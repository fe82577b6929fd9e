"""Shim for environments whose setuptools predates wheel-less PEP 660
builds (setuptools < 70.1 needs the ``wheel`` package to build editable
installs; on an offline box without it, this file keeps

    pip install -e . --no-use-pep517 --no-build-isolation

working via the legacy develop path). All metadata lives in
``pyproject.toml``; this file intentionally declares nothing."""

from setuptools import setup

setup()
