"""Packaging pins (VERDICT r8 item 4): the distribution metadata stays
installable — pyproject parses, the version matches the package, the
dependency floors name what the code actually uses, and setuptools
discovery finds every subpackage (a missing __init__.py would silently
drop a subpackage from the wheel). The full `pip install -e .` path is
exercised out-of-band (it needs the `wheel` package under setuptools
< 70.1, which this offline image lacks outside the venv used to verify
it); these pins catch the regressions that would break it."""

from __future__ import annotations

import pathlib

try:
    import tomllib  # Python >= 3.11
except ImportError:  # pragma: no cover - 3.10 fallback
    import tomli as tomllib  # type: ignore[no-redef]

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _project():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_with_required_metadata():
    proj = _project()["project"]
    assert proj["name"] == "pyspark-deduplication-spark"
    assert proj["requires-python"].startswith(">=3.1")
    deps = {d.split(">=")[0].strip() for d in proj["dependencies"]}
    # the four runtime imports the engine actually makes
    assert {"pyspark", "pandas", "pyarrow", "numpy"} <= deps


def test_version_single_source():
    import pyspark_deduplication_spark as pkg

    assert _project()["project"]["version"] == pkg.__version__


def test_package_discovery_finds_every_subpackage():
    from setuptools import find_packages

    found = set(find_packages(
        where=str(ROOT), include=["pyspark_deduplication_spark*"]))
    # every directory under the package root that holds .py files must
    # be a discoverable package (i.e. has __init__.py)
    pkg_root = ROOT / "pyspark_deduplication_spark"
    expected = {"pyspark_deduplication_spark"}
    for d in pkg_root.rglob("*"):
        if d.is_dir() and any(p.suffix == ".py" for p in d.iterdir()):
            rel = d.relative_to(ROOT)
            expected.add(".".join(rel.parts))
    missing = expected - found
    assert not missing, f"subpackages without __init__.py: {missing}"


def test_build_backend_declared():
    cfg = _project()
    assert cfg["build-system"]["build-backend"] == "setuptools.build_meta"
