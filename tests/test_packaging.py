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


def test_bench_baseline_parser_reads_headline_rows():
    """bench.py's auto-retry (VERDICT r12 item 8) keys off per-query
    baselines parsed from BASELINE.md's table rows — pin that the
    parser finds the headline rows (old and round-13 additions),
    keeps the FIRST occurrence semantics stable for re-recorded rows,
    and skips prose/non-numeric table lines."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    b = bench._baselines()
    assert b["q1_pricing_summary"] == 1.7
    assert b["web_ingest_pipeline_docs"] == 4.3
    assert b["warc_binary_ingest_docs"] == 0.6
    assert "total" not in b  # bold-total row is not a query
    assert all(isinstance(v, float) and v > 0 for v in b.values())
