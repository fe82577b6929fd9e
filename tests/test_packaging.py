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
    applies LATER-record-wins semantics for re-recorded rows (the r8
    re-record precedent — a query re-measured in a later ``sec``
    table supersedes the stale number), skips prose/non-numeric
    table lines, and (ADVICE r13) is not fooled by a scaling table
    placed immediately after a ``sec`` table with no prose between —
    the header row itself disarms ingestion."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    b = bench._baselines()
    assert b["q1_pricing_summary"] == 1.7
    assert b["web_ingest_pipeline_docs"] == 4.3
    assert b["warc_binary_ingest_docs"] == 0.6
    # VERDICT r13 item 6: the most expensive bench row now has a
    # machine-readable baseline (was prose-only, excluded from retry)
    assert b["opq_distortion_report"] == 11.0
    # sf1 scaling-table rows must never leak in as baselines
    assert "warc_octet_ingest_docs" not in b
    assert "total" not in b  # bold-total row is not a query
    assert all(isinstance(v, float) and v > 0 for v in b.values())


def test_bench_baseline_parser_scaling_table_abutting_sec_table(
        tmp_path):
    """ADVICE r13 low: a scaling table placed DIRECTLY after a sec
    table (no prose line between) must not have its sf rows ingested
    as warm baselines — the scaling header row itself disarms
    ingestion. Also pins later-record-wins for re-recorded rows."""
    import importlib.util
    import shutil

    shutil.copy("/root/repo/bench.py", tmp_path / "bench.py")
    (tmp_path / "BASELINE.md").write_text(
        "| query | sec | notes |\n"
        "|---|---|---|\n"
        "| alpha_q | 2.0 | first record |\n"
        "| query | sf0.1 s | sf1 s | ratio | exponent |\n"
        "|---|---|---|---|---|\n"
        "| scaled_q | 9.9 | 99.0 | 10.0 | 1.0 |\n"
        "| alpha_q | 7.7 | 77.0 | 10.0 | 1.0 |\n"
        "\n"
        "prose between tables.\n"
        "\n"
        "| query | sec | notes |\n"
        "|---|---|---|\n"
        "| alpha_q | 3.0 | later re-record wins |\n")
    spec = importlib.util.spec_from_file_location(
        "bench_tmp", tmp_path / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    b = mod._baselines()
    assert b == {"alpha_q": 3.0}, b
