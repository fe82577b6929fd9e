"""SparkSession factory with scale-aware defaults.

The reference builds bare sessions (``SparkSession.builder.appName(...)
.getOrCreate()``, reference ``soulutionOne.py:24``). Our engine centralizes
session construction so every entry point gets the same scale-conscious
configuration: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for the Python boundary, UTC timestamps (required for
cross-engine oracle comparison), and a shuffle-partition count sized to the
cluster rather than Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cgroup_limit_bytes() -> int | None:
    """Container memory cap, if one applies: cgroup v2 ``memory.max``
    or v1 ``memory.limit_in_bytes``. Returns None when unlimited or
    unreadable. Needed because ``os.sysconf`` reports the HOST's
    physical RAM — exactly wrong inside a capped CI container sitting
    on a big host (ADVICE r10)."""
    for path in ("/sys/fs/cgroup/memory.max",
                 "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            raw = open(path).read().strip()
        except OSError:
            continue
        if raw == "max":
            return None
        try:
            limit = int(raw)
        except ValueError:
            continue
        # v1 reports "unlimited" as a huge page-rounded sentinel
        # (~2^63); anything beyond 4 TiB is not a real cap.
        if 0 < limit < (4 << 40):
            return limit
    return None


def _total_ram_gib() -> int:
    """Effective RAM in GiB (floor 1): min(physical RAM, cgroup cap).
    Used to size the local-mode driver heap default; os.sysconf is
    POSIX-only, so fall back to 8 GiB where it is unavailable rather
    than guessing small."""
    try:
        ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        return 8
    cap = _cgroup_limit_bytes()
    if cap is not None:
        ram = min(ram, cap)
    return max(1, int(ram // (1024 ** 3)))


def _default_driver_mem() -> str:
    """Local-mode driver heap: ``SPARK_GRAFT_DRIVER_MEM`` if set, else
    min(8g, ~70 % of physical RAM) — big enough for 32 executor threads
    on a real box, without OOM-killing constrained CI containers where
    a fixed 8g ask exceeds the cgroup limit (ADVICE r9)."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    return f"{max(1, min(8, _total_ram_gib() * 7 // 10))}g"


def shuffle_partitions_for_bytes(
    input_bytes: int,
    target_partition_bytes: int = 128 << 20,
    expansion: float = 1.0,
    floor: int | None = None,
    cap: int = 200_000,
) -> int:
    """Shuffle-partition count sized to the DATA, not the box:
    ``ceil(input_bytes * expansion / target_partition_bytes)``, floored
    at the local parallelism and capped against pathological inputs.

    The fixed per-core default is right for fixture-sized runs but
    misrepresents scale behavior: ``doc_dup_span_fraction`` measured a
    1.06 sf1 exponent at the static 32 partitions and 0.93 at 128 —
    post-shuffle partitions must track input size or per-partition state
    (sort runs, hash tables) grows ∝ n and spills (VERDICT r9 item 4).
    ``expansion`` converts what you can measure (compressed on-disk
    bytes) into what actually shuffles: text shingling/gram explosion
    runs ~two orders of magnitude over zstd-compressed parquet (each
    token re-appears in k grams, decompressed), so the dedup families
    size with ``expansion≈100``; plain columnar aggregations are ~3-8×.
    On a cluster the same rule applies with input_bytes from table
    metadata; AQE then coalesces DOWN cheaply, but it never splits an
    undersized partition count UP, so the static conf must start high
    enough."""
    floor = floor if floor is not None else (os.cpu_count() or 8)
    import math

    need = math.ceil(max(0, input_bytes) * expansion
                     / target_partition_bytes)
    return max(1, max(floor, min(cap, int(need))))


def dir_input_bytes(path: str) -> int:
    """Total bytes under a local fixture path — a directory tree or a
    single file (the driver fixtures are single ``<table>.parquet``
    files) — for sizing shuffle partitions in local runs/tools. Cluster
    deployments read this from catalog/table metadata instead."""
    if os.path.isfile(path):
        try:
            return os.path.getsize(path)
        except OSError:
            return 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                continue
    return total


from contextlib import contextmanager


@contextmanager
def model_state_exec(spark):
    """Temporarily disable adaptive query execution around an action
    whose EVERY exchange is model-state-sized by construction (Lloyd
    sufficient statistics: ≤ partitions × k × dim scalar rows; CC label
    sums over a small graph). AQE's value is runtime re-planning of
    DATA-sized shuffles (coalescing, skew splits); for a bounded-size
    shuffle it only adds one extra job submission + re-optimization per
    exchange — measured ~0.1-0.3 s of fixed cost per iterative round at
    bench SF, × rounds × callers. Restores the previous setting on
    exit; the engine never runs driver threads concurrently, so the
    session-wide toggle cannot race another query."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def get_spark(
    app_name: str = "pyspark_deduplication_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster, ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total executor cores; locally we
    default to ``local[$SPARK_GRAFT_CPUS or *]`` and one shuffle partition
    per core. All settings are overridable via ``extra_conf``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    # In local mode the driver JVM IS the whole engine — every executor
    # thread, the block manager, shuffle state, and localCheckpoint
    # blocks live in its heap. Spark's 1g default is sized for a
    # cluster driver that only coordinates; leaving it in place here
    # capped 32 executor threads at 1 GiB TOTAL and OOMed the sf1
    # scale run (r9). Honored only when the JVM isn't up yet (i.e. the
    # first get_spark in the process), like every JVM-level conf.
    # Default: min(8g, ~70% of physical RAM) so constrained CI
    # containers aren't OOM-killed by a fixed 8g ask (ADVICE r9);
    # SPARK_GRAFT_DRIVER_MEM overrides (set it HIGH, e.g. 48g, for
    # sf1+ scale runs on a big box).
    driver_mem = _default_driver_mem()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        # ContextCleaner only reclaims unreferenced shuffle/broadcast/
        # checkpoint blocks when the JVM garbage-collects; with a real
        # heap, GC can go quiet for tens of minutes in a long-lived
        # local session and stale blocks congest later jobs. 5min
        # (default 30min) keeps steady-state cleanup flowing.
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # and dynamic join-strategy switching. Essential at 100 TB where
        # static planning cannot know post-filter cardinalities.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas_udf / createDataFrame(pandas) / toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic cross-engine semantics (DuckDB oracle is UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Some fixture tables carry TIMESTAMP(NANOS) parquet columns, which
        # Spark rejects by default; read them as epoch-nanos longs and
        # convert at the source wrapper (sources/readers, queries._events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet scans: vectorized reader + pushdown are on by default;
        # keep file split size at default 128m — right for both local and
        # cluster HDFS/S3 block sizes.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
