"""Sinks — CSV / Parquet / JDBC writers (SURVEY.md §2.2, K1-K4).

The reference forces single-file CSV output via ``coalesce(1)`` before
every major write (``soulutionOne.py:47,75``) and loads MySQL row-by-row
through the driver (``DAG/ETL.py:97-100``). Both serialize what should be
executor-parallel work. Here:

- multi-part parallel writes are the default; ``single_file=True`` is an
  explicit opt-in that documents its cost,
- the RDBMS sink is Spark's JDBC writer — executor-parallel batched
  inserts, with append vs truncate-overwrite matching the two DAG variants
  (``DAG/ETL.py:97-100`` append; ``DAG/sample.py:71-87`` truncate+load),
- array/struct columns are rendered to deterministic strings before CSV
  (the format can't hold them; the reference's lossy ``cast(StringType)``
  at ``soulutionOne.py:68-69`` becomes an explicit, sorted JSON render).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _csv_safe(df: DataFrame) -> DataFrame:
    """Render array/struct/map columns as JSON strings (sorted arrays for
    determinism) so the frame is CSV-representable."""
    cols = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.ArrayType) and isinstance(
            field.dataType.elementType, (T.StringType, T.IntegerType,
                                         T.LongType, T.DoubleType)
        ):
            cols.append(F.to_json(F.sort_array(c)).alias(field.name))
        elif isinstance(field.dataType, (T.ArrayType, T.StructType, T.MapType)):
            cols.append(F.to_json(c).alias(field.name))
        else:
            cols.append(c)
    return df.select(*cols)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """K1/K2. ``single_file=True`` reproduces the reference's
    ``coalesce(1)`` single-task write — fine for small exports, an
    anti-pattern at scale (1 task writes everything)."""
    out = _csv_safe(df)
    if single_file:
        out = out.coalesce(1)
    out.write.csv(path, mode=mode, header=header)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet is the engine's native interchange format (replaces the
    reference's write-then-reread CSV handoffs, ``soulutionOne.py:47-50``)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (built into Spark; same pushdown/pruning class as
    parquet — for pipelines whose downstream warehouse is ORC-native)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    truncate: bool = False,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """K3/K4 — executor-parallel JDBC sink.

    ``mode='append'`` ≙ the reference's row-wise INSERT loop
    (``DAG/ETL.py:97-100``) but batched and parallel; ``mode='overwrite',
    truncate=True`` ≙ the TRUNCATE + LOAD DATA variant
    (``DAG/sample.py:71-87``). Integration-tested against the embedded
    Derby engine Spark bundles (``tests/test_jdbc.py`` round-trips rows
    through a real JDBC driver, including the truncate-overwrite path).

    Dialect behavior of ``truncate=True`` (Spark resolves the SQL per
    JdbcDialect, the engine passes the flag through): MySQL — the
    reference's target — and Derby both issue a literal ``TRUNCATE
    TABLE``, preserving the table's schema/indexes/grants exactly as
    ``DAG/sample.py:71`` does; dialects where truncation would cascade
    or is unsupported make Spark fall back to DROP + CREATE (e.g.
    Postgres with cascading foreign keys), which loses indexes and
    grants — pre-create the table and verify the fallback is acceptable
    before enabling on a new dialect. The reference's ``LOAD DATA
    INFILE`` bulk step maps to the batched executor-parallel INSERTs
    here; on MySQL add ``properties={"rewriteBatchedStatements":
    "true"}`` so the driver coalesces each ``batch_size`` batch into
    one multi-row statement (within ~2× of LOAD DATA, without the
    server-filesystem coupling). Only the embedded-Derby dialect is
    exercisable in this container (no network/database daemons);
    other dialects differ only in the url/driver pair plus the notes
    above.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("truncate", str(truncate).lower())
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized parquet: range-partition on the sort key, then
    sort within each partition before writing.

    Files end up covering disjoint key ranges and every parquet row group
    carries tight min/max statistics on the sort columns, so later range
    or point filters on those columns skip whole files/row groups at plan
    time (partition pruning's little sibling, and the single biggest scan
    win available without a table format). At 100 TB this is the
    difference between scanning a time slice and scanning the corpus.
    ``num_files`` controls output file count (defaults to the session's
    shuffle parallelism via ``repartitionByRange``'s default).
    """
    cols = [F.col(c) for c in sort_cols]
    out = (df.repartitionByRange(num_files, *cols) if num_files
           else df.repartitionByRange(*cols))
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    epoch: int = 0,
    id_col: str = "doc_id",
    token_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Export the corpus as deterministic TRAINING SHARDS — the last
    mile of the curation pipeline, where a trainer's data loader wants
    many same-sized, internally-shuffled files it can assign to
    workers: each row hash-assigns to a shard via its epoch-salted md5
    key (the ``epoch_shuffle_docs`` key family — append-stable,
    reproducible, a DIFFERENT permutation per epoch) and rows within a
    shard are written in key order, so global read order =
    concatenated shard order = the epoch's md5 permutation restricted
    to hash-sharding. One shuffle (the shard repartition); no global
    sort, no single-partition window — shard balance is binomial
    (±O(√(n/shards))), which is what every production shard writer
    accepts in exchange for scale.

    Writes ``shard=<i>`` parquet partitions and returns the MANIFEST
    frame (shard, n_rows[, n_tokens]) the loader reads for length
    bucketing / work assignment — compute it from the same keyed frame
    so it cannot drift from the files."""
    key = F.md5(F.concat(F.lit(f"{epoch}:"),
                         F.col(id_col).cast("string")))
    keyed = (
        df.withColumn("__key", key)
        .withColumn("shard",
                    F.pmod(F.xxhash64(F.col("__key")), F.lit(n_shards)))
    )
    # STATIC overwrite on purpose: an export replaces the whole
    # dataset, so a re-export with fewer shards (or an empty shard)
    # must not leave stale shard=<i> partitions behind to mix old rows
    # into the corpus — dynamic partition overwrite is the EPOCH-sink
    # idiom (streaming ingests), not the exporter's (review-caught).
    (
        keyed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__key")
        .drop("__key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col)).alias("n_tokens"))
    return keyed.groupBy("shard").agg(*aggs).orderBy("shard")


def write_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (hash-pre-shuffled) table — THE co-located-join tool at
    100 TB: pay the shuffle ONCE at write time and every later
    equi-join or aggregation on the bucket columns between tables with
    the same bucket count skips its Exchange entirely (Catalyst reads
    the bucket spec from the catalog and trusts the on-disk hash
    layout). ``sort_cols`` additionally sorts within each bucket file,
    so a bucketed sort-merge join also skips its Sort. The standing
    fact/dim tables of a training pipeline (documents by doc_id,
    signatures by doc_id, embeddings by vec_id) should live bucketed —
    each incremental batch then joins against them shuffle-free on the
    batch side only.

    Bucketing requires the table catalog (``saveAsTable``); ``path``
    pins an external location, otherwise the warehouse dir hosts it.
    Read back with ``readers.read_table`` — ``spark.read.parquet(path)``
    would see the files but NOT the bucket spec, silently losing the
    exchange elision."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def zorder_key(cols: list, bits: int = 16) -> "F.Column":
    """Morton (Z-order) key from pre-scaled non-negative integer columns:
    bit ``b`` of column ``i`` lands at interleaved position
    ``b * n_cols + i``. Columns must already be scaled into ``[0, 2^bits)``
    (see ``write_zordered_parquet``, which min/max-scales for you). Pure
    shift/mask expressions — stays inside whole-stage codegen."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional layout optimization: cluster the file/row-group
    layout on a Morton (Z-order) curve over several columns at once.

    ``write_sorted_parquet``'s linear sort gives perfect skipping on the
    leading column and none on the others; interleaving the columns'
    bits makes rows close in EVERY dimension land close on disk, so
    range/point filters on ANY Z-column skip most row groups (the same
    trick table formats expose as ``OPTIMIZE ... ZORDER BY``). Each
    column is min/max-scaled into ``[0, 2^bits)`` via a 1-row broadcast
    of the extrema (computed distributedly — no driver collect), the
    interleave is pure bit arithmetic, and the write is the same
    range-partition + sort-within-partitions as the linear writer, keyed
    on the Z-value. ``bits=16`` gives 2^16 cells per dimension — plenty
    to separate row groups, cheap to compute (16·n_cols shifts/row).

    Restricted to numeric/date/timestamp columns (anything Spark can
    cast to long); at 100 TB the scan savings on the second and third
    filter column are what this buys over the linear sort."""
    longs = [F.col(c).cast("long") for c in zorder_cols]
    extrema = df.agg(
        *[F.min(c).alias(f"__lo_{i}") for i, c in enumerate(longs)],
        *[F.max(c).alias(f"__hi_{i}") for i, c in enumerate(longs)],
    )
    scale = F.lit((1 << bits) - 1).cast("double")
    scaled = [
        F.least(
            F.floor(
                (c - F.col(f"__lo_{i}")).cast("double")
                / F.greatest((F.col(f"__hi_{i}") - F.col(f"__lo_{i}"))
                             .cast("double"), F.lit(1.0))
                * scale
            ).cast("long"),
            F.lit((1 << bits) - 1).cast("long"),
        )
        for i, c in enumerate(longs)
    ]
    keyed = (
        df.crossJoin(F.broadcast(extrema))
        .withColumn("__z", zorder_key(scaled, bits))
        .drop(*[f"__lo_{i}" for i in range(len(longs))],
              *[f"__hi_{i}" for i in range(len(longs))])
    )
    out = (keyed.repartitionByRange(num_files, F.col("__z")) if num_files
           else keyed.repartitionByRange(F.col("__z")))
    (out.sortWithinPartitions("__z").drop("__z")
     .write.mode(mode).parquet(path))


def compact_small_files(
    spark,
    path: str,
    out_path: str | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a table directory into files sized
    for ``target_bytes`` each. Streaming sinks and over-parallel writes
    leave thousands of KB-sized files whose per-file open/footer cost
    dominates scans at corpus scale; periodic compaction is standard
    table maintenance (the hand-rolled form of OPTIMIZE in table
    formats).

    File count derives from the INPUT's on-disk bytes (compressed), read
    from the filesystem — no data pass. The rewrite itself is one
    shuffle-free coalesce when shrinking, or a round-robin repartition
    when growing parallelism. Returns the file count written.

    **Local paths only.** The size scan and the in-place swap use the
    local filesystem API; a remote URI (hdfs://, s3a://, ...) raises —
    route through an explicit ``out_path`` job plus the store's own
    rename/OPTIMIZE there. In-place compaction (``out_path=None``) swaps
    via two renames: the live dir moves aside, the rewrite moves in,
    then the old dir is deleted. The vulnerable window is the instant
    between the two renames (crash there leaves ``path`` absent but both
    ``path + '__compact_old'`` — complete — and the finished rewrite on
    disk for manual recovery); this is table maintenance, not a
    transactional commit.
    """
    import math
    import os
    import shutil
    from urllib.parse import urlparse

    for p in (path, out_path) if out_path else (path,):
        scheme = urlparse(p).scheme
        if scheme not in ("", "file"):
            raise ValueError(
                f"compact_small_files is local-filesystem-only, got {p!r}; "
                "use an explicit out_path job + the store's rename there")

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_bytes))

    df = spark.read.format(fmt).load(path)
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files < cur else df.repartition(n_files)

    dest = out_path or (path.rstrip("/") + "__compact_tmp")
    out.write.format(fmt).mode("overwrite").save(dest)
    if out_path is None:
        old = path.rstrip("/") + "__compact_old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(dest, path)
        shutil.rmtree(old)
    return n_files


def consolidate_epochs(
    spark, path: str, upto: int | None = None, mode: str = "append"
) -> int:
    """Fold the epoch partitions of a streaming artifact table (any
    ``partitionBy("epoch")`` sink in ``streaming/ops.py``) into ONE
    partition at the MAXIMUM consolidated epoch id. Reads of the form
    ``epoch < current_batch_epoch`` see equivalent state afterwards:
    checkpointed batch ids only ever increase, so the consolidated id
    stays strictly below every future batch's — the invariant that
    makes this safe to run between micro-batches.

    The NEWEST on-disk epoch is never folded into itself by default:
    it may be an UNCOMMITTED batch (sink written, crash before the
    streaming checkpoint commit — exactly the replay window the
    epoch-overwrite idiom exists for). If that batch replayed after
    being folded, its ``epoch < epoch_id`` reads would see no prior
    state and its dynamic partition overwrite would wipe the
    consolidated partition. So ``upto=None`` defaults to the
    SECOND-newest epoch, leaving the newest partition untouched. Pass
    an explicit ``upto`` to override — it MUST be strictly below the
    last committed batch id (the on-disk max is only safe when the
    stream is stopped and its final batch is known committed).

    ``mode`` must match the table's epoch SEMANTICS:

    - ``"append"`` — each epoch holds NEW rows (the corpus content,
      span/signature/cell-index tables): every consolidated row is
      kept, relabelled to the target epoch.
    - ``"snapshot"`` — each epoch holds the FULL standing state
      (``streaming_reservoir_ingest``): only the newest consolidated
      epoch's rows survive; older lineage is dropped (folding
      superseded snapshots together would resurrect displaced rows).

    ``upto`` consolidates only epochs ≤ it (leaving newer partitions
    untouched — e.g. keep the last day's lineage); ``None`` folds
    everything below the newest epoch (see above). The rewrite goes
    through the same two-rename in-place
    swap as ``compact_small_files`` (local paths only; same recovery
    caveat) and rewrites every consolidated row once — table
    maintenance cost, run it at the compaction cadence. Returns the
    number of epoch partitions consolidated (0 = nothing to do,
    table untouched)."""
    import os
    import shutil
    from urllib.parse import urlparse

    if urlparse(path).scheme not in ("", "file"):
        raise ValueError(
            f"consolidate_epochs is local-filesystem-only, got {path!r}")

    if mode not in ("append", "snapshot"):
        raise ValueError(f"consolidate_epochs: unknown mode {mode!r}")
    import logging

    log = logging.getLogger(__name__)
    df = spark.read.parquet(path)
    all_epochs = sorted(
        r["epoch"] for r in df.select("epoch").distinct().collect())
    if upto is None:
        # never fold the newest epoch into itself (possibly an
        # uncommitted batch — see docstring); default to second-newest
        if len(all_epochs) < 3:
            # say so — upto=None used to fold EVERYTHING (advisory r8);
            # an operator expecting full consolidation should notice
            log.info(
                "consolidate_epochs(%s): %d epoch(s) on disk — nothing "
                "folded (upto=None spares the newest epoch; pass an "
                "explicit committed upto to fold a 2-epoch table)",
                path, len(all_epochs))
            return 0
        upto = all_epochs[-2]
        log.info(
            "consolidate_epochs(%s): upto=None spares the newest epoch "
            "%s (possibly uncommitted); folding through epoch %s",
            path, all_epochs[-1], upto)
    sel = df.where(F.col("epoch") <= upto)
    epochs = [e for e in all_epochs if e <= upto]
    if len(epochs) <= 1:
        log.info(
            "consolidate_epochs(%s): %d epoch(s) at/below upto=%s — "
            "nothing to fold", path, len(epochs), upto)
        return 0
    target = max(epochs)
    if mode == "snapshot":
        sel = sel.where(F.col("epoch") == target)
    consolidated = (
        sel.drop("epoch").withColumn("epoch", F.lit(target))
    )
    keep = df.where(F.col("epoch") > upto)
    out = consolidated.unionByName(keep)

    tmp = path.rstrip("/") + "__epochs_tmp"
    (out.write.mode("overwrite").partitionBy("epoch").parquet(tmp))
    old = path.rstrip("/") + "__epochs_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(epochs)
