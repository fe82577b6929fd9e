"""Sources & sinks: CSV round-trips (incl. array rendering), schema
validation, directory-glob ingestion, SQL surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_deduplication_spark.sources.readers import (
    MissingColumnsError,
    read_csv,
    read_csv_dir,
    read_table,
    validate_columns,
)
from pyspark_deduplication_spark.sources.writers import write_csv, write_parquet


def test_csv_roundtrip_default_stringly(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    out = str(tmp_path / "t1")
    write_csv(df, out)
    back = read_csv(spark, out)
    # reference mode: no schema, no inference → all strings
    assert [f.dataType for f in back.schema.fields] == [T.StringType()] * 2
    assert sorted((r.id, r.name) for r in back.collect()) == [("1", "a"), ("2", "b")]


def test_csv_single_file_mode(spark, tmp_path):
    import glob

    df = spark.range(100).withColumnRenamed("id", "x")
    out = str(tmp_path / "single")
    write_csv(df, out, single_file=True)
    parts = glob.glob(f"{out}/part-*")
    assert len(parts) == 1  # ≙ reference coalesce(1)


def test_csv_array_columns_rendered_sorted(spark, tmp_path):
    df = spark.createDataFrame([(1, ["b", "a"])],
                               "id long, names array<string>")
    out = str(tmp_path / "arr")
    write_csv(df, out)
    back = read_csv(spark, out)
    assert back.collect()[0].names == '["a","b"]'


def test_validate_columns_case_insensitive(spark):
    df = spark.createDataFrame([(1, "x")], "ID long, Name string")
    validate_columns(df, ["id", "name"])  # must not raise (SURVEY §1.3)
    with pytest.raises(MissingColumnsError) as exc:
        validate_columns(df, ["iban"])
    assert exc.value.missing == ["iban"]


def test_read_csv_required_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    out = str(tmp_path / "req")
    write_csv(df, out)
    read_csv(spark, out, required_columns=["name", "id"])
    with pytest.raises(MissingColumnsError):
        read_csv(spark, out, required_columns=["iban"])


def test_read_csv_dir_glob_single_job(spark, tmp_path):
    for i in range(3):
        spark.createDataFrame([(i, f"n{i}")], "id long, name string") \
            .coalesce(1).write.csv(str(tmp_path / f"f{i}.csv"), header=True)
    back = read_csv_dir(spark, str(tmp_path))
    assert back.count() == 3


def test_csv_schema_declared(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], "id long, v double")
    out = str(tmp_path / "sch")
    write_csv(df, out)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    back = read_csv(spark, out, schema=schema)
    assert back.schema == schema
    assert back.collect() == [(1, 2.5)]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=["k"])
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert set(back.columns) == {"id", "k"}


def test_temp_view_and_catalog_lookup(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    df.createOrReplaceTempView("extracted_data")  # ≙ DAG/ETL.py:29
    assert read_table(spark, "extracted_data").count() == df.count()
    assert spark.sql("SELECT * FROM extracted_data").count() == df.count()


def test_jdbc_writer_requires_driver(spark):
    """No JDBC driver jar in this container: the writer must fail with the
    driver-not-found error (proving the plan was constructed and submitted),
    not an API misuse error."""
    from pyspark_deduplication_spark.sources.writers import write_jdbc

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(Exception) as exc:
        write_jdbc(df, "jdbc:mysql://localhost:3306/test", "tbltest")
    assert "driver" in str(exc.value).lower() or "No suitable" in str(exc.value)


def test_sorted_parquet_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_sorted_parquet must produce files whose sort-key ranges are
    disjoint with tight row-group stats — the data-skipping contract."""
    import pyarrow.parquet as pq

    from pyspark_deduplication_spark.sources.writers import write_sorted_parquet

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "li_sorted")
    write_sorted_parquet(li, out, ["l_shipdate"], num_files=4)

    import glob

    ranges = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i
               for i in range(meta.num_columns)}["l_shipdate"]
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # actually range-partitioned
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint: no overlap between file key ranges

    # and the filtered read still pushes the predicate to the scan
    from pyspark_deduplication_spark.plans.inspect import pushed_filters

    q = spark.read.parquet(out).filter(F.col("l_shipdate") >= "2000-01-01")
    assert any("l_shipdate" in f for f in pushed_filters(q))


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """write_bucketed_table: two tables bucketed on the same key with
    the same bucket count must sort-merge-join with NO Exchange on
    either side (the pay-the-shuffle-once-at-write contract), and the
    values must round-trip."""
    import re

    from pyspark_deduplication_spark.plans.inspect import explain_str
    from pyspark_deduplication_spark.sources.writers import (
        write_bucketed_table,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    write_bucketed_table(cust, "bkt_cust", 4, ["c_custkey"],
                         sort_cols=["c_custkey"],
                         path=str(tmp_path / "bkt_cust"))
    write_bucketed_table(orders, "bkt_orders", 4, ["c_custkey"],
                         sort_cols=["c_custkey"],
                         path=str(tmp_path / "bkt_orders"))
    try:
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bkt_cust").join(
                spark.table("bkt_orders"), "c_custkey")
            plan = explain_str(j)
            assert "SortMergeJoin" in plan, plan
            final = plan.split("== Initial Plan ==")[0]
            assert not re.search(r"Exchange \(\d+\)", final), plan
            assert j.count() == orders.count()
            # the bucket spec lives in the catalog, not the files: a
            # bare parquet read of the same path must NOT be trusted
            # as pre-shuffled (Exchange comes back)
            raw = (
                spark.read.parquet(str(tmp_path / "bkt_cust"))
                .join(spark.read.parquet(str(tmp_path / "bkt_orders")),
                      "c_custkey")
            )
            raw_final = explain_str(raw).split("== Initial Plan ==")[0]
            assert re.search(r"Exchange \(\d+\)", raw_final)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_cust")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_zordered_parquet_skips_on_every_dimension(spark, sf_dir, tmp_path):
    """Z-order layout must make row-group stats selective on BOTH
    interleaved columns — a linear sort can only serve its leading
    column. For a point-ish predicate on each dimension, the fraction
    of row groups whose [min,max] admit the value must be well under
    the scan-everything 100%."""
    import glob

    import pyarrow.parquet as pq

    from pyspark_deduplication_spark.sources.writers import write_zordered_parquet

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "li_z")
    write_zordered_parquet(li, out, ["l_partkey", "l_suppkey"], num_files=8)

    stats = {"l_partkey": [], "l_suppkey": []}
    total = 0
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i
               for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            for col in stats:
                st = meta.row_group(rg).column(idx[col]).statistics
                stats[col].append((st.min, st.max))

    assert total >= 8
    # row count preserved
    assert spark.read.parquet(out).count() == li.count()
    # The honest selectivity claim, measured two ways. Thresholds need
    # real margin: repartitionByRange's boundary sample seed depends
    # on the session's RDD-id history, and with only 8 z-cells over
    # this fixture the per-probe admitting fraction genuinely runs
    # 0.4–0.75 per dimension (r12 measured the distribution across
    # RDD-id histories; two suite flakes came from thresholds set
    # inside that band).
    def mean_admitting(ranges_, n_groups):
        los = sorted(lo for lo, _ in ranges_)
        fracs = [
            sum(1 for lo, hi in ranges_
                if lo <= los[len(los) * q // 4] <= hi) / n_groups
            for q in (1, 2, 3)
        ]
        return sum(fracs) / len(fracs)

    # (1) absolute: typical probes on BOTH dimensions skip row groups
    for col, ranges in stats.items():
        assert mean_admitting(ranges, total) <= 0.85, (
            col, [r for r in ranges])
    # (2) relative — the property a linear sort cannot have: against a
    # l_partkey-sorted layout, the z-order's SECOND dimension
    # (l_suppkey) is far more selective than the linear layout's,
    # where every row group spans the whole suppkey space
    from pyspark_deduplication_spark.sources.writers import (
        write_sorted_parquet,
    )

    lin = str(tmp_path / "li_lin")
    write_sorted_parquet(li, lin, ["l_partkey"], num_files=8)
    lin_ranges, lin_total = [], 0
    for f in sorted(glob.glob(f"{lin}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i
               for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            lin_total += 1
            st = meta.row_group(rg).column(idx["l_suppkey"]).statistics
            lin_ranges.append((st.min, st.max))
    z_sup = mean_admitting(stats["l_suppkey"], total)
    lin_sup = mean_admitting(lin_ranges, lin_total)
    assert lin_sup > 0.95, lin_sup      # linear sort: suppkey unservable
    assert z_sup <= 0.7 * lin_sup, (z_sup, lin_sup)
    # and both dimensions cannot be globally sorted at once: at least
    # one row group must NOT span the full key space on either column
    for col, ranges in stats.items():
        lo_all = min(lo for lo, _ in ranges)
        hi_all = max(hi for _, hi in ranges)
        assert any(lo > lo_all or hi < hi_all for lo, hi in ranges), col


def test_read_jsonl_quarantine_splits_clean_and_corrupt(spark, tmp_path):
    from pyspark.sql import types as T

    from pyspark_deduplication_spark.sources.readers import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "second doc"}\n'
        'this line is not json at all\n'
        '{"doc_id": 3, "text": "third", "extra": "ignored"}\n'
        '{"doc_id": "NOT_A_NUMBER", "text": "type mismatch"}\n'
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    clean, bad = read_jsonl_quarantine(spark, str(p), schema)
    ids = sorted(r.doc_id for r in clean.collect())
    assert ids == [1, 2, 3]
    assert clean.columns == ["doc_id", "text"]
    bad_lines = sorted(r.raw_line for r in bad.collect())
    assert len(bad_lines) == 2
    assert any("not json" in ln for ln in bad_lines)
    assert any("NOT_A_NUMBER" in ln for ln in bad_lines)


def test_orc_round_trip(spark, tmp_path, sf_dir):
    from pyspark_deduplication_spark.sources.readers import read_orc
    from pyspark_deduplication_spark.sources.writers import write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)
    back = read_orc(spark, out, required_columns=["doc_id", "text"])
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    from pyspark_deduplication_spark.sources.writers import compact_small_files

    src = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    import glob
    n_before = len(glob.glob(f"{src}/part-*"))
    assert n_before == 64
    n_target = compact_small_files(spark, src, target_bytes=10**9)
    n_after = len(glob.glob(f"{src}/part-*"))
    assert n_target == 1 and n_after == 1
    # data intact after in-place swap
    assert spark.read.parquet(src).count() == 10_000


def test_compact_small_files_explicit_out_path(spark, tmp_path):
    from pyspark_deduplication_spark.sources.writers import compact_small_files

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compacted")
    spark.range(0, 1000).repartition(16).write.parquet(src)
    compact_small_files(spark, src, out_path=dst, target_bytes=10**9)
    assert spark.read.parquet(dst).count() == 1000
    # source untouched when out_path given
    import glob
    assert len(glob.glob(f"{src}/part-*")) == 16


def test_compact_small_files_rejects_remote_uri(spark):
    import pytest

    from pyspark_deduplication_spark.sources.writers import compact_small_files

    with pytest.raises(ValueError, match="local-filesystem-only"):
        compact_small_files(spark, "hdfs://nn/warehouse/t")
    with pytest.raises(ValueError, match="local-filesystem-only"):
        compact_small_files(spark, "s3a://bucket/t")


def test_compact_small_files_swap_leaves_no_residue(spark, tmp_path):
    """In-place swap: live dir readable afterwards, no __compact_tmp or
    __compact_old directories left behind."""
    from pyspark_deduplication_spark.sources.writers import compact_small_files

    src = str(tmp_path / "frag3")
    spark.range(0, 500).repartition(8).write.parquet(src)
    compact_small_files(spark, src, target_bytes=10**9)
    assert spark.read.parquet(src).count() == 500
    leftovers = [p.name for p in tmp_path.iterdir() if "compact" in p.name]
    assert leftovers == []


def test_consolidate_epochs_preserves_content_and_stream_resumes(
    spark, tmp_path
):
    """Epoch consolidation: content identical under the reader's
    `epoch < next_batch` contract, `upto` leaves newer lineage
    untouched, and a resumed streaming reservoir picks up the
    consolidated state seamlessly (final sample == batch operator over
    every row that ever streamed)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pyspark_deduplication_spark.operators.sampling import (
        reservoir_per_group,
    )
    from pyspark_deduplication_spark.sources.writers import (
        consolidate_epochs,
    )
    from pyspark_deduplication_spark.streaming.ops import (
        streaming_reservoir_ingest,
    )

    schema = T.StructType([
        T.StructField("grp", T.StringType()),
        T.StructField("id", T.LongType()),
    ])
    src = str(tmp_path / "incoming")
    res_dir = str(tmp_path / "reservoir")
    ckpt = str(tmp_path / "ckpt")
    e1 = [("a", i) for i in range(1, 5)]
    e2 = [("a", i) for i in range(5, 9)] + [("b", 10)]
    e3 = [("a", i) for i in range(9, 13)] + [("b", 11)]
    spark.createDataFrame(e1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{src}/f1")
    spark.createDataFrame(e2, schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{src}/f2")

    def run():
        stream = (spark.readStream.format("parquet").schema(schema)
                  .option("maxFilesPerTrigger", "1").load(f"{src}/*"))
        q = streaming_reservoir_ingest(stream, res_dir, ckpt,
                                       group_col="grp", key_col="id", k=2)
        q.awaitTermination(180)

    run()
    before = spark.read.parquet(res_dir)
    last = before.agg(F.max("epoch")).collect()[0][0]
    latest_rows = sorted((r.grp, r.id) for r in
                         before.where(before.epoch == last).collect())
    # upto= below the second epoch selects a single partition — a
    # documented no-op (nothing to fold), table untouched
    n = consolidate_epochs(spark, res_dir, upto=last - 1)
    assert n == 0
    after = spark.read.parquet(res_dir)
    assert sorted((r.grp, r.id) for r in
                  after.where(after.epoch == last).collect()) == latest_rows
    # default upto never touches the newest epoch (it could be an
    # uncommitted batch) — with only 2 epochs on disk that's a no-op
    assert consolidate_epochs(spark, res_dir, mode="snapshot") == 0
    # the stream is terminated here, so `last` is known committed and
    # an explicit upto=last may fold everything: a single epoch
    # partition holding exactly the latest standing state (append mode
    # would resurrect displaced snapshot rows — wrong for this table)
    consolidate_epochs(spark, res_dir, mode="snapshot", upto=last)
    folded = spark.read.parquet(res_dir)
    assert folded.select("epoch").distinct().count() == 1
    assert sorted((r.grp, r.id) for r in folded.collect()) == latest_rows

    # the stream resumes against the consolidated table
    spark.createDataFrame(e3, schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{src}/f3")
    run()
    final = spark.read.parquet(res_dir)
    last2 = final.agg(F.max("epoch")).collect()[0][0]
    got = sorted((r.grp, r.id) for r in
                 final.where(final.epoch == last2).collect())
    expect = sorted(
        (r.grp, r.id)
        for r in reservoir_per_group(
            spark.createDataFrame(e1 + e2 + e3, schema),
            "grp", "id", 2).collect())
    assert got == expect


def test_consolidate_epochs_append_mode_keeps_all_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.sources.writers import (
        consolidate_epochs,
    )

    path = str(tmp_path / "appendtable")
    for e, vals in ((0, [1, 2]), (1, [3]), (2, [4, 5])):
        (spark.createDataFrame([(v,) for v in vals], "v long")
         .withColumn("epoch", F.lit(e))
         .write.mode("append").partitionBy("epoch").parquet(path))
    n = consolidate_epochs(spark, path, upto=1)
    assert n == 2
    df = spark.read.parquet(path)
    assert sorted(r.epoch for r in df.select("epoch").distinct().collect()) \
        == [1, 2]
    assert sorted(r.v for r in df.where("epoch = 1").collect()) == [1, 2, 3]
    assert sorted(r.v for r in df.where("epoch = 2").collect()) == [4, 5]


def test_consolidate_epochs_default_spares_newest_epoch(spark, tmp_path):
    """upto=None folds up to the SECOND-newest epoch only: the newest
    partition (a possibly-uncommitted batch) survives byte-identical,
    so a crash-replay of that batch still sees its prior state."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.sources.writers import (
        consolidate_epochs,
    )

    path = str(tmp_path / "defaulttable")
    for e, vals in ((0, [1, 2]), (1, [3]), (2, [4, 5])):
        (spark.createDataFrame([(v,) for v in vals], "v long")
         .withColumn("epoch", F.lit(e))
         .write.mode("append").partitionBy("epoch").parquet(path))
    n = consolidate_epochs(spark, path)
    assert n == 2  # epochs 0 and 1 folded into 1; epoch 2 untouched
    df = spark.read.parquet(path)
    assert sorted(r.epoch for r in df.select("epoch").distinct().collect()) \
        == [1, 2]
    assert sorted(r.v for r in df.where("epoch = 1").collect()) == [1, 2, 3]
    assert sorted(r.v for r in df.where("epoch = 2").collect()) == [4, 5]
    # with <3 epochs, the safe default has nothing it may fold
    assert consolidate_epochs(spark, path) == 0


def test_write_training_shards_deterministic_and_ordered(spark, tmp_path):
    """Shard export contract: every row lands in exactly one of
    n_shards; within a shard the on-disk row order is the epoch md5
    key order (the loader's read order IS the epoch permutation);
    the manifest matches the files exactly; a rewrite is byte-stable;
    a different epoch yields a different permutation but the same
    manifest totals."""
    from pyspark_deduplication_spark.sources.writers import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i}", (i % 7) + 1) for i in range(200)],
        "doc_id long, text string, n_tokens int")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, path, n_shards=4, epoch=1, token_col="n_tokens").collect()
    assert [r.shard for r in manifest] == [0, 1, 2, 3]
    assert sum(r.n_rows for r in manifest) == 200
    assert sum(r.n_tokens for r in manifest) == \
        docs.agg(F.sum("n_tokens")).first()[0]

    back = spark.read.parquet(path)
    assert back.count() == 200
    per_shard = {r.shard: r.n_rows for r in manifest}
    for shard, n in per_shard.items():
        rows = (spark.read.parquet(f"{path}/shard={shard}")
                .withColumn("__f", F.input_file_name())
                .collect())
        assert len(rows) == n
        import hashlib
        keys = [hashlib.md5(f"1:{r.doc_id}".encode()).hexdigest()
                for r in rows]
        assert keys == sorted(keys), shard   # on-disk order = key order

    again = write_training_shards(
        docs, path, n_shards=4, epoch=1, token_col="n_tokens").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in manifest]

    e2 = write_training_shards(
        docs, str(tmp_path / "shards2"), n_shards=4, epoch=2,
        token_col="n_tokens").collect()
    assert sum(r.n_rows for r in e2) == 200
    assert {r.shard: r.n_rows for r in e2} != per_shard or \
        True  # balance may coincide; the permutation check is below
    s0_e1 = [r.doc_id for r in
             spark.read.parquet(f"{path}/shard=0").collect()]
    s0_e2 = [r.doc_id for r in
             spark.read.parquet(str(tmp_path / "shards2") + "/shard=0")
             .collect()]
    assert s0_e1 != s0_e2                    # epochs permute differently

    # static overwrite: re-exporting with FEWER shards must replace
    # the whole path — no stale shard=<i> partitions mixing old rows
    write_training_shards(docs, path, n_shards=2, epoch=1)
    assert spark.read.parquet(path).count() == 200
    import os
    shard_dirs = sorted(d for d in os.listdir(path)
                        if d.startswith("shard="))
    assert shard_dirs == ["shard=0", "shard=1"], shard_dirs


def test_consolidate_epochs_logs_spared_newest_and_small_table_noop(
    spark, tmp_path, caplog
):
    """VERDICT r9 item 7: the two quiet decisions upto=None makes —
    sparing the newest (possibly uncommitted) epoch, and refusing to
    fold a <3-epoch table — must be VISIBLE in the logs so an operator
    expecting full consolidation notices."""
    import logging

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.sources.writers import (
        consolidate_epochs,
    )

    logger = "pyspark_deduplication_spark.sources.writers"
    path = str(tmp_path / "logtable")
    for e, vals in ((0, [1]), (1, [2])):
        (spark.createDataFrame([(v,) for v in vals], "v long")
         .withColumn("epoch", F.lit(e))
         .write.mode("append").partitionBy("epoch").parquet(path))
    with caplog.at_level(logging.INFO, logger=logger):
        assert consolidate_epochs(spark, path) == 0
    assert any("nothing folded" in r.message for r in caplog.records)

    caplog.clear()
    (spark.createDataFrame([(3,)], "v long").withColumn("epoch", F.lit(2))
     .write.mode("append").partitionBy("epoch").parquet(path))
    with caplog.at_level(logging.INFO, logger=logger):
        assert consolidate_epochs(spark, path) == 2
    assert any("spares the newest epoch" in r.message
               for r in caplog.records)


def test_read_warc_dir_roundtrips_real_gz_files(spark, tmp_path):
    """On-disk WARC ingestion (VERDICT r13 item 2): write REAL
    multi-member ``.warc.gz`` files (one gzip member per record, the
    CommonCrawl layout) plus a plain ``.warc`` to a directory, then
    ``read_warc_dir`` must hand back every record BYTE-exactly —
    payloads include multi-byte UTF-8 and raw binary with embedded
    CRLF/\\x00, the cases where anything less than octet arithmetic
    mis-slices. Also pins: glob filtering (a stray .txt is ignored),
    per-file provenance in warc_file, and the map-only plan shape
    (no Exchange anywhere — scan, project, explode only)."""
    import gzip

    from pyspark_deduplication_spark.functions.text import (
        warc_header_of,
    )
    from pyspark_deduplication_spark.sources.readers import (
        read_warc_dir,
    )

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def rec(uri: str, payload: bytes) -> bytes:
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    cases = {
        "f1.warc.gz": {
            "doc://1": "café — mükti-byte …".encode("utf-8"),
            "doc://2": b"\x89PNG\r\n\x1a\n\x00\xffbinary\r\n\r\ntail",
        },
        "f2.warc.gz": {
            "doc://3": b"plain ascii payload",
        },
        # uncompressed twin in the SAME directory: auto-sniff handles
        "f3.warc": {
            "doc://4": "unkomprimiert — ärger".encode("utf-8"),
        },
    }
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    for fname, recs in cases.items():
        raw = b"".join(rec(u, p) for u, p in recs.items())
        if fname.endswith(".gz"):
            # one gzip MEMBER per record — the CommonCrawl layout
            raw = b"".join(gzip.compress(rec(u, p))
                           for u, p in recs.items())
        (warc_dir / fname).write_bytes(raw)
    (warc_dir / "stray.txt").write_bytes(b"not a warc")

    df = read_warc_dir(spark, str(warc_dir))
    got = (df.select(
        F.element_at(F.split("warc_file", "/"), -1).alias("f"),
        warc_header_of(F.col("headers"), "WARC-Target-URI")
        .alias("uri"), "payload").collect())
    want = {(f, u): p for f, recs in cases.items()
            for u, p in recs.items()}
    assert {(r.f, r.uri): bytes(r.payload) for r in got} == want

    # plan shape: scan -> project -> explode; NO exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_wet_dir_conversion_records_with_timestamps(
        spark, tmp_path):
    """read_wet_dir (r14): real on-disk ``.warc.wet.gz`` files —
    warcinfo and conversion records interleaved, member-per-record
    gzip — must yield ONE row per conversion record with the decoded
    text and the WARC-Date as a TIMESTAMP; warcinfo records drop at
    the type filter; absent/malformed dates yield NULL, never an
    error; plan stays exchange-free."""
    import datetime
    import gzip

    from pyspark_deduplication_spark.sources.readers import (
        read_wet_dir,
    )

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def rec(wtype, uri, payload, date=None):
        h = (b"WARC/1.0" + crlf + b"WARC-Type: " + wtype + crlf)
        if uri:
            h += b"WARC-Target-URI: " + uri.encode() + crlf
        if date:
            h += b"WARC-Date: " + date.encode() + crlf
        return (h + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    wet = (
        gzip.compress(rec(b"warcinfo", "",
                          b"software: graft-crawler/1.0"))
        + gzip.compress(rec(b"conversion", "https://ex.com/a",
                            "extraît — text «a»".encode("utf-8"),
                            "2024-03-01T12:34:56Z"))
        + gzip.compress(rec(b"conversion", "https://ex.com/b",
                            b"plain b",
                            "2024-03-01T12:34:56.123456Z"))
        + gzip.compress(rec(b"conversion", "https://ex.com/c",
                            b"no date record"))
        + gzip.compress(rec(b"conversion", "https://ex.com/d",
                            b"bad date", "yesterday-ish"))
    )
    d = tmp_path / "wet"
    d.mkdir()
    (d / "seg.warc.wet.gz").write_bytes(wet)

    df = read_wet_dir(spark, str(d))
    rows = {r.uri: r for r in df.collect()}
    assert sorted(rows) == ["https://ex.com/a", "https://ex.com/b",
                            "https://ex.com/c", "https://ex.com/d"]
    assert rows["https://ex.com/a"].text == "extraît — text «a»"
    assert rows["https://ex.com/a"].crawl_ts == datetime.datetime(
        2024, 3, 1, 12, 34, 56)
    assert rows["https://ex.com/b"].crawl_ts is not None
    assert rows["https://ex.com/c"].crawl_ts is None
    assert rows["https://ex.com/d"].crawl_ts is None
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_warc_accounting_report_counts(spark, tmp_path):
    """read_warc_dir_report (r15 — VERDICT r14 item 3, no-silent-caps):
    every loss class the kernels distinguish is counted per file —
    truncated/corrupt gzip members, malformed records (no
    Content-Length), over-declared truncated records, unparsed tail
    octets — while the recovered record counts match what
    read_warc_dir itself yields; a clean file reports clean=1 and
    zeros; the plan stays exchange-free."""
    import gzip

    from pyspark_deduplication_spark.sources.readers import (
        read_warc_dir,
        read_warc_dir_report,
    )

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def rec(uri, payload):
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri + crlf
                + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "good.warc.gz").write_bytes(
        gzip.compress(rec(b"u://a", b"hello"))
        + gzip.compress(rec(b"u://b", b"world")))
    (d / "trunc.warc.gz").write_bytes(
        gzip.compress(rec(b"u://c", b"keep"))
        + gzip.compress(rec(b"u://d", b"lost"))[:10])
    (d / "corrupt.warc.gz").write_bytes(
        gzip.compress(rec(b"u://e", b"keep2")) + b"NOTGZIPGARBAGE")
    (d / "mal.warc").write_bytes(
        rec(b"u://f", b"ok") + b"WARC/1.0\r\nX-Broken: yes\r\n\r\n")
    (d / "tail.warc").write_bytes(
        rec(b"u://g", b"ok2") + b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 100\r\n\r\nshort")

    rep = read_warc_dir_report(spark, str(d))
    rows = {r.warc_file.rsplit("/", 1)[-1]: r for r in rep.collect()}
    # (n_records, corrupt, trunc_gz, malformed, trunc_rec, unparsed, clean)
    want = {
        "good.warc.gz": (2, 0, 0, 0, 0, 0, 1),
        "trunc.warc.gz": (1, 0, 1, 0, 0, 0, 0),
        "corrupt.warc.gz": (1, 1, 0, 0, 0, 0, 0),
        "mal.warc": (1, 0, 0, 1, 0, 27, 0),
        "tail.warc": (1, 0, 0, 0, 1, 59, 0),
    }
    assert set(rows) == set(want)
    for name, exp in want.items():
        r = rows[name]
        got = (r.n_records, r.corrupt_gzip_members,
               r.truncated_gzip_members, r.malformed_records,
               r.truncated_records, r.unparsed_octets, r.clean)
        assert got == exp, (name, got, exp)

    # the report's counts agree with the reader's actual yield
    yields = {r.warc_file.rsplit("/", 1)[-1]: r.cnt for r in
              read_warc_dir(spark, str(d))
              .groupBy("warc_file").count()
              .withColumnRenamed("count", "cnt").collect()}
    for name, exp in want.items():
        assert yields.get(name, 0) == exp[0], name

    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_wat_dir_envelope_parse(spark, tmp_path):
    """read_wat_dir (r15 — completes WARC/WET/WAT): metadata records
    parse to typed title/outlinks/headers columns; warcinfo and
    response records drop at the type filter; unparseable JSON yields
    NULL envelope columns (PERMISSIVE), never an error; the tolerant
    WARC-Date parse accepts a short fraction + lowercase z; plan is
    exchange-free."""
    import datetime
    import gzip
    import json

    from pyspark_deduplication_spark.sources.readers import read_wat_dir

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def rec(wtype, uri, payload, date=None):
        h = b"WARC/1.0" + crlf + b"WARC-Type: " + wtype + crlf
        if uri:
            h += b"WARC-Target-URI: " + uri.encode() + crlf
        if date:
            h += b"WARC-Date: " + date.encode() + crlf
        return (h + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    env = {"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {
        "Headers": {"Server": "nginx", "Content-Type": "text/html"},
        "HTML-Metadata": {
            "Head": {"Title": "Página «uno»"},
            "Links": [{"path": "A@/href", "url": "https://t/1",
                       "text": "first anchor"},
                      {"path": "A@/href", "url": "https://t/2"}],
        }}}}}
    wat = (
        gzip.compress(rec(b"warcinfo", "", b"software: x"))
        + gzip.compress(rec(
            b"metadata", "https://page/1",
            json.dumps(env, ensure_ascii=False).encode(),
            "2024-03-01T12:05:56.25z"))
        + gzip.compress(rec(b"metadata", "https://page/2",
                            b"{ not json ["))
        + gzip.compress(rec(b"response", "https://page/3",
                            b"<html>body</html>"))
    )
    d = tmp_path / "wat"
    d.mkdir()
    (d / "seg.warc.wat.gz").write_bytes(wat)

    df = read_wat_dir(spark, str(d))
    rows = {r.uri: r for r in df.collect()}
    assert sorted(rows) == ["https://page/1", "https://page/2"]
    r1 = rows["https://page/1"]
    assert r1.title == "Página «uno»"
    assert r1.outlinks == ["https://t/1", "https://t/2"]
    # anchor text rides along; a link without one yields NULL text
    assert [(x.url, x.text) for x in r1.links] == [
        ("https://t/1", "first anchor"), ("https://t/2", None)]
    assert dict(r1.http_headers) == {"Server": "nginx",
                                     "Content-Type": "text/html"}
    assert r1.crawl_ts == datetime.datetime(
        2024, 3, 1, 12, 5, 56, 250000)
    r2 = rows["https://page/2"]
    assert r2.title is None and r2.outlinks is None
    assert r2.http_headers is None and r2.crawl_ts is None

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cdx_random_access(spark, tmp_path):
    """THE capture-index contract: seek to (offset, length) in the
    on-disk file, gunzip just those bytes, and recover the exact
    record — no segment rescan. Covers both layouts (.warc.gz member
    extents and bare-.warc record spans) with multi-byte payloads."""
    import gzip

    from pyspark_deduplication_spark.sources.readers import read_warc_cdx

    def rec(uri: str, body: str) -> bytes:
        b = body.encode("utf-8")
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                + f"WARC-Target-URI: {uri}\r\n".encode()
                + f"Content-Length: {len(b)}\r\n\r\n".encode()
                + b + b"\r\n\r\n")

    bodies = {f"https://h{i}.ex/p": f"payload «{i}» ±" for i in range(3)}
    recs = [rec(u, b) for u, b in sorted(bodies.items())]
    gz = tmp_path / "a.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in recs))
    raw = tmp_path / "b.warc"
    raw.write_bytes(b"".join(recs))

    idx = read_warc_cdx(spark, str(tmp_path)).collect()
    assert len(idx) == 6
    for cap in idx:
        data = open(cap.warc_file.replace("file:", ""), "rb").read()
        window = data[cap.offset:cap.offset + cap.length]
        if cap.warc_file.endswith(".warc.gz"):
            window = gzip.decompress(window)
        # the fetched window IS one whole record
        assert window.startswith(b"WARC/1.0\r\n")
        assert cap.uri.encode() in window
        body = bodies[cap.uri].encode("utf-8")
        assert window.endswith(body + b"\r\n\r\n")
        import hashlib
        assert cap.digest == hashlib.md5(body).hexdigest()
    # extents tile each file exactly
    for f in {c.warc_file for c in idx}:
        caps = sorted((c for c in idx if c.warc_file == f),
                      key=lambda c: c.offset)
        assert caps[0].offset == 0
        for a, b in zip(caps, caps[1:]):
            assert b.offset == a.offset + a.length
        assert caps[-1].offset + caps[-1].length == caps[-1].file_size

    plan = read_warc_cdx(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
