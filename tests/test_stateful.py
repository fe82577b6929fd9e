"""applyInPandasWithState: running profiles accumulate across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_deduplication_spark.streaming.ops import read_events_stream
from pyspark_deduplication_spark.streaming.stateful import streaming_user_profiles


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    from pyspark_deduplication_spark.queries import _events

    out = str(tmp_path_factory.mktemp("events_state"))
    # several files → several micro-batches with maxFilesPerTrigger=1
    _events(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_state_accumulates_across_batches(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    profiles = streaming_user_profiles(stream.select("user_id", "ts", "value"))
    q = (profiles.writeStream.outputMode("update").format("memory")
         .queryName("profiles_acc").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the max n_events per user across emitted updates = final state
    final = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events FROM profiles_acc "
            "GROUP BY user_id"
        ).collect()
    }
    from pyspark_deduplication_spark.queries import _events

    expected = {
        r.user_id: r.n
        for r in _events(spark, sf_dir).groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == expected
    # multiple micro-batches actually happened (state carried over)
    updates = spark.sql(
        "SELECT user_id, count(*) c FROM profiles_acc GROUP BY user_id"
    ).collect()
    assert max(r.c for r in updates) > 1
