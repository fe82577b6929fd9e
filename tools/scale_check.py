"""sf1 scaling checkpoint (VERDICT r7 item 4 / r8 item 1): time the
dedup-family queries at a base fixture and a ``factor``×-replicated one
(``tools/make_scale_fixture.py`` — near-dup rate preserved, so workload
SHAPE is fixed while n grows) and report per-query scaling exponents

    exponent = ln(t_scaled / t_base) / ln(factor)

≈1.0 is linear, ≈2.0 quadratic. Two families of rows:

- **as-cataloged** — the query exactly as ``queries()`` defines it,
  fixture knobs (n_cells=8, label blocking) HELD FIXED. Capacity knobs
  that are meant to track n (an IVF's cell count) then make per-cell /
  per-block work grow, so a super-linear exponent here indicts the
  FIXTURE PARAMETERIZATION, not the operator.
- **knob-scaled** (names suffixed ``@scaled``) — the same operator with
  its capacity knob grown with n (n_cells × factor → constant expected
  cell size), i.e. how a 100 TB deployment would actually configure it.
  THESE rows carry the scaling claim.

Usage:
    python tools/scale_check.py BASE_DIR SCALED_DIR FACTOR [names...]
    SCALE_RUNS=n  best-of-n per (query, sf) timing (default 2)

Prints one JSON line per query and a closing summary line; paste the
table into BASELINE.md's sf1 section.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "minhash_dedup_docs",
    "incremental_minhash_docs",
    "semantic_dedup_embeddings",
    "incremental_semantic_dedup_embeddings",
    "fused_dedup_docs",
]


def _knob_scaled_variants(factor: int):
    """The dedup-family operators re-invoked with capacity knobs grown
    with n — the deployment spelling of each query (same operator code
    path, only the knob differs; catalog fixtures pin n_cells=8 for
    oracle determinism at tiny SF)."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.fused import fused_dedup
    from pyspark_deduplication_spark.operators.knn import (
        incremental_semantic_dedup,
        semantic_dedup,
    )
    from pyspark_deduplication_spark.queries import _t

    def sem(n_cells):
        def q(spark, sf_dir):
            emb = _t(spark, sf_dir, "embeddings")
            return semantic_dedup(emb, threshold=0.3, n_cells=n_cells,
                                  max_cell_size=4096)
        return q

    def inc_sem(n_cells):
        def q(spark, sf_dir):
            emb = _t(spark, sf_dir, "embeddings")
            batch = emb.filter(F.col("vec_id") % 4 == 0)
            corpus = emb.filter(F.col("vec_id") % 4 != 0)
            return incremental_semantic_dedup(
                batch, corpus, threshold=0.3, n_cells=n_cells,
                max_cell_size=4096).select("vec_id", "label")
        return q

    def fused(n_cells):
        # the PRODUCTION fused operator (cells, not label blocking —
        # the catalog entry's label-blocked semantic leg exists for
        # oracle-ability and grows with block size by construction)
        def q(spark, sf_dir):
            docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
            emb = _t(spark, sf_dir, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "embedding")
            both = docs.join(emb, "doc_id")
            return fused_dedup(
                both, "doc_id", "text", "embedding",
                jaccard_threshold=0.7, cosine_threshold=0.7,
                n_cells=n_cells, max_bucket_size=4096, max_cell_size=4096)
        return q

    def fused_weighted(n_cells):
        # the three-signal production operator (r9 weighted_threshold
        # leg): lexical MinHash ∪ semantic cells ∪ tf-weighted ICWS,
        # one CC pass — cells knob-scaled like the two-signal variant
        def q(spark, sf_dir):
            docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
            emb = _t(spark, sf_dir, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "embedding")
            both = docs.join(emb, "doc_id")
            return fused_dedup(
                both, "doc_id", "text", "embedding",
                jaccard_threshold=0.7, cosine_threshold=0.7,
                n_cells=n_cells, max_bucket_size=4096, max_cell_size=4096,
                weighted_threshold=0.5)
        return q

    def ivfpq(n_cells):
        # the composed IVF×PQ train+query path with the coarse-cell
        # knob grown with n (constant expected cell size — how a
        # deployment sizes the coarse quantizer)
        from pyspark_deduplication_spark.operators.knn import ivfpq_knn

        def q(spark, sf_dir):
            emb = _t(spark, sf_dir, "embeddings")
            queries = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), F.col("embedding"))
            return ivfpq_knn(emb, queries, dim=64, k=10, n_cells=n_cells,
                             n_probe=4, m_subspaces=8, k_codes=16,
                             rerank=50, residual=True)
        return q

    def media(n_keys):
        # perceptual image dedup over synthesized clone families —
        # input size is the synthesis knob (the fixture dirs carry no
        # media table), so base/scaled grow n_keys by the factor
        from pyspark_deduplication_spark.queries import (
            media_perceptual_dedup,
        )

        def q(spark, sf_dir):
            return media_perceptual_dedup(spark, sf_dir, n_keys=n_keys)
        return q

    def banding_sampled(fraction):
        # the sampled planner (r11): fraction shrinks 1/factor at the
        # scaled fixture so the ABSOLUTE sample size stays constant —
        # how a 100 TB deployment sets it (target_sample / n_docs).
        # Cost should stay near-flat apart from the map-only scan.
        from pyspark_deduplication_spark.queries import (
            lsh_banding_plan_sampled_docs,
        )

        def q(spark, sf_dir):
            return lsh_banding_plan_sampled_docs(
                spark, sf_dir, fraction=fraction)
        return q

    def keep_best_lsh():
        # quality-aware survivorship with the production pair
        # generator (banded MinHash, skew-capped) in place of the
        # catalog's oracle-gradable exact-Jaccard linear-floor core
        from pyspark_deduplication_spark.queries import (
            dedup_keep_best_quality_docs,
        )

        def q(spark, sf_dir):
            return dedup_keep_best_quality_docs(spark, sf_dir,
                                                lsh_pairs=True)
        return q

    def overlap_sampled(fraction):
        # the sampled overlap report: fraction shrinks 1/factor at the
        # scaled fixture so the ABSOLUTE sample size stays constant
        # (target_sample / n_docs — the deployment setting)
        from pyspark_deduplication_spark.queries import (
            dedup_signal_overlap_sampled_docs,
        )

        def q(spark, sf_dir):
            return dedup_signal_overlap_sampled_docs(
                spark, sf_dir, fraction=fraction)
        return q

    return {
        "dedup_keep_best_quality_docs@scaled":
            (keep_best_lsh(), keep_best_lsh()),
        "dedup_signal_overlap_sampled_docs@scaled":
            (overlap_sampled(0.5), overlap_sampled(0.5 / factor)),
        "semantic_dedup_embeddings@scaled": (sem(8), sem(8 * factor)),
        "incremental_semantic_dedup_embeddings@scaled":
            (inc_sem(8), inc_sem(8 * factor)),
        "fused_dedup_docs@scaled": (fused(8), fused(8 * factor)),
        "fused_dedup_docs_weighted@scaled":
            (fused_weighted(8), fused_weighted(8 * factor)),
        "lsh_banding_plan_sampled_docs@scaled":
            (banding_sampled(0.5), banding_sampled(0.5 / factor)),
        "ivfpq_knn_embeddings@scaled": (ivfpq(8), ivfpq(8 * factor)),
        "media_perceptual_dedup@scaled": (media(300), media(300 * factor)),
    }


def main() -> None:
    import time

    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    names = sys.argv[4:] or DEFAULT_QUERIES
    runs = int(os.environ.get("SCALE_RUNS", "2"))

    from pyspark_deduplication_spark.queries import CATALOG
    from pyspark_deduplication_spark.session import (
        dir_input_bytes,
        get_spark,
        shuffle_partitions_for_bytes,
    )

    spark = get_spark("scale_check")
    # Shuffle partitions track INPUT SIZE per fixture (VERDICT r9 item
    # 4): the static per-core default under-partitions the scaled
    # fixture (doc_dup_span_fraction: exponent 1.06 @32 vs 0.93 @128).
    # Size on the tables the scale families actually read
    # (documents+embeddings), with the measured ~100x gram-explosion
    # factor over compressed parquet; at the base fixture this lands on
    # the same 32 floor every earlier batch used, so exponents stay
    # comparable across BASELINE.md batches.
    parts_for = {
        d: shuffle_partitions_for_bytes(
            sum(dir_input_bytes(os.path.join(d, t))
                for t in ("documents.parquet", "embeddings.parquet")),
            target_partition_bytes=8 << 20, expansion=100.0)
        for d in (base_dir, scaled_dir)
    }
    print(json.dumps({"shuffle_partitions": parts_for}), flush=True)
    variants = _knob_scaled_variants(factor)

    plan: list[tuple[str, object, object]] = []
    for n in names:
        if n.endswith("@scaled"):
            # @scaled-only: run just the knob-scaled deployment variant
            # (skip re-measuring an as-cataloged spelling whose fixture
            # parameterization is already classified, e.g. the
            # label-blocked fused twins' by-construction super-linearity)
            if n not in variants:
                sys.exit(f"unknown @scaled variant: {n} "
                         f"(known: {', '.join(sorted(variants))})")
            plan.append((n, *variants[n]))
            continue
        plan.append((n, CATALOG[n].fn, CATALOG[n].fn))
        if n + "@scaled" in variants:
            plan.append((n + "@scaled", *variants[n + "@scaled"]))

    # one untimed warm query per fixture (JIT + parquet footers)
    for d in (base_dir, scaled_dir):
        CATALOG["minhash_dedup_docs"].fn(spark, d).write.format(
            "noop").mode("overwrite").save()

    def _clean() -> None:
        # bench.py's inter-query GC, same reason (r9): ContextCleaner
        # reclaims dead shuffle/broadcast/checkpoint blocks only on JVM
        # GC, which goes quiet on a big heap — blocks from earlier
        # queries in the batch congest late rows (doc_dup_span_fraction
        # read exponent 1.27 in-batch behind the fused CC loop vs 0.85
        # solo-warm, r10). One explicit GC outside the timed window.
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def timed(fn, d) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts_for[d]))
        best = math.inf
        for _ in range(runs):
            _clean()
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for name, fn_base, fn_scaled in plan:
        tb = timed(fn_base, base_dir)
        ts = timed(fn_scaled, scaled_dir)
        row = {
            "query": name,
            "t_base_sec": round(tb, 2),
            "t_scaled_sec": round(ts, 2),
            "ratio": round(ts / tb, 2),
            "exponent": round(math.log(ts / tb) / math.log(factor), 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "sf1_scaling_exponents",
        "factor": factor,
        "base": base_dir,
        "scaled": scaled_dir,
        "runs": runs,
        "rows": rows,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
