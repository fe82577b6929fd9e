"""Link-graph analytics over crawl edge lists.

The link graph a WAT sidecar yields (``read_wat_dir`` outlinks →
(src domain, dst domain) edges) feeds two curation signals: degree
aggregates (``queries.wat_link_graph_docs`` — one exchange) and the
iterative authority score this module provides. PageRank here is the
classic fixed-iteration power iteration expressed as DataFrame joins —
no driver-side graph state, no RDDs — so Catalyst/AQE schedule every
round and the corpus-scale side only ever shuffles by a key.

Scale shape per iteration: one equi-join of the edge list with the
current ranks (both keyed on ``src`` — AQE co-partitions, and the
rank side is |nodes| rows, far smaller than the edge list), one
aggregation keyed on ``dst``, and one left join back onto the node
set. Lineage is truncated with the engine's stats-stripped eager
checkpoint every few rounds (the ``connected_components`` discipline —
unbounded iterative lineage otherwise sends Catalyst's size estimates
into BigInteger territory). Skew note: a mega-in-degree node (every
page links to facebook.com) concentrates one reduce key; AQE's skew
split handles the aggregation, and the rank/deg join key is ``src``,
which fans OUT, not in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_deduplication_spark.operators.linkage import _checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → one row
    per node: ``node, rank``.

    The UNNORMALIZED spelling (the standard Spark-examples fixpoint):
    ``rank = (1-d) + d · Σ_in rank(u)/outdeg(u)``, iterated from
    ``rank₀ = 1`` — the probability-normalized score times |V|, with
    identical ordering. Conventions, all documented here because they
    change the numbers:

    - edges are DEDUPLICATED (simple graph) and self-loops dropped
      before iterating;
    - dangling nodes (no out-links) RECEIVE rank but redistribute
      nothing — the classic simplification (their leaked mass is a
      uniform additive term in the normalized spelling and does not
      change ranking);
    - every endpoint of any edge gets a row, sources included.

    Ranks are raw doubles; callers grading cross-engine should
    quantize (``F.round(rank, 6)``) per the determinism convention.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    out_src = e.join(deg, "src")
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for i in range(iterations):
        contribs = (
            out_src
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("s")))
        ranks = (
            nodes.join(contribs, "node", "left")
            .select("node",
                    (F.lit(1.0 - damping)
                     + F.lit(damping)
                     * F.coalesce(F.col("s"), F.lit(0.0)))
                    .alias("rank")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = _checkpoint(ranks)
    return ranks
