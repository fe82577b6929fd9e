"""PageRank power iteration vs an independent dense NumPy oracle."""

from __future__ import annotations

import numpy as np

from pyspark_deduplication_spark.operators.graph import pagerank


def _np_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[ix[u]] += 1
    r = np.ones(n)
    for _ in range(iters):
        nxt = np.full(n, 1.0 - d)
        for u, v in edges:
            nxt[ix[v]] += d * r[ix[u]] / out[ix[u]]
        r = nxt
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b"),
             ("d", "a")]  # d is a source; c has in+out; cycle a<->b
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank
           for r in pagerank(df, iterations=12).collect()}
    want = _np_pagerank(edges, iters=12)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])
    # d never receives rank: floor value; a outranks everyone (cycle
    # + external in-link)
    assert abs(got["d"] - 0.15) < 1e-12
    assert got["a"] == max(got.values())


def test_pagerank_dedups_and_drops_self_loops(spark):
    noisy = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")]
    clean = [("a", "b"), ("b", "a")]
    df_n = spark.createDataFrame(noisy, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df_n, iterations=6).collect()}
    want = _np_pagerank(clean, iters=6)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9
