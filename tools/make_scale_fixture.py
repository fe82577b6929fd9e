"""Deterministic scale-up fixture generator for the sf1 scaling
checkpoint (VERDICT r7 item 4): replicate the sf0.1 documents /
embeddings tables ``factor``× with per-replica perturbations that
PRESERVE the near-dup rate (scaling measurements need n to grow while
workload shape stays fixed):

- documents: replica k appends ``k`` to every 3rd word — replicas of
  two near-dup originals stay near-dups of each other, but no replica
  family near-matches another (3-gram shingles diverge), so the dup
  fraction is constant in n.
- embeddings: replica k rolls the vector coordinates by k — an
  orthogonal transform, so within-replica cosines are EXACTLY
  preserved and cross-replica pairs decorrelate.

Output is parquet named like the driver fixtures so `queries()`
callables run on it unchanged. Writes ONLY under the given output dir
(default /tmp/sfscale); /root/testdata is never touched."""

from __future__ import annotations

import os
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]

    con.execute(f"""
    COPY (
      SELECT doc_id + k * {n_docs} AS doc_id,
             CASE WHEN k = 0 THEN text ELSE
               array_to_string(list_transform(
                 string_split(text, ' '),
                 (w, i) -> CASE WHEN i % 3 = 0
                                THEN w || CAST(k AS VARCHAR) ELSE w END),
                 ' ')
             END AS text,
             lang, source, n_chars
      FROM '{src}/documents.parquet'
      CROSS JOIN (SELECT unnest(range({factor})) AS k)
    ) TO '{out}/documents.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
    COPY (
      SELECT vec_id + k * {n_vecs} AS vec_id,
             CASE WHEN k = 0 THEN embedding ELSE
               list_concat(embedding[CAST(k AS INT) + 1:],
                           embedding[1:CAST(k AS INT)])
             END AS embedding,
             label
      FROM '{src}/embeddings.parquet'
      CROSS JOIN (SELECT unnest(range({factor})) AS k)
    ) TO '{out}/embeddings.parquet' (FORMAT parquet)
    """)
    for r in con.execute(f"""
        SELECT 'documents', count(*) FROM '{out}/documents.parquet'
        UNION ALL SELECT 'embeddings', count(*)
        FROM '{out}/embeddings.parquet'""").fetchall():
        print(r)


if __name__ == "__main__":
    main()
