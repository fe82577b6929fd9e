"""Local mimic of the driver's correctness gate.

Runs every CATALOG query on Spark and its oracle on DuckDB at the given
scale factor, then compares row count, column names, and exact values
(order-insensitive, columns sorted by name). Run:

    python tools/parity.py [sf_dir] [query ...]

Two deliberate differences from round 1 (VERDICT.md "Next round" #1):

- The Spark session is built VANILLA (plain builder, no engine configs),
  exactly like the driver's. Anything a query needs (UTC timezone,
  nanosAsLong) must be set at runtime by the query itself — this file
  would otherwise mask vanilla-session divergences.
- In addition to the full-precision value comparison, each side is ALSO
  converted to pandas (Spark ``toPandas``, DuckDB ``.df()``) and compared
  per-column on dtype and rendered cells. The driver's value-hash is built
  from dataframe conversions, so a dtype mismatch (Spark bigint/int64 vs
  DuckDB HUGEINT→float64, Spark DecimalType→object vs DuckDB
  DECIMAL→float64) fails its hash even when values are numerically exact.
  Any DecimalType column in a final Spark schema is therefore a failure
  here, full stop.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr — catches any FP divergence
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_cell(row[i]) for i in order))
    return sorted(out)


def render_frame(pdf):
    """Order-insensitive rendering of a pandas frame: sorted columns,
    str() cells (the driver-hash proxy), sorted rows."""
    cols = sorted(pdf.columns)
    rows = [tuple(str(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def dtype_report(scols, spdf, opdf):
    """Compare pandas dtypes per column; return list of mismatch strings."""
    bad = []
    for c in sorted(scols):
        sd, od = str(spdf[c].dtype), str(opdf[c].dtype)
        if sd != od:
            bad.append(f"{c}: spark={sd} oracle={od}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from pyspark_deduplication_spark.queries import CATALOG

    # VANILLA session — mimic the driver exactly (no UTC/nanos/AQE confs;
    # queries must self-canonicalize at runtime).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.appName("parity")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, q in CATALOG.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dec_cols = [f.name for f in sdf.schema.fields
                    if f.dataType.typeName().startswith("decimal")]
        if dec_cols:
            failures.append(name)
            print(f"FAIL  {name}: DecimalType in final schema: {dec_cols} "
                  f"(driver hash renders DuckDB DECIMAL as float64)")
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            opdf = con.execute(q.oracle).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} "
                  f"oracle={sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        sn = norm_rows(scols, [[r[c] for c in scols] for r in srows])
        on = norm_rows(ocols, orows)
        if sn != on:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(sn, on) if a != b)
            print(f"FAIL  {name}: values differ ({ndiff}/{len(sn)} rows)")
            for a, b in list(zip(sn, on))[:200]:
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
            continue
        # Driver-hash proxy: pandas dtypes and str() cell renderings must
        # agree after conversion on both sides.
        dt_bad = dtype_report(scols, spdf, opdf)
        _, srend = render_frame(spdf)
        _, orend = render_frame(opdf)
        if dt_bad or srend != orend:
            failures.append(name)
            print(f"FAIL  {name}: pandas-render mismatch "
                  f"(driver hash would differ)")
            for line in dt_bad[:8]:
                print(f"      dtype {line}")
            for a, b in list(zip(srend, orend))[:500]:
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
