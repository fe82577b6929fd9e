"""Grade-window audit: which catalog entries have driver correctness
rows, which are still waiting, and what the next rotation should grade.

The driver grades the first ~50 CATALOG entries in dict order
(CORRECTNESS_r{N}.json); rows from past rounds are permanent files, so
each round can rotate never-graded entries into the window while keeping
a canary band. Run:

    python tools/grade_window.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    from pyspark_deduplication_spark.queries import CATALOG

    graded: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        graded |= set(json.load(open(path)))

    window = list(CATALOG)[:50]
    oracle = {n for n, q in CATALOG.items() if q.oracle}

    print(f"catalog: {len(CATALOG)} entries, {len(oracle)} oracle-backed")
    print(f"driver-graded so far: {len(graded & set(CATALOG))}")

    in_window_no_oracle = [n for n in window if n not in oracle]
    if in_window_no_oracle:
        print("\nWARNING — rows-only entries inside the graded window "
              "(would record err:'no_oracle'):")
        for n in in_window_no_oracle:
            print(f"  {n}")

    pending = [n for n in CATALOG
               if n in oracle and n not in graded and n not in window]
    print(f"\noracle-backed, never graded, outside current window "
          f"({len(pending)}) — candidates for the next rotation:")
    for n in pending:
        print(f"  {n}")

    rows_only = [n for n in CATALOG if n not in oracle]
    print(f"\nrows-only by design ({len(rows_only)}): "
          + ", ".join(rows_only))
    return 1 if in_window_no_oracle else 0


if __name__ == "__main__":
    raise SystemExit(main())
