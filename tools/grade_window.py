"""Grade-window audit: which catalog entries have driver correctness
rows, how stale each entry's LAST grade is, and what the next rotation
should pull into the 50-slot window.

The driver grades the first ~50 CATALOG entries in dict order
(CORRECTNESS_r{N}.json); rows from past rounds are permanent files, so
each round rotates stale/never-graded entries into the window while
keeping canaries for freshly changed code paths (VERDICT r6 item 4:
every round's window should re-grade ≥10 entries whose last grade is
≥3 rounds old, oldest first). Run:

    python tools/grade_window.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    from pyspark_deduplication_spark.queries import CATALOG

    last_graded: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        rounds.append(rnd)
        for name in json.load(open(path)):
            last_graded[name] = max(last_graded.get(name, 0), rnd)
    current = max(rounds) if rounds else 0

    window = list(CATALOG)[:50]
    oracle = {n for n, q in CATALOG.items() if q.oracle}

    print(f"catalog: {len(CATALOG)} entries, {len(oracle)} oracle-backed")
    print(f"driver-graded so far: "
          f"{len(set(last_graded) & set(CATALOG))}; latest round r{current}")

    in_window_no_oracle = [n for n in window if n not in oracle]
    if in_window_no_oracle:
        print("\nWARNING — rows-only entries inside the graded window "
              "(would record err:'no_oracle'):")
        for n in in_window_no_oracle:
            print(f"  {n}")

    stale_in_window = sorted(
        (last_graded[n], n) for n in window if last_graded.get(n, 99) <= current - 3
    )
    print(f"\nstale canaries (last grade ≥3 rounds old) inside the "
          f"current window ({len(stale_in_window)}; target ≥10):")
    for r, n in stale_in_window:
        print(f"  r{r}  {n}")

    never = [n for n in CATALOG
             if n in oracle and n not in last_graded and n not in window]
    print(f"\noracle-backed, never graded, outside current window "
          f"({len(never)}) — highest-priority rotation candidates:")
    for n in never:
        print(f"  {n}")

    stale_out = sorted(
        (last_graded[n], n) for n in CATALOG
        if n in oracle and n not in window
        and last_graded.get(n, 99) <= current - 3
    )
    print(f"\noracle-backed, stale, outside current window "
          f"({len(stale_out)}) — oldest-first queue for future rotations:")
    for r, n in stale_out:
        print(f"  r{r}  {n}")

    rows_only = [n for n in CATALOG if n not in oracle]
    print(f"\nrows-only by design ({len(rows_only)}): "
          + ", ".join(rows_only))
    return 1 if in_window_no_oracle else 0


if __name__ == "__main__":
    raise SystemExit(main())
