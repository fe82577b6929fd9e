"""Deterministic sampling for corpus curation.

Spark's seeded ``sample``/``sampleBy`` is Bernoulli over the partition
iteration order — reruns with different partitioning (or shuffle read
order) select different rows. Training-data pipelines need *stable*
samples (re-runs, audits, incremental appends), so the engine samples on
a content hash instead: a row is kept iff the first byte of
``md5(key || seed)`` falls below ``round(fraction * 256)``. Properties:

- deterministic across runs, partitionings, engines (md5 is universal —
  the DuckDB oracle replicates it exactly),
- uniform (md5 bytes are uniform), fraction granularity 1/256,
- stable under appends: an existing row's membership never changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, seed: str = "42") -> Column:
    """First md5 byte of (key, seed) as a hex pair — uniform over 256
    values, stable everywhere. NULL keys hash a sentinel instead of
    propagating NULL (which would silently drop the row from every
    sample regardless of fraction)."""
    k = F.coalesce(key.cast("string"), F.lit("\x00null"))
    return F.substring(F.md5(F.concat(k, F.lit(seed))), 1, 2)


def _hex_threshold(fraction: float) -> str:
    n = max(0, min(256, round(fraction * 256)))
    if n >= 256:
        # 'g' sorts after every hex pair ('0'-'9' < 'a'-'f' < 'g') — a
        # keep-all sentinel; '100' would NOT work ('ff' < '100' is false
        # in string order).
        return "g"
    return format(n, "02x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "42"
) -> DataFrame:
    """Keep ~``fraction`` of rows, selected by content hash of ``key_col``."""
    if fraction >= 1.0:
        return df
    return df.filter(
        hash_bucket(F.col(key_col), seed) < F.lit(_hex_threshold(fraction))
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: str = "42",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 50%
    while keeping low-resource languages whole)."""
    threshold = None
    for stratum, frac in fractions.items():
        case = F.when(F.col(strata_col) == stratum,
                      F.lit(_hex_threshold(frac)))
        threshold = case if threshold is None else threshold.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(frac)))
    threshold = (threshold.otherwise(F.lit(_hex_threshold(default_fraction)))
                 if threshold is not None
                 else F.lit(_hex_threshold(default_fraction)))
    return df.filter(hash_bucket(F.col(key_col), seed) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "42",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the first
    split whose cumulative hash threshold its content hash falls under.

    ``splits`` is an ordered {name: fraction} mapping (fractions sum to
    ~1.0; the last split absorbs rounding remainder). Assignment is a
    pure row-local projection on the same md5 bucket as ``hash_sample``,
    so it is stable across runs, partitionings, and engines, and a row's
    split never changes when the corpus grows — the property training
    pipelines need to avoid test-set leakage across re-runs. Zero
    shuffle; granularity 1/256 per boundary.
    """
    bucket = hash_bucket(F.col(key_col), seed)
    names = list(splits)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def leakage_safe_split(
    df: DataFrame,
    group_expr,
    key_col: str,
    splits: dict[str, float],
    seed: str = "42",
    split_col: str = "split",
    group_key_col: str = "group_key",
) -> DataFrame:
    """Dup-group-aware train/val/test assignment: rows that share
    ``group_expr`` (a content fingerprint, a CC component id, …) get
    the GROUP's minimum ``key_col`` as their split key, so duplicates
    can never straddle splits — the leakage ``hash_split`` alone cannot
    prevent (two byte-identical docs with different ids are split
    independently, and a test doc with a train twin is a leaked label).

    One shuffle (the group window, keyed by the fingerprint — at 100 TB
    project to (key, fingerprint) first and join back, or reuse an
    already-persisted dedup component table as ``group_expr``). The
    split itself stays the row-local ``hash_split`` projection, so all
    its stability properties carry over at group granularity: a group's
    split never changes as the corpus grows, and singleton groups match
    the naive row split exactly. Returns ``df`` + ``group_key_col`` +
    ``split_col``."""
    w = Window.partitionBy(group_expr)
    grouped = df.withColumn(
        group_key_col, F.min(F.col(key_col)).over(w))
    return hash_split(grouped, group_key_col, splits, seed, split_col)


def execute_token_budget(
    df: DataFrame,
    budgets: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str = "n_tok",
    budget_col: str = "planned_tokens",
    seed: str = "mix",
    prefilter_factor: float | None = None,
) -> DataFrame:
    """Materialize a token-budget mixture plan (VERDICT r5 item 4): for
    each group, keep the GREEDY PREFIX of rows in deterministic
    md5-hash order whose cumulative token count stays within the
    group's budget — the execution step downstream of
    ``corpus_mixture_waterfill``'s per-source allocations.

    Selection rule: rows order by (md5(key‖seed), key) — uniform,
    engine-portable, append-stable in the sense that an existing row's
    ORDER KEY never changes — and a row is kept iff its INCLUSIVE
    running token sum ≤ budget. Strict-prefix semantics (an oversized
    row blocks the rest of its group's tail rather than being skipped
    over) keep the kept-set MONOTONE in the budget: raising a budget
    only ever adds rows, so epoch-over-epoch diffs are pure appends —
    worth more to a training pipeline than squeezing out the last few
    knapsack tokens. Zero-token rows cost nothing and pass through
    wherever they land in the prefix.

    Plan shape: the budget table is n_groups rows — broadcast; the
    corpus shuffles ONCE on ``group_col`` for the running-sum window
    (the same exchange a per-group cap needs; no global sort). Skewed
    groups bound their OUTPUT at the budget but still window their
    full input — ``prefilter_factor`` closes that gap at 100 TB: only
    the hash-order PREFIX expected to hold ``prefilter_factor ×
    budget`` tokens (a 2-byte hex threshold on the SAME (md5 ‖ seed)
    order key the window sorts by, granularity 1/65536) enters the
    window shuffle. The pre-filter is provably EXACT for any input —
    not merely a high-probability superset — via a cut-safety check:
    two n_groups-sized aggregates derive each group's token inventory
    and the token mass INSIDE its hash-threshold region, and a group
    uses the cut only when that region mass strictly exceeds its
    budget. Region mass > budget means the first budget violator lies
    inside the region; since token counts are nonnegative the inclusive
    running sum is nondecreasing, so the exact kept set is precisely
    the rows before that violator — all inside the region, where the
    windowed sums over the region equal the sums over the full group.
    Region mass ≤ budget means the exact prefix could extend past the
    cut (zero-token tails are the canonical case — a hypothesis-found
    counterexample: a 0-token row deep in the hash order is kept by
    the exact path at any depth, which no positional cut can cover),
    so the group escapes to keep-all, which trivially preserves the
    prefix property. The same keep-all escape covers budget ≤ 0 /
    NULL and inventory ≤ 0 / NULL. Escapes are GROUP-LEVEL only: a
    per-row escape (e.g. "always keep zero-token rows") admits rows
    from beyond the cut while dropping positive-token rows before
    them, shrinking running sums and keeping rows the exact path
    drops (review r7 finding). ``prefilter_factor`` now tunes only
    how often the cut engages (higher factor → region mass more
    likely to exceed budget → fewer keep-all fallbacks on light
    groups); correctness no longer depends on it.

    Returns the kept rows of ``df`` (all columns) plus ``__cum_tokens``
    (the inclusive running sum, handy for audit)."""
    order_key = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    bsel = budgets.select(F.col(group_col), F.col(budget_col).alias("__budget"))
    joined = df.join(F.broadcast(bsel), group_col)
    if prefilter_factor is not None:
        inv = (
            df.groupBy(group_col)
            .agg(F.sum(F.col(tokens_col)).cast("double").alias("__gtok"))
        )
        # NULL-out a non-positive inventory BEFORE dividing: under ANSI
        # mode (the Spark 4 default) a double division by zero THROWS
        # rather than yielding Inf, and this expression evaluates for
        # every group — including the gtok=0 groups the escape below
        # keeps whole (hypothesis-found; pinned by @example). Division
        # by NULL is NULL, least() skips it, and ceiled=65536 routes
        # the group into the keep-all escape.
        safe_gtok = F.when(F.col("__gtok") > 0, F.col("__gtok"))
        frac = F.least(
            F.lit(1.0),
            F.lit(float(prefilter_factor)) * F.col("__budget") / safe_gtok,
        )
        # 2-byte hex threshold on the order key: keep the hash-order
        # prefix expected to carry prefilter_factor × budget tokens.
        # lower(): conv() emits UPPERCASE hex while md5 renders
        # lowercase, and 'A'-'F' sort below 'a'-'f' — an uppercase
        # threshold would wrongly exclude keys whose boundary nibble
        # is a letter. The escape triggers on the CEILED value, not
        # frac >= 1.0: frac just under 1.0 ceils to 65536, whose
        # 5-hex-digit spelling lpad(…, 4) would TRUNCATE to '1000'
        # and silently drop ~94% of the group's true prefix.
        ceiled = F.ceil(frac * F.lit(65536)).cast("long")
        ginfo = (
            bsel.join(inv, group_col, "left")
            .withColumn("__esc",
                        (F.col("__gtok") <= 0)
                        | F.col("__gtok").isNull()
                        | (F.col("__budget") <= 0)
                        | F.col("__budget").isNull()
                        | (ceiled >= 65536))
            .withColumn(
                "__thr",
                F.lpad(
                    F.lower(F.conv(
                        F.least(ceiled, F.lit(65535)).cast("string"),
                        10, 16)),
                    4, "0"))
        )
        # cut-safety aggregate: token mass inside each group's region
        reg = (
            df.join(F.broadcast(ginfo.filter(~F.col("__esc"))
                                .select(group_col, "__thr")), group_col)
            .filter(F.substring(order_key, 1, 4) < F.col("__thr"))
            .groupBy(group_col)
            .agg(F.sum(F.col(tokens_col)).cast("double").alias("__rmass"))
        )
        gmeta = (
            ginfo.join(reg, group_col, "left")
            .withColumn(
                "__keep_all",
                F.col("__esc")
                | (F.coalesce(F.col("__rmass"), F.lit(0.0))
                   <= F.col("__budget")))
            .select(group_col, "__thr", "__keep_all")
        )
        joined = (
            joined.join(F.broadcast(gmeta), group_col)
            .filter(F.col("__keep_all")
                    | (F.substring(order_key, 1, 4) < F.col("__thr")))
            .drop("__thr", "__keep_all")
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_key, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            "__cum_tokens",
            F.sum(F.col(tokens_col)).over(w).cast("long"))
        .filter(F.col("__cum_tokens") <= F.col("__budget"))
        .drop("__budget")
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    seed: str = "42",
) -> DataFrame:
    """Bounded uniform k-sample per group — the engine's reservoir
    sampler: keep the ``k`` rows with the SMALLEST ``md5(key‖seed)``
    per group (bottom-k / KMV order statistics). The hash plays the
    role of the reservoir algorithm's random tag, so the kept set is a
    uniform random size-min(k, n) subset of each group — but unlike
    Algorithm R it is deterministic, partitioning-independent, and
    **mergeable**: ``bottomk(A ∪ B) == bottomk(bottomk(A) ∪ B)`` (an
    element of the combined bottom-k is in the bottom-k of any subset
    containing it), which is exactly the reservoir update rule a
    continuous-ingest pipeline needs — the standing sample plus a new
    batch re-caps to the new standing sample with no per-row state and
    no dependence on arrival order (``streaming/ops.py::
    streaming_reservoir_ingest`` is that loop). Rows duplicated on
    ``(group, key)`` collapse first so a replayed batch cannot occupy
    two reservoir slots with one logical row — and the survivor is the
    MINIMUM row under the full-row struct order, not an arbitrary one
    (a bare ``dropDuplicates`` keeps whichever physical row arrives
    first, which would make the streaming loop's replay-rewrites-
    identical-partitions claim false whenever a key re-arrives with a
    changed payload; review-caught). Columns must therefore be
    orderable (no map type).

    One hash-partition shuffle on ``group_col`` + a rank window
    (``cap_per_group``); output is bounded at k·|groups| rows. Same
    md5 idiom as ``hash_sample``/``hash_split``, so reservoirs nest
    consistently with the rest of the sampling family and DuckDB
    replicates the selection byte-for-byte (the catalog oracle)."""
    tag = F.md5(F.concat(
        F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null")),
        F.lit(seed)))
    wdup = Window.partitionBy(group_col, key_col).orderBy(
        F.struct(*[F.col(c) for c in df.columns]))
    deduped = (
        df.withColumn("__dup_rn", F.row_number().over(wdup))
        .filter(F.col("__dup_rn") == 1)
        .drop("__dup_rn")
    )
    tagged = deduped.withColumn(
        "__tag",
        F.struct(tag.alias("h"),
                 F.col(key_col).cast("string").alias("k")))
    return (
        cap_per_group(tagged, group_col, "__tag", k)
        .filter(F.col("__kept"))
        .drop("__tag", "__kept")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    cap: int,
    keep_col: str = "__kept",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    ``order_col`` (ties broken by the column itself — callers pass a
    unique key or a (rank, key) struct column). The per-domain /
    per-source cap every crawl-curation pipeline applies so one mega-host
    cannot dominate the corpus.

    One hash-partition shuffle on ``group_col`` + a rank window; no
    global sort. Skewed groups are bounded by the cap itself on output;
    for pathological single-group skew at 100 TB, pre-aggregate counts
    and short-circuit groups already under the cap (they need no window
    at all) — that rewrite is left to callers because it doubles the
    scan.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        df.withColumn(keep_col, F.row_number().over(w) <= cap)
    )
