"""As-of join (SURVEY.md §2.3 J8).

Spark has no native ASOF JOIN executor. The scalable re-expression is the
union-and-window pass: tag both streams, sort once per key, and carry the
most recent right-side id forward with `last(ignorenulls)`. This is ONE
shuffle on the key and never materializes the (left x earlier-rights)
blowup that the naive inequality join creates — the plan that survives
100 TB event tables.

Oracle: DuckDB's native `ASOF JOIN` (timestamps cast to microsecond
TIMESTAMP on both sides so ns-vs-µs precision cannot flip a boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

_J8_ORACLE = """
WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'signup')
SELECT p.user_id,
       p.event_id              AS purchase_id,
       s.event_id              AS asof_signup_id,
       round(p.value, 2)       AS purchase_value
FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, attach the latest right row
    with right_ts <= left_ts within the same `on` key.

    Implementation: union both sides with a side tag, window-sort by
    (ts, side[, tiebreak]) per key — right rows sort before left rows at
    equal timestamps so equality matches — then forward-fill right
    columns with ``last(ignorenulls=True)`` and keep only left rows.
    LEFT-OUTER semantics: every left row survives; the filled
    ``_asof_*`` columns are NULL when no prior right row exists.
    Callers wanting inner semantics filter the fill themselves (j8
    does); j8b load-bearingly relies on the outer behavior for its
    tolerance NULLs — do not "tighten" this helper to drop rows.

    ``right_tiebreak`` names a right-side column (usually its id) used as
    the final window sort key: when two right rows share (key, ts), the
    HIGHEST tiebreak value wins deterministically. Without it, equal-ts
    right rows are picked in partition arrival order — nondeterministic
    across retries/partitionings, the kind of instability only visible
    when real data has ties. The column is NULL on left-side rows and
    left/right already separate on ``_side``, so the tiebreak only
    disambiguates among right rows.
    """
    if right_tiebreak is not None and right_tiebreak not in right.columns:
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} is not a right-side column "
            f"(right has: {right.columns}) — a typo here would otherwise "
            "surface as an opaque AnalysisException, or silently sort on a "
            "left column, far from this call site"
        )
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    r_tagged = (
        right.withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
    )
    # Ordered merge (left cols, then right-only cols) — a `set` union here
    # would make the output schema order depend on Python hash seeding.
    cols = list(left.columns) + [c for c in right.columns if c not in left.columns]
    l_full = l_tagged.select(
        *[
            (F.col(c) if c in left.columns else F.lit(None)).alias(c)
            for c in cols
        ],
        "_side",
        "_ts",
    )
    r_full = r_tagged.select(
        *[
            (F.col(c) if c in right.columns else F.lit(None)).alias(c)
            for c in cols
        ],
        "_side",
        "_ts",
    )
    unioned = l_full.unionByName(r_full)
    order = [F.col("_ts"), F.col("_side")]
    if right_tiebreak is not None:
        order.append(F.col(right_tiebreak))
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    result = filled.filter(F.col("_side") == 1)
    return result


@register("j8_asof_join", oracle=_J8_ORACLE, tags=("J8",))
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent signup at-or-before the
    purchase timestamp (event enrichment against slowly-changing state)."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
    )
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="p_ts",
        right_ts="s_ts",
        right_cols=["signup_id"],
        right_tiebreak="signup_id",
    )
    return (
        joined.filter(F.col("_asof_signup_id").isNotNull())
        .select(
            "user_id",
            "purchase_id",
            F.col("_asof_signup_id").alias("asof_signup_id"),
            F.round("value", 2).alias("purchase_value"),
        )
    )


# J8b — as-of join with a tolerance bound (pandas merge_asof tolerance) -------
#
# The production variant every enrichment pipeline eventually needs:
# "most recent state, but only if it is FRESH ENOUGH" — a signup older
# than the tolerance must not enrich the purchase (stale-state joins
# are a real correctness bug class). Left-outer semantics: every
# purchase survives, out-of-tolerance or missing matches come back
# NULL. Same single union+window pass as j8 (the nearest prior match
# is by definition the only candidate that can be inside the window,
# so the tolerance check is a map-side post-filter on the filled
# timestamp — no extra join, no inequality blowup); the ORACLE
# deliberately uses the naive range inequality join + per-purchase
# argmax, so agreement proves the rewrite (the j12 pattern).

_J8B_TOL_US = 86_400_000_000  # 24 hours

_J8B_ORACLE = """
WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'signup'),
cand AS (
  SELECT p.event_id AS purchase_id, s.event_id AS signup_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY s.ts DESC, s.event_id DESC) AS rn
  FROM p JOIN s ON p.user_id = s.user_id
     AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL '24 hours'
)
SELECT p.user_id,
       p.event_id          AS purchase_id,
       c.signup_id         AS asof_signup_id,
       round(p.value, 2)   AS purchase_value
FROM p LEFT JOIN (SELECT purchase_id, signup_id FROM cand WHERE rn = 1) c
  ON p.event_id = c.purchase_id
"""


@register("j8b_asof_join_tolerance", oracle=_J8B_ORACLE, tags=("J8",))
def j8b_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment bounded to 24h freshness: the nearest prior
    signup per purchase, nulled when older than the tolerance (it is
    the nearest candidate, so no earlier one could qualify either —
    which is what makes the tolerance a pure post-filter on the j8
    union+window plan)."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
    )
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="p_ts",
        right_ts="s_ts",
        right_cols=["signup_id", "s_ts"],
        right_tiebreak="signup_id",
    )
    fresh = (
        F.col("_asof_s_ts").isNotNull()
        & (
            F.unix_micros("p_ts") - F.unix_micros("_asof_s_ts")
            <= _J8B_TOL_US
        )
    )
    return joined.select(
        "user_id",
        "purchase_id",
        F.when(fresh, F.col("_asof_signup_id")).alias("asof_signup_id"),
        F.round("value", 2).alias("purchase_value"),
    )


# J8c — nearest-direction as-of join (pandas merge_asof direction='nearest') ---
#
# The third merge_asof direction: attach the CLOSEST right row in either
# time direction. Scalable form: the backward match comes from the j8
# union+window pass unchanged, the forward match from the SAME helper on
# a negated time axis (first-at-or-after == last-at-or-before under
# t -> -t), and a map-side argmin picks the nearer of the two
# candidates. Tie laws, identical in the oracle: equal distances prefer
# the backward match (pandas' rule); equal timestamps within a side use
# j8's id tiebreaks (backward: highest id; forward: lowest id — the
# negated axis flips the sign of the tiebreak column to preserve this).
# Cost model: one key-partitioned union+window shuffle per direction,
# plus the purchase_id-keyed join that combines the two candidate
# frames and the final output sort — never an inequality join, and
# every stage is keyed on a real column (no single-partition step);
# the oracle runs the naive all-candidates argmin, so agreement proves
# the two-pass rewrite.

_J8C_ORACLE = """
WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'signup'),
cand AS (
  SELECT p.event_id AS purchase_id, s.event_id AS signup_id,
         abs(epoch_us(p.ts) - epoch_us(s.ts)) AS gap_us,
         CASE WHEN s.ts <= p.ts THEN 'backward' ELSE 'forward' END AS direction,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(p.ts) - epoch_us(s.ts)),
                    CASE WHEN s.ts <= p.ts THEN 0 ELSE 1 END,
                    CASE WHEN s.ts <= p.ts THEN -s.event_id ELSE s.event_id END
         ) AS rn
  FROM p JOIN s ON p.user_id = s.user_id
)
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.signup_id AS nearest_signup_id,
       c.direction AS direction,
       c.gap_us    AS gap_us
FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON p.event_id = c.purchase_id
ORDER BY purchase_id
"""


@register("j8c_asof_join_nearest", oracle=_J8C_ORACLE, tags=("J8",))
def j8c_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the temporally CLOSEST signup in either
    direction, with the winning direction and the exact microsecond
    gap. Left-outer: purchases with no signup at all keep NULLs."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
    )

    back = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="p_ts",
        right_ts="s_ts",
        right_cols=["signup_id", "s_ts"],
        right_tiebreak="signup_id",
    ).select(
        "user_id",
        "purchase_id",
        "p_ts",
        F.col("_asof_signup_id").alias("b_id"),
        F.col("_asof_s_ts").alias("b_ts"),
    )

    p_neg = purchases.withColumn("p_neg", -F.unix_micros("p_ts"))
    s_neg = signups.withColumn("s_neg", -F.unix_micros("s_ts")).withColumn(
        "neg_id", -F.col("signup_id")
    )
    fwd = asof_join(
        p_neg,
        s_neg,
        on="user_id",
        left_ts="p_neg",
        right_ts="s_neg",
        right_cols=["signup_id", "s_ts"],
        right_tiebreak="neg_id",
    ).select(
        "purchase_id",
        F.col("_asof_signup_id").alias("f_id"),
        F.col("_asof_s_ts").alias("f_ts"),
    )

    j = back.join(fwd, "purchase_id", "left")
    d_back = F.unix_micros("p_ts") - F.unix_micros("b_ts")
    d_fwd = F.unix_micros("f_ts") - F.unix_micros("p_ts")
    use_back = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (d_back <= d_fwd)
    )
    nearest_id = F.when(use_back, F.col("b_id")).otherwise(F.col("f_id"))
    direction = F.when(use_back, F.lit("backward")).when(
        F.col("f_id").isNotNull(), F.lit("forward")
    )
    gap = F.when(use_back, d_back).when(F.col("f_id").isNotNull(), d_fwd)
    return j.select(
        "user_id",
        "purchase_id",
        nearest_id.alias("nearest_signup_id"),
        direction.alias("direction"),
        gap.cast("long").alias("gap_us"),
    ).orderBy("purchase_id")
