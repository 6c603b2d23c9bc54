"""Window-function operators (SURVEY.md §2.5, W1-W10).

All windows partition by a real key (user_id) so state is bounded per
partition; the one global window (W4, distribution bucketing over orders)
is a deliberate single-partition sort whose registered 100 TB twin is
w4b_quartile_cutpoints (`functions/bucketing.py` broadcast cutpoints,
no Window node, plan-gated).

Ordering note: ``events.ts`` is nanosecond in parquet and microsecond in
Spark, so every ORDER BY carries ``event_id`` as the final tiebreaker and
oracles compare on ids/values, not raw ns timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# W1 — row_number latest-per-key dedup ---------------------------------------

_W1_ORACLE = """
SELECT user_id, event_id, event_type, value
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("w1_row_number_latest", oracle=_W1_ORACLE, tags=("W1",))
def w1_row_number_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the canonical "updates" pattern the
    reference's audit column exists for (README.md:28). One shuffle on
    user_id; Spark rewrites rn=1 into a per-partition top-1 (no full sort
    materialization) via InferWindowGroupLimit."""
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


# W1b — rank / dense_rank ------------------------------------------------------

_W1B_ORACLE = """
SELECT o_orderkey, o_custkey,
       rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)               AS drnk
FROM orders
"""


@register("w1b_rank_dense_rank", oracle=_W1B_ORACLE, tags=("W1",))
def w1b_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    w_price = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_prio = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w_price).alias("rnk"),
        F.dense_rank().over(w_prio).alias("drnk"),
    )


# W2 — lag / lead ----------------------------------------------------------------

_W2_ORACLE = """
SELECT user_id, event_id,
       round(value - lag(value)  OVER w, 2) AS delta_prev,
       round(lead(value) OVER w - value, 2) AS delta_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


@register("w2_lag_lead", oracle=_W2_ORACLE, tags=("W2",))
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change detection between consecutive events of a user."""
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
    )


# W3 — running / frame aggregates ----------------------------------------------------

_W3_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg_3
FROM events
"""


@register("w3_running_agg", oracle=_W3_ORACLE, tags=("W3",))
def w3_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average. ROWS frames (not RANGE) so
    ns-vs-µs timestamp precision cannot change frame membership."""
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_value"),
        F.round(F.avg("value").over(w.rowsBetween(-2, W.currentRow)), 4).alias(
            "moving_avg_3"
        ),
    )


# W4 — distribution bucketing ----------------------------------------------------------

_W4_ORACLE = """
SELECT o_orderkey,
       ntile(4)        OVER w                    AS quartile,
       round(percent_rank() OVER w, 6)           AS pct_rank,
       round(cume_dist()    OVER w, 6)           AS cume
FROM orders
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
"""


@register("w4_ntile_percent_rank", oracle=_W4_ORACLE, tags=("W4",))
def w4_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distribution bucketing. Deliberately a single-partition
    window here — the exact ntile/rank law needs the global total order;
    the registered 100 TB twin is w4b_quartile_cutpoints (broadcast
    quantile cutpoints, no Window node, plan-gated)."""
    orders = Catalog(spark, sf_dir).orders
    w = W.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# W4b — scale-safe quartile bucketing (no Window node) -----------------------
#
# The twin W4's docstring promises: quartile assignment from broadcast
# quantile cutpoints instead of a single-partition ntile. Value-based
# law (ties share a bucket; per-bucket counts are near-N/4, not exactly
# N/4) — the HONEST distributed semantics, since splitting equal values
# across buckets requires a global total order. The full per-order
# assignment is oracle-checked row-for-row, which transitively proves
# cutpoint equality between the engines.

_W4B_PROBS = (0.25, 0.5, 0.75)


def _w4b_oracle() -> str:
    from ..functions.bucketing import bucket_sql, cuts_sql

    return f"""
WITH cuts AS (SELECT {cuts_sql('o_totalprice', _W4B_PROBS)} AS cuts FROM orders)
SELECT o_orderkey, {bucket_sql('o_totalprice')} AS quartile
FROM orders, cuts
"""


@register("w4b_quartile_cutpoints", oracle=_w4b_oracle(), tags=("W4",))
def w4b_quartile_cutpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4's 100 TB form: one aggregate computes the exact-at-this-scale
    quartile cutpoints (``functions.bucketing``: percentile_approx with
    rank error < 1 row == DuckDB quantile_disc), broadcasts the 1-row
    fold, and assigns buckets map-side — NO Window node anywhere in the
    plan (plan-gated), so no single-reducer sort of the orders table."""
    from ..functions.bucketing import with_range_bucket

    orders = Catalog(spark, sf_dir).orders.select("o_orderkey", "o_totalprice")
    return with_range_bucket(
        orders, "o_totalprice", _W4B_PROBS, out="quartile"
    ).select("o_orderkey", "quartile")


# W5 — first / last value ------------------------------------------------------------------

_W5_ORACLE = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type)  OVER w AS last_type,
       round(first_value(value) OVER w, 2) AS first_value_amt,
       round(last_value(value)  OVER w, 2) AS last_value_amt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("w5_first_last_value", oracle=_W5_ORACLE, tags=("W5",))
def w5_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user as-of snapshot: first and last observed state."""
    ev = Catalog(spark, sf_dir).events
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.round(F.first("value").over(w), 2).alias("first_value_amt"),
        F.round(F.last("value").over(w), 2).alias("last_value_amt"),
    ).distinct()


# W6 — gap-based sessionization (composed: lag -> flag -> running sum -> agg) ---

_W6_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
g AS (
  SELECT user_id, event_id, ts, us,
         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, ts, us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT user_id,
       CAST(session_idx AS BIGINT)        AS session_idx,
       count(*)                           AS n_events,
       min(ts)                            AS session_start,
       round((max(us) - min(us)) / 1e6, 3) AS duration_sec
FROM s
GROUP BY user_id, session_idx
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization core over any frame with ``user_id``,
    ``event_id``, ``ts``: lag flags session starts, a running sum assigns
    session ids, then per-session stats. All three passes share ONE
    shuffle on user_id (identical window partitioning), and the gap math
    runs on integer microseconds (unix_micros) so engines compare exactly
    — no float drift at session boundaries. The window orders by
    ``(us, event_id)``, so session assignment is a pure function of the
    row SET — input order (late/out-of-order arrival in a batch backfill)
    cannot change it; tests/test_late_data.py holds that law under
    hypothesis-shuffled orderings."""
    base = events.select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("us")
    )
    gap_us = int(gap_minutes) * 60_000_000
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    sess = base.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    ).withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy(
        "user_id", F.col("session_idx").cast("long").alias("session_idx")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.round((F.max("us") - F.min("us")) / 1e6, 3).alias("duration_sec"),
    )


@register("w6_sessionize", oracle=_W6_ORACLE, tags=("W6",))
def w6_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) of the events
    fixture — the batch twin of the T3 session window. See
    :func:`sessionize` for the core and its order-invariance law."""
    return sessionize(Catalog(spark, sf_dir).events, gap_minutes=30)


# W7 — ordered-sequence (funnel) detection ---------------------------------------

_W7_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
), s1 AS (
  SELECT *, last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS recent_view
  FROM e
), s2 AS (
  SELECT *, last_value(CASE WHEN event_type = 'click' AND recent_view IS NOT NULL
                             AND ts <= recent_view + INTERVAL 30 MINUTE
                            THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS recent_qclick
  FROM s1
)
SELECT user_id, count(*) AS n_funnels
FROM s2
WHERE event_type = 'purchase' AND recent_qclick IS NOT NULL
  AND ts <= recent_qclick + INTERVAL 30 MINUTE
GROUP BY user_id
"""


@register("w7_funnel_detect", oracle=_W7_ORACLE, tags=("W7",))
def w7_funnel_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence detection (view -> click -> purchase, each step
    within 30 minutes of the one it chains from) — MATCH_RECOGNIZE-style
    funnel analytics without a single self-join. Two stacked conditional
    ``last(..., ignorenulls)`` running windows over the SAME partition/
    order spec carry the most recent qualifying prior step forward, so
    the whole funnel costs ONE shuffle on user_id and one sort, where the
    naive 3-way self-join explodes quadratically on active users. Ties
    are broken by event_id so both engines see identical frames."""
    ev = Catalog(spark, sf_dir).events
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    half_hour = F.expr("INTERVAL 30 MINUTES")
    s1 = ev.withColumn(
        "recent_view",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    s2 = s1.withColumn(
        "recent_qclick",
        F.last(
            F.when(
                (F.col("event_type") == "click")
                & F.col("recent_view").isNotNull()
                & (F.col("ts") <= F.col("recent_view") + half_hour),
                F.col("ts"),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        s2.filter(
            (F.col("event_type") == "purchase")
            & F.col("recent_qclick").isNotNull()
            & (F.col("ts") <= F.col("recent_qclick") + half_hour)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_funnels"))
    )


# W8 — time-RANGE frame (trailing-interval aggregate) -------------------------
#
# The frame family W3 deliberately avoided: a RANGE frame over TIME, the
# "per-user trailing-hour load" query. W3's note stands — ns-vs-µs
# precision could move frame edges — so the frame is defined on
# whole-second epoch integers in BOTH engines (floor of the µs-truncated
# timestamp): integer-keyed RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
# is bit-identical everywhere, and peers (equal seconds) are whole-frame
# members by RANGE semantics in both engines.

_W8_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER w, 2) AS trail_1h_sum,
       count(*)         OVER w     AS trail_1h_cnt
FROM (
  SELECT user_id, event_id, value,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("w8_time_range_window", oracle=_W8_ORACLE, tags=("W3",))
def w8_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1-hour sum/count via an integer-second RANGE
    frame. One shuffle on user_id, one sort per partition; the frame
    slides by value, so a burst of events inside an hour aggregates
    without self-joining events to events (the O(n^2)-per-user shape
    a range join would give). At 100 TB the partition key refines to
    (user_id, day) with a seeded overlap read, keeping any one user's
    history out of a single task."""
    ev = Catalog(spark, sf_dir).events
    t = ev.select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("epoch_s"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, W.currentRow)
    )
    return t.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("trail_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trail_1h_cnt"),
    )


# W9 — rolling z-score anomaly detection --------------------------------------

_W9_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
),
w AS (
  SELECT user_id, event_id, value,
         sum(value)         OVER fr AS s,
         sum(value * value) OVER fr AS sq,
         count(*)           OVER fr AS n
  FROM t
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT user_id, event_id, value,
         s / n                         AS mean,
         (sq - s * s / n) / (n - 1)    AS var
  FROM w WHERE n = 5
),
zz AS (
  -- CASE guards the sqrt: a constant window's variance can round to a
  -- tiny NEGATIVE float, and DuckDB errors on sqrt(<0); a bare
  -- conjunction (var > 0 AND ... sqrt(var) ...) would depend on
  -- unguaranteed AND evaluation order
  SELECT user_id, event_id, value, mean,
         CASE WHEN var > 0 THEN (value - mean) / sqrt(var) END AS zval
  FROM z
)
SELECT user_id, event_id, value,
       round(mean, 4) AS baseline_mean,
       round(zval, 2) AS zscore
FROM zz
WHERE zval IS NOT NULL AND abs(zval) > 2
ORDER BY user_id, event_id
"""


@register("w9_rolling_zscore_anomaly", oracle=_W9_ORACLE, tags=("W3",))
def w9_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly flags: each event's value is z-scored against
    its OWN trailing baseline (the 5 prior events, current row
    excluded) and reported when |z| > 2 — the streaming-adjacent outlier
    screen a telemetry pipeline runs per entity.

    Moments come from windowed sum and sum-of-squares, NOT the builtin
    stddev: both engines then derive mean/variance from the same two
    frame sums instead of each running its own (differently-ordered)
    variance recurrence, keeping the oracle agreement at rounding
    precision. One shuffle on user_id, one sort per partition; the
    ROWS frame is O(1) state per row. Warm-up rows (< 5 priors) are
    out of scope by the n = 5 guard; var = 0 baselines (constant
    history) cannot flag."""
    ev = Catalog(spark, sf_dir).events
    t = ev.select("user_id", "event_id", "value", "ts")
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, -1)
    )
    w = t.select(
        "user_id",
        "event_id",
        "value",
        F.sum("value").over(fr).alias("s"),
        F.sum(F.col("value") * F.col("value")).over(fr).alias("sq"),
        F.count(F.lit(1)).over(fr).alias("n"),
    ).filter(F.col("n") == 5)
    mean = F.col("s") / F.col("n")
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        w.filter((var > 0) & (F.abs(z) > 2))
        .select(
            "user_id",
            "event_id",
            "value",
            F.round(mean, 4).alias("baseline_mean"),
            F.round(z, 2).alias("zscore"),
        )
        .orderBy("user_id", "event_id")
    )


# W10 — truncated EWMA (exponentially weighted moving average) ----------------
#
# The smoothing pass between plain moving averages (w3) and anomaly
# baselines (w9): each event's value blended with its trailing history
# under exponential decay. The truncated form (last 8 events, weights
# renormalized) keeps it a pure frame computation: both engines collect
# the ROWS frame in order and run the IDENTICAL Horner fold
# (acc*a + x — left fold; Spark's 0.0 init and DuckDB list_reduce's
# first-element init coincide because 0*a + x0 == x0), so every
# multiply-add happens in the same sequence and the values agree
# bit-for-bit at rounding precision. One shuffle on user_id; O(frame)
# state per row.

_W10_DECAY = 0.75
_W10_SPAN = 8

_W10_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, value,
         list(value) OVER (PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id
                           ROWS BETWEEN {_W10_SPAN - 1} PRECEDING AND CURRENT ROW)
           AS vals
  FROM events
  WHERE value IS NOT NULL
)
SELECT user_id, event_id, value,
       CAST(len(vals) AS INT) AS n_frame,
       round(list_reduce(vals, (acc, x) -> acc * {_W10_DECAY} + x)
             / list_reduce(list_transform(vals, x -> CAST(1 AS DOUBLE)),
                           (acc, x) -> acc * {_W10_DECAY} + x), 4) AS ewma
FROM e
"""


@register("w10_ewma", oracle=_W10_ORACLE, tags=("W3",))
def w10_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated EWMA (decay 0.75 over the trailing 8 events,
    weights renormalized so early events with short history are unbiased).
    The frame's collect_list is ordered by the window's ORDER BY, and
    the Horner fold groups float operations identically to the oracle's
    list_reduce. NULL values are filtered out identically in both
    engines BEFORE the window (Spark collect_list drops NULLs while
    DuckDB list() keeps them — the explicit filter makes the frame
    contents engine-independent rather than relying on the fixture
    never emitting NULLs)."""
    ev = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_W10_SPAN - 1), W.currentRow)
    )
    a = F.lit(_W10_DECAY)
    base = ev.select(
        "user_id",
        "event_id",
        "value",
        F.collect_list("value").over(fr).alias("vals"),
    )
    horner = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc * a + x
    )
    return base.select(
        "user_id",
        "event_id",
        "value",
        F.size("vals").cast("int").alias("n_frame"),
        F.round(
            horner(F.col("vals"))
            / horner(F.transform("vals", lambda x: F.lit(1.0))),
            4,
        ).alias("ewma"),
    )


# W11 — cumulative distinct users (first-seen rewrite) ------------------------
#
# The growth-dashboard query that is a scale trap when written naively:
# COUNT(DISTINCT user) OVER an ever-growing window holds every user id
# in window state. The public rewrite: a user contributes to the
# cumulative count exactly once — on their FIRST day — so min(day) per
# user (one hash-agg, map-side combined), a days-sized new-user count,
# and a running sum over the DATE-grain table give the same number with
# bounded state. The only unpartitioned window runs over one row per
# calendar day — cardinality bounded by the calendar (30 rows/month,
# ~3.7k rows/decade), not by data volume, which is the documented
# exception to the no-global-window rule (w4b's cutpoint trick exists
# for tables that GROW with the corpus; this one cannot).

_W11_ORACLE = """
WITH fs AS (
  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
  FROM events GROUP BY user_id
),
daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n_events,
         count(DISTINCT user_id) AS active_users
  FROM events GROUP BY 1
),
nu AS (SELECT d0 AS day, count(*) AS new_users FROM fs GROUP BY d0)
SELECT strftime(daily.day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT)                 AS n_events,
       CAST(active_users AS BIGINT)             AS active_users,
       CAST(coalesce(new_users, 0) AS BIGINT)   AS new_users,
       CAST(sum(coalesce(new_users, 0))
              OVER (ORDER BY daily.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                                AS cum_users
FROM daily LEFT JOIN nu ON daily.day = nu.day
ORDER BY day
"""


@register("w11_cumulative_distinct", oracle=_W11_ORACLE, tags=("W3", "A3"))
def w11_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity with an all-time cumulative distinct-user count,
    via the first-seen rewrite (no distinct-over-window state): events
    aggregate to days, users aggregate to their first day, and the
    running sum walks the calendar-bounded date table."""
    ev = Catalog(spark, sf_dir).events
    day = F.to_date("ts")
    fs = ev.groupBy("user_id").agg(F.min(day).alias("d0"))
    daily = ev.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("active_users"),
    )
    nu = fs.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    cum = F.sum(F.coalesce(F.col("new_users"), F.lit(0))).over(
        W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        daily.join(nu, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("active_users").cast("long").alias("active_users"),
            F.coalesce(F.col("new_users"), F.lit(0))
            .cast("long")
            .alias("new_users"),
            cum.cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )


# W12 — retention cohort matrix (first-seen week x activity week) --------------
#
# The growth-analytics staple built on w11's first-seen rewrite: users
# cohort by the ISO week of their first event; each later week they are
# active increments that (cohort, offset) cell; retention = cell /
# cohort size. Offset-0 retention is 1.0 by construction (every user is
# active in their own first week), which doubles as a built-in sanity
# row. Both engines truncate weeks to the ISO Monday (Spark
# date_trunc('week') == DuckDB date_trunc('week')) and the offset is an
# exact integer day-difference / 7.
#
# Scale shape: first-seen per user (hash-agg, map-side combined),
# distinct (user, week) activity (hash-agg), ONE user-keyed join, a
# (cohorts x offsets)-sized aggregate, and cohort sizes read off the
# offset-0 cells with a window over that tiny matrix — no
# distinct-over-window state anywhere.

_W12_ORACLE = """
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
  FROM events
),
fs AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id),
cell AS (
  SELECT fs.cohort, CAST((wk.week - fs.cohort) / 7 AS BIGINT) AS week_offset,
         count(*) AS n_active
  FROM wk JOIN fs ON wk.user_id = fs.user_id
  GROUP BY fs.cohort, (wk.week - fs.cohort) / 7
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       week_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(max(CASE WHEN week_offset = 0 THEN n_active END)
              OVER (PARTITION BY cohort) AS BIGINT) AS cohort_size,
       floor(n_active / CAST(max(CASE WHEN week_offset = 0 THEN n_active END)
              OVER (PARTITION BY cohort) AS DOUBLE) * 10000) / 10000 AS retention
FROM cell
ORDER BY cohort_week, week_offset
"""


@register("w12_retention_cohorts", oracle=_W12_ORACLE, tags=("W3", "A3"))
def w12_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: per (first-seen cohort week, week
    offset), active users and the retention fraction against the
    cohort's size."""
    ev = Catalog(spark, sf_dir).events
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    wk = ev.select("user_id", week.alias("week")).distinct()
    fs = wk.groupBy("user_id").agg(F.min("week").alias("cohort"))
    cell = (
        wk.join(fs, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("week"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(W.partitionBy("cohort"))
    return cell.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        F.col("n_active").cast("long").alias("n_active"),
        size.cast("long").alias("cohort_size"),
        # floor(x*1e4)/1e4, not round(,4): n_active/cohort_size ratios
        # can land exactly on .xxxx5 decimals where the engines' round()
        # laws diverge (the x4q lesson); floor of the identical double
        # is deterministic in both.
        (F.floor(F.col("n_active") / size.cast("double") * 10000) / 10000).alias(
            "retention"
        ),
    ).orderBy("cohort_week", "week_offset")


# W13 — rolling 7-day distinct users (explode-contribution rewrite) ------------
#
# The trailing-window sibling of w11's all-time count — and a distinct
# scale trap of its own: COUNT(DISTINCT user) OVER (ORDER BY day RANGE
# 6 PRECEDING) keeps a full user set in every window's state and Spark
# refuses DISTINCT in window frames anyway. The public rewrite: a user
# active on day d is a member of exactly the 7 windows ending d..d+6,
# so distinct (user, day) activity explodes to its 7 TARGET days (a
# fixed x7 fan-out of the already-day-deduped table, NOT of raw
# events), re-dedupes on (user, target) — a user active several days
# inside one window still counts once — and hash-aggregates. Every
# stage is a bounded-key shuffle with map-side combine; no per-window
# user-set state exists anywhere. Emitted days are the days with
# actual activity (dashboard semantics; trailing windows of silent
# days would extend the frame, not the fixture).

_W13_DAYS = 7

_W13_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
contrib AS (
  SELECT DISTINCT user_id, ud.day + CAST(o.i AS INT) AS target
  FROM ud CROSS JOIN (SELECT unnest(range({_W13_DAYS})) AS i) o
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT c.user_id) AS BIGINT) AS rolling_users
FROM days d JOIN contrib c ON c.target = d.day
GROUP BY d.day
ORDER BY day
"""


@register("w13_rolling_distinct_users", oracle=_W13_ORACLE, tags=("W3", "A3"))
def w13_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users active in the trailing 7 days, per active day —
    via the explode-contribution rewrite (day-deduped activity fans
    out to its 7 target windows; no distinct-over-window state)."""
    ev = Catalog(spark, sf_dir).events
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(_W13_DAYS - 1))
        ).alias("i"),
        "day",
    ).select("user_id", F.date_add("day", F.col("i")).alias("target"))
    return (
        days.join(contrib, days["day"] == contrib["target"])
        .groupBy(days["day"].alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("rolling_users"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "rolling_users")
        .orderBy("day")
    )


# W14 — event-time-weighted average (TWAP) ---------------------------------------
#
# The telemetry/finance staple the W family still lacked: each event's
# value HOLDS until the key's next event, so the mean must weight by
# interval duration, not row count — a plain avg() over-represents
# bursts. One lead() window per key supplies the holding interval; the
# aggregate is then map-combinable.
#
# Cross-engine law, integer-exact end to end: values quantize to cents
# (the registered 2dp law), durations stay integer microseconds, the
# weighted sum is exact BIGINT (per-user bound: cents <= ~1e5 x span
# <= 2.6e12 us -> <= 2.6e17 < 2^63 REGARDLESS of corpus size — the
# span, not the row count, bounds it, so the law survives 100x), and
# the final TWAP is ONE integer division (Spark `div` == DuckDB `//`
# on the HUGEINT-summed side after CAST). No float ever crosses an
# engine boundary.

_W14_ORACLE = """
WITH e AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
         event_id
  FROM events
),
iv AS (
  SELECT user_id, v_cents,
         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
           AS dt_us
  FROM e
)
SELECT user_id,
       CAST(count(*) AS BIGINT)      AS n_intervals,
       CAST(sum(dt_us) AS BIGINT)    AS total_dt_us,
       CAST(sum(v_cents * dt_us) // sum(dt_us) AS BIGINT) AS twap_cents
FROM iv
WHERE dt_us IS NOT NULL
GROUP BY user_id
HAVING sum(dt_us) > 0
ORDER BY user_id
"""


@register("w14_time_weighted_avg", oracle=_W14_ORACLE, tags=("W2", "W3"))
def w14_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value: each event's (2dp-cents)
    value holds until the user's next event; the TWAP is the exact
    integer division of the duration-weighted cent-sum by the total
    held duration — the burst-insensitive mean a metering or pricing
    pipeline bills on."""
    e = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    iv = e.select(
        "user_id", "v_cents", (F.lead("us").over(w) - F.col("us")).alias("dt_us")
    ).filter(F.col("dt_us").isNotNull())
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dt_us").cast("long").alias("total_dt_us"),
            # ONE exact integer division — never a float ratio (doubles
            # lose bits past 2^53 on the weighted sum)
            F.expr("sum(v_cents * dt_us) div sum(dt_us)")
            .cast("long")
            .alias("twap_cents"),
        )
        .filter(F.col("total_dt_us") > 0)
        .orderBy("user_id")
    )


# W15 — gaps-and-islands activity streaks --------------------------------------
#
# The classic gaps-and-islands rewrite (a staple the reference's
# analytics layer implies but no prior w-id covered): a user's distinct
# activity days collapse to consecutive-day runs by the
# day-index-minus-row-number trick — inside a run the difference is
# constant, across a gap it jumps — so streak detection is one window
# plus one hash-agg, never a self-join or per-user iteration. The day
# index is an exact integer day difference from a fixed epoch anchor
# (2024-01-01, the fixture's first day) computed by both engines'
# datediff, so the island key is engine-identical.
#
# Scale shape: distinct (user, day) is a map-combined hash-agg; the
# row_number window partitions by user_id (bounded state per key); the
# two downstream aggregates are user-keyed hash-aggs. No joins at all —
# at 100 TB the only shuffle is the user-day hash exchange.

_W15_EPOCH = "2024-01-01"

_W15_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         date_diff('day', DATE '{_W15_EPOCH}', day)
         - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM d
),
isl AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len_days,
         min(day) AS start_day, max(day) AS end_day
  FROM r GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT)      AS n_streaks,
       CAST(max(len_days) AS BIGINT) AS longest_streak,
       CAST(sum(len_days) AS BIGINT) AS active_days,
       strftime(min(start_day), '%Y-%m-%d') AS first_day,
       strftime(max(end_day), '%Y-%m-%d')   AS last_day
FROM isl
GROUP BY user_id
ORDER BY user_id
"""


@register("w15_gaps_islands", oracle=_W15_ORACLE, tags=("W1", "W3"))
def w15_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity streaks (gaps-and-islands): distinct active
    days collapse to consecutive-day islands via the day-index minus
    row_number constant, then per-user streak count, longest streak,
    total active days, and the activity span. The island key is an
    exact integer (datediff from the fixture epoch), so runs are found
    with one window and one aggregate — no self-join, no iteration."""
    ev = Catalog(spark, sf_dir).events
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = W.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.to_date(F.lit(_W15_EPOCH)))
            - F.row_number().over(rn)
        ).alias("island"),
    )
    isl = r.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len_days"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    return (
        isl.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len_days").cast("long").alias("longest_streak"),
            F.sum("len_days").cast("long").alias("active_days"),
            F.date_format(F.min("start_day"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("end_day"), "yyyy-MM-dd").alias("last_day"),
        )
        .orderBy("user_id")
    )
