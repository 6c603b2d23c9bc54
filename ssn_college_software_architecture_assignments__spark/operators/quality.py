"""Data-quality expectations and incremental aggregate maintenance.

The reference's validation layer ("verify data is inserted correctly and
consistently", /root/reference/README.md:33,46,106) is a count assert at
the sink (S8). A production connector needs the richer form every warehouse
runs nightly: a declarative expectation suite (null-rate, range, accepted
values, uniqueness, referential integrity) that emits one verdict row per
check — and rollup maintenance that folds new data into standing aggregates
without rescanning history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register


def expectation_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Run a suite of row-level expectations in ONE aggregation pass.

    ``checks`` maps check name -> boolean Column (True = row violates).
    Every check becomes a conditional count inside the same aggregate, so
    the table is scanned once regardless of suite size — at 100 TB the
    difference between one pass and len(checks) passes is the whole
    budget. Cross-table checks (referential integrity) don't fit a single
    scan and are composed by the caller via union."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("_n_rows"), *aggs)
    stack = ", ".join(f"'{name}', {name}" for name in checks)
    return wide.select(
        F.expr(
            f"stack({len(checks)}, {stack}) AS (check_name, n_violations)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "check_name",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


_S8B_ORACLE = """
WITH base AS (SELECT count(*) AS n_rows FROM orders),
checks AS (
  SELECT 'null_custkey' AS check_name,
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
  UNION ALL
  SELECT 'nonpositive_totalprice',
         (SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0))
  UNION ALL
  SELECT 'bad_orderstatus',
         (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
  UNION ALL
  SELECT 'duplicate_orderkey',
         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
  UNION ALL
  SELECT 'orphan_custkey',
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
)
SELECT c.check_name, c.n_violations, b.n_rows,
       c.n_violations = 0 AS passed
FROM checks c CROSS JOIN base b
"""


@register("s8b_dq_report", oracle=_S8B_ORACLE, tags=("S8",))
def s8b_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over the orders load: three row-level checks in
    one scan, plus uniqueness (one distinct-agg) and referential
    integrity against customer (anti-join — the dim side broadcasts).
    Total cost at any scale: one fact scan for the row checks, one
    key-only scan + partial-distinct shuffle for uniqueness, one
    broadcast anti-join for RI. The report is tiny (one row per check)
    no matter the input size."""
    c = Catalog(spark, sf_dir)
    orders, customer = c.orders, c.customer
    row_checks = expectation_report(
        orders,
        {
            "null_custkey": F.col("o_custkey").isNull(),
            "nonpositive_totalprice": ~(F.col("o_totalprice") > 0),
            "bad_orderstatus": ~F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    dup = (
        orders.agg(
            F.lit("duplicate_orderkey").alias("check_name"),
            (F.count("o_orderkey") - F.countDistinct("o_orderkey"))
            .cast("bigint")
            .alias("n_violations"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    ).select(
        "check_name",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )
    base = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        )
        .agg(
            F.lit("orphan_custkey").alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )
        .crossJoin(base)
        .select(
            "check_name",
            "n_violations",
            "n_rows",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
    return row_checks.unionByName(dup).unionByName(orphans)


# A11 — incremental rollup maintenance ------------------------------------------

_A11_ORACLE = """
SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS order_month,
       count(*)                         AS n_orders,
       round(sum(o_totalprice), 2)      AS revenue
FROM orders
GROUP BY 1
"""


@register("a11_incremental_rollup", oracle=_A11_ORACLE, tags=("A11", "S10"))
def a11_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the standing monthly rollup was
    built from history (orders before 1997); a new load (1997+) arrives
    and only ITS partial aggregates are computed and merged — history is
    never rescanned. Because sum/count are commutative monoids, merging
    partial states (sum of sums, sum of counts) is exact; the oracle is
    the full recompute over everything, which must match to the cent.

    At 100 TB this is the only viable rollup strategy: the nightly delta
    is GBs while the history is the lake. Avg/stddev merge the same way
    from (sum, count, m2) states; only true holistic aggregates (exact
    percentiles) force a rescan."""
    orders = Catalog(spark, sf_dir).orders
    cutoff = F.lit("1997-01-01").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM-dd").alias(
                "order_month"
            )
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_price"),
        )

    history_state = partial(orders.filter(F.col("o_orderdate") < cutoff))
    new_partial = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        history_state.unionByName(new_partial)
        .groupBy("order_month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.round(F.sum("sum_price"), 2).alias("revenue"),
        )
    )
    return merged.select("order_month", "n_orders", "revenue")


# A11b — the incremental path COMPOSED end-to-end: S14 CDC feed drives the
# standing A11 rollup. The reference's "run the connector again" model
# (/root/reference/README.md:12,28) means updates arrive as a new snapshot;
# the engine-grade answer is: diff the snapshots (S14), fold ONLY the delta
# into the standing aggregate (A11's monoid merge), and prove the folded
# state equals a from-scratch recompute over the new generation. That
# equality is the whole point — it shows the two incremental operators
# compose without rescanning history.

_A11B_ORACLE = """
WITH gen1 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice + 100.0, 2)
              ELSE round(o_totalprice, 2) END AS totalprice,
         o_orderdate
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, round(o_totalprice, 2), o_orderdate
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS order_month,
       count(*)                    AS n_orders,
       round(sum(totalprice), 2)   AS revenue
FROM gen1
GROUP BY 1
"""


@register("a11b_cdc_rollup_compose", oracle=_A11B_ORACLE, tags=("A11", "S14"))
def a11b_cdc_rollup_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 -> A11 composed: the monthly revenue rollup stands on
    generation 0; generation 1 arrives (same mutation recipe as
    s14_snapshot_diff: every 10th order repriced +100, every 7th deleted,
    a shifted copy of every 13th inserted); ``snapshot_diff`` emits the
    O(changes) CDC feed, and each change row folds into the rollup as a
    signed delta — insert adds (+1, +new_price) to its month, delete
    subtracts (+/-1, old_price), update does both (net price delta). The
    oracle recomputes the rollup from scratch over generation 1: the
    folded standing state must match it to the cent, WITHOUT the Spark
    side ever re-aggregating generation-0 history against generation 1.

    Scale shape: standing state is O(months), the CDC diff is one
    outer join on the order key (bucketable, see S14), and the fold is a
    groupBy over O(changes) rows — the 100 TB nightly-delta pattern.
    Months with all orders deleted net to (0, 0.0) and are dropped to
    match the recompute, which cannot emit empty groups."""
    from ..sources.sink import snapshot_diff

    orders = Catalog(spark, sf_dir).orders
    gen0 = orders.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        "o_orderdate",
    )
    gen1 = (
        orders.filter(F.col("o_orderkey") % 7 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 10 == 0,
                F.round(F.col("o_totalprice") + 100.0, 2),
            )
            .otherwise(F.round("o_totalprice", 2))
            .alias("totalprice"),
            "o_orderdate",
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.round("o_totalprice", 2).alias("totalprice"),
                "o_orderdate",
            )
        )
    )

    month = lambda c: F.date_format(F.trunc(c, "month"), "yyyy-MM-dd")  # noqa: E731

    # Standing state: the rollup as it existed over generation 0.
    standing = gen0.groupBy(month("o_orderdate").alias("order_month")).agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum("totalprice").alias("dsum"),
    )

    # CDC feed -> signed per-month deltas. orderdate rides through
    # compare_cols so the fold knows each change's month; it never
    # differs between generations, so it cannot create spurious updates.
    cdc = snapshot_diff(
        gen0, gen1, key_cols=["o_orderkey"],
        compare_cols=["totalprice", "o_orderdate"],
    )
    minus_old = F.when(
        F.col("change_type").isin("delete", "update"),
        F.struct(
            month("old_o_orderdate").alias("m"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("old_totalprice")).alias("dsum"),
        ),
    )
    plus_new = F.when(
        F.col("change_type").isin("insert", "update"),
        F.struct(
            month("new_o_orderdate").alias("m"),
            F.lit(1).cast("long").alias("dn"),
            F.col("new_totalprice").alias("dsum"),
        ),
    )
    deltas = (
        cdc.select(
            F.explode(
                F.filter(F.array(minus_old, plus_new), lambda s: s.isNotNull())
            ).alias("d")
        )
        .select(
            F.col("d.m").alias("order_month"),
            F.col("d.dn").alias("dn"),
            F.col("d.dsum").alias("dsum"),
        )
    )

    return (
        standing.unionByName(deltas)
        .groupBy("order_month")
        .agg(
            F.sum("dn").cast("long").alias("n_orders"),
            F.round(F.sum("dsum"), 2).alias("revenue"),
        )
        .filter(F.col("n_orders") > 0)
    )
