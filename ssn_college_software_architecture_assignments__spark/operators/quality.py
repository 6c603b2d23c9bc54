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
