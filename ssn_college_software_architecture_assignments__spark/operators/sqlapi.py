"""SQL entry point (SURVEY.md §3.2 E2).

The engine registers every catalog table as a temp view, so ``spark.sql``
strings and DataFrame chains resolve against identical data and go
through the same Catalyst analyze/optimize/plan pipeline. These queries
prove the surface end-to-end with multi-table analytics (TPC-H-shaped,
since the driver's lake is a TPC-H-ish star — TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog
from ..registry import register

# E2a — TPC-H Q3-style shipping priority (join + agg + top-k via pure SQL) ------

_Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

_Q3_ORACLE = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("e2_sql_shipping_priority", oracle=_Q3_ORACLE, tags=("E2",))
def e2_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape submitted as a SQL string: customer-filtered star
    join, group-aggregate, ordered top-10. Catalyst broadcasts the
    filtered customer dim and pushes both date predicates into the scans
    — identical physical plan to the DataFrame form."""
    Catalog(spark, sf_dir).register_views(("customer", "orders", "lineitem"))
    return spark.sql(_Q3_SQL)


# E2b — TPC-H Q5-style regional revenue (5-way star join in SQL) ----------------

_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


_GS_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("a5_grouping_sets", oracle=_GS_SQL, tags=("A5", "E2"))
def a5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (arbitrary granularity list, unlike
    rollup/cube's fixed lattices) — one Expand + one shuffle, same as
    rollup."""
    Catalog(spark, sf_dir).register_views(("lineitem",))
    return spark.sql(_GS_SQL)


@register("e2_sql_regional_revenue", oracle=_Q5_SQL, tags=("E2",))
def e2_sql_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table star join with a region filter that
    prunes through nation -> supplier. Every dim side is broadcast; the
    only shuffles are the fact-side aggregations."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(
        ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    return spark.sql(_Q5_SQL)
