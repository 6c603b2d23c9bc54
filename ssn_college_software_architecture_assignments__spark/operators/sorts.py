"""Sort / limit / top-k operators (SURVEY.md §2.6, O1-O3).

Scale notes: a global ORDER BY is a range-partitioned sort (sampling pass
+ shuffle); ORDER BY + LIMIT collapses to TakeOrderedAndProject — each
partition keeps only k rows and the driver merges 32xK, never the full
data. Top-k-per-group windows are rewritten by Spark into per-partition
group limits (InferWindowGroupLimit) — no full sort either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# O1 — multi-key order by (with limit so ordering is actually observable) -----

_O1_ORACLE = """
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
LIMIT 100
"""


@register("o1_order_by", oracle=_O1_ORACLE, tags=("O1", "O2"))
def o1_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement; + LIMIT this plans as
    TakeOrderedAndProject (per-partition top-100, no global sort)."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.orderBy(
            F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .limit(100)
    )


# O2 — limit -------------------------------------------------------------------

_O2_ORACLE = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 50
"""


@register("o2_limit_topn", oracle=_O2_ORACLE, tags=("O2",))
def o2_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-N (unique tiebreaker keys make LIMIT stable)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .limit(50)
    )


# O3 — top-k per group --------------------------------------------------------------

_O3_ORACLE = """
SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS total_price
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn <= 3
"""


@register("o3_top_k_per_group", oracle=_O3_ORACLE, tags=("O3",))
def o3_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment. The rn<=k filter is pushed into
    the window sort as a group limit — each group keeps k rows early."""
    c = Catalog(spark, sf_dir)
    joined = c.orders.join(
        c.customer, F.col("o_custkey") == F.col("c_custkey")
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )
