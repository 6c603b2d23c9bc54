"""Aggregation operators (SURVEY.md §2.4, A1-A8).

Aggregation is [REF-implied] at the reference's validation layer (insert
count checks — /root/reference/README.md:33,106) and driver-mandated for
analytics over ingested tables.

Scale notes (100 TB posture): every groupBy here is a Tungsten hash
aggregate with map-side partial aggregation — one shuffle on the group
keys, no driver-side collection. Group-key cardinality is tiny relative
to input (flags, types, dates), so the shuffle payload is the partial
aggregate map, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (operators S5, P2, P5, A2, O1).
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 4)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("A2", "P2", "P5", "O1", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter -> hash-agg (8 aggregates) -> sort.

    The plan Catalyst produces is the one we want at 100 TB: parquet scan
    with the shipdate predicate pushed down, partial hash aggregation
    map-side, a 4-row shuffle (2 flags x 2 statuses), final agg, sort.
    """
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
