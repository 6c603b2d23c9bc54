"""Set operators (SURVEY.md §2.7, U1-U3).

U1 (union-all) is the reference's page-merge: pagination collects page
DataFrames and unions them (README.md:12) — `unionByName` with
allowMissingColumns tolerates schema drift between pages (FIXTURES.md B2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# U1 — union all ---------------------------------------------------------------

_U1_ORACLE = """
SELECT nationkey, side, count(*) AS n
FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
)
GROUP BY nationkey, side
"""


@register("u1_union_all", oracle=_U1_ORACLE, tags=("U1",))
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge heterogeneous batches by column name (page-merge pattern).
    Union is plan-level concatenation — zero shuffle."""
    c = Catalog(spark, sf_dir)
    cn = c.customer.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    sn = c.supplier.select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return cn.unionByName(sn, allowMissingColumns=True).groupBy(
        "nationkey", "side"
    ).agg(F.count("*").alias("n"))


# U2 — intersect ------------------------------------------------------------------

_U2_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


@register("u2_intersect", oracle=_U2_ORACLE, tags=("U2",))
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers (INTERSECT DISTINCT)."""
    c = Catalog(spark, sf_dir)
    cn = c.customer.select(F.col("c_nationkey").alias("nationkey"))
    sn = c.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return cn.intersect(sn)


# U3 — except ----------------------------------------------------------------------

_U3_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register("u3_except", oracle=_U3_ORACLE, tags=("U3",))
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-records-since-last-run pattern (README.md:28 "updates"):
    set difference with DISTINCT semantics — users who clicked but never
    purchased."""
    ev = Catalog(spark, sf_dir).events
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.subtract(buyers)


# U4 — union across drifted schemas ---------------------------------------------

_U4_ORACLE = """
SELECT o_orderkey, totalprice, priority FROM (
  SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL BY NAME
  SELECT o_orderkey, o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 2 = 1
)
"""


@register("u4_union_schema_drift", oracle=_U4_ORACLE, tags=("U4", "S13"))
def u4_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across load generations whose schemas drifted (a column was
    added/dropped between connector runs — the S13 scenario at the
    dataflow layer instead of the storage layer). ``unionByName(
    allowMissingColumns=True)`` aligns by NAME and null-fills the gaps;
    positional ``union`` would silently mis-align columns, the classic
    multi-generation ingestion bug. Pure narrow op — no shuffle at any
    scale."""
    orders = Catalog(spark, sf_dir).orders
    gen_a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
    )
    gen_b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", F.col("o_orderpriority").alias("priority")
    )
    return gen_a.unionByName(gen_b, allowMissingColumns=True).select(
        "o_orderkey", "totalprice", "priority"
    )


# U5 — bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) ---------------

_U5_ORACLE = """
WITH a AS (SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 10),
b AS (SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 5),
ex AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
ix AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
exg AS (SELECT l_returnflag, l_linestatus, count(*) AS n_except FROM ex GROUP BY 1, 2),
ixg AS (SELECT l_returnflag, l_linestatus, count(*) AS n_intersect FROM ix GROUP BY 1, 2)
SELECT coalesce(exg.l_returnflag, ixg.l_returnflag)  AS l_returnflag,
       coalesce(exg.l_linestatus, ixg.l_linestatus)  AS l_linestatus,
       CAST(coalesce(n_except, 0) AS BIGINT)         AS n_except,
       CAST(coalesce(n_intersect, 0) AS BIGINT)      AS n_intersect
FROM exg FULL JOIN ixg
  ON exg.l_returnflag = ixg.l_returnflag AND exg.l_linestatus = ixg.l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("u5_bag_setops", oracle=_U5_ORACLE, tags=("U2", "U3"))
def u5_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET semantics next to U2/U3's set semantics: EXCEPT ALL
    subtracts multiplicities (a row appearing 7x in A and 4x in B
    survives 3x) and INTERSECT ALL keeps min(multiplicity) — the
    bag algebra batch reconciliation actually needs (set-DISTINCT
    forms silently collapse duplicate records, hiding volume
    discrepancies). Verified here by bag-differencing two overlapping
    lineitem slices and counting the surviving multiplicities per key.
    Both operators plan as aggregate+generate (sum of signed/min
    counts, then replicate) — one shuffle on the row key, no sort."""
    li = Catalog(spark, sf_dir).lineitem
    a = li.filter(F.col("l_quantity") < 10).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_quantity") < 5).select("l_returnflag", "l_linestatus")
    exg = (
        a.exceptAll(b)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_except"))
    )
    ixg = (
        a.intersectAll(b)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_intersect"))
    )
    return (
        exg.join(ixg, ["l_returnflag", "l_linestatus"], "full")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.coalesce("n_except", F.lit(0)).cast("long").alias("n_except"),
            F.coalesce("n_intersect", F.lit(0)).cast("long").alias("n_intersect"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# U6 — NOT IN vs NOT EXISTS under NULLs (the three-valued-logic trap) ----------
#
# The SQL-semantics operator every migration guide warns about: NOT IN
# against a subquery CONTAINING A NULL returns zero rows (x <> NULL is
# UNKNOWN, so no row can prove membership-absence), while the
# NOT EXISTS form keeps matching. An engine claiming ANSI semantics must
# reproduce BOTH behaviors exactly — Spark plans the NOT IN as a
# null-aware anti-join (a dedicated join path), DuckDB as a
# mark join; the oracle is the same SQL verbatim so the two engines'
# three-valued logic is compared result-for-result. The probe injects
# NULLs deterministically (negative-balance customers) into the
# subquery; customers are a dim table, so both legs broadcast at scale.

_U6_SQL = """
SELECT 'not_in' AS method, count(*) AS n_orders
FROM orders
WHERE o_custkey NOT IN (
  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
  FROM customer WHERE c_mktsegment = 'BUILDING'
)
UNION ALL
SELECT 'not_exists' AS method, count(*) AS n_orders
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_mktsegment = 'BUILDING'
    AND (CASE WHEN c.c_acctbal < 0 THEN NULL ELSE c.c_custkey END) = o.o_custkey
)
ORDER BY method
"""


@register("u6_not_in_null_semantics", oracle=_U6_SQL, tags=("U3", "E2"))
def u6_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS over a NULL-bearing subquery, side by side:
    the NOT IN leg must collapse to zero the moment any NULL enters the
    list (three-valued logic), the NOT EXISTS leg must keep its
    matches. Same SQL text is the DuckDB oracle verbatim."""
    Catalog(spark, sf_dir).register_views(("orders", "customer"))
    return spark.sql(_U6_SQL)
