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


# E2c — TPC-H Q4: EXISTS subquery (decorrelated to a semi-join) -----------------

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
GROUP BY o_orderpriority
"""


@register("e2_sql_exists_priority", oracle=_Q4_SQL, tags=("E2",))
def e2_sql_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS subquery. Catalyst's
    RewritePredicateSubquery decorrelates it into a LEFT SEMI join on
    l_orderkey — the date filter pushes to the orders scan and the
    discount predicate evaluates inside the lineitem scan, so the
    semi-join build side carries only qualifying keys. The same text
    runs verbatim in DuckDB (its optimizer does the same rewrite), which
    is the point of the SQL entry surface: one dialect-portable string,
    two engines, identical results."""
    Catalog(spark, sf_dir).register_views(("orders", "lineitem"))
    return spark.sql(_Q4_SQL)


# E2d — TPC-H Q17-style: correlated scalar subquery ------------------------------

_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_size <= 5
  AND l1.l_quantity < (SELECT 0.8 * avg(l2.l_quantity)
                       FROM lineitem l2
                       WHERE l2.l_partkey = l1.l_partkey)
"""


@register("e2_sql_scalar_subquery", oracle=_Q17_SQL, tags=("E2",))
def e2_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold; probe filtered to small parts). Catalyst's
    RewriteCorrelatedScalarSubquery turns
    the per-row subquery into ONE aggregation over lineitem grouped by
    partkey joined back to the filtered probe — the subquery is evaluated
    once per key, not once per row (the difference between O(|parts|)
    and O(|lineitem|^2) at 100 TB). The part filter broadcasts."""
    Catalog(spark, sf_dir).register_views(("lineitem", "part"))
    return spark.sql(_Q17_SQL)


# E2e — TPC-H Q18-style large-quantity customers (HAVING + IN subquery) ---------

_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("e2_sql_large_quantity", oracle=_Q18_SQL, tags=("E2",))
def e2_sql_large_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery over a grouped HAVING filter —
    the remaining classic subquery form the E2 surface hadn't exercised
    (Q4 covers EXISTS, Q17 the scalar subquery). Catalyst rewrites the
    IN to a left-semi join against the aggregated keys; the aggregate
    side shuffles once on l_orderkey and the semi join prunes lineitem
    before the wide 3-table join, so the expensive join only sees
    qualifying orders. Same SQL text is the DuckDB oracle verbatim."""
    Catalog(spark, sf_dir).register_views(("customer", "orders", "lineitem"))
    return spark.sql(_Q18_SQL)


# E2f — TPC-H Q10-style returned-item revenue ----------------------------------

_Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1994-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("e2_sql_returned_revenue", oracle=_Q10_SQL, tags=("E2",))
def e2_sql_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the returned-items loss report — which customers
    sent the most revenue back last quarter. Four-table star with both
    date bounds and the returnflag predicate pushed to the scans, the
    tiny nation dim broadcast, and the top-20 via TakeOrderedAndProject.
    Same SQL text is the DuckDB oracle verbatim."""
    Catalog(spark, sf_dir).register_views(
        ("customer", "orders", "lineitem", "nation")
    )
    return spark.sql(_Q10_SQL)


# E2g — TPC-H Q14-style promo revenue share ------------------------------------

_Q14_SQL = """
SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
"""


@register("e2_sql_promo_revenue", oracle=_Q14_SQL, tags=("E2",))
def e2_sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: market-response ratio — the share of one month's
    revenue that came from promo-typed parts, as a ratio of two
    conditional aggregates in one pass (no second scan, no subquery:
    the CASE folds into the same partial aggregation). The part dim
    broadcasts; both shipdate bounds push into the lineitem scan so the
    join only sees the month. Same SQL text is the DuckDB oracle
    verbatim."""
    Catalog(spark, sf_dir).register_views(("lineitem", "part"))
    return spark.sql(_Q14_SQL)


# E2h — TPC-H Q19-style disjunctive bracket revenue ----------------------------

_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#9'  AND p_size BETWEEN 1  AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
"""


@register("e2_sql_bracket_revenue", oracle=_Q19_SQL, tags=("E2",))
def e2_sql_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under DISJUNCTIVE cross-table predicate
    brackets (brand x size x quantity), the classic optimizer test for
    OR-of-ANDs spanning a join: the common join key stays an equi-join,
    per-side conjuncts (p_brand/p_size on part, l_quantity on lineitem)
    are derivable for pushdown, and the residual OR evaluates post-join.
    Same SQL text is the DuckDB oracle verbatim."""
    Catalog(spark, sf_dir).register_views(("lineitem", "part"))
    return spark.sql(_Q19_SQL)


# E2j — TPC-H Q21-style waiting orders (correlated EXISTS + NOT EXISTS) --------
#
# The hardest remaining TPC-H subquery shape: TWO correlated subqueries
# against the SAME fact table at different aliases — an EXISTS (some
# other supplier contributed to the order) and a NOT EXISTS (no OTHER
# supplier was late on it) — then a group-by over the surviving
# suppliers. Catalyst decorrelates both: the EXISTS becomes a left-semi
# join and the NOT EXISTS a left-anti join on l_orderkey with the
# non-equal-supplier / lateness conjuncts as join conditions, so the
# fact table is never driven row-at-a-time. The fixture lineitem has no
# l_receiptdate/l_commitdate, so "late" is a fixed shipdate cutoff —
# the decorrelation structure, which is what this entry exercises, is
# unchanged. LIKE-filtered nation dim broadcast-joins (Q21's nation
# predicate adapted to the synthetic names).

_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name LIKE 'NATION!_1%' ESCAPE '!'
  AND l1.l_shipdate > TIMESTAMP '1999-06-30 00:00:00'
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > TIMESTAMP '1999-06-30 00:00:00')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("e2_sql_waiting_orders", oracle=_Q21_SQL, tags=("E2",))
def e2_sql_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order. Same SQL text is the DuckDB oracle
    verbatim; the plan gate asserts the correlated subqueries
    decorrelate into semi/anti joins (no per-row subquery execution)."""
    Catalog(spark, sf_dir).register_views(
        ("supplier", "lineitem", "orders", "nation")
    )
    return spark.sql(_Q21_SQL)


# E2k — TPC-H Q13-style customer order distribution (outer-join histogram) -----
#
# The one TPC-H shape whose AGGREGATE feeds another aggregate: a LEFT
# OUTER join with a join-condition filter (the filter must live in the
# ON clause — in WHERE it would silently turn the join inner and drop
# zero-order customers), a per-customer count, then a histogram over
# those counts. Exercises outer-join null handling (count(o_orderkey)
# skips nulls so no-order customers land in bucket 0) and double
# aggregation.

_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("e2_sql_order_distribution", oracle=_Q13_SQL, tags=("E2",))
def e2_sql_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many (non-urgent)
    orders, including the zero bucket. Same SQL text is the DuckDB
    oracle verbatim. Both aggregations are partial+final; the second
    one's input is customer-sized, the histogram is |distinct counts|
    rows."""
    Catalog(spark, sf_dir).register_views(("customer", "orders"))
    return spark.sql(_Q13_SQL)


# E2l — TPC-H Q22-style dormant high-balance customers -------------------------
#
# The remaining distinctive Q22 ingredients: an UNCORRELATED scalar
# subquery (global positive-balance average, computed once and
# broadcast into the filter) combined with a correlated NOT EXISTS
# (decorrelated to a left-anti join on o_custkey). The fixture's
# customers all have at least one order, so the anti-join predicate is
# "no URGENT order" — the decorrelation structure Q22 exercises is
# unchanged.

_Q22_SQL = """
SELECT n_name AS cntry,
       CAST(count(*) AS BIGINT)       AS numcust,
       round(sum(c_acctbal), 2)       AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY n_name
ORDER BY n_name
"""


@register("e2_sql_dormant_customers", oracle=_Q22_SQL, tags=("E2",))
def e2_sql_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, grouped by nation. Same SQL text is the DuckDB oracle
    verbatim; the scalar subquery plans as a one-row broadcast
    (Subquery scalar-subquery reuse), the NOT EXISTS as a left-anti
    join."""
    Catalog(spark, sf_dir).register_views(("customer", "orders", "nation"))
    return spark.sql(_Q22_SQL)


# E2m — TPC-H Q15-style top supplier (aggregating CTE referenced twice) --------
#
# The one remaining distinctive TPC-H structure (round-8 verdict task
# 6): a grouped derived table referenced TWICE — once joined for its
# rows, once reduced to a scalar max — i.e. a scalar subquery over an
# aggregating view. Catalyst plans the CTE into both consumers (no
# automatic sharing), evaluates the scalar branch as a one-row subquery
# broadcast, and equi-joins supplier against the grouped fact side; no
# correlated execution anywhere. Revenue is rounded to 4 INSIDE the CTE
# so the twice-planned float aggregations (whose partial-sum orders may
# legitimately differ plan-to-plan) compare on a stable value, and the
# max-equality predicate is exact in both engines.

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("e2_sql_top_supplier", oracle=_Q15_SQL, tags=("E2",))
def e2_sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarter-revenue view per supplier, then the
    supplier(s) achieving the view's maximum. Same SQL text is the
    DuckDB oracle verbatim; exercises the CTE-referenced-twice /
    scalar-subquery-over-grouped-table Catalyst path no other E2 entry
    touches."""
    Catalog(spark, sf_dir).register_views(("supplier", "lineitem"))
    return spark.sql(_Q15_SQL)


# E2n — TPC-H Q6-style forecasting revenue change (pure scan-filter-agg) -------

_Q6_SQL = """
SELECT round(round(sum(l_extendedprice * l_discount), 6), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("e2_sql_forecast_revenue", oracle=_Q6_SQL, tags=("E2",))
def e2_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown probe — no join at
    all, three range predicates that must reach the parquet scan and a
    single map-combined aggregate. The E2 surface's floor: if this plan
    ever grows an exchange beyond the final 1-row agg, pushdown broke.
    The sum rounds in two stages (6dp then 2dp) so a partial-sum
    ordering difference between engines cannot straddle a 2dp rounding
    boundary — the drift would have to land on an exact .xx5000 at 6dp
    first (the Q15-trick class of mitigation)."""
    Catalog(spark, sf_dir).register_views(("lineitem",))
    return spark.sql(_Q6_SQL)


# E2o — TPC-H Q7-style volume shipping (dual-role dimension join) --------------

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(round(sum(volume), 6), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                       AND TIMESTAMP '1996-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("e2_sql_volume_shipping", oracle=_Q7_SQL, tags=("E2",))
def e2_sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the SAME dimension table (nation) joined twice in
    different roles (supplier's vs customer's), with a disjunctive
    cross-role predicate that cannot be pushed to either scan alone.
    Exercises alias-scoped dual joins — a Catalyst path no other E2
    entry touches. Both nation sides broadcast; the year extraction
    is CAST to BIGINT so both engines agree on the grouping type.
    Two-stage rounding (6dp then 2dp) keeps per-group float sums off
    2dp rounding boundaries under cross-engine summation-order drift."""
    Catalog(spark, sf_dir).register_views(
        ("supplier", "lineitem", "orders", "customer", "nation")
    )
    return spark.sql(_Q7_SQL)


# E2p — TPC-H Q8-style national market share (CASE-in-aggregate ratio) ---------

_Q8_SQL = """
SELECT o_year,
       floor(round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                   / sum(volume), 8) * 10000) / 10000 AS mkt_share
FROM (
  SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("e2_sql_market_share", oracle=_Q8_SQL, tags=("E2",))
def e2_sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of regional PROMO
    revenue per order year — an 8-table star with nation again in two
    roles (customer's region membership, supplier's identity) and the
    share computed as a CASE-guarded conditional sum over the SAME
    aggregate pass (one shuffle, not two). The denominator is nonzero
    whenever a group exists, so ANSI division is safe by construction.
    The share is an unbounded ratio, so it takes the x4q/w12 floor law
    (floor(x*1e4)/1e4 after an 8dp snap) instead of round(,4): engine
    round() laws diverge on exact .xxxx5 doubles."""
    Catalog(spark, sf_dir).register_views(
        ("part", "lineitem", "orders", "customer", "nation", "region", "supplier")
    )
    return spark.sql(_Q8_SQL)


# E2q — TPC-H Q20-style promising parts (IN-subquery nested in an IN-subquery) -

_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40
  )
ORDER BY s_suppkey
"""


@register("e2_sql_promising_parts", oracle=_Q20_SQL, tags=("E2",))
def e2_sql_promising_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the last distinctive decorrelation structure —
    an IN-subquery (suppliers who moved enough of the flagged parts in
    the half-year) whose body itself contains another IN-subquery (the
    flagged parts) plus a grouped HAVING. Catalyst must collapse the
    whole chain into a semi-join stack: part-name semi-join under the
    lineitem aggregate, that aggregate semi-joined against supplier —
    no correlated re-execution anywhere (gate pins no nested-loop and
    >= 2 LeftSemi joins). The reference lake has no partsupp table, so
    the availability predicate becomes the grouped half-year quantity
    HAVING — structurally the same nested-IN + agg chain as pristine
    Q20. Same SQL text is the DuckDB oracle verbatim; integer-sum
    HAVING, so no float-boundary hazard."""
    Catalog(spark, sf_dir).register_views(("supplier", "nation", "lineitem", "part"))
    return spark.sql(_Q20_SQL)


# E2r — TPC-H Q2-style minimum-cost supplier (correlated scalar min subquery) --

_Q2_SQL = """
SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
       round(l_extendedprice, 2) AS min_price
FROM part, lineitem, supplier, nation
WHERE l_partkey = p_partkey AND s_suppkey = l_suppkey
  AND s_nationkey = n_nationkey
  AND p_size = 7 AND p_type = 'PROMO'
  AND l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
ORDER BY p_partkey, s_suppkey
"""


@register("e2_sql_min_cost_supplier", oracle=_Q2_SQL, tags=("E2",))
def e2_sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier rows that
    achieve the minimum price, expressed as a correlated scalar-min
    subquery compared for EQUALITY inside a 4-table join (pristine Q2's
    min supplycost; price stands in because the lake has no partsupp).
    Distinct from Q17 (correlated avg feeding an inequality + single
    fact table): here the subquery must decorrelate into a grouped min
    that joins back into a multi-table plan, ties preserved. The
    equality compares a STORED parquet value against a min of stored
    values — no arithmetic, so exact in both engines. Same SQL text is
    the DuckDB oracle verbatim."""
    Catalog(spark, sf_dir).register_views(("part", "lineitem", "supplier", "nation"))
    return spark.sql(_Q2_SQL)


# E2s — TPC-H Q9-style product-type profit (5-way join + derived measure) ------

_Q9_SQL = """
SELECT n_name AS nation, o_year, round(round(sum(amount), 6), 2) AS sum_profit
FROM (
  SELECT n_name, CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.5 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


@register("e2_sql_product_profit", oracle=_Q9_SQL, tags=("E2",))
def e2_sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation per year over the widest join
    in the suite — lineitem against part, supplier, nation AND orders
    simultaneously (5 tables, 4 join keys), with a contains-LIKE part
    filter that prunes the fact side only through the part join, and a
    derived profit measure combining columns of three tables (retail
    cost stands in for the absent partsupp supplycost). All dimension
    sides broadcast; the single shuffle is the (nation, year) agg.
    Two-stage rounding (6dp then 2dp) keeps per-group float sums off
    2dp boundaries under cross-engine summation-order drift."""
    Catalog(spark, sf_dir).register_views(
        ("lineitem", "part", "supplier", "nation", "orders")
    )
    return spark.sql(_Q9_SQL)


# E2t — TPC-H Q11-style important stock (HAVING vs scalar subquery over agg) ---

_Q11_SQL = """
SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2')
GROUP BY l_partkey
HAVING round(sum(l_extendedprice * l_quantity), 6) > (
  SELECT round(3.0 * avg(part_value), 6) FROM (
    SELECT sum(l_extendedprice * l_quantity) AS part_value
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2')
    GROUP BY l_partkey
  ) pv
)
ORDER BY value DESC, l_partkey
"""


@register("e2_sql_important_stock", oracle=_Q11_SQL, tags=("E2",))
def e2_sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value filtered by a HAVING
    whose right side is a scalar subquery over a SECOND full
    aggregation of the same joined fact — the group-vs-global-statistic
    structure no other E2 entry has. Pristine Q11 thresholds against
    fraction * total, which degenerates as the corpus grows (total
    scales with rows, per-part value doesn't); the threshold here is
    3x the average per-part value — scale-invariant by construction,
    so the query stays non-degenerate at any sf. Both comparison sides
    round at 6dp so summation-order drift cannot straddle the
    threshold. Same SQL text is the DuckDB oracle verbatim."""
    Catalog(spark, sf_dir).register_views(("lineitem", "supplier", "nation"))
    return spark.sql(_Q11_SQL)


# E2u — TPC-H Q12-style late-shipment priority classes (date-arith join filter) -

_Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL '60' DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("e2_sql_priority_shipping", oracle=_Q12_SQL, tags=("E2",))
def e2_sql_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments classified into high/low
    priority CASE-counts per group. The distinctive piece is the
    CROSS-TABLE date-arithmetic predicate (shipdate vs orderdate +
    INTERVAL '60' DAY) that cannot push to either scan alone and must
    evaluate inside the join — the interval-literal Catalyst path no
    other E2 entry touches (receipt/commit dates don't exist in this
    lake; ship-vs-order lateness is the same structure). Counts are
    integers — no float hazard. Same SQL text is the DuckDB oracle
    verbatim; both engines parse INTERVAL '60' DAY identically."""
    Catalog(spark, sf_dir).register_views(("orders", "lineitem"))
    return spark.sql(_Q12_SQL)


# E2v — TPC-H Q16-style supplier counts (grouped COUNT DISTINCT + NOT IN) ------

_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'SMALL%'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < -900.0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("e2_sql_supplier_part_counts", oracle=_Q16_SQL, tags=("E2",))
def e2_sql_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) bucket with three anti-predicates on the dimension and a
    NOT IN exclusion subquery on the fact's supplier key (pristine
    Q16's complaint-supplier exclusion, keyed on acctbal here since
    supplier comments don't exist). Exercises grouped COUNT(DISTINCT)
    — a two-phase distinct-then-count aggregate — stacked on an
    anti-join, which no other E2 entry combines. s_suppkey is
    non-null by construction, so the NOT IN is the plain anti-join
    face (u6 probes the null face). Integer counts — no float hazard.
    Same SQL text is the DuckDB oracle verbatim; ORDER BY carries the
    full grouping key so ties cannot reorder."""
    Catalog(spark, sf_dir).register_views(("part", "lineitem", "supplier"))
    return spark.sql(_Q16_SQL)
