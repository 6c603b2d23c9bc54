"""Projection / filter / cleaning operators (SURVEY.md §2.2, P1-P7).

These re-express the reference's Transform stage — "Clean or reformat the
data for MongoDB compatibility" (/root/reference/README.md:22) and its
fault-handling guidance ("empty payloads", README.md:32,105) — as Catalyst
logical-plan nodes. Everything here is a narrow (shuffle-free) operator:
at 100 TB these run inside the scan stage with predicate pushdown and
column pruning doing the heavy lifting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# P1 — select / rename / compute ------------------------------------------

_P1_ORACLE = """
SELECT
  o_orderkey                     AS order_id,
  o_orderpriority                AS priority,
  lower(o_orderstatus)           AS status,
  round(o_totalprice * 0.93, 2)  AS net_price
FROM orders
"""


@register("p1_project", oracle=_P1_ORACLE, tags=("P1",))
def p1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + rename + computed column; scan reads only 4 of 6 columns
    (column pruning — verify via ReadSchema in explain)."""
    return Catalog(spark, sf_dir).orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        F.lower("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 0.93, 2).alias("net_price"),
    )


# P2 — filter ----------------------------------------------------------------

_P2_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R' AND l_discount > 0.02
"""


@register("p2_filter", oracle=_P2_ORACLE, tags=("P2",))
def p2_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate; all three clauses push down to the parquet
    scan (PushedFilters)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_discount") > 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# P3 — drop empty / null records ---------------------------------------------

_P3_ORACLE = """
WITH payload AS (
  SELECT event_id, user_id,
         CASE WHEN value < 5 THEN NULL ELSE value END   AS v,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype
  FROM events
)
SELECT event_id, user_id, v, etype
FROM payload
WHERE v IS NOT NULL AND etype IS NOT NULL
"""


@register("p3_drop_empty", oracle=_P3_ORACLE, tags=("P3",))
def p3_drop_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discard records whose payload is empty/null (README.md:32 "empty
    payloads"). Nulls are synthesized deterministically since fixtures are
    dense; `na.drop` is the operator under test."""
    ev = Catalog(spark, sf_dir).events
    payload = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"),
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("event_type"))
        .alias("etype"),
    )
    return payload.na.drop(how="any", subset=["v", "etype"])


# P4 — null fill / defaulting -------------------------------------------------

_P4_ORACLE = """
WITH payload AS (
  SELECT event_id,
         CASE WHEN value < 5 THEN NULL ELSE value END AS v,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype
  FROM events
)
SELECT event_id,
       coalesce(v, 0.0)            AS v_filled,
       coalesce(etype, 'unknown')  AS etype_filled
FROM payload
"""


@register("p4_null_fill", oracle=_P4_ORACLE, tags=("P4",))
def p4_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default missing fields for sink compatibility (README.md:22)."""
    ev = Catalog(spark, sf_dir).events
    payload = ev.select(
        "event_id",
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"),
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("event_type"))
        .alias("etype"),
    )
    filled = payload.na.fill({"v": 0.0, "etype": "unknown"})
    return filled.select(
        "event_id",
        F.col("v").alias("v_filled"),
        F.col("etype").alias("etype_filled"),
    )


# P5 — type coercion -----------------------------------------------------------

_P5_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')  AS ship_date,
  CAST(floor(l_quantity) AS BIGINT)     AS qty_int,
  CAST(l_linenumber AS VARCHAR)         AS line_str
FROM lineitem
"""


@register("p5_type_cast", oracle=_P5_ORACLE, tags=("P5",))
def p5_type_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coerce types for sink compatibility (README.md:22). Note: Spark's
    double->int cast truncates while DuckDB's rounds, so the portable
    idiom is floor-then-cast (both engines agree)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_date"),
        F.floor("l_quantity").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
    )


def sanitize_field_names(df: DataFrame) -> DataFrame:
    """Generic sink-key sanitizer (README.md:22 "MongoDB compatibility"):
    rewrites every column AND nested struct field name, replacing
    characters illegal in document-store keys (``.`` ``$`` and
    whitespace) with ``_``. Structs are rebuilt recursively with pure
    projections — no data movement, no Python in the row path."""
    from pyspark.sql import types as T

    def clean(name: str) -> str:
        return "".join("_" if ch in ".$ \t" else ch for ch in name)

    def rebuild(col: Column, dtype: T.DataType) -> Column:
        if isinstance(dtype, T.StructType):
            return F.struct(
                *[
                    rebuild(col.getField(f.name), f.dataType).alias(clean(f.name))
                    for f in dtype.fields
                ]
            )
        if isinstance(dtype, T.ArrayType) and isinstance(
            dtype.elementType, T.StructType
        ):
            return F.transform(col, lambda x: rebuild(x, dtype.elementType))
        return col

    # Backtick-quote top-level names so a literal "pay.load" column is
    # not parsed as a struct path.
    return df.select(
        *[
            rebuild(F.col(f"`{f.name}`"), f.dataType).alias(clean(f.name))
            for f in df.schema.fields
        ]
    )


# P6 — field sanitization --------------------------------------------------------

_P6_ORACLE = """
SELECT
  event_id                                              AS event_id,
  event_type                                            AS type,
  value                                                 AS value_usd,
  CAST(json_extract_string(props, '$.k') AS BIGINT)     AS props_k
FROM events
"""


@register("p6_field_sanitize", oracle=_P6_ORACLE, tags=("P6",))
def p6_field_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename sink-illegal keys and flatten namespaced payload fields into
    safe column names (README.md:22 "MongoDB compatibility": no dots/$ in
    keys). `props.k` becomes `props_k`."""
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id",
        F.col("event_type").alias("type"),
        F.col("value").alias("value_usd"),
        F.get_json_object("props", "$.k").cast("long").alias("props_k"),
    )


_P6B_ORACLE = """
SELECT event_id,
       round(value, 2) AS value_usd,
       event_type      AS event_kind
FROM events
"""


@register("p6b_sanitize_generic", oracle=_P6B_ORACLE, tags=("P6",))
def p6b_sanitize_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic recursive sanitizer over a deliberately hostile nested
    schema: dotted/dollar/space names at the top level and inside a
    struct all become sink-safe, then the struct is flattened back out
    for the oracle comparison."""
    ev = Catalog(spark, sf_dir).events
    hostile = ev.select(
        "event_id",
        F.struct(
            F.round("value", 2).alias("value.usd"),
            F.col("event_type").alias("event kind"),
        ).alias("pay$load"),
    )
    clean = sanitize_field_names(hostile)
    return clean.select(
        "event_id",
        F.col("pay_load.value_usd").alias("value_usd"),
        F.col("pay_load.event_kind").alias("event_kind"),
    )


# P7 — flatten nested structures ---------------------------------------------------

_P7_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')[1:8]) AS token
FROM documents
"""


@register("p7_flatten", oracle=_P7_ORACLE, tags=("P7",))
def p7_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode nested arrays from a document payload (README.md:12,21 —
    nested response structures). At scale explode multiplies rows inside
    the scan stage; no shuffle is introduced."""
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.explode(F.slice(F.split("text", " "), 1, 8)).alias("token"),
    )
