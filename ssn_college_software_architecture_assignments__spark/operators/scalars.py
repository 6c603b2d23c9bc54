"""Scalar function families (SURVEY.md §2.8).

The reference's Transform stage — "Clean or reformat the data for MongoDB
compatibility" (/root/reference/README.md:22) — is arbitrary per-record
computation. Re-expressed here as built-in `pyspark.sql.functions`
(JVM-side, whole-stage-codegen'd) instead of Python code: the fast path at
100 TB. One registry query per family.

Cross-engine notes baked into the oracles (verified against DuckDB 1.0):
- DuckDB `floor()` returns DOUBLE (Spark: LONG) -> CAST in SQL;
- DuckDB `datediff`/`len()` return BIGINT (Spark: INT) -> cast Spark side;
- DuckDB `log()` is log10 -> use `ln()`;
- DuckDB `date_trunc('month', ts)` returns DATE -> use Spark `F.trunc`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# String family ---------------------------------------------------------------

_STRING_ORACLE = """
SELECT
  p_partkey,
  lower(p_name)                                   AS name_lc,
  upper(p_brand)                                  AS brand_uc,
  substring(p_type, 1, 5)                         AS type_prefix,
  concat_ws('-', p_brand, p_type)                 AS brand_type,
  length(p_name)                                  AS name_len,
  regexp_replace(p_name, '[aeiou]', '', 'g')      AS name_novowel,
  regexp_extract(p_name, '([a-z]+)$', 1)          AS last_word,
  lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
  (p_type LIKE '%a%')                             AS has_a
FROM part
"""


@register("f_string_family", oracle=_STRING_ORACLE, tags=("scalar-string",))
def f_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim/case/substring/concat/regexp/lpad/like over part names."""
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_type").like("%a%").alias("has_a"),
    )


# Date/time family -------------------------------------------------------------

_DATETIME_ORACLE = """
SELECT
  o_orderkey,
  year(o_orderdate)                                          AS order_year,
  month(o_orderdate)                                         AS order_month,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')     AS month_start,
  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_cutoff,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
  CAST(epoch_ms(o_orderdate) AS BIGINT)                      AS epoch_millis,
  strftime(o_orderdate, '%Y-%m-%d')                          AS date_str
FROM orders
"""


@register("f_datetime_family", oracle=_DATETIME_ORACLE, tags=("scalar-datetime",))
def f_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction, truncation, arithmetic, formatting on order dates
    (ingestion-timestamp handling per README.md:28)."""
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_format(F.trunc(F.col("o_orderdate").cast("date"), "month"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
        F.date_format(F.add_months(F.col("o_orderdate").cast("date"), 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_millis"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
    )


# Math family -------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  round(abs(l_discount - 0.05), 4)          AS disc_dev,
  CAST(floor(l_extendedprice) AS BIGINT)    AS price_floor,
  CAST(ceil(l_extendedprice) AS BIGINT)     AS price_ceil,
  round(ln(l_quantity + 1), 6)              AS log_qty,
  round(exp(l_discount), 6)                 AS exp_disc,
  round(sqrt(l_quantity), 6)                AS sqrt_qty,
  round(pow(1 + l_tax, 2), 6)               AS tax_sq,
  l_orderkey % 7                            AS key_mod
FROM lineitem
"""


@register("f_math_family", oracle=_MATH_ORACLE, tags=("scalar-math",))
def f_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/ln/exp/sqrt/pow/mod — all codegen'd JVM
    expressions, zero Python in the hot path."""
    li = Catalog(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# Array family (incl. higher-order functions) --------------------------------------

_ARRAY_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT
  doc_id,
  CAST(len(toks) AS BIGINT)                                   AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT)                    AS n_unique,
  list_contains(toks, 'spark')                                AS has_spark,
  toks[1]                                                     AS first_token,
  array_to_string(list_sort(list_distinct(toks))[1:5], ',')   AS first5_sorted,
  CAST(len(list_filter(toks, x -> length(x) > 5)) AS BIGINT)  AS n_long_tokens,
  CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum') AS BIGINT) AS total_chars
FROM t
"""


@register("f_array_family", oracle=_ARRAY_ORACLE, tags=("scalar-array",))
def f_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/contains/sort/distinct + higher-order transform/filter/aggregate.
    Higher-order functions run inside codegen — this is how per-document
    token math stays JVM-side instead of becoming a Python UDF."""
    docs = Catalog(spark, sf_dir).documents
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.array_contains(toks, "spark").alias("has_spark"),
        toks[0].alias("first_token"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ","
        ).alias("first5_sorted"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5))
        .cast("long")
        .alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


# Struct family -----------------------------------------------------------------------

_STRUCT_ORACLE = """
WITH t AS (
  SELECT p_partkey,
         struct_pack(brand := p_brand, size := p_size, price := p_retailprice) AS meta
  FROM part
)
SELECT p_partkey,
       meta.brand                 AS meta_brand,
       meta.size                  AS meta_size,
       round(meta.price, 2)       AS meta_price
FROM t
"""


@register("f_struct_family", oracle=_STRUCT_ORACLE, tags=("scalar-struct",))
def f_struct_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack columns into a struct (document-shaping for a JSON/BSON sink,
    README.md:22) and read fields back out."""
    p = Catalog(spark, sf_dir).part
    packed = p.select(
        "p_partkey",
        F.struct(
            F.col("p_brand").alias("brand"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").alias("price"),
        ).alias("meta"),
    )
    return packed.select(
        "p_partkey",
        F.col("meta.brand").alias("meta_brand"),
        F.col("meta.size").alias("meta_size"),
        F.round(F.col("meta.price"), 2).alias("meta_price"),
    )


# JSON family ----------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT)      AS k,
  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2  AS k_doubled,
  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
  (props LIKE '{%')                                      AS looks_like_json
FROM events
"""


@register("f_json_family", oracle=_JSON_ORACLE, tags=("scalar-json",))
def f_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse/extract JSON payloads (the reference ingests raw API JSON,
    README.md:21). `from_json` gives a typed struct; `get_json_object`
    does path extraction without full parsing."""
    ev = Catalog(spark, sf_dir).events
    parsed = ev.withColumn(
        "parsed", F.from_json("props", "k BIGINT")
    )
    return parsed.select(
        "event_id",
        F.col("parsed.k").alias("k"),
        (F.col("parsed.k") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").cast("long").alias("k_missing"),
        F.col("props").like("{%").alias("looks_like_json"),
    )


# Hash / fingerprint family ------------------------------------------------------------------

_HASH_ORACLE = """
SELECT doc_id,
       md5(text)          AS text_md5,
       sha256(text)       AS text_sha256
FROM documents
"""


@register("f_hash_family", oracle=_HASH_ORACLE, tags=("scalar-hash",))
def f_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic record fingerprints for dedup/audit (README.md:28)."""
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


# Conditional family -----------------------------------------------------------------------------

_COND_ORACLE = """
SELECT
  CASE WHEN c_acctbal < 0 THEN 'delinquent'
       WHEN c_acctbal < 5000 THEN 'standard'
       ELSE 'premium' END                    AS tier,
  count(*)                                   AS n,
  round(sum(c_acctbal), 2)                   AS total_bal,
  round(avg(nullif(c_acctbal, 0.0)), 4)      AS avg_nonzero_bal
FROM customer
GROUP BY 1
"""


@register("f_conditional_family", oracle=_COND_ORACLE, tags=("scalar-conditional",))
def f_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN cleaning rules + NULLIF guard."""
    cust = Catalog(spark, sf_dir).customer
    tier = (
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
    )
    return (
        cust.select(tier.alias("tier"), "c_acctbal")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.round(F.avg(F.nullif(F.col("c_acctbal"), F.lit(0.0))), 4).alias(
                "avg_nonzero_bal"
            ),
        )
    )
