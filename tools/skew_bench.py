"""Measured skew-join evidence (round-5 brief item 8).

Builds a deliberately skewed fact table from the sf lineitem fixture —
~50% of all rows collapse onto HOT_KEYS join keys (an adversarial
straggler: fewer hot keys than reducers, strictly harsher than the
"1% of keys = 50% of rows" profile, where 1% of a TPC-H key domain
already outnumbers the reducers and self-balances) — then measures:

1. reducer balance: per-partition row counts after hash-partitioning on
   the bare key vs on (key, per-row salt);
2. wall time of the join+agg, unsalted vs salted (J10's recipe), with
   AQE skew handling OFF to expose the mechanism, and with AQE ON as
   the production default for reference.

Usage: python tools/skew_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON object; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HOT_KEYS = 4          # hot-key count < reducer count => genuine stragglers
HOT_FRACTION = 50     # percent of fact rows remapped onto the hot keys
SALT = 8
PARTS = 32
REPLICATE = 8         # scale the fact up so task time dominates overhead


def build_tables(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    li = li.crossJoin(spark.range(REPLICATE).select(F.col("id").alias("_rep")))
    # ~HOT_FRACTION% of rows -> key in [0, HOT_KEYS); the rest keep a
    # shifted original key (disjoint from the hot range)
    hot = F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "_rep"), F.lit(100))
    fact = li.select(
        F.when(hot < HOT_FRACTION, F.pmod(F.xxhash64("l_orderkey"), F.lit(HOT_KEYS)))
        .otherwise(F.col("l_orderkey") + HOT_KEYS)
        .alias("key"),
        "l_linenumber",
        "_rep",
        "l_returnflag",
    )
    dim = (
        fact.select("key").distinct()
        .withColumn("payload", F.pmod(F.xxhash64("key"), F.lit(1000)) / 10.0)
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_bench/fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_bench/dim")
    return (
        spark.read.parquet("/tmp/skew_bench/fact"),
        spark.read.parquet("/tmp/skew_bench/dim"),
    )


def partition_histogram(df, cols, parts=PARTS, top=5):
    from pyspark.sql import functions as F

    sizes = (
        df.repartition(parts, *cols)
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    counts = [r["count"] for r in sizes]
    return {
        "top_partitions": counts[:top],
        "max": max(counts),
        "median": sorted(counts)[len(counts) // 2],
        "n_partitions_with_data": len(counts),
    }


def timed(fn, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from ssn_college_software_architecture_assignments__spark import build_session

    spark = build_session(app_name="ssn-skew-bench")
    spark.conf.set("spark.sql.shuffle.partitions", str(PARTS))
    fact, dim = build_tables(spark, sf_dir)
    n_fact = fact.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def unsalted():
        j = fact.join(dim.hint("merge"), "key")
        force(j.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.round(F.sum("payload"), 2).alias("s")
        ))

    def salted():
        f = fact.withColumn(
            "_salt",
            F.pmod(F.xxhash64("key", "l_linenumber", "_rep"), F.lit(SALT)).cast("int"),
        )
        d = dim.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
        )
        j = f.join(d.hint("merge"), ["key", "_salt"])
        force(j.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.round(F.sum("payload"), 2).alias("s")
        ))

    out = {
        "sf_dir": sf_dir,
        "fact_rows": n_fact,
        "hot_keys": HOT_KEYS,
        "hot_fraction_pct": HOT_FRACTION,
        "salt": SALT,
        "shuffle_partitions": PARTS,
        "partition_histogram_unsalted": partition_histogram(fact, ["key"]),
        "partition_histogram_salted": partition_histogram(
            fact.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64("key", "l_linenumber", "_rep"), F.lit(SALT)
                ).cast("int"),
            ),
            ["key", "_salt"],
        ),
    }

    # mechanism exposure: AQE skew handling off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    force(fact.join(dim.hint("merge"), "key").groupBy("key").count())  # warm
    out["unsalted_sec_aqe_off"] = timed(unsalted)
    out["salted_sec_aqe_off"] = timed(salted)
    # production default: AQE on (OptimizeSkewedJoin active)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["unsalted_sec_aqe_on"] = timed(unsalted)
    out["salted_sec_aqe_on"] = timed(salted)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
