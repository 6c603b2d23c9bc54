"""10x stress run (round-5 brief item 3): synthesize ~sf1 from the sf0.1
fixtures once, run the bench headline set at both scales, and flag any
query whose time grows super-linearly in the data size.

Synthesis = 10 re-keyed copies of every scaling table (key columns get a
disjoint per-copy offset so FK joins stay consistent and key cardinality
scales with the data, like a real TPC-H sf1). The fixed-size dimensions
(region, nation) stay single-copy, exactly as TPC-H scales them.
Documents additionally get a per-copy vowel-rotation applied to the text
so copies are NOT near-duplicates of each other: each copy carries the
same internal near-dup structure as the original corpus, keeping
per-doc near-dup density constant as the corpus grows — the correct
null hypothesis for linear scaling of x2 candidate generation. (A naive
10x duplication would plant 45 exact near-dup pairs per doc and make
candidate growth quadratic BY CONSTRUCTION, measuring the fixture, not
the algorithm.)

Usage: python tools/stress_sf1.py [--synth-only]
Writes /tmp/ssn_sf1/<table>.parquet (reused if present) and prints one
JSON object {query: {sf01_sec, sf1_sec, ratio, verdict}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/ssn_sf1"
COPIES = 10
OFFSET = 100_000_000  # disjoint key ranges per copy, far above any sf0.1 key

# rows grow 10x; allow generous constant-overhead slack before calling a
# query super-linear (constant setup makes most ratios land well under 10)
SUPRALINEAR_RATIO = 13.0

VOWELS = "aeiou"


def _rotated(i: int) -> str:
    r = i % len(VOWELS)
    return VOWELS[r:] + VOWELS[:r]


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    def shifted(df, i, key_cols):
        for c in key_cols:
            df = df.withColumn(c, F.col(c) + F.lit(i * OFFSET))
        return df

    plans = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
        "documents": ["doc_id"],
    }
    for table, keys in plans.items():
        out = f"{SF1}/{table}.parquet"
        if os.path.exists(out):
            continue
        base = spark.read.parquet(f"{SF01}/{table}.parquet")
        copies = []
        for i in range(COPIES):
            c = shifted(base, i, keys)
            if table == "documents":
                # decorrelate text across copies; keep n_chars consistent
                c = c.withColumn(
                    "text", F.translate("text", VOWELS, _rotated(i))
                )
            copies.append(c)
        full = copies[0]
        for c in copies[1:]:
            full = full.unionByName(c)
        full.repartition(8).write.mode("overwrite").parquet(out)
    for table in ("region", "nation"):  # fixed-size dims, like real TPC-H
        out = f"{SF1}/{table}.parquet"
        if not os.path.exists(out):
            spark.read.parquet(f"{SF01}/{table}.parquet").write.mode(
                "overwrite"
            ).parquet(out)


def main() -> None:
    from ssn_college_software_architecture_assignments__spark import build_session
    import bench
    import __spark_entry__ as entrymod

    spark = build_session(app_name="ssn-stress-sf1")
    synthesize(spark)
    if "--synth-only" in sys.argv:
        print(json.dumps({"synthesized": SF1}))
        return

    qs = entrymod.queries()
    names = [n for n in bench.HEADLINE if n in qs]

    def timed(name, sf_dir):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            bench._force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        return round(best, 3)

    bench._force(qs[names[0]](spark, SF01))  # warm
    results = {}
    for name in names:
        t_small = timed(name, SF01)
        t_big = timed(name, SF1)
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        results[name] = {
            "sf01_sec": t_small,
            "sf1_sec": t_big,
            "ratio": ratio,
            "verdict": (
                "SUPER-LINEAR"
                if ratio is not None and ratio > SUPRALINEAR_RATIO
                else "ok"
            ),
        }
    out = {
        "copies": COPIES,
        "supralinear_threshold": SUPRALINEAR_RATIO,
        "queries": results,
        "worst": max(results, key=lambda n: results[n]["ratio"] or 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
