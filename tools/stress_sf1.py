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
            if table == "embeddings":
                # per-copy deterministic sign-flip: an ORTHOGONAL
                # transform, so every within-copy cosine is preserved
                # exactly (each copy carries the original near-dup
                # structure) while cross-copy similarity is destroyed —
                # without this, 10 verbatim copies would plant 9 exact
                # duplicates per vector and make x2f candidate growth
                # quadratic by construction.
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> "
                        f"x * CAST(1 - 2 * pmod(xxhash64(j * 131 + {i}), 2) AS FLOAT))"
                    ),
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
    # the round-4 verdict's watched risk: candidate-PAIR growth in the
    # near-dup generators — for these, count output rows too, since a
    # quadratic pair blowup shows in cardinality before wall time
    count_names = [
        n
        for n in ("x2f_embedding_neardup_lsh", "x2g_minhash_full_oracle")
        if n in qs
    ]

    def timed(name, sf_dir, count=False):
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            if count:
                rows = qs[name](spark, sf_dir).count()
            else:
                bench._force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        return round(best, 3), rows

    bench._force(qs[names[0]](spark, SF01))  # warm
    results = {}
    for name in names + count_names:
        count = name in count_names
        t_small, rows_small = timed(name, SF01, count)
        t_big, rows_big = timed(name, SF1, count)
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
        if count:
            results[name]["sf01_rows"] = rows_small
            results[name]["sf1_rows"] = rows_big
            row_ratio = (
                round(rows_big / rows_small, 2) if rows_small else None
            )
            results[name]["row_ratio"] = row_ratio
            if row_ratio is not None and row_ratio > SUPRALINEAR_RATIO:
                results[name]["verdict"] = "SUPER-LINEAR (rows)"
    out = {
        "copies": COPIES,
        "supralinear_threshold": SUPRALINEAR_RATIO,
        "queries": results,
        "worst": max(results, key=lambda n: results[n]["ratio"] or 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
