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

Timing methodology (round-5 verdict fix): the r5 run timed all sf0.1
iterations, then all sf1 iterations, whole-run sequentially — so a
transient host-load episode could inflate one side of the ratio only.
BENCH_r05_sf1.json recorded x4f with ratio 0.16 (sf1 FASTER than
sf0.1), physically impossible, proving a contaminated denominator — the
exact failure mode that would let a genuinely super-linear query slip
under the flag (inflated denominator => understated growth). Now each
query runs N INTERLEAVED (sf0.1, sf1) pairs — load spikes hit both
scales with equal probability — takes the min per side across pairs,
and cross-checks each shared query's sf0.1 time against the newest
BENCH_r*.json: >2x disagreement marks the run TIMING-SUSPECT and exits
nonzero instead of publishing poisoned ratios.
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

# interleaved (sf0.1, sf1) measurement pairs per query; min per side
PAIRS = 2

# a shared-scale (sf0.1) timing that disagrees with the round's
# BENCH_r*.json record by more than this factor marks the whole run
# TIMING-SUSPECT: the host was loaded, the ratios are poisoned.
BENCH_AGREEMENT_FACTOR = 2.0


def _latest_bench_path() -> str | None:
    """Newest round bench record (BENCH_rNN.json, not the *_sf1 stress
    outputs) — the cross-check reference for sf0.1 timings. Delegates to
    bench.latest_bench_record_path so the integer-round ordering rule
    lives in exactly one place."""
    import bench

    return bench.latest_bench_record_path(REPO_ROOT)


def _load_latest_bench_times() -> dict[str, float]:
    path = _latest_bench_path()
    if path is None:
        return {}
    try:
        with open(path) as fh:
            payload = json.load(fh)
        # the driver wraps bench.py's JSON line under "parsed"
        queries = payload.get("queries") or (payload.get("parsed") or {}).get(
            "queries"
        )
        return {
            k: float(v)
            for k, v in (queries or {}).items()
            if isinstance(v, (int, float))
        }
    except (OSError, ValueError):
        return {}

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

    def run_once(name, sf_dir, count=False):
        t0 = time.time()
        rows = None
        if count:
            rows = qs[name](spark, sf_dir).count()
        else:
            bench._force(qs[name](spark, sf_dir))
        return time.time() - t0, rows

    bench._force(qs[names[0]](spark, SF01))  # warm
    bench_ref = _load_latest_bench_times()
    results = {}
    timing_suspect = []
    for name in names + count_names:
        count = name in count_names
        # N interleaved (sf0.1, sf1) pairs: a transient host-load episode
        # hits both scales with equal probability instead of poisoning
        # one side of the ratio; min per side across pairs.
        t_small = t_big = float("inf")
        rows_small = rows_big = None
        for _ in range(PAIRS):
            s, rows_small = run_once(name, SF01, count)
            b, rows_big = run_once(name, SF1, count)
            t_small, t_big = min(t_small, s), min(t_big, b)
        t_small, t_big = round(t_small, 3), round(t_big, 3)
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
        # Cross-check the shared scale against the round bench record: a
        # >2x disagreement means this session's timings are contaminated
        # and every ratio derived from them is unpublishable.
        ref = bench_ref.get(name)
        if ref and ref > 0 and t_small > 0:
            disagreement = max(t_small / ref, ref / t_small)
            results[name]["bench_sf01_sec"] = ref
            results[name]["bench_disagreement"] = round(disagreement, 2)
            if disagreement > BENCH_AGREEMENT_FACTOR:
                results[name]["verdict"] = "TIMING-SUSPECT"
                timing_suspect.append(name)
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
        "pairs_per_query": PAIRS,
        "supralinear_threshold": SUPRALINEAR_RATIO,
        "bench_agreement_factor": BENCH_AGREEMENT_FACTOR,
        "bench_reference": _latest_bench_path(),
        "timing_suspect": timing_suspect,
        "queries": results,
        "worst": max(results, key=lambda n: results[n]["ratio"] or 0),
    }
    print(json.dumps(out))
    if timing_suspect:
        print(
            f"TIMING-SUSPECT: {len(timing_suspect)} queries disagree with "
            f"the bench record by >{BENCH_AGREEMENT_FACTOR}x — ratios "
            "unpublishable, re-run on a quiet host",
            file=sys.stderr,
        )
        raise SystemExit(1)


if __name__ == "__main__":
    main()
