"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation, no
driver-side collection), which is how a real cluster job would consume it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

# Headline set: one representative per operator family (scan+agg, joins,
# window, top-k, dedup, similarity, text, as-of, streaming).
HEADLINE = [
    "q1_pricing_summary",
    "j1_inner_equi_join",
    "j6_broadcast_join",
    "j8_asof_join",
    "a8_pivot",
    "w1_row_number_latest",
    "o3_top_k_per_group",
    "x1_exact_dedup",
    "x2_minhash_near_dedup",
    "x3_similarity_bruteforce",
    "x4b_term_frequency",
    "x4f_corpus_curation",
    "t1_tumbling_window",
    # round-2 additions: lake layout + curation (no prior-round delta)
    "x1b_incremental_dedup",
    "x6d_decontamination",
]
# j11 is benchmarked as its two legs (see main): "j11_write" is the
# one-off bucketed ingest, "j11_join" the repeated shuffle-free join.


def _force(df) -> int:
    # noop sink executes the whole plan without materializing on the driver.
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


# Host-speed calibration: a fixed-size, data-independent, in-memory JVM
# aggregation (no IO, no shuffle). Its wall-time tracks raw host/runtime
# speed, so round-over-round drift becomes MEASURED instead of inferred
# from uniform slowdowns across unchanged queries (the r3->r4 lesson).
# CALIB_NOMINAL_SEC pins the round-5 host as the normalization reference:
# value_normalized = value * (CALIB_NOMINAL_SEC / calib_sec) re-expresses
# a total in round-5-host seconds, comparable across rounds.
CALIB_NOMINAL_SEC = 0.140


def _calibrate(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _force(spark.range(0, 50_000_000, 1, 8).selectExpr("sum(id * 2) AS s"))
        best = min(best, time.time() - t0)
    return round(best, 4)


def _fingerprint(spark) -> dict:
    import platform

    import pyspark

    cpu_model = ""
    try:
        with open("/proc/cpuinfo", encoding="utf-8") as fh:
            for line in fh:
                if line.lower().startswith("model name"):
                    cpu_model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {
        "pyspark": pyspark.__version__,
        "python": platform.python_version(),
        "cpu_model": cpu_model,
        "cpus": os.cpu_count(),
        "calib_sec": _calibrate(spark),
        "calib_nominal_sec": CALIB_NOMINAL_SEC,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ssn_college_software_architecture_assignments__spark import build_session
    import __spark_entry__ as entrymod

    spark = build_session(app_name="ssn-spark-bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)

    # Warm the JVM + parquet footers once so timings measure the query.
    _force(qs[names[0]](spark, sf_dir))

    fingerprint = _fingerprint(spark)

    # Run each query twice and report the min: machine noise on shared
    # hosts dwarfs plan differences (the same plan has been observed at
    # 3s and 54s), and min-of-2 is the cheapest stable estimator.
    per_query: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        per_query[name] = round(best, 3)

    # j11 split timing: the bucketed-table write is a one-off ingest cost
    # that amortizes over every later join; the join leg is the claim under
    # test (no-Exchange SMJ) and must stay cheap round-over-round.
    from ssn_college_software_architecture_assignments__spark.operators.joins import (
        j11_join_bucketed,
        j11_write_bucketed_tables,
    )

    t0 = time.time()
    j11_write_bucketed_tables(spark, sf_dir)
    per_query["j11_write"] = round(time.time() - t0, 3)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _force(j11_join_bucketed(spark))
        best = min(best, time.time() - t0)
    per_query["j11_join"] = round(best, 3)

    total = round(sum(per_query.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Drift-normalized total: what this run would cost on the pinned
    # reference host (calib_sec == CALIB_NOMINAL_SEC). Guard against a
    # degenerate calibration (0 would mean the clock failed).
    calib = fingerprint["calib_sec"]
    normalized = round(total * (CALIB_NOMINAL_SEC / calib), 3) if calib > 0 else None

    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "value_normalized": normalized,
        "fingerprint": fingerprint,
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
        "notes": (
            "value_normalized rescales the total by the fixed in-memory "
            "calibration agg (fingerprint.calib_sec vs the pinned "
            "calib_nominal_sec) so host/runtime drift is factored out of "
            "round-over-round comparison; j11 stays split as j11_write "
            "(one-off ingest) + j11_join (repeated no-Exchange SMJ leg)"
        ),
    }

    # Round-over-round continuity: compare against the newest BENCH_r*.json
    # so per-query regressions are visible in the bench line itself.
    import glob

    prior = sorted(glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")))
    if prior:
        try:
            with open(prior[-1], encoding="utf-8") as fh:
                prev = json.load(fh)
            # The driver wraps the bench line under "parsed". Guard every
            # shape assumption: a corrupted/hand-edited prior file must
            # never kill the bench run.
            if not isinstance(prev, dict):
                raise ValueError("prior bench file is not a JSON object")
            prev_q = prev.get("parsed", prev)
            prev_q = prev_q.get("queries", {}) if isinstance(prev_q, dict) else {}
            out["prev_round"] = os.path.basename(prior[-1])
            out["delta_vs_prev"] = {
                n: round(per_query[n] - prev_q[n], 3)
                for n in per_query
                if isinstance(prev_q.get(n), (int, float))
            }
            # Host-speed ratio vs the previous round, when it recorded a
            # calibration: >1 means this host is that much slower now.
            prev_parsed = prev.get("parsed", prev)
            prev_fp = (
                prev_parsed.get("fingerprint", {})
                if isinstance(prev_parsed, dict)
                else {}
            )
            prev_calib = prev_fp.get("calib_sec")
            if isinstance(prev_calib, (int, float)) and prev_calib > 0 and calib > 0:
                out["calib_drift_vs_prev"] = round(calib / prev_calib, 3)
        except (OSError, ValueError, KeyError, TypeError, AttributeError):
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
