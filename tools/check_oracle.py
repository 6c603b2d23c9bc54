"""Local replica of the driver's oracle-diff correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted column
names, and order-insensitive values (exact string equality after type
normalization — stricter than any reasonable hash).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
    python tools/check_oracle.py --both [--out ORACLE_SWEEP.json] [names...]

``--both`` is the standing dual-scale gate (round-5 verdict task 3): one
command runs the full sweep at sf0.01 AND sf0.1 and writes a JSON
artifact recording per-query status at each scale, so the "correct at
both scales" claim is a checked-in record instead of session prose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BOTH_SCALES = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # floats are pre-rounded by the queries; repr normalizes -0.0 etc.
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
        ts = pd.Timestamp(v)
        return ts.floor("us").isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def run_sweep(spark, sf: str, names: list[str], qs, oracles, repeat=False) -> dict:
    """Run the oracle diff for ``names`` at scale dir ``sf``; returns a
    result dict: {"pass": n, "fail": n, "rows_only": n, "failures": [...],
    "queries": {name: "pass"|"fail"|"rows-only"|"nondeterministic"},
    "elapsed_sec": s} — the fourth status only appears under ``repeat``
    and counts into ``fail``/``failures``.

    ``repeat=True`` executes every Spark query a SECOND time in the same
    session and demands identical normalized values run-to-run — the
    determinism gate (round-8 verdict task 4). Oracle agreement alone can
    mask nondeterminism (unstable sort ties, partition-order float sums)
    when the flaky side happens to land on the oracle's answer once;
    same-session repetition catches exactly that class."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    t_sweep = time.time()
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    statuses: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            statuses[name] = "fail"
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if repeat:
            try:
                spark_pdf2 = qs[name](spark, sf).toPandas()
            except Exception as exc:
                n_fail += 1
                failures.append(name)
                statuses[name] = "fail"
                print(f"FAIL  {name}: spark error on repeat run: {exc}")
                continue
            if normalize(spark_pdf) != normalize(spark_pdf2):
                n_fail += 1
                failures.append(name)
                statuses[name] = "nondeterministic"
                print(f"FAIL  {name}: NONDETERMINISTIC (run1 != run2 values)")
                continue
        if name not in oracles:
            n_rows_only += 1
            statuses[name] = "rows-only"
            print(f"rows-only  {name}: {len(spark_pdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            statuses[name] = "fail"
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue

        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
            )
        if not problems:
            s_rows, d_rows = normalize(spark_pdf), normalize(duck_pdf)
            if s_rows != d_rows:
                bad = [
                    (i, a, b)
                    for i, (a, b) in enumerate(zip(s_rows, d_rows))
                    if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {bad}")
        if problems:
            n_fail += 1
            failures.append(name)
            statuses[name] = "fail"
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            statuses[name] = "pass"
            print(f"PASS  {name}: {len(spark_pdf)} rows  ({time.time()-t0:.1f}s)")

    con.close()
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)} queries at {sf}"
    )
    if failures:
        print("failures:", " ".join(failures))
    return {
        "sf_dir": sf,
        "pass": n_pass,
        "fail": n_fail,
        "rows_only": n_rows_only,
        "failures": failures,
        "queries": statuses,
        "elapsed_sec": round(time.time() - t_sweep, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--both",
        action="store_true",
        help="run the sweep at sf0.01 AND sf0.1 and write a JSON artifact",
    )
    ap.add_argument(
        "--out",
        default="ORACLE_SWEEP.json",
        help="artifact path for --both (repo-root relative)",
    )
    ap.add_argument("--rows-only-ok", action="store_true")
    ap.add_argument(
        "--repeat",
        action="store_true",
        help="run every Spark query twice and fail on any run-to-run "
        "value difference (same-session determinism gate)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ssn_college_software_architecture_assignments__spark import build_session

    spark = build_session(app_name="oracle-check", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    if not args.both:
        result = run_sweep(spark, args.sf, names, qs, oracles, repeat=args.repeat)
        return 1 if result["fail"] else 0

    results = {}
    for sf in BOTH_SCALES:
        print(f"\n===== sweep at {sf} =====")
        results[os.path.basename(sf)] = run_sweep(
            spark, sf, names, qs, oracles, repeat=args.repeat
        )
    artifact = {
        "tool": "check_oracle --both" + (" --repeat" if args.repeat else ""),
        "repeat": args.repeat,
        "n_queries": len(names),
        "scales": results,
        "all_green": all(r["fail"] == 0 for r in results.values()),
    }
    out_path = (
        args.out if os.path.isabs(args.out) else os.path.join(REPO_ROOT, args.out)
    )
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwrote {out_path}  all_green={artifact['all_green']}")
    return 0 if artifact["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
