"""Local replica of the driver's oracle-diff correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted column
names, and order-insensitive values (exact string equality after type
normalization — stricter than any reasonable hash).

Usage:  python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rows-only-ok", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ssn_college_software_architecture_assignments__spark import build_session

    spark = build_session(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows-only  {name}: {len(spark_pdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
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
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(spark_pdf)} rows  ({time.time()-t0:.1f}s)")

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)} queries at {args.sf}"
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
