"""As-of join semantics on a handmade frame (exact expectations)."""

from __future__ import annotations

from ssn_college_software_architecture_assignments__spark.operators.asof import asof_join


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 250, 20.0), (2, 50, 5.0)],
        "key long, l_ts long, lval double",
    )
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 300, "c"), (2, 60, "z")],
        "key long, r_ts long, tag string",
    )
    out = asof_join(left, right, on="key", left_ts="l_ts", right_ts="r_ts",
                    right_cols=["tag"]).collect()
    got = {(r["key"], r["l_ts"]): r["_asof_tag"] for r in out}
    assert got[(1, 100)] == "a"   # equal timestamps match (>=)
    assert got[(1, 250)] == "b"   # latest at-or-before 250 is 200
    assert got[(2, 50)] is None   # nothing at-or-before -> null (pre-filter)
