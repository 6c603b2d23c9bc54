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


# ---- property test vs a brute-force Python reference (round-5 verdict
# task 6; mirrors what tests/test_late_data.py does for sessionize) -----

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = datetime(2024, 3, 1, 9, 0, 0)

# (key, seconds-offset) pairs; tiny domains force collisions so ties —
# same key + same timestamp on either or both sides — and pre-first-dim
# events (a left row earlier than every right row) are all exercised.
_side_strategy = lambda max_size: st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),
    min_size=0,
    max_size=max_size,
)


def _python_asof(left_rows, right_rows):
    """Brute-force reference: for each left row, scan ALL right rows for
    the same key at-or-before its timestamp; highest (ts, id) wins; left
    rows with no candidate drop (inner semantics)."""
    out = []
    for key, lts, lid in left_rows:
        cands = [
            (rts, rid)
            for rkey, rts, rid in right_rows
            if rkey == key and rts <= lts
        ]
        if cands:
            _, rid = max(cands)
            out.append((key, lid, rid))
    return sorted(out)


@given(lefts=_side_strategy(12), rights=_side_strategy(8))
@_SETTINGS
def test_asof_matches_python_reference(spark, lefts, rights):
    """J8 semantics pin: the union+window as-of equals a brute-force scan
    on arbitrary event/dim sets — including equal timestamps across
    sides, duplicate (key, ts) dim rows (id tiebreak), empty sides, and
    left rows before the first dim row (dropped, never null-matched)."""
    left_rows = [
        (int(k), _BASE + timedelta(seconds=s), int(i))
        for i, (k, s) in enumerate(lefts)
    ]
    right_rows = [
        (int(k), _BASE + timedelta(seconds=s), int(i))
        for i, (k, s) in enumerate(rights)
    ]
    left = spark.createDataFrame(
        left_rows, "key int, l_ts timestamp, l_id int"
    ) if left_rows else spark.createDataFrame([], "key int, l_ts timestamp, l_id int")
    right = spark.createDataFrame(
        right_rows, "key int, r_ts timestamp, r_id int"
    ) if right_rows else spark.createDataFrame([], "key int, r_ts timestamp, r_id int")

    got = sorted(
        (r["key"], r["l_id"], r["_asof_r_id"])
        for r in asof_join(
            left, right, on="key", left_ts="l_ts", right_ts="r_ts",
            right_cols=["r_id"], right_tiebreak="r_id",
        )
        .filter("_asof_r_id IS NOT NULL")
        .collect()
    )
    expected = _python_asof(
        [(k, ts, i) for k, ts, i in left_rows],
        [(k, ts, i) for k, ts, i in right_rows],
    )
    assert got == expected


def test_asof_rejects_bad_tiebreak_column(spark):
    """A typo'd (or left-only) right_tiebreak must fail fast with a clear
    ValueError at the call site — not an opaque AnalysisException from
    deep inside the window sort, or a silent sort on a left column."""
    import pytest

    left = spark.createDataFrame(
        [(1, _BASE, 10)], "key int, l_ts timestamp, l_id int"
    )
    right = spark.createDataFrame(
        [(1, _BASE, 20)], "key int, r_ts timestamp, r_id int"
    )
    for bad in ("r_idd", "l_id"):  # typo; left-only column
        with pytest.raises(ValueError, match="right_tiebreak"):
            asof_join(
                left, right, on="key", left_ts="l_ts", right_ts="r_ts",
                right_cols=["r_id"], right_tiebreak=bad,
            )


def test_asof_tolerance_boundary_is_inclusive(spark, tmp_path):
    """j8b law on planted events: a signup EXACTLY 24h before the
    purchase matches (inclusive bound); one microsecond older comes
    back NULL; a user with no signup at all survives with NULL."""
    import datetime as dt
    import os

    from ssn_college_software_architecture_assignments__spark.operators.asof import (
        j8b_asof_join_tolerance,
    )

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    day = dt.timedelta(hours=24)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: signup exactly 24h before purchase -> matches
        (10, t0 - day, 1, "signup", 0.0, "{}"),
        (11, t0, 1, "purchase", 5.0, "{}"),
        # user 2: signup 24h + 1us before purchase -> NULL
        (20, t0 - day - us, 2, "signup", 0.0, "{}"),
        (21, t0, 2, "purchase", 7.0, "{}"),
        # user 3: purchase with no signup -> NULL, row still present
        (31, t0, 3, "purchase", 9.0, "{}"),
        # user 4: two signups at the same ts -> highest id wins
        (40, t0 - us, 4, "signup", 0.0, "{}"),
        (41, t0 - us, 4, "signup", 0.0, "{}"),
        (42, t0, 4, "purchase", 3.0, "{}"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {
        r["purchase_id"]: r["asof_signup_id"]
        for r in j8b_asof_join_tolerance(spark, sf_dir).collect()
    }
    assert got == {11: 10, 21: None, 31: None, 42: 41}


def test_nearest_asof_tie_and_direction_laws(spark, tmp_path):
    """j8c laws on a handmade event stream: equal-distance ties prefer
    the backward match, a forward-only user matches forward, a
    signup-free user keeps NULLs, and gaps are exact microseconds."""
    import datetime as dt
    import os

    from ssn_college_software_architecture_assignments__spark.operators.asof import (
        j8c_asof_join_nearest,
    )

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        # user 1: signup at 100 and 300; purchase at 200 -> equidistant
        # (100s each) -> backward (signup_id 11) must win
        (11, ts(100), 1, "signup", 0.0, ""),
        (12, ts(300), 1, "signup", 0.0, ""),
        (13, ts(200), 1, "purchase", 9.0, ""),
        # user 2: only a FUTURE signup; purchase matches forward
        (21, ts(500), 2, "signup", 0.0, ""),
        (22, ts(450), 2, "purchase", 9.0, ""),
        # user 3: no signup at all
        (31, ts(700), 3, "purchase", 9.0, ""),
        # user 4: strictly nearer forward signup must beat farther backward
        (41, ts(0), 4, "signup", 0.0, ""),
        (42, ts(1000), 4, "signup", 0.0, ""),
        (43, ts(990), 4, "purchase", 9.0, ""),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {r["purchase_id"]: r for r in j8c_asof_join_nearest(spark, sf_dir).collect()}
    assert got[13]["nearest_signup_id"] == 11
    assert got[13]["direction"] == "backward"
    assert got[13]["gap_us"] == 100_000_000
    assert got[22]["nearest_signup_id"] == 21
    assert got[22]["direction"] == "forward"
    assert got[22]["gap_us"] == 50_000_000
    assert got[31]["nearest_signup_id"] is None
    assert got[31]["direction"] is None
    assert got[31]["gap_us"] is None
    assert got[43]["nearest_signup_id"] == 42
    assert got[43]["direction"] == "forward"
    assert got[43]["gap_us"] == 10_000_000


def test_j8c_nearest_property_vs_python_spec(spark, tmp_path):
    """Property: on arbitrary small event logs (multi-signup users,
    signup-less purchases, exact cross-direction distance ties, equal
    timestamps within a side), j8c reproduces an independent Python
    statement of its declared law — nearest by |gap|, backward
    preferred on equal distance, within-side ties to the latest
    backward / earliest forward signup id."""
    import datetime
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ssn_college_software_architecture_assignments__spark.operators.asof import (
        j8c_asof_join_nearest,
    )

    base = datetime.datetime(2024, 1, 1)
    counter = [0]

    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 2),                # user
                st.sampled_from(["purchase", "signup"]),
                st.integers(0, 40),               # second offset (ties likely)
            ),
            min_size=1,
            max_size=14,
        )
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(events):
        counter[0] += 1
        sf_dir = str(tmp_path / f"e{counter[0]}")
        os.makedirs(sf_dir, exist_ok=True)
        rows = [
            (i, base + datetime.timedelta(seconds=sec), u, etype, 1.0, "{}")
            for i, (u, etype, sec) in enumerate(events)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

        got = {
            r["purchase_id"]: (
                r["nearest_signup_id"], r["direction"], r["gap_us"]
            )
            for r in j8c_asof_join_nearest(spark, sf_dir).collect()
        }

        purchases = [(i, u, sec) for i, (u, t, sec) in enumerate(events)
                     if t == "purchase"]
        signups = [(i, u, sec) for i, (u, t, sec) in enumerate(events)
                   if t == "signup"]
        assert set(got) == {i for i, _, _ in purchases}
        for pid, pu, psec in purchases:
            back = [(sid, ssec) for sid, su, ssec in signups
                    if su == pu and ssec <= psec]
            fwd = [(sid, ssec) for sid, su, ssec in signups
                   if su == pu and ssec > psec]
            # backward leg: latest ts, then largest id; forward leg:
            # earliest ts, then smallest id (the negated-axis tiebreak
            # maximizes neg_id = minimizes signup_id)
            b = max(back, key=lambda t: (t[1], t[0])) if back else None
            f = min(fwd, key=lambda t: (t[1], t[0])) if fwd else None
            if b is None and f is None:
                assert got[pid] == (None, None, None), pid
                continue
            d_b = (psec - b[1]) * 1_000_000 if b else None
            d_f = (f[1] - psec) * 1_000_000 if f else None
            if b is not None and (f is None or d_b <= d_f):
                assert got[pid] == (b[0], "backward", d_b), pid
            else:
                assert got[pid] == (f[0], "forward", d_f), pid

    run()


def test_j8c_forward_same_ts_tie_takes_smallest_id(spark, tmp_path):
    """Deterministic probe of the sub-case random generation rarely
    hits: two forward signups at the SAME timestamp must resolve to the
    smallest signup_id (the negated-axis tiebreak maximizes neg_id),
    mirroring the backward side's largest-id law."""
    import datetime

    from ssn_college_software_architecture_assignments__spark.operators.asof import (
        j8c_asof_join_nearest,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # purchase at t=0; two signups both at t=10 (forward tie);
        # plus a backward pair: two signups both at t=-10 for user 2
        (0, base, 1, "purchase", 1.0, "{}"),
        (5, base + datetime.timedelta(seconds=10), 1, "signup", 1.0, "{}"),
        (6, base + datetime.timedelta(seconds=10), 1, "signup", 1.0, "{}"),
        (1, base, 2, "purchase", 1.0, "{}"),
        (7, base - datetime.timedelta(seconds=10), 2, "signup", 1.0, "{}"),
        (8, base - datetime.timedelta(seconds=10), 2, "signup", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path / "tie")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")
    got = {r["purchase_id"]: (r["nearest_signup_id"], r["direction"])
           for r in j8c_asof_join_nearest(spark, sf_dir).collect()}
    assert got[0] == (5, "forward")   # smallest id wins the forward tie
    assert got[1] == (8, "backward")  # largest id wins the backward tie
