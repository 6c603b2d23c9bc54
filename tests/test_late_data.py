"""Out-of-order and late-data laws for the session paths (round-5 brief
item 6; SURVEY.md §5.2(4)-(5)).

Batch side (W6): gap-sessionization must be a pure function of the event
SET — hypothesis shuffles arrival order and the session assignment must
not move; an independent pure-Python reference implementation pins the
semantics themselves.

Stream side (T3/T4): a session_window aggregation must merge sessions
across micro-batches regardless of arrival order, and with a watermark in
append mode a row older than the persisted watermark must drop
deterministically — it can neither extend a sealed session nor surface as
a new one.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.operators.windows import (
    sessionize,
)

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = datetime(2024, 3, 1, 9, 0, 0)
GAP_MIN = 30

# (user_id, minutes-offset) pairs; offsets collide on purpose so ties
# (same user, same timestamp) are exercised — the event_id tiebreak must
# keep those deterministic too.
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 400)),
    min_size=1,
    max_size=24,
)


def _rows(pairs):
    return [
        (int(uid), int(i), BASE + timedelta(minutes=mins))
        for i, (uid, mins) in enumerate(pairs)
    ]


EVENT_SCHEMA = "user_id INT, event_id INT, ts TIMESTAMP"


def _collect_sessions(spark, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    return sorted(
        (r["user_id"], r["session_idx"], r["n_events"], r["session_start"],
         r["duration_sec"])
        for r in sessionize(df, gap_minutes=GAP_MIN).collect()
    )


@given(pairs=events_strategy, seed=st.integers(0, 2**32 - 1))
@SETTINGS
def test_sessionize_is_arrival_order_invariant(spark, pairs, seed):
    """W6 law: any permutation of the same event set yields byte-identical
    session assignments (late rows in a backfill can't shift sessions)."""
    rows = _rows(pairs)
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    assert _collect_sessions(spark, rows) == _collect_sessions(spark, shuffled)


def _python_sessions(rows):
    """Independent reference: sort each user's events by (ts, event_id),
    split where the gap exceeds GAP_MIN, report per-session stats."""
    by_user: dict[int, list] = {}
    for uid, eid, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        sessions: list[list] = []
        for ts, eid in evs:
            if sessions and (ts - sessions[-1][-1][0]) <= timedelta(minutes=GAP_MIN):
                sessions[-1].append((ts, eid))
            else:
                sessions.append([(ts, eid)])
        for idx, sess in enumerate(sessions, start=1):
            dur = (sess[-1][0] - sess[0][0]).total_seconds()
            out.append((uid, idx, len(sess), sess[0][0], round(dur, 3)))
    return sorted(out)


@given(pairs=events_strategy)
@SETTINGS
def test_sessionize_matches_python_reference(spark, pairs):
    """W6 semantics pin: the Spark islands idiom equals a brute-force
    pure-Python sessionizer on arbitrary event sets."""
    rows = _rows(pairs)
    assert _collect_sessions(spark, rows) == _python_sessions(rows)


# ---- streaming side -----------------------------------------------------------


def _write_batch(spark, src_dir: str, n: int, rows) -> None:
    # one parquet file per micro-batch; lexicographic names keep
    # FileStreamSource discovery order deterministic with
    # maxFilesPerTrigger=1
    df = spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)
    df.write.mode("append").parquet(f"{src_dir}/batch={n}")


def _run_session_stream(spark, src_dir: str, ckpt: str, out_dir: str,
                        watermark: str | None) -> None:
    """One availableNow run of a session_window count over the source dir
    into a parquet sink; restartable against the same checkpoint."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(EVENT_SCHEMA)
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/batch=*")
    )
    if watermark:
        ev = ev.withWatermark("ts", watermark)
    agg = ev.groupBy(
        F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_stream_sessions_merge_across_out_of_order_batches(spark, tmp_path, sf_dir):
    """T3 law: an event arriving in a LATER micro-batch that falls between
    two earlier events (no watermark yet sealed anything) must merge all
    three into one session — state-store session merge, not append."""
    from ssn_college_software_architecture_assignments__spark.streaming.core import (
        run_to_memory,
    )
    from pyspark.sql.types import StructType

    src = str(tmp_path / "src")
    t = lambda m: BASE + timedelta(minutes=m)
    _write_batch(spark, src, 1, [(1, 0, t(0)), (1, 1, t(20))])
    _write_batch(spark, src, 2, [(1, 2, t(10))])  # out-of-order arrival

    schema = StructType.fromDDL(EVENT_SCHEMA)
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/batch=*")
    )
    agg = ev.groupBy(
        F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = run_to_memory(
        agg.select("user_id", F.col("w.start").alias("s"),
                   F.col("w.end").alias("e"), "n_events"),
        "complete",
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_events"] == 3
    assert row["s"] == t(0)
    assert row["e"] == t(20 + GAP_MIN)


def test_stream_watermark_drops_late_row_deterministically(spark, tmp_path):
    """T4 law across a RESTART: run 1 advances the watermark far past a
    session and emits it (append mode); run 2 delivers a row older than
    the persisted watermark. The late row must drop: it cannot re-open
    the sealed session and must not surface as a new one."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    t = lambda m: BASE + timedelta(minutes=m)

    # run 1: a 2-event session plus a clock-advancer event 4h later;
    # final watermark = t(240) - 30min = t(210), sealing the session.
    _write_batch(spark, src, 1, [(1, 0, t(0)), (1, 1, t(5)), (2, 2, t(240))])
    _run_session_stream(spark, src, ckpt, out_dir, f"{GAP_MIN} minutes")
    first = spark.read.parquet(out_dir).collect()
    sealed = [(r["user_id"], r["n_events"]) for r in first]
    assert (1, 2) in sealed, f"sealed session missing from {sealed}"

    # run 2 (restart, same checkpoint): one row far below the watermark.
    # If it were admitted it would form its own below-watermark session
    # and be emitted by the flush batch — so emptiness of the delta IS
    # the drop proof.
    _write_batch(spark, src, 2, [(1, 3, t(60))])
    _run_session_stream(spark, src, ckpt, out_dir, f"{GAP_MIN} minutes")
    final = spark.read.parquet(out_dir).collect()
    assert len(final) == len(first), (
        f"late row was not dropped: {sorted((r['user_id'], r['n_events']) for r in final)}"
    )
    # re-running with the SAME late row again changes nothing (determinism)
    _write_batch(spark, src, 3, [(1, 4, t(60))])
    _run_session_stream(spark, src, ckpt, out_dir, f"{GAP_MIN} minutes")
    assert len(spark.read.parquet(out_dir).collect()) == len(final)


# ---- W7 funnel: property test vs a sequential-scan reference ------------------


def _python_funnels(rows, gap_min=30):
    """Brute-force reference for w7 semantics: per user, scan events in
    (ts, event_id) order keeping the latest view, the latest QUALIFYING
    click (one within gap of the view that was most recent at the
    click's position), and count purchases within gap of that click."""
    by_user = {}
    for eid, uid, etype, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    gap = timedelta(minutes=gap_min)
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        last_view = last_qclick = None
        n = 0
        for ts, _eid, etype in evs:
            if etype == "view":
                last_view = ts
            elif etype == "click":
                if last_view is not None and ts <= last_view + gap:
                    last_qclick = ts
            elif etype == "purchase":
                if last_qclick is not None and ts <= last_qclick + gap:
                    n += 1
        if n:
            out[uid] = n
    return out


funnel_events = st.lists(
    st.tuples(
        st.integers(0, 1),                             # user
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(0, 120),                           # minute offset
    ),
    min_size=1,
    max_size=24,
)


@given(events=funnel_events)
@SETTINGS
def test_funnel_matches_sequential_reference(spark, events, tmp_path_factory):
    """W7 semantics pin: the stacked conditional-last window funnel
    equals a per-user sequential scan on arbitrary event sets — ties at
    the same timestamp (broken by event_id in both), steps exactly at
    the 30-minute boundary, and interleaved step types included."""
    import os
    import uuid

    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w7_funnel_detect,
    )

    rows = [
        (int(i), int(uid), etype, BASE + timedelta(minutes=m))
        for i, (uid, etype, m) in enumerate(events)
    ]
    sf_dir = str(tmp_path_factory.mktemp("w7") / uuid.uuid4().hex[:8])
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(eid, ts, uid, etype, 1.0, "{}") for eid, uid, etype, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["user_id"]: r["n_funnels"]
        for r in w7_funnel_detect(spark, sf_dir).collect()
    }
    assert got == _python_funnels(rows)
