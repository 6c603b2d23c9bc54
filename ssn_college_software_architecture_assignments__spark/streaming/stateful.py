"""Custom stateful streaming (SURVEY.md §2.9 T6).

``applyInPandasWithState``: arbitrary per-key state machines over a
stream — the operator for connector-style incremental logic that window
aggregates can't express (running per-user counters, anomaly flags,
cross-batch accumulation).

T6b adds the Spark 4 successor, ``transformWithStateInPandas`` (arbitrary
state API v2: named state variables on a StatefulProcessor handle,
timers, TTL). Its Python worker requires protobuf, which this container
does not ship, so the processor logic is fully implemented and
unit-tested against a fake handle, while the registry query and the
end-to-end test gate on protobuf availability (same environmental
pattern as the MongoDB wire leg and the PIL decode path).
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from ..session import default_parallelism
from .core import run_to_memory, stream_events

# transformWithStateInPandas serializes state over protobuf; probe once.
# find_spec on a submodule imports the parent package, so a missing
# "google" namespace raises instead of returning None.
try:
    HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAS_PROTOBUF = False

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _accumulate(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) carried across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


_T6_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
"""


@register("t6_stateful_per_key", oracle=_T6_ORACLE, tags=("T6",))
def t6_stateful_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key state over a real stream: per-user event count and
    value total accumulated in GroupState. The cross-batch state machine
    itself isn't SQL-expressible, but its END state over a bounded fixture
    is the per-user batch aggregate — which is what the oracle checks."""
    ev = stream_events(spark, sf_dir)
    stateful = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(stateful, "update").orderBy("user_id")


# T6b — the Spark 4 native stateful API (state API v2) -------------------------

try:  # the class exists in pyspark 4 regardless; runtime needs protobuf
    from pyspark.sql.streaming import StatefulProcessor
except ImportError:  # pragma: no cover - pyspark < 4
    StatefulProcessor = object  # type: ignore[assignment,misc]


class AccumulateProcessor(StatefulProcessor):
    """Per-user running (count, sum) as a v2 StatefulProcessor: the same
    cross-batch accumulation as :func:`_accumulate`, expressed with a
    named ValueState on the handle instead of a positional GroupState —
    the v2 surface also offers ListState/MapState, timers, and TTL that
    v1 cannot express. ``handleInputRows`` is plain Python over pandas
    batches, so its batch-equivalence law is unit-testable with a fake
    handle even where the protobuf-backed runtime is unavailable."""

    def init(self, handle) -> None:
        self.state = handle.getValueState("acc", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self.state.get() if self.state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self.state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def t6b_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6's accumulation on the Spark 4 native stateful API
    (``transformWithStateInPandas``); end state over a bounded fixture
    equals the per-user batch aggregate, same oracle as t6."""
    ev = stream_events(spark, sf_dir)
    stateful = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            AccumulateProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
    return run_to_memory(stateful, "update").orderBy("user_id")


if HAS_PROTOBUF:  # pragma: no cover - protobuf absent in this container
    register("t6b_transform_with_state", oracle=_T6_ORACLE, tags=("T6",))(
        t6b_transform_with_state
    )


# T6c — event-time TTL state expiry (the timer face of stateful streaming) ------
#
# The wrinkle the plain accumulator (t6) never exercises: state that
# must EXPIRE — the session-garbage-collection half of every long-lived
# keyed pipeline (inactive-user eviction, abandoned-cart emission,
# billing-session close). Expressed on the runnable v1 API with
# EventTimeTimeout: each (user, day) group keeps (n_events, last_us)
# state and arms an event-time timer at last-activity + TTL; when the
# watermark passes the timer the group fires ONCE, emits its summary,
# and removes its state. availableNow runs the no-new-data flush batch,
# so the final watermark is max(ts) - delay and the emitted set is
# deterministic:
#
#     expired iff  last_ms + TTL_MS < max_ms - DELAY_MS      (strict <)
#
# Three law details pinned empirically against this Spark build
# (tests/test_streaming.py::test_ttl_timeout_strictness_is_exclusive):
# - the timeout fires iff timeoutTimestamp < watermark (STRICT — a
#   timer equal to the watermark does NOT fire);
# - watermark arithmetic is in MILLISECONDS with each µs event time
#   floored (us DIV 1000), so the oracle must floor before comparing;
# - TTL/delay are sized so nothing can fire before the flush batch
#   (TTL > span/2 + delay), which keeps re-created-key double-emission
#   impossible and the output a pure function of the final watermark.
#
# Scale: state is one 2-long tuple per live (user, day); timers evict
# it, so the store holds only the active horizon — the property that
# keeps a 100 TB keyed stream's state store bounded.
#
# MODE ASSUMPTION (load-bearing for _T6C_ORACLE): the closed form below
# is exact for the availableNow harness, where ALL data lands in one
# batch and the final flush batch runs every timer against the final
# watermark. In a long-lived multi-batch stream the watermark CLAMP
# (an expired-on-arrival key re-arms at wm+1) only emits if the
# watermark advances AGAIN; a stream that ends immediately after a
# clamped re-arm holds a key that satisfies last+TTL < final-wm yet
# never fired. The operator is still correct (no timer may be armed in
# the past); the ORACLE's closed form is what is mode-dependent.

_T6C_TTL_MS = 15 * 24 * 3600 * 1000  # 15 days — > half the 30-day span
_T6C_DELAY = "1 hour"
_T6C_DELAY_MS = 3_600_000

_T6C_OUTPUT_SCHEMA = "user_id bigint, day string, n_events bigint, last_us bigint"
_T6C_STATE_SCHEMA = "n bigint, last_us bigint"

_T6C_ORACLE = f"""
WITH e AS (
  SELECT user_id,
         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
wm AS (SELECT max(us) // 1000 - {_T6C_DELAY_MS} AS w_ms FROM e),
g AS (
  SELECT user_id, day,
         CAST(count(*) AS BIGINT) AS n_events,
         max(us) AS last_us
  FROM e GROUP BY 1, 2
)
SELECT g.user_id, g.day, g.n_events, g.last_us
FROM g, wm
WHERE g.last_us // 1000 + {_T6C_TTL_MS} < wm.w_ms
ORDER BY user_id, day
"""


def _ttl_expire(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-(user, day) TTL state machine: accumulate (n, last_us), arm
    the event-time timer at last + TTL, emit the summary exactly once
    when the timer fires, then drop the state."""
    if state.hasTimedOut:
        n, last_us = state.get
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "day": [key[1]],
                "n_events": [n],
                "last_us": [last_us],
            }
        )
        state.remove()
    else:
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            last_us = max(last_us, int(pdf["us"].max()))
        state.update((n, last_us))
        # timer in ms (floor) — the watermark clock's own unit. Clamped
        # one past the CURRENT watermark: if a stale key is refreshed in
        # a later micro-batch after the watermark has already overtaken
        # last + TTL, an unclamped setTimeoutTimestamp would sit below
        # the watermark and Spark throws; the clamp re-arms validly and
        # the key then fires at the next watermark advance (single-data-
        # batch availableNow runs never hit the clamp — watermark is
        # still 0 while the only data batch processes).
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + _T6C_TTL_MS, wm_ms + 1))


@register("t6c_state_ttl_expiry", oracle=_T6C_ORACLE, tags=("T6",))
def t6c_state_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactive-group expiry over a real stream: every (user, day)
    group whose last activity is more than TTL behind the final
    watermark fires its event-time timer in the flush batch and emits
    (n_events, last_us) exactly once — per-key state with TIMERS, the
    stateful-streaming face t6's plain accumulator can't express."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", _T6C_DELAY)
    keyed = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("us"),
        "ts",
    )
    expired = (
        keyed.groupBy("user_id", "day")
        .applyInPandasWithState(
            _ttl_expire,
            outputStructType=_T6C_OUTPUT_SCHEMA,
            stateStructType=_T6C_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    # ~40k (user, day) state keys, each its own per-key Python call in
    # BOTH the data batch and the timer flush batch — the per-key
    # Python work dominates, so spread the state stores over the
    # session's cores instead of the few-key default (r18, guide
    # §2.5/§4; scale-adaptive via SPARK_GRAFT_CPUS, identical rows).
    return run_to_memory(
        expired, "append", state_partitions=default_parallelism()
    ).orderBy("user_id", "day")


class TTLExpiryProcessor(StatefulProcessor):
    """The t6c law on the Spark 4 v2 surface: a named ValueState plus a
    REGISTERED TIMER per key (``handle.registerTimer`` /
    ``handleExpiredTimer`` — the API v1 approximates with its single
    implicit timeout). Same emission law as :func:`_ttl_expire`, which
    the law-sync pytest asserts row-for-row on a handmade two-batch
    sequence; runs end-to-end only where protobuf ships (same gate as
    :class:`AccumulateProcessor`)."""

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("acc", _T6C_STATE_SCHEMA)
        # the ACTUAL armed timer timestamp: a watermark-clamped timer
        # (see handleInputRows) can't be recomputed from last_us, and
        # v2 named timers need the exact old timestamp to delete when
        # re-arming — recomputing would leak the stale timer and
        # double-emit the key
        self.timer = handle.getValueState("armed", "t bigint")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, last_us = self.state.get() if self.state.exists() else (0, 0)
        old_timer = self.timer.get()[0] if self.timer.exists() else None
        for pdf in rows:
            n += len(pdf)
            last_us = max(last_us, int(pdf["us"].max()))
        self.state.update((n, last_us))
        # v2 timers are named per timestamp, not a single mutable slot:
        # re-arming means delete-old + register-new. Same watermark
        # clamp as _ttl_expire: a stale key refreshed after the
        # watermark passed last + TTL re-arms one past the watermark
        # instead of registering an already-expired timestamp.
        if old_timer is not None:
            self.handle.deleteTimer(old_timer)
        wm_ms = (
            timerValues.getCurrentWatermarkInMs() if timerValues is not None else 0
        )
        new_timer = max(last_us // 1000 + _T6C_TTL_MS, wm_ms + 1)
        self.handle.registerTimer(new_timer)
        self.timer.update((new_timer,))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        n, last_us = self.state.get()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "day": [key[1]],
                "n_events": [n],
                "last_us": [last_us],
            }
        )
        self.state.clear()
        self.timer.clear()

    def close(self) -> None:
        pass


def t6c_v2_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t6c on ``transformWithStateInPandas`` (protobuf-gated, like
    :func:`t6b_transform_with_state`); same oracle — the two APIs must
    agree on the expiry law."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", _T6C_DELAY)
    keyed = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("us"),
        "ts",
    )
    expired = (
        keyed.groupBy("user_id", "day")
        .transformWithStateInPandas(
            TTLExpiryProcessor(),
            outputStructType=_T6C_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
    return run_to_memory(expired, "append").orderBy("user_id", "day")


if HAS_PROTOBUF:  # pragma: no cover - protobuf absent in this container
    register("t6c_v2_transform_with_state", oracle=_T6C_ORACLE, tags=("T6",))(
        t6c_v2_transform_with_state
    )
