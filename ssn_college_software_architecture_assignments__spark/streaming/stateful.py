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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
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
