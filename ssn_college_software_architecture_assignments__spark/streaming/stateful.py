"""Custom stateful streaming (SURVEY.md §2.9 T6).

``applyInPandasWithState``: arbitrary per-key state machines over a
stream — the operator for connector-style incremental logic that window
aggregates can't express (running per-user counters, anomaly flags,
cross-batch accumulation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .core import run_to_memory, stream_events

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
