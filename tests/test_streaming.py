"""Batch-stream equivalence tests (SURVEY.md §5.2(5))."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.catalog import Catalog
from ssn_college_software_architecture_assignments__spark.streaming.windows import (
    t1_tumbling_window,
    t5_streaming_dedup,
)


def test_tumbling_stream_equals_batch(spark, sf_dir):
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in t1_tumbling_window(spark, sf_dir).collect()
    }
    ev = Catalog(spark, sf_dir).events
    batch = {
        (r["ws"], r["event_type"]): (r["n"], r["sum_value"])
        for r in ev.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
        .collect()
    }
    assert streamed == batch


def test_streaming_dedup_removes_double_delivery(spark, sf_dir):
    deduped = {
        r["event_type"]: r["n_unique"]
        for r in t5_streaming_dedup(spark, sf_dir).collect()
    }
    ev = Catalog(spark, sf_dir).events
    expected = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert deduped == expected


def test_stream_and_batch_read_identical_timestamps(spark, sf_dir):
    """The streamed events table must carry exactly the batch Catalog's
    timestamps and types. Guards against parquet TIMESTAMP(NANOS) read
    drift across Spark builds — a declared-schema mismatch once silently
    compressed every streamed ts 1000x into 1970 (t9 overcounted 320x)."""
    from pyspark.sql import functions as F

    from ssn_college_software_architecture_assignments__spark.catalog import Catalog
    from ssn_college_software_architecture_assignments__spark.streaming.core import (
        run_to_memory,
        stream_events,
    )

    streamed = run_to_memory(
        stream_events(spark, sf_dir).select("event_id", "ts"), "append"
    )
    batch = Catalog(spark, sf_dir).events.select(
        "event_id", F.col("ts").alias("ts_batch")
    )
    # identical type after normalization (watermark-eligible TIMESTAMP)
    assert streamed.schema["ts"].dataType.typeName() == "timestamp"
    assert batch.schema["ts_batch"].dataType.typeName() == "timestamp"
    # identical values, row for row
    diff = (
        streamed.join(batch, "event_id")
        .filter(~F.col("ts").eqNullSafe(F.col("ts_batch")))
        .count()
    )
    assert diff == 0
    # and the values are in the fixture's real epoch, not 1970
    mn = streamed.agg(F.min("ts").alias("m")).collect()[0]["m"]
    assert mn.year >= 2000, f"stream timestamps collapsed to {mn}"
