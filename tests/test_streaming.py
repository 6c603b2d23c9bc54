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
