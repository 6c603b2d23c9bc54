"""Raw-sink + validated-insert tests (reference README.md:26-28,33)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.sources.sink import (
    AUDIT_COLUMN,
    raw_sink,
    raw_table_path,
    validated_insert,
)


def test_raw_sink_adds_audit_column(spark, tmp_path, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    raw_sink(df, "region", str(tmp_path), mode="overwrite")
    back = spark.read.parquet(raw_table_path(str(tmp_path), "region"))
    assert AUDIT_COLUMN in back.columns
    assert back.count() == df.count()
    assert back.filter(F.col(AUDIT_COLUMN).isNull()).count() == 0


def test_raw_sink_append_accumulates_batches(spark, tmp_path, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    raw_sink(df, "region", str(tmp_path), mode="append")
    raw_sink(df, "region", str(tmp_path), mode="append")
    back = spark.read.parquet(raw_table_path(str(tmp_path), "region"))
    assert back.count() == 2 * df.count()
    # re-runs must be distinguishable by ingestion timestamp (README.md:28)
    assert back.select(AUDIT_COLUMN).distinct().count() >= 1


def test_validated_insert_consistent(spark, tmp_path, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    report = validated_insert(df, "nation", str(tmp_path), mode="overwrite")
    assert report.consistent
    assert report.n_transformed == df.count() == report.n_written
