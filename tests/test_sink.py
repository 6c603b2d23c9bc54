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


def test_quarantine_validity_is_shape_independent(spark):
    """s15's bad_props check must classify by JSON-object validity, not by
    the presence of any fixture-specific key: valid objects lacking 'k'
    pass; malformed / scalar / array JSON quarantine."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, '{"k": 5}'),
            (2, '{"other": 1}'),
            (3, "{broken"),
            (4, "3"),
            (5, "[1,2]"),
            (6, "{}"),
        ],
        "event_id long, props string",
    )
    bad = {
        r["event_id"]: r["bad"]
        for r in df.select(
            "event_id",
            F.from_json("props", "map<string,string>").isNull().alias("bad"),
        ).collect()
    }
    assert bad == {1: False, 2: False, 3: True, 4: True, 5: True, 6: False}
