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


def test_document_writer_fallback_only_on_missing_datasource(spark, tmp_path, sf_dir):
    """The mongodb->file fallback fires ONLY when the data source is
    absent from the classpath (nothing reached a database); any other
    failure must raise rather than risk double-loading a batch."""
    import pytest as _pytest

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        DocumentWriter,
        _is_missing_datasource_error,
    )

    df = spark.read.parquet(f"{sf_dir}/region.parquet")

    # connector jar absent in this sandbox -> classified as missing,
    # fallback="json" lands files losslessly
    w = DocumentWriter(
        "region", str(tmp_path), mongo_uri="mongodb://127.0.0.1:1/x"
    )
    path = w.write(df, mode="overwrite")
    assert not path.startswith("mongodb://")
    assert spark.read.json(path).count() == df.count()

    # same condition with fallback="error" must raise instead
    strict = DocumentWriter(
        "region2", str(tmp_path), mongo_uri="mongodb://127.0.0.1:1/x",
        fallback="error",
    )
    with _pytest.raises(Exception):
        strict.write(df, mode="overwrite")

    # classifier: only missing-datasource shapes match
    assert _is_missing_datasource_error(Exception("DATA_SOURCE_NOT_FOUND: mongodb"))
    assert _is_missing_datasource_error(
        Exception("java.lang.ClassNotFoundException: mongodb.DefaultSource")
    )
    assert not _is_missing_datasource_error(Exception("connection refused"))
    assert not _is_missing_datasource_error(Exception("auth failed"))
