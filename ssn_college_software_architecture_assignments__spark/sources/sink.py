"""Load stage: the ``<connector>_raw`` sink with audit column and insert
validation (SURVEY.md §2.1 S7-S8).

Reference contract re-expressed:
- one table per connector named ``<connector>_raw``
  (/root/reference/README.md:26-27,98);
- every record carries an ingestion timestamp ``_ingested_at`` "to
  support audits or updates" (README.md:28,99);
- the load validates consistent insertion — rows written == rows
  transformed (README.md:33,46,106) — via ``df.observe`` metrics on the
  write job (no second scan of the input).

The verifiable sink in this environment is a parquet table directory; on
a real deployment the same DataFrame writes through any Spark-supported
format (including the MongoDB Spark connector) unchanged.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

AUDIT_COLUMN = "_ingested_at"


def raw_table_path(base_dir: str, connector: str) -> str:
    return os.path.join(base_dir, f"{connector}_raw")


def raw_sink(
    df: DataFrame,
    connector: str,
    base_dir: str,
    mode: str = "append",
) -> str:
    """Write ``df`` to the connector's raw table with the audit column.

    Append mode by default: re-runs accumulate and are distinguishable by
    ``_ingested_at`` (README.md:28). Writes are partitioned by ingest date
    so downstream reads partition-prune to the batches they care about —
    the 100 TB layout decision."""
    path = raw_table_path(base_dir, connector)
    audited = df.withColumn(AUDIT_COLUMN, F.current_timestamp()).withColumn(
        "_ingest_date", F.current_date()
    )
    audited.write.mode(mode).partitionBy("_ingest_date").parquet(path)
    return path


@dataclass(frozen=True)
class InsertReport:
    connector: str
    path: str
    n_transformed: int
    n_written: int

    @property
    def consistent(self) -> bool:
        return self.n_transformed == self.n_written


def validated_insert(
    df: DataFrame,
    connector: str,
    base_dir: str,
    mode: str = "append",
) -> InsertReport:
    """Write + verify consistent insertion (README.md:33,106).

    The transformed-row count comes from an ``observe`` metric collected
    DURING the write job (no extra scan of the input); the written count
    is a read-back of the sink filtered to THIS batch's ``_batch_id`` —
    an end-to-end check that catches sink-side loss even under append
    mode with concurrent historical batches. The read-back prunes to
    today's ``_ingest_date`` partitions before filtering, so at 100 TB
    it scans one day, not the table."""
    import uuid

    obs = Observation(f"{connector}_insert")
    path = raw_table_path(base_dir, connector)
    batch_id = uuid.uuid4().hex
    audited = (
        df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        .withColumn(AUDIT_COLUMN, F.current_timestamp())
        .withColumn("_batch_id", F.lit(batch_id))
        .withColumn("_ingest_date", F.current_date())
    )
    audited.write.mode(mode).partitionBy("_ingest_date").parquet(path)
    n_transformed = int(obs.get["n_rows"])
    n_written = (
        df.sparkSession.read.parquet(path)
        .filter(F.col("_ingest_date") == F.current_date())
        .filter(F.col("_batch_id") == batch_id)
        .count()
    )
    return InsertReport(connector, path, n_transformed, n_written)


# Registry entries -------------------------------------------------------------

_S7_ORACLE = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


@register("s7_raw_sink_roundtrip", oracle=_S7_ORACLE, tags=("S7",))
def s7_raw_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E->T->L->readback: land documents into ``docs_raw`` with the audit
    column, read the sink back, and return the payload columns. Proves the
    sink is lossless; the audit column is checked by tests (it is
    nondeterministic so it stays out of the oracle projection)."""
    docs = Catalog(spark, sf_dir).documents
    base = tempfile.mkdtemp(prefix="ssn_raw_sink_")
    raw_sink(docs, "docs", base, mode="overwrite")
    back = spark.read.parquet(raw_table_path(base, "docs"))
    return back.select("doc_id", "text", "lang", "source", "n_chars")


_S8_ORACLE = """
SELECT count(*) AS n_transformed, count(*) AS n_written, true AS consistent
FROM documents
"""


@register("s8_validated_insert", oracle=_S8_ORACLE, tags=("S8",))
def s8_validated_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-consistency validation report as a 1-row DataFrame."""
    docs = Catalog(spark, sf_dir).documents
    base = tempfile.mkdtemp(prefix="ssn_validated_insert_")
    report = validated_insert(docs, "docs", base, mode="overwrite")
    return spark.createDataFrame(
        [(report.n_transformed, report.n_written, report.consistent)],
        "n_transformed long, n_written long, consistent boolean",
    )
