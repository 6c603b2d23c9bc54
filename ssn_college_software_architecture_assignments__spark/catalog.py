"""Fixture/table catalog.

The driver's verifiable data lake is ten parquet tables per scale factor
(``TESTDATA.md``): a TPC-H-ish star schema (region nation customer supplier
part orders lineitem) plus events / documents / embeddings. The reference's
``<connector>_raw`` collections (``/root/reference/README.md:27``) map to
tables in this catalog; analytics queries address them by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy accessor for the per-scale-factor parquet tables.

    ``Catalog(spark, sf_dir).lineitem`` returns the lineitem DataFrame;
    reads are plain ``spark.read.parquet`` so Catalyst retains full
    predicate pushdown / column pruning / partition pruning on every scan.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        tune_session(spark)
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown fixture table: {name!r}")
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: tuple[str, ...] = TABLE_NAMES) -> None:
        """Register every table as a temp view so ``spark.sql`` queries and
        DataFrame queries see identical data (SURVEY.md §3.2 E2)."""
        for name in names:
            self.table(name).createOrReplaceTempView(name)
