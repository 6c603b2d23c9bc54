"""End-to-end Pipeline (E->T->L) test over the mock REST API."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.plans.pipeline import Pipeline
from ssn_college_software_architecture_assignments__spark.sources.mock_api import (
    MockApiServer,
)
from ssn_college_software_architecture_assignments__spark.sources.rest import (
    register_rest_source,
)
from ssn_college_software_architecture_assignments__spark.sources.sink import (
    AUDIT_COLUMN,
    raw_table_path,
)

RECORDS = [
    {"id": 1, "name": " alpha ", "price": 9.99},
    {"id": 2, "name": "beta", "price": None},
    {"id": 3, "name": None, "price": 3.5},
]


def test_pipeline_end_to_end(spark, tmp_path):
    register_rest_source(spark)
    with MockApiServer(RECORDS) as server:

        def source(s):
            df = (
                s.read.format("restapi")
                .option("base_url", server.base_url)
                .option("endpoint", "items")
                .option("schema", "id BIGINT, name STRING, price DOUBLE")
                .load()
            )
            df = df.cache()
            df.count()  # materialize while server is up
            return df

        pipe = (
            Pipeline(name="items", source=source)
            .transform(lambda df: df.na.drop(subset=["name"]))
            .transform(lambda df: df.withColumn("name", F.trim("name")))
            .transform(lambda df: df.na.fill({"price": 0.0}))
        )
        report = pipe.run(spark, str(tmp_path), mode="overwrite")

    assert report.consistent
    assert report.n_transformed == 2  # id=3 dropped (null name)
    back = spark.read.parquet(raw_table_path(str(tmp_path), "items"))
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "alpha"  # trimmed
    assert rows[2]["price"] == 0.0  # filled
    assert AUDIT_COLUMN in back.columns  # audit contract (README.md:28)
