"""Connector fault-matrix tests (FIXTURES.md B2 / reference README.md:32):
invalid responses, empty payloads, rate limits, connectivity, auth."""

from __future__ import annotations

import pytest

from ssn_college_software_architecture_assignments__spark.sources.mock_api import (
    MockApiServer,
)
from ssn_college_software_architecture_assignments__spark.sources.rest import (
    read_rest,
    register_rest_source,
)

RECORDS = [{"id": i, "name": f"item{i}", "price": i * 1.5} for i in range(250)]
SCHEMA = "id BIGINT, name STRING, price DOUBLE"


def _read(spark, server, **opts):
    register_rest_source(spark)
    reader = (
        spark.read.format("restapi")
        .option("base_url", server.base_url)
        .option("endpoint", "items")
        .option("schema", SCHEMA)
        .option("page_size", "100")
    )
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    return reader.load()


def test_happy_path_pagination(spark):
    with MockApiServer(RECORDS) as server:
        df = _read(spark, server)
        rows = df.collect()
    assert len(rows) == 250
    assert {r["id"] for r in rows} == set(range(250))
    # page-range parallelism: 3 pages / 4-per-partition -> >= 1 partition
    assert df.rdd.getNumPartitions() >= 1


def test_partition_per_page_range(spark):
    with MockApiServer(RECORDS) as server:
        df = _read(spark, server, pages_per_partition=1)
        assert df.rdd.getNumPartitions() == 3  # 250 records / 100 per page
        assert df.count() == 250


def test_empty_payload_terminates(spark):
    with MockApiServer([]) as server:
        df = _read(spark, server)
        assert df.count() == 0


def test_retry_on_500(spark):
    with MockApiServer(RECORDS[:50], fail_first_n=2, fail_mode="500") as server:
        df = _read(spark, server)
        assert df.count() == 50


def test_retry_on_429_rate_limit(spark):
    with MockApiServer(RECORDS[:50], fail_first_n=2, fail_mode="429") as server:
        df = _read(spark, server)
        assert df.count() == 50


def test_retry_on_invalid_json(spark):
    with MockApiServer(RECORDS[:50], fail_first_n=1, fail_mode="garbage") as server:
        df = _read(spark, server)
        assert df.count() == 50


def test_auth_token_from_env(spark, monkeypatch):
    # read_rest resolves auth_env on the DRIVER, so a live env change is
    # honored (worker processes only inherit the JVM-launch environment).
    monkeypatch.setenv("TEST_API_TOKEN", "sekrit")
    with MockApiServer(RECORDS[:10], require_token="sekrit") as server:
        df = read_rest(
            spark, server.base_url, "items", SCHEMA,
            page_size="100", auth_env="TEST_API_TOKEN",
        )
        assert df.count() == 10


def test_missing_auth_env_fails_fast(spark, monkeypatch):
    monkeypatch.delenv("NO_SUCH_TOKEN", raising=False)
    with MockApiServer(RECORDS[:10], require_token="x") as server:
        with pytest.raises(Exception, match="auth env var"):
            read_rest(
                spark, server.base_url, "items", SCHEMA,
                page_size="100", auth_env="NO_SUCH_TOKEN",
            ).collect()


def test_cursor_pagination_walks_chain(spark):
    with MockApiServer(RECORDS, cursor_mode=True) as server:
        df = _read(spark, server, pagination="cursor")
        rows = df.collect()
    assert {r["id"] for r in rows} == set(range(250))
    assert df.rdd.getNumPartitions() == 1  # cursor chains are serial


def test_cursor_pagination_with_retries(spark):
    with MockApiServer(
        RECORDS[:60], cursor_mode=True, fail_first_n=2, fail_mode="500"
    ) as server:
        df = _read(spark, server, pagination="cursor", page_size="25")
        assert df.count() == 60


def test_streaming_rest_incremental_reruns_exactly_once(spark, tmp_path):
    """The scheduled-rerun connector model (reference README.md:28): each
    availableNow run ingests only pages beyond the committed offset;
    re-runs after exhaustion add nothing; no duplicates ever."""
    ckpt, out_dir = str(tmp_path / "ckpt"), str(tmp_path / "out")
    totals = []
    with MockApiServer(RECORDS) as server:
        register_rest_source(spark)
        for _ in range(4):
            stream = (
                spark.readStream.format("restapi")
                .option("base_url", server.base_url)
                .option("endpoint", "items")
                .option("schema", SCHEMA)
                .option("page_size", "50")
                .option("stream_pages_per_batch", "2")
                .load()
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            rows = spark.read.parquet(out_dir).collect()
            totals.append(len(rows))
            assert len({r["id"] for r in rows}) == len(rows)  # no dupes
    assert totals == [100, 200, 250, 250]


def test_missing_fields_become_null(spark):
    ragged = [{"id": 1, "name": "a", "price": 1.0}, {"id": 2}]  # schema drift
    with MockApiServer(ragged) as server:
        rows = {r["id"]: r for r in _read(spark, server).collect()}
    assert rows[2]["name"] is None and rows[2]["price"] is None
