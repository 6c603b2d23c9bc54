"""Raw-sink + validated-insert tests (reference README.md:26-28,33)."""

from __future__ import annotations

import os

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


def _register_fake_docstore(spark):
    """A Python Data Source registered as ``fakedocstore``: accepts the
    exact option surface DocumentWriter hands to format("mongodb")
    (connection.uri / database / collection), lands every partition's
    rows as JSON lines under <landing>/<database>/<collection>/ — a
    document-store double that makes the mongodb branch executable in a
    sandbox without the connector jar."""
    import json as _json
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Commit(WriterCommitMessage):
        def __init__(self, n):
            self.n = n

    class FakeDocStoreWriter(DataSourceWriter):
        def __init__(self, options):
            uri = options.get("connection.uri", "")
            if not uri.startswith("mongodb://"):
                raise ValueError(f"bad connection.uri: {uri!r}")
            self.dir = os.path.join(
                uri.removeprefix("mongodb://").split("/", 1)[1],
                options["database"],
                options["collection"],
            )

        def write(self, rows):
            os.makedirs(self.dir, exist_ok=True)
            n = 0
            with open(
                os.path.join(self.dir, f"part-{_uuid.uuid4().hex}.jsonl"),
                "w",
                encoding="utf-8",
            ) as fh:
                for row in rows:
                    fh.write(_json.dumps(row.asDict(recursive=True), default=str))
                    fh.write("\n")
                    n += 1
            return _Commit(n)

    class FakeDocStore(DataSource):
        @classmethod
        def name(cls):
            return "fakedocstore"

        def writer(self, schema, overwrite):
            return FakeDocStoreWriter(dict(self.options))

    spark.dataSource.register(FakeDocStore)


def test_document_writer_mongodb_branch_executes(spark, tmp_path, sf_dir):
    """Execute the format(...) branch of DocumentWriter for real — not
    just its error classifier — against a registered document-store
    double that receives the same options the MongoDB connector would:
    every document must land, keyed by database/collection, and the
    writer must report the mongodb:// target, not a file fallback."""
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        AUDIT_COLUMN as AUDIT,
        DocumentWriter,
        to_documents,
    )

    _register_fake_docstore(spark)
    landing = tmp_path / "docstore"
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    docs = to_documents(
        region, id_col="r_regionkey", nests={"meta": ["r_name"]}
    )
    w = DocumentWriter(
        "region",
        str(tmp_path),
        mongo_uri=f"mongodb://fake-host/{landing}",
        database="etl",
        format_name="fakedocstore",
    )
    target = w.write(docs, mode="append")
    assert target == "mongodb://etl/region_raw"

    import json as _json

    collection = landing / "etl" / "region_raw"
    landed = []
    for part in collection.glob("part-*.jsonl"):
        for line in part.read_text().splitlines():
            landed.append(_json.loads(line))
    assert {d["_id"] for d in landed} == {
        r["r_regionkey"] for r in region.collect()
    }
    assert all(AUDIT in d and "meta" in d for d in landed)


def test_document_sink_fallback_is_mongoimport_safe(spark, tmp_path, sf_dir):
    """mongoimport-style validation of the JSON fallback: every line of
    every part file parses as a standalone strict-JSON object, _id is
    present and globally unique, and keys are BSON-safe (no dots, no
    leading '$', non-empty) at every nesting level."""
    import json as _json

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        document_sink,
        to_documents,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(200)
    docs = to_documents(
        cust,
        id_col="c_custkey",
        nests={"profile": ["c_name", "c_mktsegment"], "account": ["c_acctbal"]},
    )
    path = document_sink(docs, "customers", str(tmp_path), mode="overwrite")

    def assert_bson_safe(obj):
        for k, v in obj.items():
            assert k and "." not in k and not k.startswith("$"), f"unsafe key {k!r}"
            if isinstance(v, dict):
                assert_bson_safe(v)

    ids = []
    n_lines = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(root, fname), encoding="utf-8") as fh:
                for line in fh:
                    doc = _json.loads(line)  # strict JSON: no NaN/Infinity
                    assert isinstance(doc, dict)
                    assert "_id" in doc
                    assert_bson_safe(doc)
                    ids.append(doc["_id"])
                    n_lines += 1
    assert n_lines == docs.count()
    assert len(ids) == len(set(ids)), "duplicate _id in fallback files"


def test_mongodb_connector_roundtrip_jar_present(spark, tmp_path, sf_dir):
    """Real-connector integration: runs only where the MongoDB Spark
    connector jar AND a reachable server are provided via
    SSN_MONGO_TEST_URI (CI with a mongo service). Proves the identical
    DocumentWriter call lands documents in a live collection."""
    import pytest as _pytest

    uri = os.environ.get("SSN_MONGO_TEST_URI")
    if not uri:
        _pytest.skip("SSN_MONGO_TEST_URI not set (no connector jar/server here)")
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        DocumentWriter,
        to_documents,
    )

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    docs = to_documents(region, id_col="r_regionkey", nests={"meta": ["r_name"]})
    w = DocumentWriter(
        "region_it", str(tmp_path), mongo_uri=uri, fallback="error"
    )
    target = w.write(docs, mode="overwrite")
    assert target.startswith("mongodb://")
    back = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", "etl")
        .option("collection", "region_it_raw")
        .load()
    )
    assert back.count() == region.count()


def test_cdc_apply_round_trip_reconstructs_target(spark):
    """s18 law on a handmade pair exercising every change type at once:
    apply(A, diff(A, B)) must equal B exactly, and the no-op diff
    apply(A, diff(A, A)) must equal A (empty delta, nothing touched)."""
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        cdc_apply,
        snapshot_diff,
    )

    a = spark.createDataFrame(
        [(1, 10.0, "p1"), (2, 20.0, "p2"), (3, 30.0, "p3"), (4, None, "p4")],
        "k long, price double, prio string",
    )
    b = spark.createDataFrame(
        [
            (1, 10.0, "p1"),      # unchanged
            (2, 25.0, "p2"),      # update (value)
            (4, 40.0, "p4"),      # update (NULL -> value)
            (5, 50.0, "p5"),      # insert          (3 deleted)
        ],
        "k long, price double, prio string",
    )
    keys, cols = ["k"], ["price", "prio"]

    delta = snapshot_diff(a, b, keys, cols)
    got = {
        r["k"]: (r["price"], r["prio"])
        for r in cdc_apply(a, delta, keys, cols).collect()
    }
    want = {r["k"]: (r["price"], r["prio"]) for r in b.collect()}
    assert got == want

    noop = snapshot_diff(a, a, keys, cols)
    assert noop.count() == 0
    same = {
        r["k"]: (r["price"], r["prio"])
        for r in cdc_apply(a, noop, keys, cols).collect()
    }
    assert same == {r["k"]: (r["price"], r["prio"]) for r in a.collect()}

    # NULL-key round trip (review-caught): the anti-join must match the
    # NULL key null-safely or the update would duplicate the row
    an = spark.createDataFrame([(None, 10.0, "p")], "k long, price double, prio string")
    bn = spark.createDataFrame([(None, 20.0, "p")], "k long, price double, prio string")
    out = cdc_apply(an, snapshot_diff(an, bn, keys, cols), keys, cols).collect()
    assert [(r["k"], r["price"]) for r in out] == [(None, 20.0)]

    # DELETE of a NULL-key row (round-10 property-test catch): presence
    # must come from explicit markers, not key nullity — the old code
    # classified this as an all-NULL insert and left a ghost row
    empty = spark.createDataFrame([], "k long, price double, prio string")
    d = snapshot_diff(an, empty, keys, cols)
    assert [r["change_type"] for r in d.collect()] == ["delete"]
    assert cdc_apply(an, d, keys, cols).count() == 0


def test_dynamic_partition_overwrite_touches_only_target_day(spark, tmp_path):
    """s19 mechanism: after a dynamic-mode overwrite of one partition,
    every OTHER partition's parquet files are bit-identical (not
    rewritten), the target day carries the corrected rows — and the
    static-mode hazard is real: the same write without the option
    truncates the whole lake down to the one incoming partition."""
    import glob
    import hashlib
    import os

    from pyspark.sql import functions as F

    src = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 3:02d}", float(i)) for i in range(30)],
        "event_id long, event_date string, value double",
    )

    def land(path):
        src.write.partitionBy("event_date").mode("overwrite").parquet(path)

    def file_hashes(path):
        return {
            os.path.relpath(p, path): hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{path}/event_date=*/*.parquet")
        }

    lake = str(tmp_path / "lake_dyn")
    land(lake)
    before = file_hashes(lake)
    fixed = src.filter(F.col("event_date") == "2024-01-02").withColumn(
        "value", F.col("value") * 10
    )
    (
        fixed.write.partitionBy("event_date").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(lake)
    )
    after = file_hashes(lake)
    untouched_before = {k: v for k, v in before.items() if "2024-01-02" not in k}
    untouched_after = {k: v for k, v in after.items() if "2024-01-02" not in k}
    assert untouched_before == untouched_after  # other days not rewritten
    got = spark.read.parquet(lake)
    assert got.filter(F.col("event_date") == "2024-01-02").agg(
        F.sum("value")
    ).first()[0] == sum(i * 10.0 for i in range(30) if i % 3 == 1)
    assert got.count() == 30

    # the hazard the dynamic mode exists to prevent:
    lake2 = str(tmp_path / "lake_static")
    land(lake2)
    fixed2 = src.filter(F.col("event_date") == "2024-01-02")
    fixed2.write.partitionBy("event_date").mode("overwrite").parquet(lake2)
    assert spark.read.parquet(lake2).count() == 10  # 20 rows silently gone


def test_s20_merge_rewrites_only_touched_partitions(spark, sf_dir):
    """s20 mechanism: the partition-scoped CDC merge leaves every
    untouched month's parquet files bit-identical on disk, rewrites
    exactly the three months the delta touches, and the merged lake
    equals gen1 row-for-row (the diff/apply round-trip law, now
    through the partitioned writer)."""
    import glob
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ssn_college_software_architecture_assignments__spark.catalog import (
        Catalog,
    )
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        _s20_generations,
        cdc_apply_partitioned,
        snapshot_diff,
    )

    orders = Catalog(spark, sf_dir).orders
    gen0, gen1 = _s20_generations(orders)
    base = tempfile.mkdtemp(prefix="ssn_s20_test_")
    lake = f"{base}/lake"
    gen0.write.partitionBy("order_month").mode("overwrite").parquet(lake)

    def file_hashes(path):
        return {
            os.path.relpath(p, path): hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{path}/order_month=*/*.parquet")
        }

    before = file_hashes(lake)
    cols = ["order_month", "totalprice", "priority"]
    delta = snapshot_diff(gen0, gen1, key_cols=["o_orderkey"], compare_cols=cols)
    merged = cdc_apply_partitioned(
        spark, lake, delta, key_cols=["o_orderkey"], compare_cols=cols,
        part_col="order_month",
    )
    staging = f"{base}/staging"
    merged.write.mode("overwrite").parquet(staging)
    (
        spark.read.parquet(staging)
        .write.partitionBy("order_month").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(lake)
    )
    after = file_hashes(lake)

    touched = ("1996-03", "1996-07", "1996-11")
    untouched_before = {
        k: v for k, v in before.items()
        if not any(m in k for m in touched)
    }
    untouched_after = {
        k: v for k, v in after.items()
        if not any(m in k for m in touched)
    }
    assert untouched_before == untouched_after
    assert untouched_before, "fixture must have untouched months"
    for m in touched:
        assert any(m in k for k in after), m

    cols_all = ["o_orderkey", "order_month", "totalprice", "priority"]
    got = spark.read.parquet(lake).select(*cols_all)
    want = gen1.select(*cols_all)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_s21_merge_on_read_never_rewrites_base(spark, sf_dir):
    """s21 mechanism: after two delta commits, every base parquet file
    is bit-identical on disk (merge-on-read's defining property), and
    the resolved view surfaces the three-deep version stack plus the
    delta-2 inserts."""
    import glob
    import hashlib
    import os

    from pyspark.sql import functions as F

    from ssn_college_software_architecture_assignments__spark.catalog import (
        Catalog,
    )
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        merge_on_read_view,
        s21_land_generations,
    )

    import tempfile

    orders = Catalog(spark, sf_dir).orders
    lake = f"{tempfile.mkdtemp(prefix='ssn_s21_test_')}/lake"

    def hashes(sub):
        return {
            os.path.relpath(p, lake): hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{lake}/{sub}/*.parquet")
        }

    # land via the OPERATOR's own single-sited fixture builder, hash
    # every landed generation, then commit one MORE delta — no prior
    # file may change (delta commits never touch base or older deltas)
    s21_land_generations(orders, lake)
    before = {sub: hashes(sub) for sub in ("base", "delta_1", "delta_2")}
    assert all(before.values()), "all generations must exist"
    orders.filter(F.col("o_orderkey") % 30 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") + 300.0, 2).alias("totalprice"),
        F.lit(4).alias("version"),
    ).write.parquet(f"{lake}/delta_3")
    after = {sub: hashes(sub) for sub in ("base", "delta_1", "delta_2")}
    assert after == before, "prior generations must not be rewritten"

    got = {
        r["o_orderkey"]: r["version"]
        for r in merge_on_read_view(
            spark, lake, key_cols=["o_orderkey"], version_col="version"
        ).collect()
    }
    inserts = [k for k in got if k >= 200000000]
    assert inserts and all(got[k] == 3 for k in inserts)
    sample = sorted(k for k in got if k < 200000000)[:200]
    for k in sample:
        want = (4 if k % 30 == 0 else
                3 if k % 20 == 0 else
                2 if k % 10 == 0 else 1)
        assert got[k] == want, k


def test_cdc_round_trip_property_on_random_snapshots(spark):
    """Property: for arbitrary snapshot pairs (random overlap of keys —
    including a NULL key — random NULL-bearing values, empty sides),
    apply(A, diff(A, B)) == B exactly. The handmade test pins each
    change type once; this pins the law under random mixtures."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        cdc_apply,
        snapshot_diff,
    )

    key_pool = st.sampled_from([None, 1, 2, 3, 4])
    val = st.one_of(st.none(), st.integers(0, 3).map(float))

    snapshot = st.dictionaries(key_pool, st.tuples(val, val), max_size=5)

    @given(a=snapshot, b=snapshot)
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(a, b):
        schema = "k long, price double, prio double"
        df_a = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in a.items()], schema
        )
        df_b = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in b.items()], schema
        )
        keys, cols = ["k"], ["price", "prio"]
        delta = snapshot_diff(df_a, df_b, keys, cols)
        got = {
            r["k"]: (r["price"], r["prio"])
            for r in cdc_apply(df_a, delta, keys, cols).collect()
        }
        assert got == b

    run()


# ---- S7d: mongomock writer contract --------------------------------------------


def test_mongomock_upsert_id_collision_last_wins(spark, tmp_path):
    """The PyMongo contract on handmade docs: batch 2 re-sends two _ids
    with new payloads and adds one new _id — the collection holds the
    union of ids with last-wins payloads, and the manifest's
    validated-insert counts (s8's invariant) record 1 insert + 2
    updates against a prior size of 3."""
    from ssn_college_software_architecture_assignments__spark.sources.mongomock import (
        COLLECTION_FILE,
        read_manifest,
        register_mongomock,
    )

    register_mongomock(spark)
    coll = str(tmp_path / "things_raw")
    schema = "_id long, payload string"
    b1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema)
    b2 = spark.createDataFrame([(2, "B"), (3, "C"), (4, "d")], schema)
    b1.write.format("mongomock").mode("overwrite").option("path", coll).save()
    b2.write.format("mongomock").mode("append").option("path", coll).save()
    back = {
        r["_id"]: r["payload"]
        for r in spark.read.schema(schema).json(f"{coll}/{COLLECTION_FILE}").collect()
    }
    assert back == {1: "a", 2: "B", 3: "C", 4: "d"}
    m = read_manifest(coll)
    assert (m["n_prior"], m["n_inserted"], m["n_updated"], m["n_total"]) == (
        3, 1, 2, 4,
    )


def test_mongomock_rejects_bson_illegal_keys_and_null_ids(spark, tmp_path):
    """Contract teeth: a dotted key (anywhere, including nested) or a
    null _id must fail the WRITE, not land corrupt documents."""
    import pytest

    from pyspark.sql import functions as F
    from ssn_college_software_architecture_assignments__spark.sources.mongomock import (
        register_mongomock,
    )

    register_mongomock(spark)
    dotted = spark.range(3).select(
        F.col("id").alias("_id"), F.lit(1.5).alias("total.price")
    )
    with pytest.raises(Exception, match="BSON-illegal"):
        dotted.write.format("mongomock").mode("overwrite").option(
            "path", str(tmp_path / "bad1")
        ).save()
    null_id = spark.createDataFrame([(None, "x")], "_id long, v string")
    with pytest.raises(Exception, match="non-null _id"):
        null_id.write.format("mongomock").mode("overwrite").option(
            "path", str(tmp_path / "bad2")
        ).save()


def test_mongomock_upsert_order_is_partition_then_row(spark, tmp_path):
    """Determinism law the oracle leans on: when one batch carries the
    same _id twice in different partitions, the HIGHER partition id
    wins (ordered-bulk semantics over partition order then row order)."""
    from ssn_college_software_architecture_assignments__spark.sources.mongomock import (
        COLLECTION_FILE,
        register_mongomock,
    )

    register_mongomock(spark)
    coll = str(tmp_path / "dup_raw")
    schema = "_id long, v string"
    # repartitionByRange on v puts "early" in a lower partition than "late"
    df = spark.createDataFrame([(7, "early"), (7, "late")], schema).repartitionByRange(
        2, "v"
    )
    df.write.format("mongomock").mode("overwrite").option("path", coll).save()
    back = spark.read.schema(schema).json(f"{coll}/{COLLECTION_FILE}").collect()
    assert len(back) == 1 and back[0]["v"] == "late"


def test_mongomock_rejects_illegal_keys_inside_arrays_and_merges_numeric_ids(
    spark, tmp_path
):
    """Review-caught contract gaps: (1) a BSON-illegal key nested in an
    ARRAY of documents must fail the write like any other level; (2)
    the _id index compares numbers BY VALUE — an append delivering 5.0
    where long 5 exists updates in place, never duplicates."""
    import pytest

    from pyspark.sql import functions as F
    from ssn_college_software_architecture_assignments__spark.sources.mongomock import (
        COLLECTION_FILE,
        read_manifest,
        register_mongomock,
    )

    register_mongomock(spark)
    nested = spark.range(2).select(
        F.col("id").alias("_id"),
        F.array(F.struct(F.lit(1.5).alias("a.b"))).alias("items"),
    )
    with pytest.raises(Exception, match="BSON-illegal"):
        nested.write.format("mongomock").mode("overwrite").option(
            "path", str(tmp_path / "bad_arr")
        ).save()

    coll = str(tmp_path / "num_raw")
    spark.createDataFrame([(5, "int")], "_id long, v string").write.format(
        "mongomock"
    ).mode("overwrite").option("path", coll).save()
    spark.createDataFrame([(5.0, "float")], "_id double, v string").write.format(
        "mongomock"
    ).mode("append").option("path", coll).save()
    back = spark.read.json(f"{coll}/{COLLECTION_FILE}").collect()
    assert len(back) == 1 and back[0]["v"] == "float"
    m = read_manifest(coll)
    assert (m["n_inserted"], m["n_updated"]) == (0, 1)


def test_mongomock_map_keys_checked_per_row_and_typed_at_plan_time(
    spark, tmp_path
):
    """The data-dependent half of the key contract: map KEY NAMES are
    only knowable per row, so a dotted map key must fail at write time
    (pinning that has_map wiring routes rows through check_bson_keys),
    while a non-string map KEY TYPE is schema-fixed and must fail at
    plan time with the contract's ValueError, not an executor
    TypeError."""
    import pytest

    from pyspark.sql import functions as F
    from ssn_college_software_architecture_assignments__spark.sources.mongomock import (
        COLLECTION_FILE,
        register_mongomock,
    )

    register_mongomock(spark)
    bad_key = spark.range(2).select(
        F.col("id").alias("_id"),
        F.create_map(F.lit("a.b"), F.lit(1)).alias("attrs"),
    )
    with pytest.raises(Exception, match="BSON-illegal"):
        bad_key.write.format("mongomock").mode("overwrite").option(
            "path", str(tmp_path / "badmapkey")
        ).save()
    bad_type = spark.range(2).select(
        F.col("id").alias("_id"),
        F.create_map(F.lit(1), F.lit("x")).alias("attrs"),
    )
    with pytest.raises(Exception, match="must be\\s+strings"):
        bad_type.write.format("mongomock").mode("overwrite").option(
            "path", str(tmp_path / "badmaptype")
        ).save()
    ok = spark.range(2).select(
        F.col("id").alias("_id"),
        F.create_map(F.lit("k"), F.lit("v")).alias("attrs"),
    )
    coll = str(tmp_path / "okmap")
    ok.write.format("mongomock").mode("overwrite").option("path", coll).save()
    assert spark.read.json(f"{coll}/{COLLECTION_FILE}").count() == 2


def test_s24_ledger_sink_equals_source_and_rerun_is_noop(spark, sf_dir):
    """s24 safety laws: after the three passes the sink holds exactly
    the source events (no loss, no double-load), an idle rerun
    processes nothing, and a late-arriving batch is picked up alone."""
    from ssn_college_software_architecture_assignments__spark.catalog import Catalog
    from ssn_college_software_architecture_assignments__spark.scratch import (
        scratch_dir,
    )
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        ingest_new_batches,
    )

    ev = Catalog(spark, sf_dir).events.select("event_id", "event_type")
    base = scratch_dir(prefix="ssn_landing_test_")
    ledger = f"{base}/ledger.json"
    sink = f"{base}/sink"
    for g in (0, 1):
        ev.filter(F.col("event_id") % 2 == g).write.parquet(f"{base}/batch_{g}")
    r1 = ingest_new_batches(spark, base, ledger, sink)
    assert r1["n_files_new"] == 2
    assert ingest_new_batches(spark, base, ledger, sink) == {
        "n_files_new": 0,
        "n_rows_new": 0,
    }
    back = spark.read.parquet(f"{sink}/*")
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0
    # a late batch (planted re-ids so rows are new) is discovered alone
    ev.limit(5).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    ).write.parquet(f"{base}/batch_late")
    r3 = ingest_new_batches(spark, base, ledger, sink)
    assert (r3["n_files_new"], r3["n_rows_new"]) == (1, 5)


def test_mongomock_reader_splits_and_round_trips(spark, tmp_path):
    """s7e's reader contract on a handmade collection: a floored
    rowsPerPartition must yield a multi-partition scan whose union is
    exactly the written documents (no row lost or duplicated at split
    boundaries), including nested and array fields."""
    from pyspark.sql import functions as F
    from ssn_college_software_architecture_assignments__spark.sources.mongomock import (
        register_mongomock,
    )

    register_mongomock(spark)
    coll = str(tmp_path / "rt_raw")
    src = spark.range(100).select(
        F.col("id").alias("_id"),
        F.struct(
            (F.col("id") * 2).alias("double_id"),
            F.array(F.col("id") + 1, F.col("id") + 2).alias("neighbors"),
        ).alias("payload"),
    )
    src.write.format("mongomock").mode("overwrite").option("path", coll).save()
    ddl = "_id BIGINT, payload STRUCT<double_id: BIGINT, neighbors: ARRAY<BIGINT>>"
    back = (
        spark.read.format("mongomock")
        .schema(ddl)
        .option("path", coll)
        .option("rowsPerPartition", "7")
        .load()
    )
    assert back.rdd.getNumPartitions() > 1
    got = {
        r["_id"]: (r["payload"]["double_id"], tuple(r["payload"]["neighbors"]))
        for r in back.collect()
    }
    assert got == {i: (2 * i, (i + 1, i + 2)) for i in range(100)}


def test_s25_psi_drift_audit_planted_shift(spark):
    """s25 laws on handmade generations: (a) an IDENTICAL second
    generation scores PSI exactly 0 on every column and flags nothing
    (the integer-unit flooring makes this exact, not epsilon-small);
    (b) a hard planted shift — all of gen1's mass pushed above gen0's
    top quartile cutpoint — drives that column past the declared
    threshold and flags it, while an untouched categorical stays
    stable."""
    import pyspark.sql.functions as F

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        _S25_THRESHOLD_SCALED,
        psi_drift_audit,
    )

    gen0 = spark.range(1000).select(
        F.col("id").cast("double").alias("v"),
        (F.col("id") % 3).cast("int").alias("cat"),
    )

    # (a) identical generations: PSI == 0 exactly
    same = psi_drift_audit(
        gen0, gen0, {"v": "v"}, {"cat": F.col("cat").cast("int")}
    ).collect()
    assert all(r["term_scaled"] == 0 for r in same)
    assert all(r["psi_scaled"] == 0 for r in same)
    assert not any(r["drifted"] for r in same)

    # (b) planted shift: every gen1 value lands in gen0's top bucket
    gen1 = spark.range(1000).select(
        (F.col("id").cast("double") + 10_000).alias("v"),
        (F.col("id") % 3).cast("int").alias("cat"),
    )
    shifted = psi_drift_audit(
        gen0, gen1, {"v": "v"}, {"cat": F.col("cat").cast("int")}
    ).collect()
    by_col = {}
    for r in shifted:
        by_col.setdefault(r["col_name"], []).append(r)
    assert all(r["drifted"] for r in by_col["v"])
    assert by_col["v"][0]["psi_scaled"] >= _S25_THRESHOLD_SCALED
    # gen1's mass is entirely in bin 4 (above every gen0 cutpoint)
    top = {r["bin_id"]: r["n_gen1"] for r in by_col["v"]}
    assert top[4] == 1000 and top[1] == top[2] == top[3] == 0
    assert not any(r["drifted"] for r in by_col["cat"])
    assert all(r["psi_scaled"] == 0 for r in by_col["cat"])

    # (c) a caller mistake (no audited columns at all) surfaces as an
    # explicit ValueError, not an opaque IndexError from parts[0]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one audited column"):
        psi_drift_audit(gen0, gen0, {}, {})


def test_s26_time_travel_hand_arithmetic(spark):
    """s26 law on 40 planted orders (o_totalprice = key): v1 serves 40
    keys at 100k cents each; v2 reprices keys 10/20/30/40 (+100.00 ->
    4 updates, +40000 cents); v3 re-reprices 20/40 (+200 replaces +100
    -> 2 updates, +20000) and inserts shifted keys 17/34 (+5100) ->
    42 keys. Every number is hand-derived."""
    from pyspark.sql import functions as F  # noqa: F401
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        s26_time_travel_read,
    )
    import ssn_college_software_architecture_assignments__spark.sources.sink as smod

    df = spark.createDataFrame(
        [(k, float(k)) for k in range(1, 41)],
        "o_orderkey long, o_totalprice double",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.orders = df

    orig = smod.Catalog
    smod.Catalog = _Cat
    try:
        rows = {
            r["as_of_version"]: r
            for r in s26_time_travel_read(spark, "x").collect()
        }
    finally:
        smod.Catalog = orig

    base = 100 * sum(range(1, 41))  # 82_000 cents
    assert rows[1]["n_keys"] == 40 and rows[1]["total_cents"] == base
    assert rows[1]["n_updated"] == 0 and rows[1]["n_inserted"] == 0
    assert rows[2]["n_keys"] == 40
    assert rows[2]["total_cents"] == base + 4 * 10_000
    assert rows[2]["n_updated"] == 4 and rows[2]["n_inserted"] == 0
    assert rows[3]["n_keys"] == 42
    assert rows[3]["total_cents"] == base + 4 * 10_000 + 2 * 10_000 + 5_100
    assert rows[3]["n_updated"] == 2 and rows[3]["n_inserted"] == 2
