"""Plan-shape and invariant tests for the lake-layout operators:
bucketed co-located join (j11), date-partitioned pruning (s11), and
incremental dedup (x1b). These assert the SCALE claims, not just values
(the value check is the DuckDB oracle in the registry)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.registry import all_queries
from tests.conftest import SF_DIR_001


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange_below_smj(spark):
    df = all_queries()["j11_bucketed_join"](spark, SF_DIR_001)
    plan = _executed_plan(df)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # The ONLY exchange allowed is the final group-by on o_orderpriority;
    # neither join input may reshuffle.
    exchanges = re.findall(r"Exchange hashpartitioning\(([a-z_]+)", plan)
    assert exchanges == ["o_orderpriority"], plan
    # And the values still match the plain (shuffling) join.
    smj = {r["o_orderpriority"]: (r["n_items"], r["revenue"]) for r in df.collect()}
    li = spark.read.parquet(f"{SF_DIR_001}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR_001}/orders.parquet")
    plain = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )
    expected = {r["o_orderpriority"]: (r["n_items"], r["revenue"]) for r in plain.collect()}
    assert smj == expected


def test_partitioned_lake_prunes_to_three_days(spark):
    df = all_queries()["s11_partitioned_lake"](spark, SF_DIR_001)
    plan = _executed_plan(df)
    # Partition pruning happens at the directory listing: the scan must
    # carry the range in PartitionFilters and select only 3 of 30 days.
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None, plan
    filters = m.group(1)
    assert ">= 2024-01-08" in filters and "<= 2024-01-10" in filters, filters
    # The predicate must be a partition filter, NOT a data filter: nothing
    # may remain to push to row groups (date never reaches file contents).
    assert re.search(r"DataFilters: \[\]", plan), plan


def test_compaction_reduces_file_count_losslessly(spark, tmp_path):
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        compact_parquet,
    )

    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    frag = str(tmp_path / "frag")
    docs.repartition(16).write.parquet(frag)

    def _n_parquet(d):
        import os

        return sum(
            f.endswith(".parquet") for _, _, fs in os.walk(d) for f in fs
        )

    assert _n_parquet(frag) == 16
    compacted = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, compacted)
    assert _n_parquet(compacted) == n < 16
    back = spark.read.parquet(compacted)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    assert back.select("doc_id").subtract(docs.select("doc_id")).count() == 0


def test_incremental_dedup_admits_only_novel_fingerprints(spark):
    admitted = all_queries()["x1b_incremental_dedup"](spark, SF_DIR_001)
    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    corpus_fp = {
        r["fp"]
        for r in docs.filter(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
        .collect()
    }
    rows = admitted.collect()
    # No admitted fingerprint may already exist in the corpus.
    assert all(r["fingerprint"] not in corpus_fp for r in rows)
    # Within-batch duplicates collapse to one admit (min doc_id wins).
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps))
    assert all(r["admit_doc_id"] % 10 == 0 for r in rows)


def test_zorder_layout_clusters_both_dimensions(spark):
    """Z-ordering exists to keep per-file min/max ranges narrow on BOTH
    dims; a sort on user_id alone would leave y ranges at full width.
    Morton-contiguous files cover ~1/n_files of the 2-D key space, so
    each dim's per-file range must sit well below its global extent.
    Needs sf0.01's 20 files — at sf0.001 there are only 2, too few for
    the interleave to separate either dimension (measured: ~34% of the
    global extent per file on both dims at sf0.01)."""
    from tests.conftest import SF_DIR_01

    stats = all_queries()["s16_zorder_layout"](spark, SF_DIR_01).collect()
    assert sum(r["n_rows"] for r in stats) == 10_000  # sf0.01 events
    g_user = max(r["max_user"] for r in stats) - min(r["min_user"] for r in stats)
    g_y = max(r["max_y"] for r in stats) - min(r["min_y"] for r in stats)
    avg_user = sum(r["max_user"] - r["min_user"] for r in stats) / len(stats)
    avg_y = sum(r["max_y"] - r["min_y"] for r in stats) / len(stats)
    assert avg_user < 0.6 * g_user
    assert avg_y < 0.6 * g_y


def test_morton_terms_match_independent_bit_interleave(spark):
    """S16 gate the oracle cannot provide: _morton_terms is shared by the
    Spark query AND its DuckDB oracle, so a formula bug would reproduce
    identically on both sides and still pass the sweep. Compare against
    an independent Python bit-interleave for exhaustive-ish (x, y)
    coverage, and confirm bijectivity on the 8-bit domain."""
    import random

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        _morton_terms,
    )

    def py_morton(x, y):
        m = 0
        for i in range(8):
            m |= ((x >> i) & 1) << (2 * i + 1)
            m |= ((y >> i) & 1) << (2 * i)
        return m

    rnd = random.Random(16)
    pairs = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    pairs += [(rnd.randrange(256), rnd.randrange(256)) for _ in range(64)]
    df = spark.createDataFrame(pairs, "x int, y int").withColumn(
        "morton", _morton_terms("x", "y", sql=False)
    )
    got = {(r["x"], r["y"]): r["morton"] for r in df.collect()}
    for (x, y), m in got.items():
        assert m == py_morton(x, y), (x, y, m)
    # distinct pairs -> distinct codes on the 8-bit domain (bijectivity)
    assert len(set(got.values())) == len(got)


def test_wap_red_audit_blocks_publish_and_keeps_staging(spark, tmp_path):
    """s17's failure leg: a staged load with a DUPLICATE key must fail
    the audit, publish nothing, and leave the staging directory intact
    for forensics; a clean load publishes atomically."""
    import os

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        write_audit_publish,
    )

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, v string")
    dup = clean.unionAll(
        spark.createDataFrame([(2, "b2")], "doc_id long, v string")
    )

    good = str(tmp_path / "good")
    r1 = write_audit_publish(clean, "doc_id", good)
    assert r1["checks_passed"] and r1["published"]
    assert os.path.isdir(f"{good}/published")
    assert not os.path.isdir(f"{good}/staging")
    assert spark.read.parquet(f"{good}/published").count() == 2

    bad = str(tmp_path / "bad")
    r2 = write_audit_publish(dup, "doc_id", bad)
    assert not r2["checks_passed"] and not r2["published"]
    assert not os.path.isdir(f"{bad}/published")
    assert os.path.isdir(f"{bad}/staging")      # preserved for forensics
    assert r2["n_staged"] == 3 and r2["n_distinct_keys"] == 2


def test_wap_repeat_load_replaces_published(spark, tmp_path):
    """A second green load into the SAME base must publish (old table
    renamed aside, new one promoted) instead of crashing on rename."""
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        write_audit_publish,
    )

    base = str(tmp_path / "serving")
    v1 = spark.createDataFrame([(1, "a")], "doc_id long, v string")
    v2 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, v string")
    assert write_audit_publish(v1, "doc_id", base)["published"]
    assert write_audit_publish(v2, "doc_id", base)["published"]
    assert spark.read.parquet(f"{base}/published").count() == 2
    assert spark.read.parquet(f"{base}/published_prev").count() == 1


def test_s23_vacuum_preserves_serving_and_honors_retention(spark, tmp_path):
    """Vacuum safety theorem on a handmade 3-generation stack: the
    serving read (newest generation) is byte-identical across a
    keep_last=1 vacuum, exactly the older directories disappear, and
    keep_last=0 is refused (serving always needs a generation)."""
    import os

    import pytest

    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        vacuum_generations,
    )

    base = str(tmp_path / "stack")
    for g, rows in enumerate([[(1, "a")], [(1, "b"), (2, "c")], [(2, "d")]]):
        spark.createDataFrame(rows, "k long, v string").write.parquet(
            f"{base}/gen_{g}"
        )
    before = sorted(map(tuple, spark.read.parquet(f"{base}/gen_2").collect()))

    stats = vacuum_generations(base, keep_last=1)
    assert stats["n_deleted"] == 2 and stats["n_kept"] == 1
    assert stats["bytes_reclaimed"] > 0
    assert sorted(os.listdir(base)) == ["gen_2"]
    after = sorted(map(tuple, spark.read.parquet(f"{base}/gen_2").collect()))
    assert before == after

    # idempotent: nothing left to reclaim
    assert vacuum_generations(base, keep_last=1)["n_deleted"] == 0
    with pytest.raises(ValueError):
        vacuum_generations(base, keep_last=0)
