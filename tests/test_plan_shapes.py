"""Physical-plan shape gates for the 100 TB posture.

These are the claims SCALE.md makes, asserted on the actual plans so a
refactor cannot silently regress them: broadcast discipline (small side
broadcasts, corpus never shuffles), no all-pairs joins anywhere in the
dedup/similarity family, and filter pushdown reaching the parquet scan.
"""

from __future__ import annotations

from ssn_college_software_architecture_assignments__spark.plans.pipeline import (
    explain_str,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    from ssn_college_software_architecture_assignments__spark import all_queries

    return explain_str(all_queries()[name](spark, SF))


def test_decontamination_broadcasts_benchmark_side(spark):
    plan = _plan(spark, "x6d_decontamination")
    assert "BroadcastExchange" in plan, "benchmark side must broadcast"
    assert "CartesianProduct" not in plan
    # the corpus side must not sort-merge against the benchmark grams
    assert "SortMergeJoin" not in plan


def test_minhash_banding_is_never_all_pairs(spark):
    plan = _plan(spark, "x2_minhash_near_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_banding_is_never_all_pairs(spark):
    plan = _plan(spark, "x2b2_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_is_never_all_pairs(spark):
    plan = _plan(spark, "x2f_embedding_neardup_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bruteforce_ann_broadcasts_queries_not_corpus(spark):
    # brute force IS all-pairs by definition — but the broadcast side
    # must be the 8 query vectors, never the corpus
    plan = _plan(spark, "x3_similarity_bruteforce")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_broadcast_join_has_no_fact_side_exchange(spark):
    plan = _plan(spark, "j6_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan.split("BroadcastHashJoin")[0]


def test_scan_filter_pushdown_reaches_parquet(spark):
    # representative predicate query: pushed filter visible at the scan
    plan = _plan(spark, "e2_sql_regional_revenue")
    assert "PushedFilters: [" in plan
    assert "ReadSchema" in plan
