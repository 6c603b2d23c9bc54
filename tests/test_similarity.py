"""Similarity-search tests: brute-force sanity + LSH recall bound."""

from __future__ import annotations

from ssn_college_software_architecture_assignments__spark.operators.similarity import (
    x3_similarity_bruteforce,
    x3b_similarity_lsh,
    x3d_similarity_ivf,
)


def test_bruteforce_topk_shape_and_bounds(spark, sf_dir):
    rows = x3_similarity_bruteforce(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        assert r["q_id"] != r["vec_id"]  # self excluded
        by_q.setdefault(r["q_id"], []).append(r["cos_sim"])
    for q, sims in by_q.items():
        assert len(sims) == 5
        assert sims == sorted(sims, reverse=True)


def test_lsh_results_subset_of_corpus_and_bucket_consistent(spark, sf_dir):
    bf = {(r["q_id"], r["vec_id"]): r["cos_sim"] for r in x3_similarity_bruteforce(spark, sf_dir).collect()}
    lsh_rows = x3b_similarity_lsh(spark, sf_dir).collect()
    assert lsh_rows, "LSH should return at least some neighbors"
    # every LSH sim must equal the exact sim for that pair (same math)
    for r in lsh_rows:
        key = (r["q_id"], r["vec_id"])
        if key in bf:
            assert abs(bf[key] - r["cos_sim"]) < 1e-9


def test_ivf_results_scored_exactly_and_ranked(spark, sf_dir):
    bf = {(r["q_id"], r["vec_id"]): r["cos_sim"] for r in x3_similarity_bruteforce(spark, sf_dir).collect()}
    ivf_rows = x3d_similarity_ivf(spark, sf_dir).collect()
    assert ivf_rows, "IVF should return neighbors"
    by_q = {}
    for r in ivf_rows:
        assert r["q_id"] != r["vec_id"]
        by_q.setdefault(r["q_id"], []).append(r["cos_sim"])
        key = (r["q_id"], r["vec_id"])
        if key in bf:  # same pair -> identical exact score
            assert abs(bf[key] - r["cos_sim"]) < 1e-9
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)
        assert len(sims) <= 5
