"""Invariant tests for the X6 curation family (value-exactness is the
DuckDB oracle's job; these assert the properties that make the operators
correct *as pipeline stages*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.registry import all_queries
from tests.conftest import SF_DIR_001


def test_split_is_stable_under_corpus_growth(spark):
    """A document's split must not change when the corpus shrinks/grows —
    the property randomSplit and row_number-modulo both lack."""
    full = all_queries()["x6_deterministic_split"](spark, SF_DIR_001)
    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    half_ids = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    full_assign = {r["doc_id"]: r["split"] for r in full.collect()}
    # Recompute on the half corpus: assignments must agree exactly.
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        split_bucket,
    )

    half = half_ids.select(
        "doc_id",
        F.when(split_bucket("doc_id") < 80, "train")
        .when(split_bucket("doc_id") < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    for r in half.collect():
        assert full_assign[r["doc_id"]] == r["split"]
    # And the rates are roughly 80/10/10.
    counts = {r["split"]: r["n"] for r in full.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert 0.70 < counts["train"] / total < 0.90


def test_sequence_packing_respects_budget_boundaries(spark):
    packed = all_queries()["x6b_sequence_packing"](spark, SF_DIR_001)
    rows = packed.orderBy("source", "doc_id").collect()
    # Recompute greedily per source: chunk_id must equal floor(prefix/2048).
    cum: dict[str, int] = {}
    for r in rows:
        start = cum.get(r["source"], 0)
        assert r["chunk_id"] == start // 2048, r
        cum[r["source"]] = start + r["n_tokens"]


def test_mixture_sample_is_subset_at_target_rates(spark):
    sampled = all_queries()["x6c_mixture_sample"](spark, SF_DIR_001)
    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en keeps everything; zh keeps ~10%.
    assert got["en"] == base["en"]
    assert got.get("zh", 0) < base["zh"] * 0.35
    # Sampling is a subset: every sampled id exists in the corpus.
    assert sampled.join(docs, "doc_id", "left_anti").count() == 0


def test_decontamination_never_flags_benchmark_docs(spark):
    flagged = all_queries()["x6d_decontamination"](spark, SF_DIR_001)
    rows = flagged.collect()
    assert all(r["train_doc_id"] % 50 != 0 for r in rows)
    assert all(r["n_shared_grams"] >= 1 and r["n_benchmark_docs"] >= 1 for r in rows)


def test_normalized_decontamination_catches_case_mangled_copy(spark):
    """The reason x6d2 exists: a benchmark passage smuggled into a train
    doc with case flips, inserted punctuation, and doubled spaces shares
    ZERO raw-cased 8-grams (x6d misses it) but must be flagged by the
    normalized-gram variant."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        contamination_report,
    )

    passage = "the quick brown fox jumps over the lazy dog near the river bank"
    mangled = "The QUICK  brown fox, jumps over -- the LAZY dog near the River bank"
    filler = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (50, passage),                       # benchmark doc (id % 50 == 0)
            (51, f"{filler} {mangled}"),         # train doc w/ mangled copy
            (52, " ".join(f"u{i}" for i in range(30))),  # clean train doc
        ],
        "doc_id long, text string",
    )
    raw = contamination_report(docs).collect()
    assert raw == [], f"raw-gram variant unexpectedly flagged: {raw}"
    norm = {r["train_doc_id"]: r for r in contamination_report(docs, normalize=True).collect()}
    assert 51 in norm and norm[51]["n_benchmark_docs"] == 1
    assert 52 not in norm
