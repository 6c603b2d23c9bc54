"""Invariant tests for the X6 curation family (value-exactness is the
DuckDB oracle's job; these assert the properties that make the operators
correct *as pipeline stages*)."""

from __future__ import annotations

import pytest
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


def test_mixture_reweight_closed_form(spark, tmp_path):
    """x6e on a handmade skewed corpus: priorities src0=4/src1=2/else=1,
    weights checked in closed form, and the invariant that
    sum(actual_frac * weight) reconstructs the target distribution."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6e_mixture_reweight,
    )

    rows = (
        [(i, "t", "src0") for i in range(10)]
        + [(100 + i, "t", "src1") for i in range(5)]
        + [(200 + i, "t", "src2") for i in range(85)]
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: r for r in x6e_mixture_reweight(spark, sf_dir).collect()}

    # priorities: 4 + 2 + 1 = 7; actuals: 0.10 / 0.05 / 0.85
    assert got["src0"]["n_docs"] == 10
    assert got["src0"]["actual_frac"] == 0.1
    assert got["src0"]["target_frac"] == round(4 / 7, 6)
    assert got["src0"]["weight"] == round((4 / 7) / 0.10, 4)   # upsample 5.7x
    assert got["src1"]["weight"] == round((2 / 7) / 0.05, 4)
    assert got["src2"]["weight"] == round((1 / 7) / 0.85, 4)   # downsample
    assert got["src2"]["weight"] < 1.0 < got["src0"]["weight"]


def test_length_histogram_bins_are_exact(spark, tmp_path):
    """x6f bin edges on handmade lengths: documents with 1, 2, 3, 6, 7
    and 14 tokens land in bins [1,2], [3,6], [7,14] (n+1 in [2^b,
    2^(b+1))), and token shares sum to 1."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6f_length_histogram,
    )

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    lengths = [1, 2, 3, 6, 7, 14]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, words(n)) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["bin_id"]: r for r in x6f_length_histogram(spark, sf_dir).collect()}

    assert sorted(got) == [1, 2, 3]
    assert (got[1]["lo_tokens"], got[1]["hi_tokens"]) == (1, 2)
    assert (got[2]["lo_tokens"], got[2]["hi_tokens"]) == (3, 6)
    assert (got[3]["lo_tokens"], got[3]["hi_tokens"]) == (7, 14)
    assert [got[b]["n_docs"] for b in (1, 2, 3)] == [2, 2, 2]
    assert [got[b]["total_tokens"] for b in (1, 2, 3)] == [3, 9, 21]
    assert abs(sum(got[b]["token_share"] for b in got) - 1.0) < 1e-6


def test_per_source_sample_is_stable_under_growth(spark, tmp_path):
    """x6g's membership law: adding a HIGH-hash document leaves the
    sample untouched; adding the LOWEST-hash document pushes exactly the
    previous rank-5 pick out. Hash order is precomputed in Python with
    the same multiplicative hash."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6g_per_source_sample,
    )

    def h(doc_id):
        return (doc_id % 2147483648) * 2654435761 % 4294967296

    base_ids = list(range(1, 11))                      # one source, 10 docs
    order = sorted(base_ids, key=lambda i: (h(i), i))
    top5 = set(order[:5])
    hi_id = max(range(100, 400), key=lambda i: h(i))   # hashes above everything
    lo_id = min(range(100, 400), key=lambda i: h(i))
    assert h(hi_id) > max(h(i) for i in base_ids)
    assert h(lo_id) < min(h(i) for i in base_ids)

    def run(ids, sub):
        d = str(tmp_path / sub)
        os.makedirs(d)
        spark.createDataFrame(
            [(i, "t", "s") for i in ids], "doc_id long, text string, source string"
        ).write.parquet(f"{d}/documents.parquet")
        return {r["doc_id"] for r in x6g_per_source_sample(spark, d).collect()}

    assert run(base_ids, "a") == top5
    assert run(base_ids + [hi_id], "b") == top5              # unchanged
    assert run(base_ids + [lo_id], "c") == {lo_id} | set(order[:4])


def test_packing_efficiency_closed_form(spark, tmp_path):
    """x6h on handmade docs: one source packs exactly two chunks — an
    overflowing first chunk (doc3 starts inside the 2048 budget and runs
    past it) and a nearly-empty second — checked against hand-computed
    fills."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6h_packing_efficiency,
    )

    def words(n):
        return " ".join("w" for _ in range(n))

    # doc lengths in doc_id order: 1000, 1000, 1048, 100. Cumulative
    # start offsets: 0, 1000, 2000, 3048. A doc joins the chunk its
    # start falls in, so doc3 (start 2000 < 2048) lands in chunk0 and
    # overflows it to fill 3048; doc4 (start 3048) opens chunk1, fill 100.
    rows = [
        (1, words(1000), "sA"),
        (2, words(1000), "sA"),
        (3, words(1048), "sA"),
        (4, words(100), "sA"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: r for r in x6h_packing_efficiency(spark, sf_dir).collect()}

    r = got["sA"]
    assert r["n_chunks"] == 2
    assert r["total_tokens"] == 3148
    assert r["n_overflow"] == 1                     # chunk0 fill 3048
    assert r["mean_fill_frac"] == round(((3048 + 100) / 2) / 2048.0, 4)
    assert r["avg_docs_per_chunk"] == 2.0           # 3 docs + 1 doc


def test_split_hash_survives_huge_doc_ids(spark, tmp_path):
    """Overflow regression: ids past ~3.47e9 used to overflow int64 in
    the raw multiplicative hash (Spark wraps, DuckDB errors). The
    31-bit-reduced form must agree with the Python reference for ids up
    to 2^62 and keep buckets in [0, 100)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6_deterministic_split,
    )

    ids = [1, 2**31 - 1, 2**31, 5_000_000_000, 2**40 + 7, 2**62 + 3]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, "t") for i in ids], "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r["bucket"] for r in x6_deterministic_split(spark, sf_dir).collect()}

    for i in ids:
        expect = (i % 2147483648) * 2654435761 % 4294967296 % 100
        assert got[i] == expect, i
        assert 0 <= got[i] < 100

    # DuckDB evaluates the same SQL expression without overflow
    import duckdb

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _BUCKET_SQL,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    for doc_id, bucket in con.execute(
        f"SELECT doc_id, {_BUCKET_SQL} FROM documents"
    ).fetchall():
        assert bucket == got[doc_id]


def test_corpus_funnel_planted_stages(spark, tmp_path):
    """x6i funnel on a handmade corpus where every stage has exactly one
    planted casualty: a duplicate (dropped by dedup), a train copy of a
    benchmark doc (also dropped by dedup — its fingerprint keeper is
    the benchmark doc), a repetition doc and a short doc (dropped by the
    quality gate), and a case-mangled benchmark copy (dropped by
    decontamination). The single clean survivor's split and token count
    come out in the report."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6i_corpus_funnel,
    )

    bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    good = " ".join(f"word{i}" for i in range(25))
    spam = " ".join(["spam"] * 25)
    mangled = (
        "ALPHA Bravo, CHARLIE delta! Echo Foxtrot GOLF hotel India Juliet "
        + " ".join(f"filler{i}" for i in range(15))
    )
    short = "one two three"
    rows = [
        (0, bench, "en", "s"),     # benchmark (doc_id % 50 == 0): not in universe
        (1, good, "en", "s"),      # clean survivor (bucket 61 -> train)
        (2, good, "en", "s"),      # exact dup of 1: dedup drops it
        (3, spam, "en", "s"),      # fails quality (distinct tokens <= 5)
        (4, mangled, "en", "s"),   # passes quality, flagged by x6d2
        (5, short, "en", "s"),     # fails quality (< 20 tokens)
        (6, bench, "en", "s"),     # train copy of the benchmark: dedup drops it
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows_out = x6i_corpus_funnel(spark, sf_dir).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["source"] == "s"
    assert r["n_docs"] == 6          # ids 1-6 (benchmark 0 excluded)
    assert r["n_unique"] == 4        # 2 and 6 lose to their keepers
    assert r["n_quality"] == 2       # 1 and 4 (3: repetition, 5: short)
    assert r["n_clean"] == 1         # 4 is contaminated
    assert (r["n_train"], r["n_val"], r["n_test"]) == (1, 0, 0)
    assert r["n_tokens_clean"] == 25


def test_dedup_aware_mixture_closed_form(spark, tmp_path):
    """x6j on a handmade corpus: src0 has 10 docs but only 2 unique
    texts, src2 has 10 all-unique docs. Raw shares treat them equally;
    effective shares must shift weight onto the dup-heavy source
    (weight_effective > weight_raw for src0, < for src2), with every
    number matching the closed form."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6j_dedup_aware_mixture,
    )

    rows = [(i, f"dup {i % 2}", "en", "src0") for i in range(10)] + [
        (100 + i, f"unique text {i}", "en", "src2") for i in range(10)
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {r["source"]: r for r in x6j_dedup_aware_mixture(spark, sf_dir).collect()}
    # priorities: src0=4, src2=1 -> targets 0.8 / 0.2
    s0, s2 = got["src0"], got["src2"]
    assert (s0["n_docs"], s0["n_unique"]) == (10, 2)
    assert (s2["n_docs"], s2["n_unique"]) == (10, 10)
    assert s0["raw_frac"] == 0.5 and s0["effective_frac"] == round(2 / 12, 6)
    assert s0["weight_raw"] == round(0.8 / 0.5, 4)
    assert s0["weight_effective"] == round(0.8 / (2 / 12), 4)
    assert s2["weight_effective"] == round(0.2 / (10 / 12), 4)
    assert s0["weight_effective"] > s0["weight_raw"]
    assert s2["weight_effective"] < s2["weight_raw"]


def test_incremental_admission_funnel_is_monotone(spark, sf_dir):
    """x6k funnel law on the fixture: 16 batch docs (ids %10==0, <200,
    minus the 4 benchmark members), each stage a subset of the previous,
    and the split counts partition the clean set."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6k_incremental_admission_funnel,
    )

    rows = x6k_incremental_admission_funnel(spark, sf_dir).collect()
    assert sum(r["n_batch"] for r in rows) == 16
    for r in rows:
        assert r["n_batch"] >= r["n_admitted"] >= r["n_quality"] >= r["n_clean"]
        assert r["n_train"] + r["n_val"] + r["n_test"] == r["n_clean"]
        if r["n_clean"] == 0:
            assert r["n_tokens_clean"] == 0


def test_shard_manifest_checksum_detects_single_doc_change(spark, tmp_path):
    """x6l laws: (a) the manifest fully partitions the corpus, (b) a
    one-character edit to ONE document flips exactly that shard's
    checksum and nothing else, (c) adding a new document leaves every
    other (split, shard) cell's checksum untouched (stable assignment)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6l_shard_manifest,
    )

    def write(rows, sub):
        d = str(tmp_path / sub)
        os.makedirs(d)
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.parquet(f"{d}/documents.parquet")
        return d

    base = [(i, f"doc number {i} body", "s") for i in range(60)]
    m0 = {(r["split"], r["shard_id"]): r for r in
          x6l_shard_manifest(spark, write(base, "a")).collect()}
    assert sum(r["n_docs"] for r in m0.values()) == 60

    edited = [(i, t + ("!" if i == 7 else ""), s) for i, t, s in base]
    m1 = {(r["split"], r["shard_id"]): r for r in
          x6l_shard_manifest(spark, write(edited, "b")).collect()}
    assert m0.keys() == m1.keys()
    changed = [k for k in m0 if m0[k]["content_xor"] != m1[k]["content_xor"]]
    assert len(changed) == 1
    assert m1[changed[0]]["n_docs"] == m0[changed[0]]["n_docs"]

    grown = base + [(1000, "a brand new document", "s")]
    m2 = {(r["split"], r["shard_id"]): r for r in
          x6l_shard_manifest(spark, write(grown, "c")).collect()}
    moved = [k for k in m0 if k in m2 and m0[k]["content_xor"] != m2[k]["content_xor"]]
    assert len(moved) <= 1  # only the new doc's own cell may differ
    assert sum(r["n_docs"] for r in m2.values()) == 61


def test_importance_resample_matches_closed_form_law(spark, tmp_path):
    """x6m law on a handmade corpus, recomputed in pure Python: the
    Laplace-smoothed unigram log-ratio (shared corpus vocab V), the
    portable-hash Gumbel key, and the threshold verdict must all match
    the closed-form values; target-vocabulary docs must outscore
    off-target docs (the reweighting direction DSIR exists for)."""
    import math
    import os
    from collections import Counter

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6M_TAU,
        x6m_importance_resample,
    )

    rows = [
        (1, "alpha alpha beta", "en", "s1"),
        (2, "alpha beta beta", "en", "s1"),
        (3, "xi upsilon zeta", "de", "s2"),
        (4, "xi xi upsilon", "zh", "s2"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    # closed-form reference
    nc: Counter = Counter()
    nt: Counter = Counter()
    for _i, t, lang, _s in rows:
        for tok in t.split():
            nc[tok] += 1
            if lang == "en":
                nt[tok] += 1
    tc, tt, v = sum(nc.values()), sum(nt.values()), len(nc)

    def log_ratio(text):
        return sum(
            math.log((nt[tok] + 1) / (tt + v)) - math.log((nc[tok] + 1) / (tc + v))
            for tok in text.split()
        )

    def gumbel(doc_id):
        h = ((doc_id % 2147483648) * 2654435761) % 4294967296
        return -math.log(-math.log((h + 0.5) / 4294967296))

    got = {r["doc_id"]: r for r in x6m_importance_resample(spark, sf_dir).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    for i, t, _lang, _s in rows:
        assert got[i]["log_ratio"] == round(log_ratio(t), 4), i
        assert got[i]["gumbel"] == round(gumbel(i), 4), i
        assert got[i]["accept"] == (log_ratio(t) + gumbel(i) > _X6M_TAU), i
    # reweighting direction: every target-vocab doc beats every off-target doc
    assert min(got[1]["log_ratio"], got[2]["log_ratio"]) > max(
        got[3]["log_ratio"], got[4]["log_ratio"]
    )


def test_bfd_packing_matches_reference_and_beats_first_fit(spark, tmp_path):
    """x6b2 law: assignments on a handmade item set must equal a pure
    Python best-fit-decreasing reference decision-for-decision, and the
    classic improvement law must hold — BFD never uses more bins than
    first-fit in arrival order (here it strictly beats it: the crafted
    sizes make id-order first-fit strand capacity)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6B2_CAP,
        x6b2_bfd_packing,
    )

    # the classic FF-vs-FFD instance scaled to cap 2048: three 819s then
    # three 1229s. Id-order first-fit opens 4 bins (819+819 blocks the
    # 1229s); BFD places the 1229s first and closes every bin at exactly
    # 1229+819 = 2048 — 3 bins.
    sizes = {1: 819, 2: 819, 3: 819, 4: 1229, 5: 1229, 6: 1229}
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(n)), "en", "s1") for i, n in sizes.items()]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    def bfd_reference(items, cap):
        bins, out = [], {}
        for d, s in sorted(items.items(), key=lambda kv: (-kv[1], kv[0])):
            feas = [b for b, load in enumerate(bins) if load + s <= cap]
            if feas:
                # ties -> lowest index: pick first bin achieving max load
                best = min(
                    (b for b in feas if bins[b] == max(bins[b2] for b2 in feas))
                )
                bins[best] += s
                out[d] = best
            else:
                bins.append(s)
                out[d] = len(bins) - 1
        return out, bins

    def first_fit_by_id(items, cap):
        bins = []
        for _d, s in sorted(items.items()):
            for b in range(len(bins)):
                if bins[b] + s <= cap:
                    bins[b] += s
                    break
            else:
                bins.append(s)
        return bins

    expect, ref_bins = bfd_reference(sizes, _X6B2_CAP)
    got = {r["doc_id"]: r["bin_id"] for r in x6b2_bfd_packing(spark, sf_dir).collect()}
    assert got == expect
    n_ff = len(first_fit_by_id(sizes, _X6B2_CAP))
    assert len(ref_bins) < n_ff  # the crafted instance: 3 vs 4
    assert len(set(got.values())) == len(ref_bins)


def test_bfd_packing_matches_python_reference_on_random_sizes(spark, tmp_path):
    """x6b2 vs the pure-Python BFD reference on a seeded random item
    set across two sources, including oversized items (> cap, forced
    singleton bins) and exact-fit ties — every assignment must match
    decision-for-decision."""
    import os
    import random

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6B2_CAP,
        x6b2_bfd_packing,
    )

    rng = random.Random(99)
    sizes = {}
    doc_id = 1
    for src in ("sA", "sB"):
        for _ in range(40):
            sizes[doc_id] = (src, rng.randrange(1, 2300))  # some > cap
            doc_id += 1
    # planted exact-fit tie pair: two bins at the same load
    sizes[doc_id] = ("sA", 1024); sizes[doc_id + 1] = ("sA", 1024)

    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)), "en", src)
        for i, (src, n) in sizes.items()
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    def bfd(items, cap):
        bins, out = [], {}
        for d, s in sorted(items.items(), key=lambda kv: (-kv[1], kv[0])):
            feas = [b for b in range(len(bins)) if bins[b] + s <= cap]
            if feas:
                top = max(bins[b] for b in feas)
                best = min(b for b in feas if bins[b] == top)
                bins[best] += s
                out[d] = best
            else:
                bins.append(s)
                out[d] = len(bins) - 1
        return out

    expect = {}
    for src in ("sA", "sB"):
        per = {i: n for i, (s, n) in sizes.items() if s == src}
        expect.update(bfd(per, _X6B2_CAP))

    got = {r["doc_id"]: r["bin_id"] for r in x6b2_bfd_packing(spark, sf_dir).collect()}
    assert got == expect
    # sanity: oversized items existed and bin counts were nontrivial
    assert any(n > _X6B2_CAP for _s, n in sizes.values())
    assert len(set(got.values())) > 5


def test_packing_scoreboard_agrees_with_both_packers(spark):
    """x6h2 integration law: the scoreboard's bin/chunk counts must
    equal what the two registered packers actually produce on the same
    fixture — a drifted composition (e.g. a stale CTE) would disagree."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6b2_bfd_packing,
        x6b_sequence_packing,
        x6h2_packing_comparison,
    )
    from tests.conftest import SF_DIR_001

    sb = {r["source"]: r for r in x6h2_packing_comparison(spark, SF_DIR_001).collect()}
    seq = (
        x6b_sequence_packing(spark, SF_DIR_001)
        .select("source", "chunk_id")
        .distinct()
        .groupBy("source")
        .count()
        .collect()
    )
    bfd = (
        x6b2_bfd_packing(spark, SF_DIR_001)
        .select("source", "bin_id")
        .distinct()
        .groupBy("source")
        .count()
        .collect()
    )
    for r in seq:
        assert sb[r["source"]]["n_chunks_seq"] == r["count"], r["source"]
    for r in bfd:
        assert sb[r["source"]]["n_bins_bfd"] == r["count"], r["source"]
    assert all(
        r["bin_delta"] == r["n_bins_bfd"] - r["n_chunks_seq"] for r in sb.values()
    )


def test_x4t_ensemble_weights_are_load_bearing(spark, sf_dir):
    """x4t sensitivity law: the keep verdict must actually depend on
    the declared weights — zeroing the repetition penalties admits at
    least one document the full ensemble rejects, and the hard x4c
    gate survives any weighting (no weights can admit a doc that fails
    passes_quality). Also pins a healthy mixture: the default ensemble
    neither keeps everything nor rejects everything."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x4t_quality_ensemble,
    )
    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4c_quality_score,
    )

    full = {r["doc_id"]: r["keep"] for r in
            x4t_quality_ensemble(spark, sf_dir).collect()}
    n_keep = sum(full.values())
    assert 0 < n_keep < len(full), (n_keep, len(full))

    norep = {r["doc_id"]: r["keep"] for r in
             x4t_quality_ensemble(
                 spark, sf_dir,
                 weights={"top_word_frac": 0.0, "top_bigram_frac": 0.0},
             ).collect()}
    admitted = [d for d in full if norep[d] and not full[d]]
    assert admitted, "repetition penalties must reject something"
    assert not [d for d in full if full[d] and not norep[d]], (
        "dropping a penalty can only admit, never reject"
    )

    gate = {r["doc_id"]: r["passes_quality"] for r in
            x4c_quality_score(spark, sf_dir).collect()}
    lax = {r["doc_id"]: r["keep"] for r in
           x4t_quality_ensemble(
               spark, sf_dir, cutoff=-1000.0
           ).collect()}
    assert all(gate[d] for d, k in lax.items() if k)
    assert any(not k for k in lax.values()) == any(not g for g in gate.values())


def test_x6n_temperature_laws(spark, sf_dir, tmp_path):
    """x6n laws: (1) on the fixture, rates are anti-monotone in source
    size (temperature flattening upweights low-resource sources) and
    realized acceptance matches a Python recomputation of the hash
    rule; (2) on a handmade skewed corpus the tiny source hits the 1.0
    cap (keep everything) while the huge source is down-sampled, and
    the expected token yield sits at the declared half-corpus budget
    when nothing is capped."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6n_temperature_mixture,
    )

    rows = x6n_temperature_mixture(spark, sf_dir).collect()
    by_size = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(by_size, by_size[1:]):
        assert a["rate"] >= b["rate"], (a, b)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    accepted = {}
    rates = {r["source"]: r["rate"] for r in rows}
    for d in docs:
        h = ((d["doc_id"] % 2147483648) * 2654435761) % 4294967296
        if h < rates[d["source"]] * 4294967296:
            accepted[d["source"]] = accepted.get(d["source"], 0) + 1
    for r in rows:
        assert r["n_accepted"] == accepted.get(r["source"], 0), r["source"]

    skew = spark.createDataFrame(
        [(i, "huge" if i < 900 else "tiny", "tok " * 49 + "tok", "en", 200)
         for i in range(910)],
        "doc_id long, source string, text string, lang string, n_chars int",
    )
    skew_dir = str(tmp_path / "skew")
    skew.write.parquet(f"{skew_dir}/documents.parquet")
    srows = {r["source"]: r for r in
             x6n_temperature_mixture(spark, skew_dir).collect()}
    assert srows["tiny"]["rate"] == 1.0
    assert srows["huge"]["rate"] < 1.0
    assert srows["tiny"]["n_accepted"] == srows["tiny"]["n_docs"]


def test_x6p_epoch_schedule_laws(spark, sf_dir, tmp_path):
    """x6p laws: (1) fixture — epochs = ceil(target/natural) capped at
    4, scheduled = min(target, 4*natural), recomputed independently in
    Python; (2) handmade skewed corpus — the tiny source HITS the
    4-epoch cap and reports a real unfilled shortfall while the huge
    source schedules under 1 target-fill (epochs small), and no
    source's scheduled tokens exceed its target."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6P_BUDGET_X,
        _X6P_MAX_EPOCHS,
        x6p_epoch_schedule,
    )

    rows = x6p_epoch_schedule(spark, sf_dir).collect()
    grand = sum(r["n_tokens"] for r in rows)
    n_src = len(rows)
    for r in rows:
        target = (_X6P_BUDGET_X * grand) // n_src
        assert r["target_tokens"] == target
        want_epochs = min(
            -(-target // r["n_tokens"]), _X6P_MAX_EPOCHS
        )
        assert r["epochs"] == want_epochs, r
        assert r["scheduled_tokens"] == min(
            target, _X6P_MAX_EPOCHS * r["n_tokens"]
        )
        assert r["unfilled_tokens"] == max(
            target - _X6P_MAX_EPOCHS * r["n_tokens"], 0
        )
        assert r["scheduled_tokens"] <= r["target_tokens"]

    skew = spark.createDataFrame(
        [(i, "huge" if i < 99 else "tiny", "tok " * 99 + "tok", "en", 400)
         for i in range(100)],
        "doc_id long, source string, text string, lang string, n_chars int",
    )
    skew_dir = str(tmp_path / "skew")
    skew.write.parquet(f"{skew_dir}/documents.parquet")
    srows = {r["source"]: r for r in
             x6p_epoch_schedule(spark, skew_dir).collect()}
    assert srows["tiny"]["epochs"] == _X6P_MAX_EPOCHS
    assert srows["tiny"]["unfilled_tokens"] > 0
    assert srows["huge"]["epochs"] <= 2
    assert srows["huge"]["unfilled_tokens"] == 0


# ---- X6u: seeded epoch reshuffle ------------------------------------------------


def test_x6u_epochs_are_distinct_permutations_of_same_ids(spark, sf_dir):
    """The reshuffle law: every epoch visits exactly the full id set
    once (a permutation), epoch 0 and epoch 1 disagree on order, and
    the order is keyed per-document, so a grown corpus never reorders
    existing pairs (rerun-after-ingest stability)."""
    from ssn_college_software_architecture_assignments__spark.catalog import Catalog
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6u_epoch_keys,
    )

    docs = Catalog(spark, sf_dir).documents
    keys = x6u_epoch_keys(docs).orderBy("epoch", "shard_id", "ekey", "doc_id")
    seqs = {0: [], 1: []}
    for r in keys.collect():
        seqs[r["epoch"]].append(r["doc_id"])
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    for ep in (0, 1):
        assert len(seqs[ep]) == len(all_ids), "epoch must visit each doc once"
        assert set(seqs[ep]) == all_ids
    assert seqs[0] != seqs[1], "epochs must be different permutations"

    # growth stability: keys of a half corpus are the same rows the
    # full corpus assigns those docs — relative order can't move
    half = docs.filter("doc_id % 2 = 0")
    sub = {
        (r["epoch"], r["doc_id"]): (r["shard_id"], r["ekey"])
        for r in x6u_epoch_keys(half).collect()
    }
    full = {
        (r["epoch"], r["doc_id"]): (r["shard_id"], r["ekey"])
        for r in keys.collect()
        if r["doc_id"] % 2 == 0
    }
    assert sub == full


def test_x6v_reconstruction_theorem_and_md5_pin(spark):
    """x6v laws: (a) RECONSTRUCTION — concatenating each chunk's
    non-overlap span (whole chunk 0, then tokens[V:] of every later
    chunk) reproduces the original document token-for-token, for every
    document at sf0.001; (b) the manifest's chunk_md5 equals the md5 of
    the independently recomputed chunk text (byte-for-byte pin);
    (c) every chunk contributes at least one new token (the ceil law's
    guarantee) and spans/starts follow the stride arithmetic."""
    import hashlib

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6V_OVERLAP,
        _X6V_STRIDE,
        _X6V_WINDOW,
        x6v_chunk_overlap_manifest,
    )

    sf = "/root/testdata/sf0.001"
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    manifest = {}
    for r in x6v_chunk_overlap_manifest(spark, sf).collect():
        manifest.setdefault(r["doc_id"], []).append(r)

    assert set(manifest) == set(texts)
    for doc_id, rows in manifest.items():
        toks = texts[doc_id].split(" ")
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        rebuilt = []
        for r in rows:
            start = r["chunk_id"] * _X6V_STRIDE
            assert r["start_tok"] == start
            ctoks = toks[start : start + _X6V_WINDOW]
            assert r["n_chunk_tokens"] == len(ctoks)
            md5 = hashlib.md5(" ".join(ctoks).encode("utf-8")).hexdigest()
            assert r["chunk_md5"] == md5
            new = ctoks if r["chunk_id"] == 0 else ctoks[_X6V_OVERLAP:]
            assert len(new) >= 1  # every chunk adds content
            rebuilt.extend(new)
        assert rebuilt == toks  # the reconstruction theorem


def test_x6w_chunk_scrub_biconditional_with_x6d(spark):
    """The x6w coverage theorem, pinned against x6d: with overlap
    7 = gram - 1, a training document is flagged at the DOC level
    (x6d) if and only if at least one of its x6w chunks is flagged —
    forward because every 8-gram falls wholly inside some chunk,
    reverse because chunk grams are a subset of doc grams. Also pins
    the per-chunk accounting: chunk ids within a doc's chunk total,
    start_tok on the stride grid, shared-gram counts positive."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6W_STRIDE,
        x6d_decontamination,
        x6w_chunk_decontamination,
    )

    sf = "/root/testdata/sf0.001"
    doc_flagged = {
        r["train_doc_id"] for r in x6d_decontamination(spark, sf).collect()
    }
    chunk_rows = x6w_chunk_decontamination(spark, sf).collect()
    chunk_docs = {r["train_doc_id"] for r in chunk_rows}
    assert chunk_docs == doc_flagged  # the biconditional
    assert len(doc_flagged) > 0  # the fixture plants real contamination
    for r in chunk_rows:
        assert 0 <= r["chunk_id"] < r["doc_chunks"]
        assert r["start_tok"] == r["chunk_id"] * _X6W_STRIDE
        assert r["n_shared_grams"] >= 1
        assert r["n_benchmark_docs"] >= 1


def test_x6x_matching_chunk_outranks_and_overlap_hits_both(spark, tmp_path):
    """x6x chunk-retrieval laws on a planted corpus (W=16, V=4, so a
    28-token doc splits into chunks [0,16) and [12,28) sharing span
    [12,16)): (a) only the chunk CONTAINING a query term is ranked —
    the same doc's non-matching chunk never appears; (b) a term landing
    in the overlap span belongs to BOTH adjacent chunks and both
    surface; (c) ranks are gapless per query and ordered by
    (score desc, doc_id, chunk_id)."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6x_chunk_bm25_retrieval,
    )

    filler = ["w%d" % i for i in range(28)]
    # doc 0: "dup" at 0-based position 5 -> chunk 0 only
    t0 = list(filler)
    t0[5] = "dup"
    # doc 1: "dup" at 0-based position 13 -> inside the [12,16) overlap
    t1 = list(filler)
    t1[13] = "dup"
    # doc 2: background, no query terms
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [" ".join(t0), " ".join(t1), " ".join(filler)],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    out = x6x_chunk_bm25_retrieval(spark, str(tmp_path)).collect()
    q0 = [r for r in out if r["query_id"] == 0]
    hits = {(r["doc_id"], r["chunk_id"]) for r in q0}
    assert (0, 0) in hits and (0, 1) not in hits   # (a)
    assert (1, 0) in hits and (1, 1) in hits       # (b) overlap: both
    assert not any(r["doc_id"] == 2 for r in q0)
    # start_tok pins the span law: chunk k starts at k * stride
    spans = {(r["doc_id"], r["chunk_id"]): r["start_tok"] for r in q0}
    assert spans[(1, 0)] == 0 and spans[(1, 1)] == 12
    # (c) gapless, ordered
    for q in {r["query_id"] for r in out}:
        rows = sorted(
            (r for r in out if r["query_id"] == q), key=lambda r: r["rnk"]
        )
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a["score_micro"], -a["doc_id"], -a["chunk_id"]) >= (
                b["score_micro"], -b["doc_id"], -b["chunk_id"]
            )


@pytest.mark.parametrize("variant", ["capped", "full"])
def test_x6y_survivorship_policy_beats_min_id_canonical(spark, variant):
    """x6y (and its uncapped twin x6y2) law on a planted 3-chain family:
    docs 1~2 and 2~4 share >= 3 shingles (1 and 4 share none -- only the
    transitive closure joins them), doc 2 is the longest. x2e2's min-id
    canonical would keep doc 1; the keep-longest policy must keep doc 2,
    drop 1 and 4, and report freed_chars = n_chars(1) + n_chars(4) on
    every family row. The singleton doc 7 keeps itself with freed_chars
    0. x6y2 additionally must assert closure_converged on every row."""
    from pyspark.sql import functions as F  # noqa: F401
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6y_dedup_survivorship,
        x6y2_dedup_survivorship_full,
    )
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    import ssn_college_software_architecture_assignments__spark.operators.dedup as dmod

    op = (
        x6y_dedup_survivorship
        if variant == "capped"
        else x6y2_dedup_survivorship_full
    )
    df = spark.createDataFrame(
        [
            (1, "a b c d e f", 11),
            (2, "a b c d e f g h i j", 100),
            (4, "f g h i j k l", 40),
            (7, "z y x w v u", 11),
        ],
        "doc_id long, text string, n_chars long",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    origs = (cmod.Catalog, dmod.Catalog)
    cmod.Catalog = dmod.Catalog = _Cat
    try:
        rows = {r["doc_id"]: r for r in op(spark, "x").collect()}
    finally:
        cmod.Catalog, dmod.Catalog = origs

    assert set(rows) == {1, 2, 4, 7}
    if variant == "full":
        assert all(r["closure_converged"] for r in rows.values())
    fam = [rows[1], rows[2], rows[4]]
    assert len({r["cluster_id"] for r in fam}) == 1  # transitive closure
    assert all(r["cluster_size"] == 3 for r in fam)
    assert rows[2]["keep"] and not rows[1]["keep"] and not rows[4]["keep"]
    # min-id canonical (doc 1) != quality survivor (doc 2): the policy
    # is a real decision, not a relabeling of is_canonical
    assert fam[0]["cluster_id"] == 1 and not rows[1]["keep"]
    assert all(r["freed_chars"] == 11 + 40 for r in fam)
    assert rows[7]["keep"] and rows[7]["freed_chars"] == 0 \
        and rows[7]["cluster_size"] == 1


def test_x6z_waterfill_cascade_matches_hand_arithmetic(spark):
    """x6z law on a planted 3-source corpus (hand-solved waterfill):
    budget 2*1110 = 2220, weights 64/16/1, caps 40/400/4000. src0 and
    src1 saturate (R*w > cap*W at their prefix), src3 stays unsaturated
    with alloc (1 * 1780) // 1 = 1780; epochs_micro pins the realized
    upsampling. With the budget multiplier raised past the epoch cap,
    every source saturates and budget_feasible flips false."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6z_token_budget_waterfill,
    )
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod

    def mk_text(n):
        return " ".join(["tok"] * n)

    df = spark.createDataFrame(
        [
            (1, mk_text(10), "src0"),    # weight 64, cap 40
            (2, mk_text(100), "src1"),   # weight 16, cap 400
            (3, mk_text(1000), "src3"),  # weight 1,  cap 4000
        ],
        "doc_id long, text string, source string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig = cmod.Catalog
    cmod.Catalog = _Cat
    try:
        rows = {
            r["source"]: r
            for r in x6z_token_budget_waterfill(spark, "x").collect()
        }
        orig_bx = cmod._X6Z_BUDGET_X
        cmod._X6Z_BUDGET_X = 10  # budget 11100 > sum caps 4440
        try:
            over = {
                r["source"]: r
                for r in x6z_token_budget_waterfill(spark, "x").collect()
            }
        finally:
            cmod._X6Z_BUDGET_X = orig_bx
    finally:
        cmod.Catalog = orig

    assert rows["src0"]["saturated"] and rows["src0"]["alloc_tokens"] == 40
    assert rows["src0"]["epochs_micro"] == 4_000_000
    assert rows["src1"]["saturated"] and rows["src1"]["alloc_tokens"] == 400
    assert not rows["src3"]["saturated"]
    assert rows["src3"]["alloc_tokens"] == 2220 - 40 - 400  # == 1780
    assert rows["src3"]["epochs_micro"] == 1_780_000
    assert all(r["budget_feasible"] for r in rows.values())
    # exact budget exhaustion here: one unsaturated source -> no floor loss
    assert sum(r["alloc_tokens"] for r in rows.values()) == 2220

    # infeasible budget: all saturated at cap, flag flips
    assert all(r["saturated"] for r in over.values())
    assert all(not r["budget_feasible"] for r in over.values())
    assert [over[s]["alloc_tokens"] for s in ("src0", "src1", "src3")] == [
        40, 400, 4000,
    ]


def test_x6z_fixture_cascade_and_budget_bounds(spark):
    """x6z on the real fixture: the skewed weights produce the designed
    3-deep cascade (src0, src1, src2 saturated at exactly 4 epochs);
    every unsaturated source lands under the cap; and the total
    allocation reaches the budget up to floor loss (< one token per
    unsaturated source)."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6Z_BUDGET_X,
        x6z_token_budget_waterfill,
    )

    rows = x6z_token_budget_waterfill(
        spark, "/root/testdata/sf0.001"
    ).collect()
    sat = {r["source"] for r in rows if r["saturated"]}
    assert sat == {"src0", "src1", "src2"}
    assert all(
        r["epochs_micro"] == 4_000_000 for r in rows if r["saturated"]
    )
    assert all(
        r["alloc_tokens"] <= r["cap_tokens"] for r in rows
    )
    budget = _X6Z_BUDGET_X * sum(r["n_tokens"] for r in rows)
    got = sum(r["alloc_tokens"] for r in rows)
    n_unsat = sum(1 for r in rows if not r["saturated"])
    assert budget - n_unsat < got <= budget


def test_x6z_boundary_budget_equals_caps(spark):
    """x6z boundary law: when the budget EXACTLY equals the sum of
    caps, the threshold rule resolves the last sorted source as
    unsaturated-at-cap (R*w <= cap*W holds with equality), so every
    source receives exactly its cap, the budget is exhausted to the
    token, and budget_feasible stays true — the <= vs < boundary is
    pinned, not accidental."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6z_token_budget_waterfill,
    )
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod

    def mk_text(n):
        return " ".join(["tok"] * n)

    # budget multiplier 2, epoch cap 4: budget == sum caps requires
    # 2 * grand == 4 * grand, impossible with >0 tokens — so pin the
    # boundary by raising the multiplier to the cap itself
    df = spark.createDataFrame(
        [(1, mk_text(10), "src0"), (2, mk_text(100), "src1"),
         (3, mk_text(1000), "src3")],
        "doc_id long, text string, source string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig_cat, orig_bx = cmod.Catalog, cmod._X6Z_BUDGET_X
    cmod.Catalog = _Cat
    cmod._X6Z_BUDGET_X = cmod._X6Z_MAX_EPOCHS  # budget == sum caps
    try:
        rows = {
            r["source"]: r
            for r in x6z_token_budget_waterfill(spark, "x").collect()
        }
    finally:
        cmod.Catalog, cmod._X6Z_BUDGET_X = orig_cat, orig_bx

    assert all(r["alloc_tokens"] == r["cap_tokens"] for r in rows.values())
    assert sum(r["alloc_tokens"] for r in rows.values()) == 4 * 1110
    assert all(r["budget_feasible"] for r in rows.values())
    assert all(r["epochs_micro"] == 4_000_000 for r in rows.values())


def test_x6z_x4x_boundary_law_sync_both_engines(spark):
    """Law-sync for the two equality-boundary branches pinned in round
    14, now asserted to fire identically in BOTH engines on the same
    planted fixtures (so a refactor that rewrites either comparison on
    one side only cannot slip through):

    (1) x6z budget == caps: at budget multiplier == the epoch cap the
        threshold rule resolves the LAST sorted source as
        unsaturated-at-cap via `<=` equality — Spark (patched
        _X6Z_BUDGET_X) and the _x6z_oracle(4) DuckDB twin must emit
        identical rows, every source at exactly its cap and feasible.
    (2) x4x zero-relevant: a query whose terms never co-occur has
        n_relevant = 0 -> recall/mrr guard to 0 while ndcg stays
        defined — Spark and the _X4X_ORACLE DuckDB twin must emit
        identical rows including that guard branch."""
    import duckdb
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _x6z_oracle,
        x6z_token_budget_waterfill,
    )
    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        _X4X_ORACLE,
        x4x_retrieval_eval,
    )
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    import ssn_college_software_architecture_assignments__spark.operators.textanalysis as tmod

    def rows_by_key(rows, cols, key):
        return {r[key]: tuple(r[c] for c in cols) for r in rows}

    # ---- boundary 1: x6z budget == sum(caps) ----
    def mk_text(n):
        return " ".join(["tok"] * n)

    pdf6 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [mk_text(10), mk_text(100), mk_text(1000)],
            "source": ["src0", "src1", "src3"],
        }
    )
    df6 = spark.createDataFrame(pdf6)

    class _Cat6:
        def __init__(self, spark, sf_dir):
            self.documents = df6

    orig_cat, orig_bx = cmod.Catalog, cmod._X6Z_BUDGET_X
    cmod.Catalog, cmod._X6Z_BUDGET_X = _Cat6, cmod._X6Z_MAX_EPOCHS
    try:
        srows = x6z_token_budget_waterfill(spark, "x").collect()
    finally:
        cmod.Catalog, cmod._X6Z_BUDGET_X = orig_cat, orig_bx

    con = duckdb.connect()
    con.register("documents", pdf6)
    cols6 = [
        "source", "n_docs", "n_tokens", "weight", "cap_tokens",
        "saturated", "alloc_tokens", "epochs_micro", "budget_feasible",
    ]
    odf6 = con.execute(_x6z_oracle(cmod._X6Z_MAX_EPOCHS)).df()
    got_s = rows_by_key(srows, cols6, "source")
    got_o = rows_by_key(odf6.to_dict("records"), cols6, "source")
    assert got_s == got_o
    # and the boundary branch genuinely fired: every source at its cap
    assert all(r["alloc_tokens"] == r["cap_tokens"] for r in srows)
    assert all(r["budget_feasible"] for r in srows)

    # ---- boundary 2: x4x zero-relevant query ----
    pdf4 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["vector vector", "stream stream", "alpha beta"],
        }
    )
    df4 = spark.createDataFrame(pdf4)

    class _Cat4:
        def __init__(self, spark, sf_dir):
            self.documents = df4

    orig_t = tmod.Catalog
    tmod.Catalog = _Cat4
    try:
        srows4 = x4x_retrieval_eval(spark, "x").collect()
    finally:
        tmod.Catalog = orig_t

    con4 = duckdb.connect()
    con4.register("documents", pdf4)
    cols4 = [
        "query_id", "n_relevant", "hits_at_k", "recall_micro",
        "mrr_micro", "dcg_micro", "idcg_micro", "ndcg_micro",
    ]
    odf4 = con4.execute(_X4X_ORACLE).df()
    got_s4 = rows_by_key(srows4, cols4, "query_id")
    got_o4 = rows_by_key(odf4.to_dict("records"), cols4, "query_id")
    assert got_s4 == got_o4
    # the guard branch fired in both: q2 has no fully-matching doc
    assert got_s4[2][cols4.index("n_relevant")] == 0
    assert got_s4[2][cols4.index("recall_micro")] == 0
    assert got_s4[2][cols4.index("mrr_micro")] == 0


def test_x6y3_batch_doc_dethrones_merged_survivors(spark, tmp_path):
    """x6y3 on the x2e3 bridge fixture, every number hand-derived:
    standing keepers are doc 1 (of {1,2}), doc 3 (of {3,4}) and doc 6
    (of {5,6}, the longest). Batch doc 10 (19 chars) bridges {1,2} and
    {3,4} AND outweighs everyone — the merged cluster's keeper is the
    batch doc and BOTH old survivors are dethroned. Batch doc 50 joins
    {5,6} but is shorter than doc 6 — the standing keeper keeps the
    crown (n_dethroned 0). The singleton and batch-only clusters have
    no old survivors at all."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6y3_incremental_survivorship,
    )

    rows = [
        (1, "a b c d e f", "en", 11),
        (2, "a b c d e y", "en", 11),
        (3, "p q r s t u", "en", 11),
        (4, "p q r s t z", "en", 11),
        (5, "g h i j k l", "en", 11),
        (6, "g h i j k z3", "en", 12),
        (10, "a b c d e p q r s t", "en", 19),
        (20, "k l m n", "en", 7),
        (30, "u v w x y z1", "en", 12),
        (40, "u v w x y z2", "en", 12),
        (50, "g h i j k m", "en", 11),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["cluster_id"]: r
        for r in x6y3_incremental_survivorship(spark, sf_dir).collect()
    }
    assert set(got) == {1, 5, 20, 30}
    assert all(r["closure_converged"] for r in got.values())
    m = got[1]  # the merge: batch doc 10 dethrones keepers 1 AND 3
    assert (m["keep_doc_id"], m["keep_is_batch"], m["keep_n_chars"]) == (10, True, 19)
    assert (m["n_old_survivors"], m["n_dethroned"]) == (2, 2)
    assert m["freed_chars"] == 4 * 11
    e = got[5]  # the extend: standing keeper 6 holds the crown
    assert (e["keep_doc_id"], e["keep_is_batch"], e["keep_n_chars"]) == (6, False, 12)
    assert (e["n_old_survivors"], e["n_dethroned"]) == (1, 0)
    assert e["freed_chars"] == 11 + 11
    s = got[20]
    assert (s["keep_doc_id"], s["keep_is_batch"]) == (20, True)
    assert (s["n_old_survivors"], s["n_dethroned"], s["freed_chars"]) == (0, 0, 0)
    p = got[30]  # batch pair: n_chars tie -> doc_id asc keeps 30
    assert (p["keep_doc_id"], p["keep_is_batch"]) == (30, True)
    assert (p["n_old_survivors"], p["freed_chars"]) == (0, 12)


def test_x6z2_allocates_against_surviving_tokens_only(spark):
    """x6z2 law, hand-solved: src0 holds two near-dup 6-token docs
    (shared 3-gram evidence -> one family, keep-longest survivor doc 1),
    src1 one unique 10-token doc. The deduped denominator: surviving
    tokens 6 + 10 = 16, budget 32, caps 24/40, weights 64/16. Sorted by
    cap/weight src0 leads and SATURATES (32*64 > 24*80), src1 takes the
    remainder (16*8)//16 = 8 -> epochs 800000. Raw x6z on the same
    corpus leaves src0 UNSATURATED (44*64 <= 48*80) — the inflated-cap
    misallocation x6z2 exists to fix — pinned as a contrast on the
    saturated flag."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6z_token_budget_waterfill,
        x6z2_dedup_aware_waterfill,
    )
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    import ssn_college_software_architecture_assignments__spark.operators.dedup as dmod

    df = spark.createDataFrame(
        [
            (1, "a b c d e f", "src0", 12),   # survivor (longest)
            (2, "a b c d e g", "src0", 11),   # near-dup of 1, dropped
            (3, "p q r s t u v w x y", "src1", 19),
        ],
        "doc_id long, text string, source string, n_chars long",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    origs = (cmod.Catalog, dmod.Catalog)
    cmod.Catalog = dmod.Catalog = _Cat
    try:
        dd = {r["source"]: r for r in x6z2_dedup_aware_waterfill(spark, "x").collect()}
        raw = {r["source"]: r for r in x6z_token_budget_waterfill(spark, "x").collect()}
    finally:
        cmod.Catalog, dmod.Catalog = origs

    s0, s1 = dd["src0"], dd["src1"]
    assert (s0["n_docs"], s0["n_tokens"], s0["cap_tokens"]) == (1, 6, 24)
    assert s0["saturated"] and s0["alloc_tokens"] == 24
    assert s0["epochs_micro"] == 4_000_000
    assert (s1["n_docs"], s1["n_tokens"]) == (1, 10)
    assert not s1["saturated"] and s1["alloc_tokens"] == 8
    assert s1["epochs_micro"] == 800_000
    assert all(r["budget_feasible"] and r["closure_converged"] for r in dd.values())
    # the contrast: raw x6z sees 12 tokens in src0 and never saturates it
    assert not raw["src0"]["saturated"]
    assert raw["src0"]["n_tokens"] == 12 and s0["n_tokens"] == 6


def test_x4z2_mmr_demotes_adjacent_overlapped_chunk(spark):
    """The structural-redundancy case x4z2 exists for, closed-form:
    doc 1 carries query 0's terms INSIDE the 4-token overlap span, so
    chunks (1,0) and (1,1) both surface (the pinned x6x property) with
    equal BM25 scores and take ranks 1-2 by the chunk tie law; doc 2's
    single chunk matches lexically-distinct and ranks 3. Their token
    sets give jac((1,0),(1,1)) = 4e6//28 = 142857 (the shared overlap
    span) vs jac((1,0),(2,0)) = 2e6//30 = 66666, so greedy MMR at
    lambda = 1/2 keeps (1,0) first, promotes doc 2's chunk to
    mmr_rank 2 and DEMOTES the adjacent overlapped chunk to rank 3 —
    all three mmr/maxsim values pinned to the floored micro-unit."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x4z2_chunk_mmr_rerank,
    )
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    import ssn_college_software_architecture_assignments__spark.operators.textanalysis as tmod

    doc1 = (
        [f"a{i}" for i in range(12)] + ["dup", "join", "b14", "b15"]
        + [f"c{i}" for i in range(16, 28)]
    )  # 28 tokens -> chunks [0,16) and [12,28); dup/join in the overlap
    doc2 = ["dup", "join"] + [f"d{i}" for i in range(2, 16)]  # one chunk
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": [" ".join(doc1), " ".join(doc2)]}
    )
    df = spark.createDataFrame(pdf)

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    origs = (cmod.Catalog, tmod.Catalog)
    cmod.Catalog = tmod.Catalog = _Cat
    try:
        out = sorted(
            (r for r in x4z2_chunk_mmr_rerank(spark, "x").collect()
             if r["query_id"] == 0),
            key=lambda r: r["mmr_rank"],
        )
    finally:
        cmod.Catalog, tmod.Catalog = origs

    assert [(r["doc_id"], r["chunk_id"]) for r in out] == [(1, 0), (2, 0), (1, 1)]
    assert [r["bm25_rnk"] for r in out] == [1, 3, 2]  # BM25 had (1,1) second
    r1, r2, r3 = out
    assert (r1["max_sim_micro"], r1["mmr_micro"]) == (0, 1000000 // 61)
    assert r2["max_sim_micro"] == (1000000 * 2) // 30
    assert r2["mmr_micro"] == 1000000 // 63 - 66666
    assert r3["max_sim_micro"] == (1000000 * 4) // 28 == 142857
    assert r3["mmr_micro"] == 1000000 // 62 - 142857


def test_x4z2_unit_guard_raises_on_aliasing_chunk_id(spark):
    """r16 advisory closure: the composite unit doc_id*1e6+chunk_id
    raises loudly when chunk_id >= _X4Z2_UNIT instead of silently
    aliasing two chunks into one unit (the x3y guard posture)."""
    import pytest
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X4Z2_UNIT,
        _x4z2_unit_col,
    )

    ok = spark.createDataFrame(
        [(3, 7), (4, _X4Z2_UNIT - 1)], "doc_id long, chunk_id long"
    )
    got = {r["unit"] for r in ok.select(_x4z2_unit_col()).collect()}
    assert got == {3 * _X4Z2_UNIT + 7, 4 * _X4Z2_UNIT + _X4Z2_UNIT - 1}

    bad = spark.createDataFrame(
        [(3, _X4Z2_UNIT)], "doc_id long, chunk_id long"
    )
    with pytest.raises(Exception, match="alias two chunks"):
        bad.select(_x4z2_unit_col()).collect()


def test_e3_pipeline_equals_stage_composition_planted(spark, tmp_path):
    """e3 law on a planted corpus where EVERY stage has a casualty:
    the pipeline's per-source attrition counts must equal the cascade
    of the individually-run registered stage operators (exact dedup ->
    x6y2 closure keep -> x4t keep -> x6d contamination), the mixture
    stats must equal x6n_rates + the portable-hash acceptance over the
    survivor set, and the pack stats must equal x6b2_pack over the
    sampled set. This pins the COLUMN-CONTRACT composition, not the
    stages themselves (each is oracle-proven alone)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        e3_curation_pipeline,
        x4t_quality_ensemble,
        x6b2_pack,
        x6d_decontamination,
        x6n_rates,
        x6y2_dedup_survivorship_full,
    )
    from ssn_college_software_architecture_assignments__spark.operators.dedup import (
        x1_exact_dedup,
    )
    from pyspark.sql import functions as F

    bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    good = " ".join(f"word{i}" for i in range(25))
    good2 = " ".join(f"note{i}" for i in range(30))
    spam = " ".join(["spam"] * 25)
    contam = bench + " " + " ".join(f"filler{i}" for i in range(15))
    near_a = " ".join(f"tok{i}" for i in range(24))
    near_b = " ".join(f"tok{i}" for i in range(20))  # shares 18 shingles w/ near_a
    rows = [
        (0, bench, "en", "s"),    # benchmark: excluded from the universe
        (1, good, "en", "s"),     # survivor
        (2, good, "en", "s"),     # exact-dup casualty
        (3, spam, "en", "s"),     # quality casualty
        (4, contam, "en", "s"),   # decontamination casualty (raw 8-grams)
        (7, near_a, "en", "s2"),  # closure survivor (longer)
        (8, near_b, "en", "s2"),  # closure casualty (keep-longest drops it)
        (9, good2, "en", "s2"),   # survivor
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    # stage verdicts from the REGISTERED operators, composed in python
    keepers = {
        r["keep_doc_id"] for r in x1_exact_dedup(spark, sf_dir).collect()
    }
    ykeep = {
        r["doc_id"]: r["keep"]
        for r in x6y2_dedup_survivorship_full(spark, sf_dir).collect()
    }
    qkeep = {
        r["doc_id"]: r["keep"]
        for r in x4t_quality_ensemble(spark, sf_dir).collect()
    }
    flagged = {
        r["train_doc_id"] for r in x6d_decontamination(spark, sf_dir).collect()
    }
    src = {i: s for i, _, _, s in rows}
    ntok = {i: len(t.split(" ")) for i, t, _, _ in rows}
    universe = [i for i, *_ in rows if i % 50 != 0]
    exact = [i for i in universe if i in keepers]
    clos = [i for i in exact if ykeep[i]]
    qual = [i for i in clos if qkeep[i]]
    clean = [i for i in qual if i not in flagged]
    # the fixture must exercise EVERY stage
    assert len(exact) < len(universe)
    assert len(clos) < len(exact)
    assert len(qual) < len(clos)
    assert len(clean) < len(qual)

    surv = spark.createDataFrame(
        [(i, src[i], ntok[i]) for i in clean],
        "doc_id long, source string, n_tok long",
    )
    rates = {r["source"]: r["rate"] for r in x6n_rates(surv).collect()}
    sampled = [
        i for i in clean
        if ((i % 2147483648) * 2654435761) % 4294967296
        < rates[src[i]] * 4294967296
    ]
    packed = x6b2_pack(
        spark.createDataFrame(
            [(i, src[i], ntok[i]) for i in sampled],
            "doc_id long, source string, n_tokens long",
        )
    ).collect()

    got = {r["source"]: r for r in e3_curation_pipeline(spark, sf_dir).collect()}
    assert set(got) == {"s", "s2"}
    for s in got:
        r = got[s]
        assert r["n_docs"] == sum(1 for i in universe if src[i] == s)
        assert r["n_exact"] == sum(1 for i in exact if src[i] == s)
        assert r["n_closure"] == sum(1 for i in clos if src[i] == s)
        assert r["n_quality"] == sum(1 for i in qual if src[i] == s)
        assert r["n_clean"] == sum(1 for i in clean if src[i] == s)
        assert r["rate"] == rates[s]
        assert r["n_sampled"] == sum(1 for i in sampled if src[i] == s)
        assert r["sampled_tokens"] == sum(
            ntok[i] for i in sampled if src[i] == s
        )
        assert r["n_bins"] == len(
            {p["bin_id"] for p in packed if p["source"] == s}
        )
        assert r["packed_tokens"] == sum(
            p["n_tokens"] for p in packed if p["source"] == s
        )


def test_x6y4_reelection_after_bridge_removal(spark):
    """x6y4 law on the x2e4 planted corpus: tombstoning bridge doc 3
    (the {1,3,4} cluster's OLD survivor — longest at 21 chars) splits
    the family, so BOTH fragments re-elect (old_survivor_lost, crown
    moved); in {5,6,23} the tombstoned leaf 23 was never the survivor,
    so doc 5 keeps the crown (keep_is_old, freed_chars = doc 6's 13);
    the dissolved singleton {13} yields no row."""
    import ssn_college_software_architecture_assignments__spark.operators.dedup as dmod
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6y4_retraction_survivorship,
    )

    texts = {
        1: "a b c d e f g",
        3: "a b c d e f q r s t u",
        4: "q r s t u v w",
        5: "h i j k l m n",
        6: "h i j k l m z",
        23: "i j k l m n",
        13: "z1 z2 z3 z4",
        7: "u1 u2 u3 u4 u5 u6",
        8: "u1 u2 u3 u4 u5 u7",
    }
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in texts.items()],
        "doc_id long, text string, n_chars long",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    # x6y4 reads Catalog in BOTH modules: dedup (members) and curation
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod

    origs = (dmod.Catalog, cmod.Catalog)
    dmod.Catalog = cmod.Catalog = _Cat
    try:
        rows = {
            r["new_cluster"]: r
            for r in x6y4_retraction_survivorship(spark, "x").collect()
        }
    finally:
        dmod.Catalog, cmod.Catalog = origs

    assert set(rows) == {1, 4, 5}
    assert all(r["closure_converged"] for r in rows.values())
    for nc in (1, 4):
        r = rows[nc]
        assert r["standing_cluster"] == 1
        assert r["old_keep_id"] == 3 and r["old_survivor_lost"]
        assert not r["keep_is_old"]
        assert r["n_members"] == 1 and r["keep_doc_id"] == nc
        assert r["freed_chars"] == 0
    r5 = rows[5]
    assert r5["standing_cluster"] == 5
    assert r5["old_keep_id"] == 5 and not r5["old_survivor_lost"]
    assert r5["keep_is_old"] and r5["keep_doc_id"] == 5
    assert r5["n_members"] == 2 and r5["freed_chars"] == 13


def test_x6b3_takedown_audit_planted_bins(spark, tmp_path):
    """x6b3 law on a planted single-source corpus whose BFD packing is
    hand-derivable: cap 2048, docs sized 2000/1500/500/48 with ids
    chosen so exactly one is tombstoned (doc_id % 10 = 3). BFD places
    2000+48 in bin 0 and 1500+500 in bin 1; tombstoned doc 23 (1500
    tokens) dirties bin 1 only, dragging the 500-token doc as
    collateral; bin 0 stays clean."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6b3_takedown_pack_audit,
    )

    mk = lambda n: " ".join(["w"] * n)
    rows = [
        (1, mk(2000)),   # bin 0 (opens)
        (23, mk(1500)),  # bin 1 (opens; 2000+1500 > cap) — TOMBSTONED
        (4, mk(500)),    # bin 1 (1500+500 = 2000 <= cap; bin 1 fuller)
        (6, mk(48)),     # bin 0 (2000+48 = 2048 <= cap; bin 0 fullest feasible)
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    out = x6b3_takedown_pack_audit(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["source"] == "s"
    assert r["n_bins"] == 2
    assert r["n_dirty_bins"] == 1
    assert r["n_tomb_docs"] == 1
    assert r["n_collateral_docs"] == 1
    assert r["tokens_rewritten"] == 500
    assert r["tokens_freed"] == 1500


def test_e3_pipeline_source_with_zero_survivors_keeps_row(spark, tmp_path):
    """e3 contract for a source the funnel kills entirely: src 'dead'
    has only a spam doc (fails the x4t quality gate), so it reaches
    the manifest with its attrition counts but NULL mixture rate (it
    never enters the survivor-derived rates) and zeroed sampling/
    packing stats — while the healthy source still flows end to end.
    Both engines must agree on the NULL/zero posture (driver hash
    covers the fixture corpus; this pins the planted edge)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        e3_curation_pipeline,
    )

    good = " ".join(f"word{i}" for i in range(25))
    spam = " ".join(["junk"] * 30)
    rows = [
        (1, good, "en", "ok"),
        (9, " ".join(f"note{i}" for i in range(30)), "en", "ok"),
        (2, spam, "en", "dead"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {r["source"]: r for r in e3_curation_pipeline(spark, sf_dir).collect()}
    assert set(got) == {"ok", "dead"}
    d = got["dead"]
    assert d["n_docs"] == 1 and d["n_clean"] == 0
    assert d["rate"] is None
    assert (d["n_sampled"], d["sampled_tokens"], d["n_bins"],
            d["packed_tokens"]) == (0, 0, 0, 0)
    ok = got["ok"]
    assert ok["n_clean"] >= 1 and ok["rate"] is not None


def test_x6b2_fold_halves_match_python_reference_randomized(spark):
    """Randomized cross-engine law for the x6b2 BFD fold: 5 seeded
    random size sets run through the Spark x6b2_pack fold, the DuckDB
    _x6b2_fold_ctes chain on a REGISTERED in-memory frame (the layout
    class that corrupted x2j2's pre-fix identity-return fold), and a
    pure-python best-fit-decreasing reference — every (doc, bin)
    assignment must agree, including tie resolution (fullest feasible
    bin, lowest index on load ties)."""
    import random

    import duckdb
    import pandas as pd
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _X6B2_CAP,
        _x6b2_fold_ctes,
        x6b2_pack,
    )

    for seed in range(5):
        rng = random.Random(100 + seed)
        docs = [(i, rng.randint(100, 1500)) for i in range(20)]

        # python BFD reference
        loads, asg = [], {}
        for i, s in sorted(docs, key=lambda d: (-d[1], d[0])):
            feas = [(ld, b) for b, ld in enumerate(loads)
                    if ld + s <= _X6B2_CAP]
            if not feas:
                asg[i] = len(loads)
                loads.append(s)
            else:
                best = max(feas, key=lambda t: (t[0], -t[1]))[1]
                asg[i] = best
                loads[best] += s

        sdf = spark.createDataFrame(
            [(i, "s", s) for i, s in docs],
            "doc_id long, source string, n_tokens long",
        )
        got_spark = {
            r["doc_id"]: r["bin_id"] for r in x6b2_pack(sdf).collect()
        }
        assert got_spark == asg, f"seed {seed}: spark half"

        con = duckdb.connect()
        con.register(
            "tdocs",
            pd.DataFrame(
                {"doc_id": [i for i, _ in docs],
                 "source": ["s"] * len(docs),
                 "n_tokens": [s for _, s in docs]}
            ),
        )
        got_duck = {
            int(r[0]): int(r[1])
            for r in con.execute(
                "WITH "
                + _x6b2_fold_ctes(
                    "SELECT doc_id, source, n_tokens FROM tdocs"
                )
                + " SELECT u[1], u[2] FROM "
                "(SELECT unnest(st[2:]) AS u FROM folded)"
            ).fetchall()
        }
        assert got_duck == asg, f"seed {seed}: duck half"


def test_x6q_leakage_planted_cross_split_pair(spark):
    """x6q law on a planted corpus: two identical docs whose ids hash
    into train and test buckets form exactly one train/test leakage
    pair (2 docs, their combined chars); a third identical doc in val
    adds val pairs; an unrelated singleton contributes nothing. Ids
    are CHOSEN by the split-hash formula inside the test, so the
    planted classes are guaranteed, not lucky."""
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6q_split_leakage_audit,
    )

    def bucket(i):
        return ((i % 2147483648) * 2654435761) % 4294967296 % 100

    train_id = next(i for i in range(1, 500) if bucket(i) < 80)
    test_id = next(i for i in range(1, 500) if bucket(i) >= 90)
    val_id = next(i for i in range(1, 500) if 80 <= bucket(i) < 90)
    text = "a b c d e f g h"  # 6 shingles >= 3 shared
    df = spark.createDataFrame(
        [
            (train_id, text, 100),
            (test_id, text, 40),
            (val_id, text, 7),
            (next(i for i in range(500, 900) if bucket(i) < 80),
             "z1 z2 z3 z4 z5", 11),
        ],
        "doc_id long, text string, n_chars long",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig = cmod.Catalog
    cmod.Catalog = _Cat
    try:
        rows = {
            (r["split_lo"], r["split_hi"]): r
            for r in x6q_split_leakage_audit(spark, "x").collect()
        }
    finally:
        cmod.Catalog = orig

    assert set(rows) == {("test", "train"), ("test", "val"), ("train", "val")}
    tt = rows[("test", "train")]
    assert tt["n_pairs"] == 1 and tt["n_docs"] == 2
    assert tt["leaked_chars"] == 140
    tv = rows[("test", "val")]
    assert tv["n_pairs"] == 1 and tv["n_docs"] == 2
    assert tv["leaked_chars"] == 47
    rv = rows[("train", "val")]
    assert rv["n_pairs"] == 1 and rv["n_docs"] == 2
    assert rv["leaked_chars"] == 107


def test_x6q2_planted_straddlers_land_in_one_split_zero_leakage(spark):
    """x6q2 law on the SAME planted corpus whose per-document split
    leaks in all three classes under x6q: the three identical docs
    (hash-chosen train/test/val ids) form one x2e2b family, so the
    family-keyed split lands them ALL in the representative's split
    (min doc_id = the train-bucket id here) and the recomputed
    leakage audit is exactly zero; the unrelated singleton falls back
    to its own hash (a val-bucket id by construction)."""
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    import ssn_college_software_architecture_assignments__spark.operators.dedup as dmod
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6q2_cluster_coherent_split,
    )

    def bucket(i):
        return ((i % 2147483648) * 2654435761) % 4294967296 % 100

    train_id = next(i for i in range(1, 500) if bucket(i) < 80)
    test_id = next(i for i in range(1, 500) if bucket(i) >= 90)
    val_id = next(i for i in range(1, 500) if 80 <= bucket(i) < 90)
    lone_id = next(i for i in range(500, 900) if 80 <= bucket(i) < 90)
    text = "a b c d e f g h"  # 6 shingles >= 3 shared
    df = spark.createDataFrame(
        [
            (train_id, text, "s", 100),
            (test_id, text, "s", 40),
            (val_id, text, "s", 7),
            (lone_id, "z1 z2 z3 z4 z5", "s", 11),
        ],
        "doc_id long, text string, source string, n_chars long",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig_c, orig_d = cmod.Catalog, dmod.Catalog
    cmod.Catalog = _Cat
    dmod.Catalog = _Cat
    try:
        rows = {
            (r["source"], r["split"]): r
            for r in x6q2_cluster_coherent_split(spark, "x").collect()
        }
    finally:
        cmod.Catalog = orig_c
        dmod.Catalog = orig_d

    assert train_id == min(train_id, test_id, val_id)  # rep is the train id
    assert set(rows) == {("s", "train"), ("s", "val")}
    fam = rows[("s", "train")]
    assert fam["n_docs"] == 3 and fam["n_chars_total"] == 147
    lone = rows[("s", "val")]
    assert lone["n_docs"] == 1 and lone["n_chars_total"] == 11
    assert all(r["leaked_pairs"] == 0 for r in rows.values())
    assert all(r["closure_converged"] for r in rows.values())


def test_x6b4_untouched_bins_bit_identical_and_collateral_migrates(spark, tmp_path):
    """x6b4 law on the x6b3 planted packing (bin 0 = docs 1+6 clean,
    bin 1 = tombstoned doc 23 + collateral doc 4): the clean bin's
    rows carry through BIT-identical to the standing x6b2 layout, the
    tombstoned doc vanishes, and the collateral doc re-packs into the
    fresh bin base = 1 + max standing bin id."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6b2_bfd_packing,
        x6b4_incremental_repack,
    )

    mk = lambda n: " ".join(["w"] * n)
    rows = [
        (1, mk(2000)),   # bin 0 (opens)
        (23, mk(1500)),  # bin 1 (opens) — TOMBSTONED (doc_id % 10 = 3)
        (4, mk(500)),    # bin 1 (best fit)
        (6, mk(48)),     # bin 0 (fullest feasible)
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    standing = {
        r["doc_id"]: r for r in x6b2_bfd_packing(spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]: r for r in x6b4_incremental_repack(spark, sf_dir).collect()
    }
    assert set(got) == {1, 4, 6}  # doc 23 is taken down
    for vid in (1, 6):  # untouched bin 0: bit-identical carry-through
        assert got[vid]["bin_id"] == standing[vid]["bin_id"] == 0
        assert got[vid]["n_tokens"] == standing[vid]["n_tokens"]
        assert got[vid]["migrated"] is False
    # collateral doc 4 migrates into base = 1 + max(bin_id) = 2
    assert got[4]["bin_id"] == 2
    assert got[4]["migrated"] is True
    assert got[4]["n_tokens"] == 500


def test_x6_split_and_x6b2_fold_builders_are_byte_identical_at_defaults():
    """The r17 builder splits (x6q2's hash/CASE parameterization and
    x6b4's fold-CTE prefix) must reproduce the registered r16 strings
    BYTE-identically at their defaults — the byte-identity law every
    oracle-reuse refactor carries (the _X2E3_CTES precedent)."""
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        _BUCKET_SQL,
        _HASH_SQL,
        _X6_ORACLE,
        _bucket_sql,
        _hash_sql,
        _split_case_sql,
        _x6b2_fold_ctes,
    )

    assert _hash_sql() == "((doc_id % 2147483648) * 2654435761) % 4294967296"
    assert _HASH_SQL == _hash_sql()
    assert _BUCKET_SQL == _bucket_sql() == f"{_HASH_SQL} % 100"
    golden = f"""
SELECT doc_id,
       CAST({_BUCKET_SQL} AS BIGINT) AS bucket,
       CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_BUCKET_SQL} < 90 THEN 'val'
            ELSE 'test' END          AS split
FROM documents
"""
    assert _X6_ORACLE == golden  # the pre-builder r16 string, verbatim
    assert _split_case_sql("B") == (
        "CASE WHEN B < 80 THEN 'train'\n"
        "            WHEN B < 90 THEN 'val'\n"
        "            ELSE 'test' END"
    )
    q = "SELECT doc_id, source, n_tokens FROM anywhere"
    assert _x6b2_fold_ctes(q) == _x6b2_fold_ctes(q, prefix="")
    prefixed = _x6b2_fold_ctes(q, prefix="r")
    for name in ("rt AS (", "rlst AS (", "rfolded AS (", "FROM rt", "FROM rlst"):
        assert name in prefixed, name


def test_x6b5_reconciliation_on_planted_takedown(spark, tmp_path):
    """x6b5 law on the x6b3/x6b4 planted packing: the prediction and
    the executed manifest reconcile exactly — 1 dirty bin, 1
    collateral doc migrated carrying its 500 tokens, 1 fresh bin
    opened (bin_delta 0), both verdicts true."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6b5_repack_reconciliation,
    )

    mk = lambda n: " ".join(["w"] * n)
    rows = [(1, mk(2000)), (23, mk(1500)), (4, mk(500)), (6, mk(48))]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    out = x6b5_repack_reconciliation(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_dirty_bins"] == 1
    assert r["n_collateral_docs"] == r["n_migrated_docs"] == 1
    assert r["tokens_rewritten"] == r["migrated_tokens"] == 500
    assert r["n_new_bins"] == 1 and r["bin_delta"] == 0
    assert r["docs_reconcile"] is True and r["tokens_reconcile"] is True


def test_x6q3_ratio_drift_on_planted_family(spark):
    """x6q3 law on the x6q2 planted corpus (4 docs: a 3-doc family
    whose members hash doc-level into train/val/test but land
    family-level in train; a val-bucket singleton): doc-level counts
    train/val/test = 1/2/1, family-level 3/1/0 — the test class
    empties under the family split (doc_delta -1) yet stays VISIBLE
    via the full outer join, train gains two, val loses the family
    member it only had doc-level. ppm values are exact BIGINT floor
    divisions of 4."""
    import ssn_college_software_architecture_assignments__spark.operators.curation as cmod
    import ssn_college_software_architecture_assignments__spark.operators.dedup as dmod
    from ssn_college_software_architecture_assignments__spark.operators.curation import (
        x6q3_split_ratio_drift,
    )

    def bucket(i):
        return ((i % 2147483648) * 2654435761) % 4294967296 % 100

    train_id = next(i for i in range(1, 500) if bucket(i) < 80)
    test_id = next(i for i in range(1, 500) if bucket(i) >= 90)
    val_id = next(i for i in range(1, 500) if 80 <= bucket(i) < 90)
    lone_id = next(i for i in range(500, 900) if 80 <= bucket(i) < 90)
    text = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (train_id, text, "s", 100),
            (test_id, text, "s", 40),
            (val_id, text, "s", 7),
            (lone_id, "z1 z2 z3 z4 z5", "s", 11),
        ],
        "doc_id long, text string, source string, n_chars long",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig_c, orig_d = cmod.Catalog, dmod.Catalog
    cmod.Catalog = _Cat
    dmod.Catalog = _Cat
    try:
        rows = {
            r["split"]: r for r in x6q3_split_ratio_drift(spark, "x").collect()
        }
    finally:
        cmod.Catalog = orig_c
        dmod.Catalog = orig_d

    assert set(rows) == {"train", "val", "test"}
    tr, va, te = rows["train"], rows["val"], rows["test"]
    assert (tr["n_docs_doc"], tr["n_docs_family"], tr["doc_delta"]) == (1, 3, 2)
    assert (va["n_docs_doc"], va["n_docs_family"], va["doc_delta"]) == (2, 1, -1)
    assert (te["n_docs_doc"], te["n_docs_family"], te["doc_delta"]) == (1, 0, -1)
    assert tr["doc_ppm"] == 250_000 and tr["family_ppm"] == 750_000
    assert te["family_ppm"] == 0
    assert all(r["closure_converged"] for r in rows.values())
