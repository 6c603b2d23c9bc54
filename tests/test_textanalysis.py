"""Closed-form tests for text-analysis operators (X4 family)."""

from __future__ import annotations


def test_source_vocab_overlap_closed_form(spark, tmp_path):
    """x4m on a handmade corpus: src0 vocab {a,b,c,d}, src1 {c,d,e,f},
    src2 {x,y}. Exactly one pair row appears (src0,src1) with
    intersection 2, union 6, Jaccard 1/3 — zero-overlap pairs are
    absent by convention, and vocab sizes count DISTINCT tokens across
    a source's documents (dup tokens planted to prove it)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4m_source_vocab_overlap,
    )

    rows = [
        (1, "a b c", "en", "src0"),
        (2, "c d a a", "en", "src0"),   # dup tokens + cross-doc repeat
        (3, "c d e", "en", "src1"),
        (4, "e f", "en", "src1"),
        (5, "x y x", "en", "src2"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    out = x4m_source_vocab_overlap(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("src0", "src1")
    assert (r["n_vocab_a"], r["n_vocab_b"], r["n_shared"]) == (4, 4, 2)
    assert r["jaccard"] == round(2 / 6, 4)


def test_lang_confusion_closed_form(spark, tmp_path):
    """x4e2 cells on a handmade corpus: 2 'en'-labeled docs guessed en,
    1 'en'-labeled doc with French markers guessed fr, 1 'fr'-labeled
    doc with no markers guessed und. labeled_share is exact per labeled
    language; the en diagonal share (= recall) is 2/3."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4e2_lang_confusion,
    )

    rows = [
        (1, "the cat and dog", "en", "s"),
        (2, "house of the king", "en", "s"),
        (3, "le chien et le chat", "en", "s"),   # mislabeled: french text
        (4, "xyzzy plugh", "fr", "s"),           # no markers -> und
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r["labeled_lang"], r["guessed_lang"]): (r["n_docs"], r["labeled_share"])
        for r in x4e2_lang_confusion(spark, sf_dir).collect()
    }
    assert got == {
        ("en", "en"): (2, round(2 / 3, 4)),
        ("en", "fr"): (1, round(1 / 3, 4)),
        ("fr", "und"): (1, 1.0),
    }, got


def test_token_entropy_closed_form(spark, tmp_path):
    """x4o laws on handmade sources: a uniform 4-token source has
    entropy exactly 2 bits (norm 1.0); a constant source has entropy 0;
    a skewed 2-token source matches the hand-computed H."""
    import math
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4o_token_entropy,
    )

    rows = [
        (1, "a b c d a b c d", "uniform"),        # 4 tokens x2 each
        (2, "x x x x x x", "constant"),           # single token
        (3, "y y y z", "skewed"),                 # p = [0.75, 0.25]
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {r["source"]: r for r in x4o_token_entropy(spark, sf_dir).collect()}
    assert got["uniform"]["entropy_bits"] == 2.0
    assert got["uniform"]["entropy_norm"] == 1.0
    assert got["constant"]["entropy_bits"] == 0.0
    assert got["constant"]["entropy_norm"] is None   # log2(1) guard
    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert got["skewed"]["entropy_bits"] == round(h, 4)
    assert got["skewed"]["n_tokens"] == 4 and got["skewed"]["n_distinct"] == 2

    # repr-level oracle agreement on the zero-entropy edge: DuckDB's
    # fold yields -0.0 there and the comparator is repr-based, so the
    # oracle must normalize it (the `+ 0.0` in _X4O_ORACLE)
    import duckdb

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        _X4O_ORACLE,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    du = {r[0]: r for r in con.execute(_X4O_ORACLE).fetchall()}
    assert repr(float(du["constant"][3])) == "0.0"   # not '-0.0'


def test_zipf_fit_recovers_exact_power_law(spark, tmp_path):
    """x4p law: a corpus whose token frequencies are EXACTLY C*rank^-1
    (12, 6, 4, 3 at ranks 1..4) must fit slope -1, intercept ln(12),
    R^2 = 1 — the regr_* moments reduced to a known closed form."""
    import math
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4p_zipf_fit,
    )

    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(1, text, "en", "s1", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    [row] = x4p_zipf_fit(spark, sf_dir).collect()
    assert row["n_fit"] == 4
    assert row["zipf_slope"] == -1.0
    assert row["zipf_intercept"] == round(math.log(12.0), 4)
    assert row["r2"] == 1.0


def test_readability_closed_form_counts_and_score(spark, tmp_path):
    """x4q law on a handmade sentence pair: 6 words, 2 sentence runs,
    9 vowel-group syllables -> Flesch 206.835 - 1.015*3 - 84.6*1.5 =
    76.89 (exact at the floor(x*100)/100 law); a punctuation-free doc
    floors sentences at 1."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4q_readability,
    )

    rows = [
        (1, "Hello world. How are you today?"),
        (2, "no punctuation here at all"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, "en", "s1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {r["doc_id"]: r for r in x4q_readability(spark, sf_dir).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 9)
    assert r1["flesch"] == 76.89
    assert got[2]["n_sentences"] == 1


def test_bigram_logprob_closed_form_and_normalization(spark, tmp_path):
    """x4s law on a handmade corpus, recomputed in pure Python — and the
    reason ctx() (not raw unigram counts) is the denominator: for any
    context, sum over the whole vocabulary of (c2+1)/(ctx+V) is exactly
    1, a genuine conditional distribution."""
    import math
    import os
    from collections import Counter

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4s_bigram_logprob,
    )

    rows = [(1, "a b a b c"), (2, "b c a"), (3, "solo")]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, "en", "s1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    c2: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    bigrams = {}
    for i, t in rows:
        w = t.split()
        vocab.update(w)
        bigrams[i] = list(zip(w, w[1:]))
        for p, c in bigrams[i]:
            c2[(p, c)] += 1
            c1[p] += 1
    v = len(vocab)

    def lp(p, c):
        return math.log((c2[(p, c)] + 1.0) / (c1[p] + v))

    got = {r["doc_id"]: r for r in x4s_bigram_logprob(spark, sf_dir).collect()}
    assert sorted(got) == [1, 2]  # doc 3 has no bigrams -> absent
    for i in (1, 2):
        ref = sum(lp(p, c) for p, c in bigrams[i]) / len(bigrams[i])
        assert got[i]["n_bigrams"] == len(bigrams[i])
        assert got[i]["avg_logprob"] == round(ref, 4)
    # normalization identity for context 'a' (2 occurrences as context)
    total = sum((c2[("a", w)] + 1.0) / (c1["a"] + v) for w in vocab)
    assert abs(total - 1.0) < 1e-12


def test_x4u_bm25_tie_break_and_rank_laws(spark, tmp_path):
    """x4u tie law, closed-form: two byte-identical documents score
    identically for every query (the integer micro-unit flooring makes
    equality EXACT, not epsilon-close) and the lower doc_id takes the
    lower rank; ranks are a gapless 1..n per query, ordered by
    (score desc, doc_id asc); docs matching no query term never
    appear."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4u_bm25_retrieval,
    )

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["dup join", "join join join", "table scan", "dup join"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = x4u_bm25_retrieval(spark, str(tmp_path)).collect()

    q0 = [r for r in out if r["query_id"] == 0]  # terms: dup, join
    score = {r["doc_id"]: r["score_micro"] for r in q0}
    rnk = {r["doc_id"]: r["rnk"] for r in q0}
    assert score[0] == score[3]  # identical docs -> exactly equal
    assert rnk[0] < rnk[3]       # doc_id breaks the tie
    assert 2 not in rnk          # no query-0 term -> never ranked

    for q in {r["query_id"] for r in out}:
        rows = sorted(
            (r for r in out if r["query_id"] == q), key=lambda r: r["rnk"]
        )
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["score_micro"] > b["score_micro"] or (
                a["score_micro"] == b["score_micro"]
                and a["doc_id"] < b["doc_id"]
            )


def test_x4v_rrf_single_leg_surfaces_and_tie_law(spark, tmp_path):
    """x4v fusion laws, closed-form on a planted corpus: (a) a doc
    ranked by only ONE leg still surfaces (doc 30 is the only lexical
    match for query 0 but is embedded anti-aligned to the anchor; doc
    20 is the anchor's nearest vector but contains no query term —
    both must appear); (b) both carry the identical single-leg rank-1
    contribution 1000000 div 61 = 16393 EXACTLY (integer division, no
    calibration), so (c) the doc_id tie law puts 20 at fused rank 1
    and 30 at rank 2."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4v_hybrid_rrf_fusion,
    )

    n = 50
    texts = ["table scan only"] * n
    texts[30] = "dup join"  # the ONLY doc matching query 0's terms
    pd.DataFrame({"doc_id": range(n), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    embs = []
    for i in range(n):
        if i == 7:                       # query 0's anchor
            embs.append([1.0, 0.0, 0.0, 0.0])
        elif i == 20:                    # near-perfect anchor match
            embs.append([1.0, 0.01, 0.0, 0.0])
        elif i == 30:                    # anti-aligned: never in top-10
            embs.append([-1.0, 0.1, 0.0, 0.0])
        else:                            # cos strictly decreasing in i
            embs.append([1.0, 0.5 + i / 100.0, 0.0, 0.0])
    pd.DataFrame({"vec_id": range(n), "embedding": embs}).to_parquet(
        tmp_path / "embeddings.parquet"
    )

    out = x4v_hybrid_rrf_fusion(spark, str(tmp_path)).collect()
    q0 = {r["doc_id"]: r for r in out if r["query_id"] == 0}
    assert 20 in q0 and 30 in q0               # (a) both legs surface
    assert q0[20]["sparse_rnk"] is None and q0[20]["dense_rnk"] == 1
    assert q0[30]["sparse_rnk"] == 1 and q0[30]["dense_rnk"] is None
    assert q0[20]["rrf_micro"] == q0[30]["rrf_micro"] == 1_000_000 // 61
    assert q0[20]["rnk"] == 1 and q0[30]["rnk"] == 2   # (c) id tie law
    # every query's ranks are gapless and ordered by (score, doc_id)
    for q in {r["query_id"] for r in out}:
        rows = sorted(
            (r for r in out if r["query_id"] == q), key=lambda r: r["rnk"]
        )
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["rrf_micro"] > b["rrf_micro"] or (
                a["rrf_micro"] == b["rrf_micro"] and a["doc_id"] < b["doc_id"]
            )


def test_x4x_metrics_match_python_closure_on_planted_corpus(spark):
    """x4x metric law on a 5-doc planted corpus: grades and the ideal
    ranking are hand-derived (q2's IDCG pinned to its exact integer),
    recall/MRR follow from the relevance law, and DCG/nDCG must equal a
    python recompute (math floor arithmetic) driven by x4u's own
    ranking — so the metric layer is pinned independently of BM25."""
    import math

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        _X4U_QUERIES,
        _X4U_SCALE,
        _X4U_TOPK,
        x4u_bm25_retrieval,
        x4x_retrieval_eval,
    )
    import ssn_college_software_architecture_assignments__spark.operators.textanalysis as tmod

    docs = spark.createDataFrame(
        [
            (1, "vector stream"),           # q2 grade 2 (relevant)
            (2, "vector vector vector vector"),  # q2 grade 1
            (3, "stream"),                  # q2 grade 1
            (4, "hash merge sort"),         # q1 grade 3 (relevant)
            (5, "alpha beta"),              # matches nothing
        ],
        "doc_id long, text string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = docs

    orig = tmod.Catalog
    tmod.Catalog = _Cat
    try:
        ranked = [r.asDict() for r in x4u_bm25_retrieval(spark, "x").collect()]
        out = {r["query_id"]: r for r in x4x_retrieval_eval(spark, "x").collect()}
    finally:
        tmod.Catalog = orig

    # python closure: grades + relevance from the corpus and query set
    texts = {1: "vector stream", 2: "vector vector vector vector",
             3: "stream", 4: "hash merge sort", 5: "alpha beta"}
    qterms = {}
    for qid, t in _X4U_QUERIES:
        qterms.setdefault(qid, set()).add(t)
    grade = {
        (qid, d): len(ts & set(txt.split()))
        for qid, ts in qterms.items() for d, txt in texts.items()
    }

    def dcg_term(g, pos):
        return math.floor(_X4U_SCALE * g / (math.log(pos + 1) / math.log(2)))

    for qid, ts in qterms.items():
        graded = sorted(
            ((grade[(qid, d)], d) for d in texts if grade[(qid, d)] > 0),
            key=lambda t: (-t[0], t[1]),
        )
        if not graded:
            assert qid not in out
            continue
        row = out[qid]
        n_rel = sum(1 for g, _ in graded if g == len(ts))
        assert row["n_relevant"] == n_rel
        idcg = sum(dcg_term(g, i + 1) for i, (g, _) in enumerate(graded[:_X4U_TOPK]))
        assert row["idcg_micro"] == idcg
        sys_rows = sorted(
            (r for r in ranked if r["query_id"] == qid), key=lambda r: r["rnk"]
        )
        dcg = sum(dcg_term(grade[(qid, r["doc_id"])], r["rnk"]) for r in sys_rows)
        assert row["dcg_micro"] == dcg
        hits = sum(1 for r in sys_rows if grade[(qid, r["doc_id"])] == len(ts))
        assert row["hits_at_k"] == hits
        assert row["recall_micro"] == (
            (_X4U_SCALE * hits) // n_rel if n_rel else 0
        )
        first = next(
            (r["rnk"] for r in sys_rows if grade[(qid, r["doc_id"])] == len(ts)),
            None,
        )
        assert row["mrr_micro"] == (_X4U_SCALE // first if first else 0)
        assert row["ndcg_micro"] == (
            (_X4U_SCALE * dcg) // idcg if idcg else 0
        )

    # hand-pinned q2 values: graded docs {1: grade2, 2: grade1, 3: grade1},
    # ideal = [2,1,1] -> IDCG = 2e6 + floor(1e6/log2(3)) + 5e5
    assert out[2]["n_relevant"] == 1
    assert out[2]["recall_micro"] == _X4U_SCALE  # the one relevant doc retrieved
    assert out[2]["idcg_micro"] == 2_000_000 + 630_929 + 500_000


def test_x4y_keywords_prefer_distinctive_terms(spark):
    """x4y law on a planted corpus: a term appearing in every doc
    (stopword) has minimal idf, so a doc's rare term outranks its more
    frequent stopword whenever tf * idf says so; ranks are dense; the
    lexicographic tie law orders equal-score terms."""
    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4y_keyword_extract,
    )
    import ssn_college_software_architecture_assignments__spark.operators.textanalysis as tmod

    df = spark.createDataFrame(
        [
            # "the" is in all 4 docs; each doc has one unique term
            (1, "the the the zebra"),
            (2, "the quark"),
            (3, "the the photon"),
            (4, "the gluon gluon"),
        ],
        "doc_id long, text string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig = tmod.Catalog
    tmod.Catalog = _Cat
    try:
        rows = {}
        for r in x4y_keyword_extract(spark, "x").collect():
            rows.setdefault(r["doc_id"], []).append(r)
    finally:
        tmod.Catalog = orig

    import math

    idf_unique = math.log(5.0 / 2.0) + 1.0   # df=1, N=4
    idf_stop = math.log(5.0 / 5.0) + 1.0     # df=4 -> idf exactly 1
    for d in (1, 2, 3, 4):
        got = sorted(rows[d], key=lambda r: r["rnk"])
        assert [r["rnk"] for r in got] == list(range(1, len(got) + 1))
    # doc 1: zebra tf=1 (score ~1.916) beats "the" tf=3 (score 3.0)?
    # no — 3.0 > 1.916, so "the" wins on raw tf; doc 2: quark (1.916)
    # beats "the" tf=1 (1.0) — the distinctiveness law
    assert rows[1][0]["term"] == "the" and rows[1][0]["rnk"] == 1
    d2 = {r["term"]: r for r in rows[2]}
    assert d2["quark"]["rnk"] == 1 and d2["the"]["rnk"] == 2
    assert d2["quark"]["tfidf"] == round(idf_unique, 4)
    assert d2["the"]["tfidf"] == round(idf_stop, 4)
    # doc 4: gluon tf=2 -> 2 * 1.9163 beats "the"
    d4 = {r["term"]: r for r in rows[4]}
    assert d4["gluon"]["rnk"] == 1
    assert d4["gluon"]["tfidf"] == round(2 * idf_unique, 4)


def test_x4x_zero_relevant_query_guards_to_zero(spark):
    """x4x guard branch: a query whose terms each occur in the corpus
    but never ALL in one doc has n_relevant = 0 -> recall_micro and
    mrr_micro pin to 0 (no division), while graded docs still produce a
    positive idcg and a well-defined ndcg."""
    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4x_retrieval_eval,
    )
    import ssn_college_software_architecture_assignments__spark.operators.textanalysis as tmod

    # q2 = {vector, stream}: present separately, never together
    df = spark.createDataFrame(
        [(1, "vector vector"), (2, "stream stream"), (3, "alpha beta")],
        "doc_id long, text string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig = tmod.Catalog
    tmod.Catalog = _Cat
    try:
        rows = {r["query_id"]: r for r in x4x_retrieval_eval(spark, "x").collect()}
    finally:
        tmod.Catalog = orig

    r = rows[2]
    assert r["n_relevant"] == 0 and r["hits_at_k"] == 0
    assert r["recall_micro"] == 0 and r["mrr_micro"] == 0
    assert r["idcg_micro"] > 0 and r["dcg_micro"] > 0
    assert r["ndcg_micro"] == (1_000_000 * r["dcg_micro"]) // r["idcg_micro"]


def test_x4z_mmr_demotes_near_duplicate(spark, tmp_path):
    """The law x4z exists for, closed-form: query 0's BM25 top-3 are
    three equal-scoring docs ranked by doc_id — doc 2 a near-duplicate
    of doc 1 (token-Jaccard 5/7), doc 3 lexically distinct (2/10). At
    lambda = 1/2 greedy MMR keeps doc 1 first, DEMOTES the duplicate:
    doc 3 takes mmr_rank 2 (16129 - 714285 < 15873 - 200000, both
    negative — the both-negative branch is the one a naive 'skip
    negatives' implementation gets wrong) and doc 2 falls to rank 3
    with max_sim_micro = 714285 exactly. Plain BM25's ordering is
    visible in the carried bm25_rnk column, so the demotion is pinned
    as a CONTRAST, not just an order."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4z_mmr_diversified_retrieval,
    )

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 9],
            "text": [
                "dup join a b c d",
                "dup join a b c e",   # near-dup of 1: |A∩B|=5, |A∪B|=7
                "dup join x y z w",   # shares only the query terms: 2/10
                "table scan only",    # filler, matches nothing
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = sorted(
        (r for r in x4z_mmr_diversified_retrieval(spark, str(tmp_path)).collect()
         if r["query_id"] == 0),
        key=lambda r: r["mmr_rank"],
    )
    assert [r["doc_id"] for r in out] == [1, 3, 2]
    assert [r["bm25_rnk"] for r in out] == [1, 3, 2]  # BM25 had 2 second
    r1, r3, r2 = out
    assert (r1["rel_micro"], r1["max_sim_micro"]) == (1000000 // 61, 0)
    assert r1["mmr_micro"] == 1000000 // 61
    # doc 3 beat doc 2 for rank 2 with BOTH candidates negative
    assert r3["max_sim_micro"] == (1000000 * 2) // 10
    assert r3["mmr_micro"] == 1000000 // 63 - 200000 < 0
    # doc 2's redundancy to the rank-1 pick, exact floored micro-units
    assert r2["max_sim_micro"] == (1000000 * 5) // 7 == 714285
    assert r2["mmr_micro"] == 1000000 // 62 - 714285
