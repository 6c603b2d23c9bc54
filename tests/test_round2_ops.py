"""Tests for the round-2 additions: stream-stream join (T9), snapshot
CDC diff (S14), statistical aggregates (A10), PII redaction (X4h)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.catalog import Catalog
from tests.conftest import SF_DIR_001
from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
    a10_stats_agg,
)
from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
    x4h_pii_redaction,
)
from ssn_college_software_architecture_assignments__spark.sources.sink import (
    s14_snapshot_diff,
    snapshot_diff,
)
from ssn_college_software_architecture_assignments__spark.streaming.windows import (
    t9_stream_stream_join,
)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """The streaming funnel join must emit exactly the batch join rows."""
    streamed = {
        (r["view_id"], r["purchase_id"])
        for r in t9_stream_stream_join(spark, sf_dir).collect()
    }
    ev = Catalog(spark, sf_dir).events
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("vts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    batch = {
        (r["view_id"], r["purchase_id"])
        for r in v.join(
            p,
            (F.col("u") == F.col("pu"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_snapshot_diff_classifies_all_change_types(spark, sf_dir):
    by_type = {
        r["change_type"]: r["n"]
        for r in s14_snapshot_diff(spark, sf_dir)
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    orders = Catalog(spark, sf_dir).orders
    n_del = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    n_ins = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    # updates: repriced (%10) minus those deleted (%7) — deletion wins
    n_upd = orders.filter(
        (F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 0)
    ).count()
    assert by_type.get("delete", 0) == n_del
    assert by_type.get("insert", 0) == n_ins
    assert by_type.get("update", 0) == n_upd


def test_snapshot_diff_emits_nothing_for_identical_snapshots(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    diff = snapshot_diff(
        orders, orders, ["o_orderkey"], ["o_totalprice", "o_orderpriority"]
    )
    assert diff.count() == 0


def test_stats_agg_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = a10_stats_agg(spark, sf_dir).collect()
    li = (
        Catalog(spark, sf_dir)
        .lineitem.select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for r in rows:
        q = li[li.l_returnflag == r["l_returnflag"]].l_quantity.to_numpy()
        p = li[li.l_returnflag == r["l_returnflag"]].l_extendedprice.to_numpy()
        assert abs(r["corr_qty_price"] - np.corrcoef(q, p)[0, 1]) < 1e-5
        assert abs(r["stddev_qty"] - q.std(ddof=1)) < 1e-5
        m = q.mean()
        sd = q.std(ddof=0)
        skew = ((q - m) ** 3).mean() / sd**3
        kurt = ((q - m) ** 4).mean() / sd**4 - 3
        assert abs(r["skewness_qty"] - skew) < 1e-5
        assert abs(r["kurtosis_qty"] - kurt) < 1e-5


def test_pii_redaction_catches_every_injected_instance(spark, sf_dir):
    out = x4h_pii_redaction(spark, sf_dir)
    n = out.count()
    assert n > 0
    # every doc had exactly one email and one phone injected
    assert out.filter(F.col("had_email") & F.col("had_phone")).count() == n


def test_dq_report_all_checks_pass_on_clean_fixture(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.operators.quality import (
        s8b_dq_report,
    )

    rows = s8b_dq_report(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["passed"] for r in rows)
    assert all(r["n_violations"] == 0 for r in rows)


def test_expectation_report_counts_violations(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.operators.quality import (
        expectation_report,
    )

    orders = Catalog(spark, sf_dir).orders
    rep = {
        r["check_name"]: r["n_violations"]
        for r in expectation_report(
            orders, {"low_price": F.col("o_totalprice") < 50000}
        ).collect()
    }
    expected = orders.filter(F.col("o_totalprice") < 50000).count()
    assert rep["low_price"] == expected > 0


def test_incremental_rollup_matches_full_recompute(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.operators.quality import (
        a11_incremental_rollup,
    )

    merged = {
        r["order_month"]: (r["n_orders"], r["revenue"])
        for r in a11_incremental_rollup(spark, sf_dir).collect()
    }
    orders = Catalog(spark, sf_dir).orders
    full = {
        r["order_month"]: (r["n_orders"], r["revenue"])
        for r in orders.groupBy(
            F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    }
    assert merged == full


def test_quarantine_split_routes_exactly_the_corrupted_slices(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        s15_quarantine_split,
    )

    out = s15_quarantine_split(spark, sf_dir)
    by_reason = {
        r["reject_reason"]: r["n"]
        for r in out.groupBy("reject_reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ev = Catalog(spark, sf_dir).events
    # precedence: bad_props > negative_value > unknown_type
    exp_props = ev.filter(F.col("event_id") % 89 == 0).count()
    exp_neg = ev.filter(
        (F.col("event_id") % 97 == 0) & (F.col("event_id") % 89 != 0)
    ).count()
    exp_type = ev.filter(
        (F.col("event_id") % 83 == 0)
        & (F.col("event_id") % 89 != 0)
        & (F.col("event_id") % 97 != 0)
    ).count()
    assert by_reason.get("bad_props", 0) == exp_props
    assert by_reason.get("negative_value", 0) == exp_neg
    assert by_reason.get("unknown_type", 0) == exp_type
    assert by_reason.get(None, 0) == ev.count() - exp_props - exp_neg - exp_type


def test_funnel_detect_matches_three_way_join(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w7_funnel_detect,
    )

    fast = {
        r["user_id"]: r["n_funnels"]
        for r in w7_funnel_detect(spark, sf_dir).collect()
    }
    # oracle by construction: for each purchase, the most recent qualifying
    # click must exist, where a qualifying click has a view <=30min before it
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type", "ts", "event_id")
    ev.createOrReplaceTempView("w7ev")
    slow = {
        r["user_id"]: r["n_funnels"]
        for r in spark.sql(
            """
            WITH s1 AS (
              SELECT *, last(CASE WHEN event_type = 'view' THEN ts END, true)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS recent_view
              FROM w7ev
            ), s2 AS (
              SELECT *, last(CASE WHEN event_type = 'click'
                                   AND ts <= recent_view + INTERVAL 30 MINUTES
                                  THEN ts END, true)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS recent_qclick
              FROM s1
            )
            SELECT user_id, count(*) AS n_funnels FROM s2
            WHERE event_type = 'purchase'
              AND ts <= recent_qclick + INTERVAL 30 MINUTES
            GROUP BY user_id
            """
        ).collect()
    }
    assert fast == slow


def test_union_schema_drift_nullfills_by_name(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.operators.setops import (
        u4_union_schema_drift,
    )

    out = u4_union_schema_drift(spark, sf_dir)
    orders = Catalog(spark, sf_dir).orders
    assert out.count() == orders.count()
    assert out.filter(
        (F.col("o_orderkey") % 2 == 0) & F.col("priority").isNotNull()
    ).count() == 0
    assert out.filter(
        (F.col("o_orderkey") % 2 == 1) & F.col("totalprice").isNotNull()
    ).count() == 0


def test_repetition_profile_edge_cases(spark, tmp_path):
    """x4i on handmade documents: empty text, single word, a degenerate
    all-same-word spam doc, and a half-repeated doc — exact expectations
    for every fraction, including the zero-denominator guards."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4i_repetition_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "", "en", 0),
            (2, "hello", "en", 5),
            (3, "spam spam spam spam", "en", 19),
            (4, "a b a b c", "en", 9),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        r["doc_id"]: r for r in x4i_repetition_profile(spark, sf_dir).collect()
    }
    empty = rows[1]
    assert (empty["n_words"], empty["word_rep_frac"], empty["top_word_frac"],
            empty["top_bigram_frac"]) == (0, 0.0, 0.0, 0.0)
    single = rows[2]
    assert (single["n_words"], single["n_distinct_words"]) == (1, 1)
    assert (single["word_rep_frac"], single["top_word_frac"],
            single["top_bigram_frac"]) == (0.0, 1.0, 0.0)
    spam = rows[3]
    assert (spam["n_words"], spam["n_distinct_words"]) == (4, 1)
    assert spam["word_rep_frac"] == 0.75          # 1 - 1/4
    assert spam["top_word_frac"] == 1.0
    assert spam["top_bigram_frac"] == 1.0         # all bigrams "spam spam"
    half = rows[4]
    assert (half["n_words"], half["n_distinct_words"]) == (5, 3)
    assert half["word_rep_frac"] == 0.4           # 1 - 3/5
    assert half["top_word_frac"] == 0.4           # "a" twice of 5
    assert half["top_bigram_frac"] == 0.5         # "a b" twice of 4


def test_unigram_logprob_orders_junk_below_common_text(spark, tmp_path):
    """x4j semantic pin on a handmade corpus: a document of corpus-common
    tokens must outscore a document of singleton junk tokens; identical
    documents score identically; and the exact value is reproducible in
    closed form (every token's probability is count/total)."""
    import math
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4j_unigram_logprob,
    )

    # corpus: "the" x 7, "cat" x 2, junk singletons j1..j3; 12 tokens total
    docs = [
        (1, "the cat the"),      # common tokens
        (2, "the cat the"),      # identical twin
        (3, "j1 j2 j3"),         # junk singletons
        (4, "the the the"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = {r["doc_id"]: r for r in x4j_unigram_logprob(spark, sf_dir).collect()}

    total = 12
    counts = {"the": 7, "cat": 2, "j1": 1, "j2": 1, "j3": 1}
    def expected(text):
        toks = text.split(" ")
        return round(sum(math.log(counts[t] / total) for t in toks) / len(toks), 4)

    for did, text in docs:
        assert rows[did]["n_tokens"] == 3
        assert rows[did]["avg_logprob"] == expected(text), (did, rows[did])
    assert rows[1]["avg_logprob"] == rows[2]["avg_logprob"]
    assert rows[3]["avg_logprob"] < rows[1]["avg_logprob"] < rows[4]["avg_logprob"]


def test_tfidf_closed_form(spark, tmp_path):
    """x4k semantic pin: smooth-idf TF-IDF on a handmade corpus checked
    in closed form — a rare repeated term outranks a ubiquitous frequent
    term, and every emitted weight equals tf * (ln((N+1)/(df+1)) + 1)."""
    import math
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4k_tfidf,
    )

    docs = [
        (1, "zebra zebra common"),
        (2, "common common common"),
        (3, "common apple"),
        (4, "common banana apple"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = x4k_tfidf(spark, sf_dir).collect()

    n_docs, df = 4, {"common": 4, "zebra": 1, "apple": 2, "banana": 1}
    def expected(tf, term):
        return round(tf * (math.log((n_docs + 1) / (df[term] + 1)) + 1), 4)

    for r in rows:
        assert r["tfidf"] == expected(r["tf"], r["term"]), r
    # rare-but-repeated beats ubiquitous-and-frequent
    assert (rows[0]["doc_id"], rows[0]["term"]) == (1, "zebra")
    assert (rows[1]["doc_id"], rows[1]["term"]) == (2, "common")
    # ubiquitous term's idf collapses to exactly 1.0 (ln(5/5) + 1)
    common = [r for r in rows if r["term"] == "common"]
    assert all(r["tfidf"] == float(r["tf"]) for r in common)


def test_trigram_stats_closed_form(spark, tmp_path):
    """x4l semantic pin: trigram occurrence/document counts on a
    handmade corpus with repeated, short (<3 tokens), empty, and
    double-spaced documents — exact counts and deterministic tie order."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4l_trigram_stats,
    )

    docs = [
        (1, "a b c a b c"),   # "a b c" x2, "b c a", "c a b"
        (2, "a b c"),
        (3, "x y"),           # too short: no trigrams
        (4, ""),
        (5, "a  b c d"),      # empty token filtered: "a b c", "b c d"
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["trigram"], r["n_occurrences"], r["n_docs"])
        for r in x4l_trigram_stats(spark, sf_dir).collect()
    ]
    assert got == [
        ("a b c", 4, 3),
        ("b c a", 1, 1),
        ("b c d", 1, 1),
        ("c a b", 1, 1),
    ]


def test_dedup_rate_by_source_closed_form(spark, tmp_path):
    """x1c on a handmade corpus: srcA has 4 docs over 2 distinct texts
    (dup_frac 0.5), srcB is all unique, srcC is one text 3 times."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.dedup import (
        x1c_dedup_rate_by_source,
    )

    rows = [
        (1, "aa", "srcA"), (2, "aa", "srcA"), (3, "bb", "srcA"), (4, "bb", "srcA"),
        (5, "u1", "srcB"), (6, "u2", "srcB"),
        (7, "cc", "srcC"), (8, "cc", "srcC"), (9, "cc", "srcC"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: r for r in x1c_dedup_rate_by_source(spark, sf_dir).collect()}

    assert (got["srcA"]["n_docs"], got["srcA"]["n_unique"], got["srcA"]["n_dup_docs"]) == (4, 2, 2)
    assert got["srcA"]["dup_frac"] == 0.5
    assert (got["srcB"]["n_docs"], got["srcB"]["n_unique"], got["srcB"]["dup_frac"]) == (2, 2, 0.0)
    assert (got["srcC"]["n_docs"], got["srcC"]["n_unique"]) == (3, 1)
    assert got["srcC"]["dup_frac"] == round(1 - 1 / 3, 6)


def test_time_range_window_boundary_semantics(spark, tmp_path):
    """w8 frame edges on handmade events: an event exactly 3600s earlier
    IS in the trailing-hour frame (RANGE is inclusive), 3601s is not;
    same-second peers are whole-frame members for each other."""
    import datetime as dt
    import os

    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w8_time_range_window,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return base + dt.timedelta(seconds=sec)

    rows = [
        (1, at(0),    7, "e", 1.0, "{}"),
        (2, at(3600), 7, "e", 2.0, "{}"),   # exactly 1h after ev1 -> includes ev1
        (3, at(7201), 7, "e", 4.0, "{}"),   # 3601s after ev2 -> excludes ev2
        (4, at(7201), 7, "e", 8.0, "{}"),   # same-second peer of ev3
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf_dir}/events.parquet")
    got = {r["event_id"]: r for r in w8_time_range_window(spark, sf_dir).collect()}

    assert (got[1]["trail_1h_sum"], got[1]["trail_1h_cnt"]) == (1.0, 1)
    assert (got[2]["trail_1h_sum"], got[2]["trail_1h_cnt"]) == (3.0, 2)   # 1+2
    # peers at the same second see each other (RANGE frame semantics)
    assert (got[3]["trail_1h_sum"], got[3]["trail_1h_cnt"]) == (12.0, 2)  # 4+8
    assert (got[4]["trail_1h_sum"], got[4]["trail_1h_cnt"]) == (12.0, 2)


def test_dim_truncation_recall_matches_numpy_recount(spark, sf_dir):
    """x3i vs an independent numpy recount: truncated-16-dim top-5 and
    full-dim top-5 recomputed from the raw parquet with the same
    rounding/tiebreak, recall compared per query."""
    import numpy as np

    from ssn_college_software_architecture_assignments__spark.operators.similarity import (
        x3i_dim_truncation_recall,
    )

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def topk(dims):
        out = {}
        for q in [i for i in emb if i < 8]:
            qv = emb[q][:dims]
            scored = []
            for v, x in emb.items():
                if v == q:
                    continue
                xv = x[:dims]
                na, nb = np.sqrt(qv @ qv), np.sqrt(xv @ xv)
                if na == 0 or nb == 0:
                    continue
                scored.append((round(float(qv @ xv / (na * nb)), 4), v))
            scored.sort(key=lambda t: (-t[0], t[1]))
            out[q] = {v for _, v in scored[:5]}
        return out

    full, trunc = topk(64), topk(16)
    got = {r["q_id"]: r for r in x3i_dim_truncation_recall(spark, sf_dir).collect()}
    assert sorted(got) == sorted(full)
    for q in full:
        hits = len(full[q] & trunc[q])
        assert got[q]["n_true"] == 5
        assert got[q]["n_hits"] == hits, (q, got[q], full[q], trunc[q])
        assert got[q]["recall_at_k"] == round(hits / 5, 4)


def test_quality_deciles_partition_the_corpus(spark, sf_dir):
    """x4n invariants on the real fixture: deciles 1..10 each present,
    doc counts sum to the corpus, sizes differ by at most 1 (ntile law),
    score ranges are non-overlapping and descending (decile 1 = best)."""
    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4n_quality_deciles,
    )

    rows = x4n_quality_deciles(spark, sf_dir).collect()
    n_docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert sum(sizes) == n_docs_total
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["min_score"] >= b["max_score"]  # descending, non-overlapping


def test_interval_grid_join_boundary_law(spark, tmp_path):
    """j12 on handmade events: an error at t0=1000s (window [1000,1300),
    spanning grid cells 3 and 4) catches clicks at +10s and +299.999999s
    but NOT at +300s (exclusive end), not before t0, and a clickless
    error window is absent. The +299.999999s click lives in the window's
    SECOND grid cell — reaching it proves the window exploded to both
    cells."""
    import datetime
    import os

    from ssn_college_software_architecture_assignments__spark.operators.joins import (
        j12_interval_grid_join,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return base + datetime.timedelta(seconds=sec)

    rows = [
        (1, at(1000), 1, "error", 0.0, "{}"),
        (2, at(1010), 1, "click", 0.0, "{}"),          # +10s: in
        (3, at(1299.999999), 1, "click", 0.0, "{}"),   # cell 4, in
        (4, at(1300), 1, "click", 0.0, "{}"),          # +300s: out
        (5, at(999), 1, "click", 0.0, "{}"),           # before: out
        (6, at(5000), 1, "error", 0.0, "{}"),          # no clicks: absent
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    out = j12_interval_grid_join(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["err_id"] == 1
    assert r["n_clicks"] == 2
    assert r["first_click_gap_sec"] == 10.0


def test_hll_sketch_rollup_merge_law(spark, tmp_path):
    """a12 on handmade events: exact per-type and TOTAL distinct counts
    are known (overlapping user sets, so the total is NOT the sum of
    per-type counts — merging sketches must deduplicate across groups),
    and every bound boolean holds at these tiny cardinalities where the
    sketch is near-exact."""
    import datetime
    import os

    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a12_hll_sketch_rollup,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # clicks from users 0-9; errors from users 5-14 -> total distinct 15
    for i in range(10):
        rows.append((i, base, i, "click", 0.0, "{}"))
    for i in range(10):
        rows.append((100 + i, base, 5 + i, "error", 0.0, "{}"))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {
        r["grp"]: (r["exact_users"], r["within_bound"])
        for r in a12_hll_sketch_rollup(spark, sf_dir).collect()
    }
    assert got == {
        "click": (10, True),
        "error": (10, True),
        "TOTAL": (15, True),
    }, got


def test_rolling_zscore_closed_form(spark, tmp_path):
    """w9 on a handmade stream: 5 warm-up values {10,10,10,10,14} for
    user 1, then a spike of 30 (baseline mean 10.8, sample var 3.2 ->
    z = 10.73, flagged) and an 11 whose own trailing window is
    {10,10,10,14,30} (mean 14.8, var 75.2 -> z = -0.44, not flagged);
    the first five rows lack a full baseline and are out of scope. A
    second user with a CONSTANT history then any value must never flag
    (var <= 0 guard)."""
    import datetime
    import os

    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w9_rolling_zscore_anomaly,
    )

    base = datetime.datetime(2024, 1, 1)
    vals_u1 = [10.0, 10.0, 10.0, 10.0, 14.0, 30.0, 11.0]
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "view", v, "{}")
        for i, v in enumerate(vals_u1)
    ] + [
        (100 + i, base + datetime.timedelta(minutes=i), 2, "view", 5.0, "{}")
        for i in range(6)
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    out = w9_rolling_zscore_anomaly(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_id"], r["event_id"]) == (1, 5)
    # baseline: mean 10.8, sample var 3.2 -> z = (30 - 10.8)/sqrt(3.2)
    assert r["baseline_mean"] == 10.8
    assert r["zscore"] == round((30 - 10.8) / (3.2 ** 0.5), 2)


def test_bag_setops_multiset_law(spark, tmp_path):
    """u5's multiset law on handmade multiplicities: a row appearing 7x
    in A and 4x in B survives EXCEPT ALL 3x and INTERSECT ALL 4x; a row
    only in A keeps its full count; a row only in B contributes an
    except-count of 0 via the intersect side (absent entirely when in
    neither output)."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.setops import (
        u5_bag_setops,
    )

    # encode multiplicities through l_quantity thresholds: <10 = A, <5 = B
    rows = []
    def add(flag, status, n_a_only, n_both):
        # n_both rows with qty 1 (in A and B), n_a_only rows qty 7 (A only)
        for _ in range(n_both):
            rows.append((flag, status, 1.0))
        for _ in range(n_a_only):
            rows.append((flag, status, 7.0))

    add("R", "X", n_a_only=3, n_both=4)   # A:7, B:4 -> except 3, intersect 4
    add("N", "Y", n_a_only=2, n_both=0)   # A-only: except 2, intersect 0
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, f, s, q) for i, (f, s, q) in enumerate(rows)],
        "l_orderkey long, l_returnflag string, l_linestatus string, l_quantity double",
    ).write.parquet(f"{sf_dir}/lineitem.parquet")

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_except"], r["n_intersect"])
        for r in u5_bag_setops(spark, sf_dir).collect()
    }
    assert got == {("R", "X"): (3, 4), ("N", "Y"): (2, 0)}


def test_not_in_null_semantics_collapse_law(spark):
    """u6: with NULLs present in the subquery list, the NOT IN leg MUST
    return zero rows (three-valued logic) while NOT EXISTS keeps its
    matches — on the fixture both branches are non-degenerate (the
    segment exists and has negative-balance customers)."""
    from ssn_college_software_architecture_assignments__spark.registry import all_queries

    rows = {
        r["method"]: r["n_orders"]
        for r in all_queries()["u6_not_in_null_semantics"](
            spark, SF_DIR_001
        ).collect()
    }
    assert rows["not_in"] == 0
    assert rows["not_exists"] > 0


def test_retention_cohorts_closed_form(spark, tmp_path):
    """w12 law on a handmade event log: two cohorts with hand-traced
    activity weeks; offset-0 retention is exactly 1.0 and later cells
    match the planted user movements."""
    import datetime as dt
    import os

    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w12_retention_cohorts,
    )

    mon0 = dt.datetime(2024, 1, 1)  # a Monday
    def at(week, dow=2):
        return mon0 + dt.timedelta(weeks=week, days=dow)

    rows = [
        # cohort week0: users 1, 2, 3
        (1, at(0), 1), (2, at(0), 2), (3, at(0), 3),
        # week1: users 1 and 2 return
        (4, at(1), 1), (5, at(1), 2),
        # week2: only user 1
        (6, at(2), 1),
        # cohort week1: user 9 first seen
        (7, at(1), 9),
        # week3: user 9 returns (offset 2 for its cohort)
        (8, at(3), 9),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(e, ts, u, "click", 1.0, "") for e, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {
        (r["cohort_week"], r["week_offset"]): r
        for r in w12_retention_cohorts(spark, sf_dir).collect()
    }
    w0, w1 = "2024-01-01", "2024-01-08"
    assert got[(w0, 0)]["n_active"] == 3 and got[(w0, 0)]["retention"] == 1.0
    assert got[(w0, 1)]["n_active"] == 2 and got[(w0, 1)]["retention"] == 0.6666
    assert got[(w0, 2)]["n_active"] == 1 and got[(w0, 2)]["retention"] == 0.3333
    assert got[(w1, 0)]["n_active"] == 1
    assert got[(w1, 2)]["n_active"] == 1 and got[(w1, 2)]["retention"] == 1.0
    assert (w1, 1) not in got  # user 9 skipped a week -> no cell
    assert all(r["cohort_size"] == got[(r["cohort_week"], 0)]["n_active"] for r in got.values())


def test_retention_cohort_sizes_sum_to_total_distinct_users(spark):
    """Cross-operator law: w12's cohort sizes partition the user base —
    summing them must equal w11's final cumulative distinct-user count
    on the same fixture (every user belongs to exactly one first-seen
    cohort)."""
    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w11_cumulative_distinct,
        w12_retention_cohorts,
    )

    cohorts = {
        r["cohort_week"]: r["cohort_size"]
        for r in w12_retention_cohorts(spark, SF_DIR_001).collect()
        if r["week_offset"] == 0
    }
    final_cum = max(
        r["cum_users"] for r in w11_cumulative_distinct(spark, SF_DIR_001).collect()
    )
    assert sum(cohorts.values()) == final_cum


def test_w13_rolling_window_laws(spark):
    """w13 laws at sf0.001: (1) a brute-force Python recomputation of
    the trailing 7-day distinct count agrees on every active day;
    (2) the rolling count dominates the single-day active count and
    never exceeds w11's cumulative total (frame-nesting sandwich)."""
    import datetime

    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        _W13_DAYS,
        w11_cumulative_distinct,
        w13_rolling_distinct_users,
    )

    got = {
        r["day"]: r["rolling_users"]
        for r in w13_rolling_distinct_users(spark, SF_DIR_001).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR_001}/events.parquet").select(
        "user_id", "ts"
    ).collect()
    activity = {(r["user_id"], r["ts"].date()) for r in ev}
    days = sorted({d for _, d in activity})
    for d in days:
        lo = d - datetime.timedelta(days=_W13_DAYS - 1)
        brute = len({u for (u, ad) in activity if lo <= ad <= d})
        assert got[d.isoformat()] == brute, d
    assert set(got) == {d.isoformat() for d in days}

    w11 = {
        r["day"]: r for r in w11_cumulative_distinct(spark, SF_DIR_001).collect()
    }
    for day, n in got.items():
        assert n >= w11[day]["active_users"]
        assert n <= w11[day]["cum_users"]


def test_w14_twap_matches_closed_form(spark):
    """w14 law on a handmade series: user 1 holds 100 cents for 3s then
    400 cents for 1s -> TWAP = (100*3 + 400*1) / 4 = 175 cents (the
    last event has no holding interval and contributes nothing); a
    single-event user emits no row; exact-tie timestamps order by
    event_id and a zero-duration interval carries zero weight."""
    from pyspark.sql import functions as F
    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w14_time_weighted_avg,
    )
    import ssn_college_software_architecture_assignments__spark.operators.windows as wmod

    df = spark.createDataFrame(
        [
            (1, 0, 1.00, 10),
            (1, 3_000_000, 4.00, 11),
            (1, 4_000_000, 9.99, 12),   # terminal: no interval
            (2, 0, 5.00, 20),           # single event: no row
            (3, 0, 1.00, 30),           # tie at us=0 with next row
            (3, 0, 2.00, 31),           # zero-duration interval
            (3, 2_000_000, 7.00, 32),
        ],
        "user_id long, us long, value double, event_id long",
    )

    # drive the registered function through a Catalog-shaped stand-in
    class _Cat:
        def __init__(self, spark, sf_dir):
            self.events = df.select(
                "user_id",
                F.timestamp_micros("us").alias("ts"),
                "value",
                "event_id",
            )

    orig = wmod.Catalog
    wmod.Catalog = _Cat
    try:
        rows = {r["user_id"]: r for r in w14_time_weighted_avg(spark, "x").collect()}
    finally:
        wmod.Catalog = orig
    assert set(rows) == {1, 3}
    assert rows[1]["n_intervals"] == 2
    assert rows[1]["total_dt_us"] == 4_000_000
    assert rows[1]["twap_cents"] == 175
    # user 3: 100c for 0us (zero weight), 200c for 2s -> 200
    assert rows[3]["twap_cents"] == 200


def test_w15_gaps_islands_planted_streaks(spark):
    """w15 law on a handmade calendar: user 1 is active Jan 1-3 and
    Jan 5 (one day twice -- distinct collapses repeats) -> 2 streaks,
    longest 3, 4 active days; user 2 has a single day -> one length-1
    streak; user 3 spans the Jan 31 -> Feb 1 month boundary, which the
    integer day index must treat as consecutive (one streak of 2)."""
    from pyspark.sql import functions as F
    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w15_gaps_islands,
    )
    import ssn_college_software_architecture_assignments__spark.operators.windows as wmod

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-02 09:00:00"),
            (1, "2024-01-02 23:00:00"),  # same day twice: counts once
            (1, "2024-01-03 01:00:00"),
            (1, "2024-01-05 12:00:00"),  # gap at Jan 4 splits the run
            (2, "2024-02-10 00:00:00"),
            (3, "2024-01-31 23:59:59"),
            (3, "2024-02-01 00:00:01"),  # month boundary, still adjacent
        ],
        "user_id long, ts_s string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.events = df.select(
                "user_id", F.to_timestamp("ts_s").alias("ts")
            )

    orig = wmod.Catalog
    wmod.Catalog = _Cat
    try:
        rows = {r["user_id"]: r for r in w15_gaps_islands(spark, "x").collect()}
    finally:
        wmod.Catalog = orig

    assert rows[1]["n_streaks"] == 2
    assert rows[1]["longest_streak"] == 3
    assert rows[1]["active_days"] == 4
    assert rows[1]["first_day"] == "2024-01-01"
    assert rows[1]["last_day"] == "2024-01-05"
    assert rows[2]["n_streaks"] == 1
    assert rows[2]["longest_streak"] == 1
    assert rows[3]["n_streaks"] == 1
    assert rows[3]["longest_streak"] == 2
