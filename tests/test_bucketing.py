"""Closed-form laws for the scale-safe ranking twins (round-8 additions):

- functions.bucketing: exact nearest-rank cutpoints + strict-> bucket law
- w4b: quartile assignment matches an independent Python computation
- x4n2: decile report on a handmade monotone corpus
- s16b: EXACTLY equals the global-row_number s16 on the real fixture
  (the equivalence that lets it reuse s16's oracle verbatim)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.functions.bucketing import (
    with_range_bucket,
)


def _nearest_rank(sorted_vals, p):
    return sorted_vals[max(0, math.ceil(p * len(sorted_vals)) - 1)]


def test_range_bucket_matches_python_nearest_rank(spark):
    """Bucket law on handmade values incl. heavy ties: bucket = 1 +
    #cuts strictly below, cuts at nearest-rank ceil(p*n)."""
    vals = [1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0, 10.0, 11.0, 40.0]
    probs = (0.25, 0.5, 0.75)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {
        r["i"]: r["b"]
        for r in with_range_bucket(df, "v", probs, out="b").collect()
    }
    cuts = [_nearest_rank(sorted(vals), p) for p in probs]
    for i, v in enumerate(vals):
        expect = 1 + sum(v > c for c in cuts)
        assert got[i] == expect, (i, v, cuts)
    # ties at a cutpoint always share the LOWER bucket
    tied = {got[i] for i, v in enumerate(vals) if v == cuts[0]}
    assert len(tied) == 1


def test_w4b_quartiles_match_python(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.catalog import Catalog
    from ssn_college_software_architecture_assignments__spark.operators.windows import (
        w4b_quartile_cutpoints,
    )

    prices = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in Catalog(spark, sf_dir).orders.select(
            "o_orderkey", "o_totalprice"
        ).collect()
    }
    svals = sorted(prices.values())
    cuts = [_nearest_rank(svals, p) for p in (0.25, 0.5, 0.75)]
    got = {r["o_orderkey"]: r["quartile"] for r in w4b_quartile_cutpoints(spark, sf_dir).collect()}
    assert got.keys() == prices.keys()
    for k, v in prices.items():
        assert got[k] == 1 + sum(v > c for c in cuts)


def test_x4n2_deciles_on_monotone_corpus(spark, tmp_path):
    """100 docs with strictly increasing distinct_ratio -> value-deciles
    are exactly 10 docs each, decile 1 holding the TOP scores."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.textanalysis import (
        x4n2_quality_deciles_scalable,
    )

    rows = []
    for i in range(100):
        # i+1 distinct tokens then padding dupes of the first -> ratio (i+1)/101
        toks = [f"t{j}" for j in range(i + 1)] + ["t0"] * (100 - i)
        text = " ".join(toks)
        rows.append((i, text, "en", len(text), "s"))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long, source string"
    ).write.parquet(f"{sf}/documents.parquet")

    out = {r["decile"]: r for r in x4n2_quality_deciles_scalable(spark, sf).collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[d]["n_docs"] == 10 for d in out)
    # decile 1 = best tenth; strictly above decile 2's range
    assert out[1]["min_score"] > out[2]["max_score"]
    assert out[10]["min_score"] == round(1 / 101, 4)


def test_s16b_equals_global_rownumber_form(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.sources.sink import (
        s16_zorder_layout,
        s16b_zorder_layout_scalable,
    )

    a = sorted(map(tuple, s16_zorder_layout(spark, sf_dir).collect()))
    b = sorted(map(tuple, s16b_zorder_layout_scalable(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_a19b_equals_window_form(spark, sf_dir):
    """a19b (range-bucketed ranking) must reproduce the registered
    a19 (per-source sort window) row for row — the equivalence that
    lets it reuse a19's oracle verbatim (the s16b precedent)."""
    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a19_grouped_trimmed_mean,
        a19b_trimmed_mean_scalable,
    )

    a = sorted(map(tuple, a19_grouped_trimmed_mean(spark, sf_dir).collect()))
    b = sorted(map(tuple, a19b_trimmed_mean_scalable(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_a20b_equals_window_form(spark, sf_dir):
    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a20_grouped_winsorized_mean,
        a20b_winsorized_mean_scalable,
    )

    a = sorted(map(tuple, a20_grouped_winsorized_mean(spark, sf_dir).collect()))
    b = sorted(map(tuple, a20b_winsorized_mean_scalable(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_ranked_by_source_scalable_matches_python_on_heavy_ties(spark):
    """The stitched (rnk, n) law on a handmade corpus with heavy value
    ties ACROSS would-be bucket boundaries and a deliberately skewed
    mega-source: ranks must equal the python (v, doc_id) sort rank
    per source, and n the per-source count."""
    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        _ranked_by_source_scalable,
    )

    rows = []
    # mega-source "big": 120 rows over only 5 distinct values
    for i in range(120):
        rows.append((i, "big", float(i % 5)))
    # small source with its own value range
    for i in range(7):
        rows.append((1000 + i, "small", float(100 + i)))
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    got = _ranked_by_source_scalable(df).collect()
    # python reference ranks
    import collections

    by_src = collections.defaultdict(list)
    for d, s, v in rows:
        by_src[s].append((v, d))
    expect = {}
    for s, vals in by_src.items():
        for rnk, (v, d) in enumerate(sorted(vals), start=1):
            expect[d] = (s, v, rnk, len(vals))
    got_by_rank = {}
    for r in got:
        got_by_rank[(r["source"], r["rnk"])] = (r["v"], r["n"])
    assert len(got) == len(rows)
    for d, (s, v, rnk, n) in expect.items():
        assert got_by_rank[(s, rnk)] == (v, n), (d, s, rnk)
