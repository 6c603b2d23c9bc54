

def test_a14_cms_laws(spark, sf_dir):
    """a14 CMS laws: (1) the estimate never underestimates (every
    counter a token touches carries its true count plus non-negative
    collision mass); (2) the deliberately collision-heavy 4x16 sketch
    produces at least one STRICT overestimate (the fixture genuinely
    exercises the min-of-rows reduction); (3) a Python re-simulation
    of the sketch from the same portable hash reproduces every
    estimate exactly — the cross-engine identity extended to a third
    independent implementation."""
    import hashlib
    from collections import Counter

    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        _A14_D,
        _A14_W,
        a14_countmin_sketch,
    )

    rows = a14_countmin_sketch(spark, sf_dir).collect()
    assert rows
    assert all(r["never_under"] for r in rows)
    assert any(r["est_n"] > r["true_n"] for r in rows)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = [t for d in docs for t in d["text"].split(" ")]

    def bucket(tok, row):
        return int(hashlib.md5(f"{tok}#{row}".encode()).hexdigest()[:15], 16) % _A14_W

    counters = [Counter() for _ in range(_A14_D)]
    truth = Counter(toks)
    for tok, n in truth.items():
        for r in range(_A14_D):
            counters[r][bucket(tok, r)] += n
    for r in rows:
        assert r["true_n"] == truth[r["token"]]
        assert r["est_n"] == min(
            counters[d][bucket(r["token"], d)] for d in range(_A14_D)
        )


def test_a15_mode_tie_law_on_handmade_groups(spark, tmp_path):
    """a15 tie law on engineered counts: a group with a strict winner
    picks it; a group with a two-way tie picks the lexicographically
    SMALLER value (count desc, value asc) — never an arbitrary
    task-order winner."""
    from pyspark.sql import functions as F

    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a15_grouped_mode,
    )

    cust = [(1, "SEG_A"), (2, "SEG_B")]
    orders = (
        [(i, 1, "1-URGENT") for i in range(3)]
        + [(10 + i, 1, "5-LOW") for i in range(1)]
        + [(20 + i, 2, "3-MEDIUM") for i in range(2)]
        + [(30 + i, 2, "2-HIGH") for i in range(2)]
    )
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(k, f"c{k}", seg, 0.0, seg) for k, seg in cust],
        "c_custkey long, c_name string, c_mktsegment string, "
        "c_acctbal double, c_nationkey string",
    ).write.parquet(f"{sf_dir}/customer.parquet")
    spark.createDataFrame(
        [(ok, ck, "O", 1.0, None, pr) for ok, ck, pr in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf_dir}/orders.parquet")
    got = {r["segment"]: (r["mode_priority"], r["n_occurrences"])
           for r in a15_grouped_mode(spark, sf_dir).collect()}
    assert got["SEG_A"] == ("1-URGENT", 3)          # strict winner
    assert got["SEG_B"] == ("2-HIGH", 2)            # tie -> smaller value


def test_a17_weighted_median_planted_laws(spark):
    """a17 law on a handmade table: group A's volume is 1+1+8 at prices
    10/20/30 -> half the volume (5) is crossed only at price 30 even
    though 20 is the unweighted median; group B crosses exactly AT the
    boundary (2*cumw == totw picks the lower median); a single-row
    group is its own median."""
    from pyspark.sql import functions as F  # noqa: F401
    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a17_weighted_median,
    )
    import ssn_college_software_architecture_assignments__spark.operators.aggregations as amod

    df = spark.createDataFrame(
        [
            ("A", 0.10, 1.0), ("A", 0.20, 1.0), ("A", 0.30, 8.0),
            ("B", 0.10, 2.0), ("B", 0.20, 2.0),   # boundary: 2*2 == 4
            ("C", 9.99, 7.0),
        ],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.lineitem = df

    orig = amod.Catalog
    amod.Catalog = _Cat
    try:
        rows = {
            r["l_returnflag"]: r
            for r in a17_weighted_median(spark, "x").collect()
        }
    finally:
        amod.Catalog = orig

    assert rows["A"]["median_price_cents"] == 30
    assert rows["A"]["total_qty"] == 10 and rows["A"]["n_rows"] == 3
    assert rows["B"]["median_price_cents"] == 10  # lower median at tie
    assert rows["C"]["median_price_cents"] == 999
    assert rows["C"]["total_qty"] == 7


def test_a18_mad_planted_laws(spark):
    """a18 on handmade token counts, every value hand-derived under the
    a17 lower-median law: source s = [2, 4, 10, 100] tokens -> even
    count takes the LOWER median 4; deviations [2, 0, 6, 96] -> MAD 2,
    unmoved by the 100-token outlier (a stddev-based spread would read
    ~41 — the robustness a18 exists for). Source t = [3, 5, 9] -> the
    odd case: median 5, deviations [2, 0, 4] -> MAD 2."""
    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a18_grouped_mad,
    )
    import ssn_college_software_architecture_assignments__spark.operators.aggregations as amod

    def words(n):
        return " ".join(["w"] * n)

    rows = (
        [(i, words(n), "s") for i, n in enumerate([2, 4, 10, 100])]
        + [(10 + i, words(n), "t") for i, n in enumerate([3, 5, 9])]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig = amod.Catalog
    amod.Catalog = _Cat
    try:
        got = {r["source"]: r for r in a18_grouped_mad(spark, "x").collect()}
    finally:
        amod.Catalog = orig

    s, t = got["s"], got["t"]
    assert (s["n_docs"], s["median_tokens"], s["mad_tokens"]) == (4, 4, 2)
    assert (t["n_docs"], t["median_tokens"], t["mad_tokens"]) == (3, 5, 2)


def test_a19_trimmed_mean_planted_outlier_immunity(spark):
    """a19 law on a planted source: 10 docs sized 10..19 tokens (wait:
    values 10,10,10,10,10,10,10,10,10,1000) — floor(10/10)=1 trimmed
    from each end drops one 10 and the 1000-token outlier, so the
    trimmed mean stays 10.0 exactly (10_000_000 micro) while the raw
    mean is dragged to 109.0 (109_000_000 micro)."""
    import ssn_college_software_architecture_assignments__spark.operators.aggregations as amod
    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a19_grouped_trimmed_mean,
    )

    mk = lambda n: " ".join(["w"] * n)
    df = spark.createDataFrame(
        [(i, mk(10), "s") for i in range(9)] + [(9, mk(1000), "s")],
        "doc_id long, text string, source string",
    )

    class _Cat:
        def __init__(self, spark, sf_dir):
            self.documents = df

    orig = amod.Catalog
    amod.Catalog = _Cat
    try:
        rows = a19_grouped_trimmed_mean(spark, "x").collect()
    finally:
        amod.Catalog = orig

    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 10 and r["n_trimmed_each_end"] == 1
    assert r["trimmed_mean_micro"] == 10_000_000
    assert r["mean_micro"] == 109_000_000


def test_a20_winsorized_mean_planted_outlier(spark, tmp_path):
    """a20 law on a hand corpus: values 1..9 plus a 1000-token
    outlier (n=10, k=1). Ranks clamp value 1 up to 2 and 1000 down to
    9, so the winsorized sum is 44 + 2 + 9 = 55 and the mean is
    5.5 tokens = 5,500,000 micro — while the raw mean reads
    104,500,000. A second source below the clamp threshold (n=3,
    k=0) must pass through with winsorized == raw."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.aggregations import (
        a20_grouped_winsorized_mean,
    )

    mk = lambda n: " ".join(["w"] * n)
    rows = [(i, mk(i), "big") for i in range(1, 10)] + [(10, mk(1000), "big")]
    rows += [(20, mk(5), "tiny"), (21, mk(7), "tiny"), (22, mk(100), "tiny")]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["source"]: r
        for r in a20_grouped_winsorized_mean(spark, sf_dir).collect()
    }
    big = got["big"]
    assert big["n_docs"] == 10 and big["n_clamped_each_end"] == 1
    assert big["winsorized_mean_micro"] == 5_500_000
    assert big["mean_micro"] == 104_500_000
    tiny = got["tiny"]
    assert tiny["n_clamped_each_end"] == 0
    assert tiny["winsorized_mean_micro"] == tiny["mean_micro"] == 37_333_333
