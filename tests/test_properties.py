"""Property-based laws (SURVEY.md §5.2(4)) on small generated frames.

hypothesis drives the inputs; each law runs one Spark job per example, so
example counts are kept low (Spark latency, not law weakness, is the
budget). Laws:

- ``from_json(to_json(row)) == row`` on a pinned schema (JSON round trip,
  the reference's payload format — README.md:21);
- exact dedup output is unique and a subset of its input;
- minhash estimated Jaccard is 1.0 for identical texts and in [0, 1]
  always.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ssn_college_software_architecture_assignments__spark.operators.dedup import (
    connected_components,
    minhash_candidate_pairs,
    minhash_signatures,
)

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

clean_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=40,
)


@given(
    rows=st.lists(
        st.tuples(st.integers(-(2**31), 2**31 - 1), clean_text, st.booleans()),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_json_round_trip_identity(spark, rows):
    schema = "id BIGINT, name STRING, flag BOOLEAN"
    df = spark.createDataFrame(rows, schema)
    back = df.select(
        F.from_json(F.to_json(F.struct("id", "name", "flag")), schema).alias("s")
    ).select("s.*")
    assert sorted(map(tuple, back.collect())) == sorted(rows)


@given(
    keys=st.lists(st.integers(0, 5), min_size=1, max_size=20),
)
@SETTINGS
def test_exact_dedup_unique_and_subset(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    out = [r["k"] for r in df.dropDuplicates(["k"]).collect()]
    assert len(out) == len(set(out))
    assert set(out) == set(keys)


@given(
    base=st.lists(clean_text.filter(lambda s: s.strip()), min_size=4, max_size=6),
)
@SETTINGS
def test_minhash_identical_docs_jaccard_one(spark, base):
    text = " ".join(base)
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id BIGINT, text STRING")
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=8)
    pairs = minhash_candidate_pairs(sigs, num_hashes=8, bands=4).collect()
    assert len(pairs) == 1
    est = pairs[0]["est_jaccard"]
    assert est == 1.0


def _union_find_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python oracle: min node id per component via union-find."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@given(
    n_nodes=st.integers(2, 10),
    edge_picks=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=12),
)
@SETTINGS
def test_connected_components_matches_union_find(spark, n_nodes, edge_picks):
    edges = [(a % n_nodes, b % n_nodes) for a, b in edge_picks if a % n_nodes != b % n_nodes]
    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    edges_df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edges_df = edges_df.limit(0)
    got = {
        r["id"]: r["label"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == _union_find_components(n_nodes, edges)


# Arbitrary unicode: CJK (no spaces at all), emoji, combining marks,
# whitespace runs, empty — the shapes a real web corpus contains and the
# ASCII word-soup fixture never exercises.
unicode_text = st.text(min_size=0, max_size=60)


@given(st.lists(unicode_text, min_size=1, max_size=8))
@SETTINGS
def test_text_pipeline_survives_arbitrary_unicode(spark, texts):
    """Robustness law: shingling, minhash, and simhash must never abort
    on ANY document content (the sequence(1,0) crash class), and
    byte-identical documents must always produce identical signatures."""
    from ssn_college_software_architecture_assignments__spark.operators.dedup import (
        shingles,
        simhash64,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    # duplicate every doc so the identical-signature law is exercised
    rows += [(len(texts) + i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    shingled = df.select(
        "doc_id", F.size(shingles("text", 3)).alias("n_shingles")
    ).collect()
    assert all(r["n_shingles"] >= 0 for r in shingled)

    sigs = minhash_signatures(df, "doc_id", "text").collect()
    by_id = {r["_id"]: tuple(r["minhash"]) for r in sigs}
    sims = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", simhash64("text").alias("s")).collect()
    }
    for i, t in enumerate(texts):
        twin = len(texts) + i
        # identical text -> identical signatures (when a signature exists)
        if i in by_id or twin in by_id:
            assert by_id.get(i) == by_id.get(twin)
        assert sims[i] == sims[twin]
