

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
