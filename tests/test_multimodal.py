"""Multimodal kernel contracts (SURVEY.md §2.10 X5).

The codecs are stubbed (none in this container) — these tests pin the
Spark-side plumbing that IS real: schema, one-row-per-input for resize,
bounded output size, and frame fan-out."""

from __future__ import annotations

from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
    _TARGET_W,
    x5b_multimodal_decode,
    x5c_frame_sample,
    x5d_resize,
)

SF = "/root/testdata/sf0.001"


def test_resize_one_row_per_doc_bounded(spark):
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    out = x5d_resize(spark, SF).collect()
    assert len(out) == docs_n
    for r in out:
        assert r.target_w == _TARGET_W
        assert len(r.thumb_hex) <= 2 * _TARGET_W  # hex doubles the byte length
        assert r.resize_status == "stubbed"


def test_decode_schema_and_rowcount(spark):
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    out = x5b_multimodal_decode(spark, SF)
    assert out.count() == docs_n
    assert {"width", "height", "channels"} <= set(out.columns)


def test_frame_sample_fans_out(spark):
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = x5c_frame_sample(spark, SF).collect()
    # every doc yields >= 1 frame; frame indices start at 0 and are dense
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert len(by_doc) == docs_n
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))
