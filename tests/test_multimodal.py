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


# x5e / x5f are REAL codecs (PPM, WAV need no library) — test the parsers
# directly on crafted bytes, including malformed inputs, no Spark needed.


def test_ppm_roundtrip_and_errors():
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _ppm_bytes,
        decode_ppm_batch,
    )

    good = _ppm_bytes(7)
    bad_magic = b"P5" + good[2:]          # greyscale magic -> rejected
    truncated = good[:-5]                 # raster shorter than w*h*3
    batch = pd.DataFrame({"doc_id": [7, 8, 9], "payload": [good, bad_magic, truncated]})
    out = pd.concat(decode_ppm_batch(iter([batch]))).set_index("doc_id")
    ok = out.loc[7]
    assert (ok.width, ok.height, ok.channels) == (4 + 7 % 13, 4 + 7 % 7, 3)
    assert ok.n_pixel_bytes == ok.width * ok.height * 3
    assert ok.decode_status == "ok"
    assert 0.0 <= ok.mean_pixel <= 255.0
    assert out.loc[8].decode_status.startswith("error")
    assert out.loc[9].decode_status.startswith("error")
    assert out.loc[9].width == 0


def test_wav_roundtrip_and_errors():
    import struct

    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _WAV_RATE,
        _wav_bytes,
        decode_wav_batch,
    )

    good = _wav_bytes(5)
    not_riff = b"JUNK" + good[4:]
    no_data = good[:44]  # header only, data chunk truncated away
    # insert an unknown chunk between fmt and data: parser must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 6) + b"abcdef"
    with_extra = good[:fmt_end] + extra + good[fmt_end:]
    with_extra = b"RIFF" + struct.pack("<I", len(with_extra) - 8) + with_extra[8:]

    batch = pd.DataFrame(
        {"doc_id": [5, 6, 7, 8], "payload": [good, not_riff, no_data, with_extra]}
    )
    out = pd.concat(decode_wav_batch(iter([batch]))).set_index("doc_id")
    n = 160 + 5 % 41
    for did in (5, 8):  # unknown chunks must not change the decode
        row = out.loc[did]
        assert row.decode_status == "ok"
        assert (row.sample_rate, row.channels, row.bits_per_sample) == (_WAV_RATE, 1, 16)
        assert row.n_samples == n
        assert row.duration_ms == n * 1000.0 / _WAV_RATE
        assert abs(row.mean_amp) <= 2048
    assert out.loc[5].mean_amp == out.loc[8].mean_amp
    assert out.loc[6].decode_status.startswith("error")
    assert out.loc[7].decode_status.startswith("error")
