"""Multimodal kernel contracts (SURVEY.md §2.10 X5).

x5b/x5d are real format-dispatching kernels since round 5: they sniff
payload magics and genuinely decode/resize PPM and WAV (plus PIL formats
when PIL is importable — not in this container), falling back to the
deterministic fake only for unrecognized payloads. These tests pin both
legs: the real decode/resize outputs on crafted media bytes, and the
fallback plumbing (schema, one-row-per-input, bounded output, fan-out)
the fixture oracles rely on."""

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


def test_generic_decode_dispatches_real_formats():
    """x5b's kernel must really decode recognized payloads: P6 dims from
    the header, WAV sample counts from the chunk walk — and only fall
    back to the fake for unknown bytes (parse failures included)."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _ppm_bytes,
        _wav_bytes,
        decode_media_batch,
    )

    ppm = _ppm_bytes(7)                      # 11 x 7 x 3 image
    wav = _wav_bytes(5)                      # 165 mono 16-bit samples
    text = "just a document".encode()
    corrupt_ppm = ppm[:-5]                   # sniffs as P6, fails parse
    batch = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "payload": [ppm, wav, text, corrupt_ppm]}
    )
    out = pd.concat(decode_media_batch(iter([batch]))).set_index("doc_id")
    assert out.loc[1].decode_status == "ok:ppm"
    assert (out.loc[1].width, out.loc[1].height, out.loc[1].channels) == (
        4 + 7 % 13, 4 + 7 % 7, 3,
    )
    assert out.loc[2].decode_status == "ok:wav"
    assert (out.loc[2].width, out.loc[2].height, out.loc[2].channels) == (
        160 + 5 % 41, 1, 1,
    )
    for did in (3, 4):  # unknown/corrupt -> deterministic fake, no error
        row = out.loc[did]
        assert row.decode_status == "stubbed"
        assert (row.width, row.height) == (row.n_bytes % 640, row.n_bytes % 480)


def test_resize_really_resamples_ppm():
    """x5d's kernel must produce a genuine 224x224 P6 thumbnail for PPM
    payloads whose pixels equal floor-mapping nearest-neighbor resampling
    (the x5g arithmetic), while text payloads keep the strided fake."""
    import numpy as np
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _TARGET_H,
        _TARGET_W,
        _ppm_bytes,
        resize_batch,
    )

    ppm = _ppm_bytes(9)
    text = "plain text payload".encode()
    batch = pd.DataFrame({"doc_id": [1, 2], "payload": [ppm, text]})
    out = pd.concat(resize_batch(iter([batch]))).set_index("doc_id")

    real = out.loc[1]
    assert real.resize_status == "ok:ppm"
    thumb = bytes(real.thumb_bytes)
    header = f"P6\n{_TARGET_W} {_TARGET_H}\n255\n".encode()
    assert thumb.startswith(header)
    pixels = np.frombuffer(thumb[len(header):], dtype=np.uint8)
    assert pixels.size == _TARGET_W * _TARGET_H * 3
    # independent nearest-neighbor reference on the source raster
    parts = ppm.split(b"\n", 3)
    w, h = (int(t) for t in parts[1].split())
    src = np.frombuffer(parts[3], dtype=np.uint8).reshape(h, w, 3)
    rows = (np.arange(_TARGET_H) * h) // _TARGET_H
    cols = (np.arange(_TARGET_W) * w) // _TARGET_W
    assert np.array_equal(pixels.reshape(_TARGET_H, _TARGET_W, 3), src[rows][:, cols])

    fake = out.loc[2]
    assert fake.resize_status == "stubbed"
    stride = max(len(text) // _TARGET_W, 1)
    assert bytes(fake.thumb_bytes) == bytes(text[::stride][:_TARGET_W])


def test_pil_path_when_available():
    """PIL leg of the dispatch — executes only where PIL exists (absent
    in this container; the guard keeps the kernel honest either way)."""
    import pytest

    from ssn_college_software_architecture_assignments__spark.operators import (
        multimodal as mm,
    )

    if mm._PILImage is None:
        pytest.skip("PIL not installed in this environment")
    import io

    import pandas as pd

    img = mm._PILImage.new("RGB", (32, 16), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    batch = pd.DataFrame({"doc_id": [1], "payload": [buf.getvalue()]})
    dec = pd.concat(mm.decode_media_batch(iter([batch]))).iloc[0]
    assert dec.decode_status == "ok:pil"
    assert (dec.width, dec.height, dec.channels) == (32, 16, 3)
    rsz = pd.concat(mm.resize_batch(iter([batch]))).iloc[0]
    assert rsz.resize_status == "ok:pil"


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


def test_frame_sampler_demuxes_ppm_containers():
    """x5c's sampler is a format-dispatch kernel: a concatenated-PPM
    container is REALLY demuxed (one row per frame, each frame's extent
    found by header parse, bounded raster prefix as payload); text-ish
    payloads keep the deterministic fallback; a corrupt container
    surfaces an error row instead of silently truncating."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _ppm_bytes,
        _ppm_video_bytes,
        sample_frames_batch,
    )

    video = _ppm_video_bytes(9)           # 2 + 9 % 4 = 3 frames
    text = b"plain text payload"
    # corrupt: valid first frame, garbage where frame 2's magic should be
    first = _ppm_bytes(9)
    corrupt = first + b"XX" + b"\x00" * 10
    batch = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [video, text, corrupt]}
    )
    out = pd.concat(sample_frames_batch(iter([batch])))

    vid = out[out.doc_id == 1].sort_values("frame_idx")
    assert list(vid.frame_idx) == [0, 1, 2]
    assert list(vid.frame_ts_ms) == [0, 1000, 2000]
    assert set(vid.sample_status) == {"ok:ppm"}
    # frame payloads are the RASTER prefix (post-header), frame f seeded
    # with doc_id + f => first raster byte of frame f is (9+f)*31 % 256
    for f, fb in zip(vid.frame_idx, vid.frame_bytes):
        expected = bytes(((9 + f) * 31 + i) % 256 for i in range(16))
        assert bytes(fb) == expected

    txt = out[out.doc_id == 2]
    assert set(txt.sample_status) == {"stubbed"}
    assert len(txt) == (len(text) % 4) + 1

    bad = out[out.doc_id == 3].sort_values("frame_idx")
    assert list(bad.sample_status)[0] == "ok:ppm"      # frame 0 decoded
    assert list(bad.sample_status)[-1].startswith("error")


def test_frame_sampler_p6_prefixed_text_takes_fallback():
    """A document whose TEXT merely begins with "P6" is NOT a PPM
    container: frame 0 never parses, so the kernel must take the
    SQL-expressible fallback (what x5c's oracle models) — not emit a
    single error row that would make the oracle data-dependent."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _try_demux_frames,
        sample_frames_batch,
    )

    impostor = b"P6 engines are the best engines, according to this doc"
    assert _try_demux_frames(impostor) is None
    batch = pd.DataFrame({"doc_id": [42], "payload": [impostor]})
    out = pd.concat(sample_frames_batch(iter([batch])))
    assert set(out.sample_status) == {"stubbed"}
    assert len(out) == (len(impostor) % 4) + 1  # the fallback's frame count


def test_audio_rms_profile_closed_form_and_error_row():
    """x5i kernel law on a handmade WAV: constant-amplitude alternating
    samples give RMS == amplitude and a crossing at every adjacent pair;
    a silent window gives RMS 0; a malformed payload yields exactly one
    error row, not an exception."""
    import struct

    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _AUDIO_WIN,
        audio_rms_profile_batch,
    )

    def wav(samples):
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # window 0: +500/-500 alternating; window 1: 40 zeros (partial)
    samples = [500 if i % 2 == 0 else -500 for i in range(_AUDIO_WIN)] + [0] * 40
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [wav(samples), b"JUNKJUNKJUNK"]}
    )
    out = pd.concat(list(audio_rms_profile_batch(iter([pdf]))))

    w0 = out[(out.doc_id == 1) & (out.window_idx == 0)].iloc[0]
    assert w0["rms"] == 500.0
    assert w0["zero_crossings"] == _AUDIO_WIN - 1
    assert w0["win_n"] == _AUDIO_WIN
    w1 = out[(out.doc_id == 1) & (out.window_idx == 1)].iloc[0]
    assert (w1["rms"], w1["zero_crossings"], w1["win_n"]) == (0.0, 0, 40)
    err = out[out.doc_id == 2]
    assert len(err) == 1
    assert err.iloc[0]["profile_status"].startswith("error:")


def test_audio_profile_empty_data_chunk_emits_status_row():
    """One-visible-row-per-payload contract: a structurally valid WAV
    whose data chunk holds zero samples must surface as a single
    'empty' status row, not silently vanish from the output."""
    import struct

    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        audio_rms_profile_batch,
    )

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    empty_wav = b"RIFF" + struct.pack("<I", len(body)) + body

    pdf = pd.DataFrame({"doc_id": [9], "payload": [empty_wav]})
    out = pd.concat(list(audio_rms_profile_batch(iter([pdf]))))
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["window_idx"], row["win_n"], row["profile_status"]) == (
        -1,
        0,
        "empty",
    )


def test_ppm_parser_distinguishes_oversized_raster():
    """Trailing bytes after w*h*3 (e.g. concatenated frames fed to a
    single-image kernel) must report 'oversized', not 'truncated'."""
    import numpy as np
    import pytest

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _parse_ppm_raster,
    )

    raster = bytes(np.zeros(2 * 2 * 3, dtype=np.uint8))
    good = b"P6\n2 2\n255\n" + raster
    assert _parse_ppm_raster(good)[0:2] == (2, 2)
    with pytest.raises(ValueError, match="oversized"):
        _parse_ppm_raster(good + b"XTRA")
    with pytest.raises(ValueError, match="truncated"):
        _parse_ppm_raster(good[:-2])


def test_wav_parser_rejects_zero_channels_and_rate():
    """A structurally valid WAV declaring channels=0 or rate=0 must come
    back as an error row from BOTH wav kernels, never a
    ZeroDivisionError that kills the task."""
    import struct

    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        audio_rms_profile_batch,
        decode_wav_batch,
    )

    def wav_with_fmt(channels, rate):
        data = struct.pack("<4h", 1, 2, 3, 4)
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [wav_with_fmt(0, 8000), wav_with_fmt(1, 0)]}
    )
    decoded = pd.concat(list(decode_wav_batch(iter([pdf]))))
    assert list(decoded["decode_status"].str.startswith("error:")) == [True, True]
    profiled = pd.concat(list(audio_rms_profile_batch(iter([pdf]))))
    assert list(profiled["profile_status"].str.startswith("error:")) == [True, True]


def test_wav_parser_rejects_short_fmt_chunk():
    """A fmt chunk shorter than 16 bytes must surface as an error ROW:
    struct.unpack would raise struct.error, which is not a ValueError
    and would escape the kernels' error handling."""
    import struct

    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        audio_rms_profile_batch,
        decode_wav_batch,
    )

    short_fmt = struct.pack("<HH", 1, 1)  # 4 bytes, not 16
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(short_fmt)) + short_fmt
    body += b"data" + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
    decoded = pd.concat(list(decode_wav_batch(iter([pdf]))))
    assert decoded.iloc[0]["decode_status"].startswith("error:")
    profiled = pd.concat(list(audio_rms_profile_batch(iter([pdf]))))
    assert profiled.iloc[0]["profile_status"].startswith("error:")


def test_channel_stats_closed_form(spark, tmp_path):
    """x5j per-channel law on one handmade doc_id: channel c of doc d
    samples (d*31 + p*3 + c) % 256 over p in range(w*h) — recount the
    mean/min/max in Python for doc_id 7 (w=11, h=4) and compare."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        x5j_image_channel_stats,
    )

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(7, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    w, h = 4 + 7 % 13, 4 + 7 % 7
    rows = {r["channel"]: r for r in x5j_image_channel_stats(spark, sf_dir).collect()}
    assert sorted(rows) == [0, 1, 2]
    for c in range(3):
        vals = [(7 * 31 + p * 3 + c) % 256 for p in range(w * h)]
        r = rows[c]
        assert r["n_values"] == w * h
        assert r["mean_val"] == round(sum(vals) / len(vals), 4)
        assert (r["min_val"], r["max_val"]) == (min(vals), max(vals))


def test_channel_stats_malformed_payload_yields_error_row():
    """Kernel contract: a payload that fails the P6 parse — including a
    header truncated before the raster, which must surface as ValueError
    not IndexError — produces one visible channel=-1 error row instead
    of silently vanishing."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _ppm_bytes,
        channel_stats_batch,
    )

    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [b"P6\n11 4\n255", _ppm_bytes(2), b"not an image"],
        }
    )
    out = pd.concat(list(channel_stats_batch(iter([batch]))))
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    assert list(by_doc[1]["channel"]) == [-1]
    assert by_doc[1]["stat_status"].iloc[0].startswith("error:")
    assert list(by_doc[2]["channel"]) == [0, 1, 2]
    assert set(by_doc[2]["stat_status"]) == {"ok"}
    assert list(by_doc[3]["channel"]) == [-1]


def test_scene_change_matches_python_recount(spark, tmp_path):
    """x5k law for doc_id 7 (5 frames): every consecutive-frame mean
    abs diff matches an independent Python recount that resamples each
    frame with the floor-mapping law and diffs the 8x6x3 rasters."""
    import os

    import numpy as np

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        x5k_scene_change,
    )

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(7, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    def resized(seed):
        w, h = 4 + seed % 13, 4 + seed % 7
        img = np.array(
            [(seed * 31 + i) % 256 for i in range(w * h * 3)], dtype=np.int64
        ).reshape(h, w, 3)
        rows = (np.arange(6) * h) // 6
        cols = (np.arange(8) * w) // 8
        return img[rows][:, cols]

    n_frames = 2 + 7 % 4  # 5 frames, seeds 7..11
    expect = {
        f: round(float(np.abs(resized(7 + f) - resized(7 + f - 1)).mean()), 4)
        for f in range(1, n_frames)
    }
    got = {
        r["frame_idx"]: r["mean_abs_diff"]
        for r in x5k_scene_change(spark, sf_dir).collect()
    }
    assert got == expect, (got, expect)


def test_scene_change_malformed_payload_yields_error_row():
    """Kernel contract: a malformed container (truncated header or
    truncated frame bytes) produces one visible frame_idx=-1 error row
    instead of killing the batch."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _ppm_video_bytes,
        scene_change_batch,
    )

    good = _ppm_video_bytes(3)
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [b"P6\n4 4\n255", good, good[:-5]],
        }
    )
    out = pd.concat(list(scene_change_batch(iter([batch]))))
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    assert list(by_doc[1]["frame_idx"]) == [-1]
    assert by_doc[1]["scene_status"].iloc[0].startswith("error:")
    assert set(by_doc[2]["scene_status"]) == {"ok"}
    assert len(by_doc[2]) == (2 + 3 % 4) - 1
    assert list(by_doc[3]["frame_idx"]) == [-1]


def test_silence_planted_wav_profiles_to_exact_zero_windows():
    """x5l's encoder law at the kernel level: doc 7 plants 3 leading and
    1 trailing all-zero window around a 167-sample signal span, so the
    profile shows rms == 0.0 exactly on windows 0-2 and 6, and nonzero
    on the 3 signal windows."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        audio_rms_profile_batch,
        encode_wav_silence_batch,
    )

    pdf = pd.DataFrame({"doc_id": [7]})
    payloads = pd.concat(list(encode_wav_silence_batch(iter([pdf]))))
    prof = pd.concat(list(audio_rms_profile_batch(iter([payloads]))))
    assert list(prof["window_idx"]) == list(range(7))
    assert all(prof["profile_status"] == "ok")
    rms = list(prof["rms"])
    assert rms[0] == rms[1] == rms[2] == 0.0
    assert rms[6] == 0.0
    assert all(r > 0 for r in rms[3:6])


def test_dhash_invariant_to_resize_and_brightness():
    """The property that makes dHash a PERCEPTUAL hash: a 2x upscaled
    copy and a brightness-shifted copy of an image hash identically to
    the original (byte-exact checksums would treat all three as
    distinct), while an unrelated image differs; malformed payloads
    yield an error row."""
    import numpy as np
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        dhash_ppm_batch,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(40, 200, size=(16, 18, 3), dtype=np.uint8)

    def ppm(img):
        h, w, _ = img.shape
        return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()

    up = base.repeat(2, axis=0).repeat(2, axis=1)       # 2x nearest upscale
    bright = (base.astype(np.int16) + 20).clip(0, 255).astype(np.uint8)
    other = rng.integers(0, 255, size=(16, 18, 3), dtype=np.uint8)

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [ppm(base), ppm(up), ppm(bright), ppm(other), b"P6 junk"],
        }
    )
    out = pd.concat(list(dhash_ppm_batch(iter([pdf])))).set_index("doc_id")
    assert out.loc[1, "hash_status"] == "ok" and len(out.loc[1, "dhash"]) == 16
    assert out.loc[2, "dhash"] == out.loc[1, "dhash"]      # resize-invariant
    assert out.loc[3, "dhash"] == out.loc[1, "dhash"]      # brightness-invariant
    assert out.loc[4, "dhash"] != out.loc[1, "dhash"]
    assert out.loc[5, "hash_status"].startswith("error:")


def test_audio_fingerprint_gain_invariance_and_clusters(spark, tmp_path):
    """x5n laws: (a) kernel-level — every gain variant of a clip
    fingerprints identically to its gain-1 base, and scaling an
    arbitrary clip by 3 never changes its fingerprint; (b) operator
    level — cluster sizes equal the multiplicities of the distinct base
    fingerprints."""
    import os
    from collections import Counter

    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _wav_bytes_grouped,
        audio_fingerprint_batch,
        x5n_audio_fingerprint_dedup,
    )

    ids = list(range(10))
    pdf = pd.DataFrame(
        {"doc_id": ids, "payload": [_wav_bytes_grouped(i) for i in ids]}
    )
    fp = {
        r.doc_id: r.fingerprint
        for r in pd.concat(list(audio_fingerprint_batch(iter([pdf])))).itertuples()
    }
    for i in ids:
        assert fp[i] == fp[(i // 5) * 5], i          # gain invariance

    base_counts = Counter(fp.values())
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, "t", "s") for i in ids], "doc_id long, text string, source string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["fingerprint"]: r["n_clips"]
        for r in x5n_audio_fingerprint_dedup(spark, sf_dir).collect()
    }
    assert got == dict(base_counts)


def test_patchify_matches_numpy_reference_and_crops_edges(spark, sf_dir):
    """x5o law: per-channel patch means recomputed independently (parse
    the PPM bytes, reshape, mean) must match row for row, and each doc
    must emit exactly (h//2)*(w//2) patches — odd edge rows/columns
    cropped, never averaged into a partial patch."""
    import numpy as np

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _parse_ppm_raster,
        _ppm_bytes,
        x5o_image_patchify,
    )

    got = {}
    for r in x5o_image_patchify(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], {})[(r["patch_row"], r["patch_col"])] = (
            r["mean_r"], r["mean_g"], r["mean_b"]
        )

    for doc_id in (0, 5, 17):
        w, h, raster = _parse_ppm_raster(_ppm_bytes(doc_id))
        h2, w2 = h // 2, w // 2
        assert len(got[doc_id]) == h2 * w2
        img = raster.reshape(h, w, 3)[: h2 * 2, : w2 * 2, :]
        means = img.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3))
        for pr in range(h2):
            for pc in range(w2):
                expect = tuple(round(float(means[pr, pc, c]), 4) for c in range(3))
                assert got[doc_id][(pr, pc)] == expect


def test_patchify_malformed_payload_emits_sentinel_row():
    """x5o decode contract (matches x5p): a malformed payload must
    surface as ONE labeled sentinel row (patch_row = -1, decode_status
    'error: ...'), never a silent skip — a decode regression is then
    attributable instead of an opaque row-count mismatch."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _ppm_bytes,
        patchify_ppm_batch,
    )

    batch = pd.DataFrame(
        {"doc_id": [3, 4], "payload": [b"NOT A PPM", _ppm_bytes(4)]}
    )
    out = pd.concat(list(patchify_ppm_batch(iter([batch]))))
    bad = out[out["doc_id"] == 3]
    assert len(bad) == 1
    assert int(bad.iloc[0]["patch_row"]) == -1
    assert int(bad.iloc[0]["patch_col"]) == -1
    assert bad.iloc[0]["decode_status"].startswith("error:")
    good = out[out["doc_id"] == 4]
    assert len(good) > 0 and (good["decode_status"] == "ok").all()


def test_audio_decimate_floor_law_on_negative_pairs(spark, tmp_path):
    """x5p law on handmade PCM including the sign-sensitive case: the
    pair (-3, 0) must average to floor(-1.5) = -2 (NOT truncate to -1),
    and an odd trailing sample is dropped."""
    import os

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        x5p_audio_decimate,
    )

    # doc_id=0: n = 160 + 0%41 = 160 samples from the fixture formula;
    # verify against a direct python mirror, including negatives.
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(0, "t", "en", "s1", 1), (7, "t", "en", "s1", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    import math

    def mirror(doc_id):
        n = 160 + doc_id % 41
        v = [((doc_id * 17 + i * 7) % 4096) - 2048 for i in range(n)]
        dec = [math.floor((v[2 * i] + v[2 * i + 1]) / 2.0) for i in range(n // 2)]
        rms = round(math.sqrt(sum(m * m for m in dec) / len(dec)), 4)
        return n, n // 2, sum(dec), rms

    got = {r["doc_id"]: r for r in x5p_audio_decimate(spark, sf_dir).collect()}
    for doc_id in (0, 7):
        n, k, s, rms = mirror(doc_id)
        r = got[doc_id]
        assert (r["n_samples_in"], r["n_samples_out"]) == (n, k)
        assert r["out_sum"] == s
        assert r["out_rms"] == rms
        assert r["decode_status"] == "ok"
    # the fixture formula really does produce negative-sum pairs
    assert any(
        ((0 * 17 + 2 * i * 7) % 4096 - 2048) + ((0 * 17 + (2 * i + 1) * 7) % 4096 - 2048) < 0
        for i in range(80)
    )
    # doc 7: n = 167 is odd -> one sample dropped
    assert got[7]["n_samples_in"] == 167
    assert got[7]["n_samples_out"] == 83


def test_x5m2_planted_variant_displacement_theorem():
    """The x5m2 plant law is a THEOREM, not a tendency: for every
    eligible doc (h >= 8 and w >= 9, so the 9x8 resample samples
    distinct source rows/columns), perturbing one sampled source pixel
    moves the dHash by AT MOST 2 bits (the two adjacent comparisons
    that read the changed grid cell) — which is what makes d = 2
    sufficient to catch every planted near-duplicate. Also pins
    eligibility itself: the chosen (doc % 8, doc % 9) source pixel is
    sampled by exactly one grid cell."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _DHASH_H,
        _DHASH_W,
        _ppm_bytes,
        _x5m2_variant_bytes,
        dhash_ppm_batch,
    )

    eligible = [
        d for d in range(500) if d % 7 >= 4 and d % 13 >= 5
    ]
    assert len(eligible) > 100  # the plant is not a corner case
    pdf = pd.DataFrame(
        {
            "doc_id": eligible + [d + 1_000_000_000 for d in eligible],
            "payload": [_ppm_bytes(d) for d in eligible]
            + [_x5m2_variant_bytes(d) for d in eligible],
        }
    )
    out = pd.concat(list(dhash_ppm_batch(iter([pdf])))).set_index("doc_id")
    assert (out["hash_status"] == "ok").all()
    moved = 0
    for d in eligible:
        w, h = 4 + d % 13, 4 + d % 7
        # eligibility = collision-free resample (the theorem's premise)
        assert h >= _DHASH_H and w >= _DHASH_W
        sy = {(y * h) // _DHASH_H for y in range(_DHASH_H)}
        sx = {(x * w) // _DHASH_W for x in range(_DHASH_W)}
        assert len(sy) == _DHASH_H and len(sx) == _DHASH_W
        a = int(out.loc[d, "dhash"], 16)
        b = int(out.loc[d + 1_000_000_000, "dhash"], 16)
        dist = bin(a ^ b).count("1")
        assert dist <= 2, (d, dist)
        moved += dist > 0
    # the perturbation is a real near-duplicate generator, not a no-op
    assert moved > len(eligible) // 2


def test_x5m2_exact_clusters_subset_of_hamming_universe(spark):
    """x5m (exact dHash clusters) is the distance-0 face of x5m2: every
    exact cluster's hash appears in x5m2's collapsed distinct-hash
    corpus with at least the same member count (x5m2's corpus adds the
    planted variants, never removes a base), and every planted variant
    is either absorbed into its base's exact cluster or surfaces as an
    output pair within distance 2."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        DHASH_SCHEMA,
        _x5m2_variant_batch,
        dhash_ppm_batch,
        encode_ppm_batch,
        x5m2_hamming_near_dedup,
        x5m_image_phash_dedup,
    )

    sf = SF
    exact = {
        r["dhash"]: r["n_images"]
        for r in x5m_image_phash_dedup(spark, sf).collect()
    }
    pairs = x5m2_hamming_near_dedup(spark, sf).collect()
    paired = {(r["a_hash"], r["b_hash"]) for r in pairs}
    universe = {}
    for r in pairs:
        universe[r["a_hash"]] = r["a_images"]
        universe[r["b_hash"]] = r["b_images"]
    for h, n in exact.items():
        if h in universe:  # hashes without a near neighbor emit no pair
            assert universe[h] >= n
    assert all(1 <= r["hamming_dist"] <= 2 for r in pairs)

    # planted-pair law, recomputed from the kernels
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id")
    eligible = docs.filter(
        ((docs.doc_id % 7) >= 4) & ((docs.doc_id % 13) >= 5)
    )
    base_h = {
        r["doc_id"]: r["dhash"]
        for r in docs.mapInPandas(
            encode_ppm_batch, "doc_id long, payload binary"
        )
        .mapInPandas(dhash_ppm_batch, DHASH_SCHEMA)
        .collect()
    }
    var_h = {
        r["doc_id"] - 1_000_000_000: r["dhash"]
        for r in eligible.mapInPandas(
            _x5m2_variant_batch, "doc_id long, payload binary"
        )
        .mapInPandas(dhash_ppm_batch, DHASH_SCHEMA)
        .collect()
    }
    absorbed = found = 0
    for d, vh in var_h.items():
        bh = base_h[d]
        if vh == bh:
            absorbed += 1
            continue
        key = (bh, vh) if bh < vh else (vh, bh)
        assert key in paired, d
        found += 1
    assert found > 0  # at least some plants surface as pairs


def test_x5n2_planted_variant_displacement_theorem_and_pairs(spark):
    """x5n2 laws: (a) THEOREM — doubling one window's samples moves the
    energy-shape fingerprint by AT MOST 2 bits (only the two adjacent
    comparisons that read the perturbed window can flip), for every
    group representative; (b) operator law at sf0.001 — every planted
    variant is either absorbed into its base's exact-fingerprint
    cluster or surfaces as an output pair within distance 2, and exact
    clusters' counts carry through the collapse."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        AUDIO_FP_SCHEMA,
        _wav_bytes_grouped,
        _x5n2_variant_bytes,
        audio_fingerprint_batch,
        x5n2_hamming_audio_near_dedup,
    )

    reps = [d for d in range(0, 500, 5)]
    pdf = pd.DataFrame(
        {
            "doc_id": reps + [d + 1_000_000_000 for d in reps],
            "payload": [_wav_bytes_grouped(d) for d in reps]
            + [_x5n2_variant_bytes(d) for d in reps],
        }
    )
    out = pd.concat(list(audio_fingerprint_batch(iter([pdf])))).set_index(
        "doc_id"
    )
    assert (out["fp_status"] == "ok").all()
    moved = 0
    for d in reps:
        a = int(out.loc[d, "fingerprint"], 16)
        b = int(out.loc[d + 1_000_000_000, "fingerprint"], 16)
        assert len(out.loc[d, "fingerprint"]) == len(
            out.loc[d + 1_000_000_000, "fingerprint"]
        )
        dist = bin(a ^ b).count("1")
        assert dist <= 2, (d, dist)
        moved += dist > 0
    assert moved > len(reps) // 2  # a real near-dup generator, not a no-op

    sf = SF
    pairs = x5n2_hamming_audio_near_dedup(spark, sf).collect()
    paired = {(r["a_fp"], r["b_fp"]) for r in pairs}
    assert all(1 <= r["hamming_dist"] <= 2 for r in pairs)

    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id")
    base_fp = {
        r["doc_id"]: r["fingerprint"]
        for r in docs.mapInPandas(
            lambda it: (
                pd.DataFrame(
                    {
                        "doc_id": p["doc_id"],
                        "payload": p["doc_id"].map(_wav_bytes_grouped),
                    }
                )
                for p in it
            ),
            "doc_id long, payload binary",
        )
        .mapInPandas(audio_fingerprint_batch, AUDIO_FP_SCHEMA)
        .collect()
    }
    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _x5n2_variant_batch,
    )

    var_fp = {
        r["doc_id"] - 1_000_000_000: r["fingerprint"]
        for r in docs.filter(docs.doc_id % 5 == 0)
        .mapInPandas(_x5n2_variant_batch, "doc_id long, payload binary")
        .mapInPandas(audio_fingerprint_batch, AUDIO_FP_SCHEMA)
        .collect()
    }
    absorbed = found = 0
    for d, vf in var_fp.items():
        bf = base_fp[d]
        if vf == bf:
            absorbed += 1
            continue
        key = (bf, vf) if bf < vf else (vf, bf)
        assert key in paired, d
        found += 1
    assert found > 0


def _x5r_python_mirror(doc_ids):
    """Assignment-free mirror of the x5r kernel: per doc, the base and
    variant clip fingerprints (pipe-joined per-sampled-frame dhashes)
    computed straight from the byte generators + the shared dhash
    site."""
    import numpy as np  # noqa: F401  (parse helper needs it loaded)

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _dhash_hex_from_raster,
        _parse_ppm_raster,
        _ppm_bytes,
        _x5m2_variant_bytes,
    )

    def fh(buf):
        w, h, raster = _parse_ppm_raster(buf)
        return _dhash_hex_from_raster(w, h, raster)

    fps = {}
    for d in doc_ids:
        n = 2 + d % 4
        sampled = [f for f in range(n) if f % 2 == 0]
        base = [fh(_ppm_bytes(d + f)) for f in sampled]
        var = [
            fh(
                _x5m2_variant_bytes(d + f)
                if (d + f) % 7 >= 4 and (d + f) % 13 >= 5
                else _ppm_bytes(d + f)
            )
            for f in sampled
        ]
        fps[d] = ("|".join(base), "|".join(var))
    return fps


def test_x5r_per_frame_displacement_theorem():
    """The x5m2 theorem applied frame-wise: for every doc, each sampled
    frame position of the planted re-encoded clip is within Hamming 2
    of the base clip's frame — and exactly 0 where the frame seed is
    ineligible for perturbation (proving the variant generator only
    touches eligible frames)."""
    fps = _x5r_python_mirror([d for d in range(200) if d % 4 >= 1])
    for d, (b, v) in fps.items():
        n = 2 + d % 4
        sampled = [f for f in range(n) if f % 2 == 0]
        for pos, (hb, hv) in enumerate(zip(b.split("|"), v.split("|"))):
            hd = bin(int(hb, 16) ^ int(hv, 16)).count("1")
            assert hd <= 2, (d, pos, hd)
            seed = d + sampled[pos]
            if not (seed % 7 >= 4 and seed % 13 >= 5):
                assert hd == 0, (d, pos)


def test_x5r_output_matches_python_closure(spark, tmp_path):
    """x5r end-to-end on a handmade doc set covering both planted
    outcomes: docs 1 and 2 collapse (no sampled frame eligible -> the
    variant is byte-identical and merges into the base's exact
    fingerprint cluster), docs 3/5/6/7/9 surface as >= 1-bit pairs.
    The Spark output pair set must equal the python all-pairs filter
    EXACTLY (same fps, same per-position <= 2 law, same max_frame_hd),
    which also pins the band join's completeness for d <= 2."""
    import pandas as pd

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        x5r_video_near_dedup,
    )

    doc_ids = [1, 2, 3, 5, 6, 7, 9]
    pd.DataFrame({"doc_id": doc_ids, "text": ["t"] * len(doc_ids)}).to_parquet(
        tmp_path / "documents.parquet"
    )
    fps = _x5r_python_mirror(doc_ids)
    # python mirror of the whole operator: distinct fps with clip
    # counts, then the all-pairs per-position law
    from collections import defaultdict

    groups = defaultdict(list)
    for d, (b, v) in fps.items():
        groups[b].append(d)
        groups[v].append(d + 1_000_000_000)
    assert len(groups[fps[1][0]]) >= 2  # doc 1's variant collapsed
    expected = {}
    keys = sorted(groups)
    for i, fa in enumerate(keys):
        for fb in keys[i + 1:]:
            pa, pb = fa.split("|"), fb.split("|")
            if len(pa) != len(pb):
                continue
            hds = [
                bin(int(a, 16) ^ int(b, 16)).count("1")
                for a, b in zip(pa, pb)
            ]
            if max(hds) <= 2:
                expected[(fa, fb)] = (len(pa), max(hds))
    got = {
        (r["a_fp"], r["b_fp"]): (r["n_frames"], r["max_frame_hd"])
        for r in x5r_video_near_dedup(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # at least one planted base-variant pair actually surfaced
    planted = [
        tuple(sorted(fps[d])) for d in doc_ids if fps[d][0] != fps[d][1]
    ]
    assert any(p in got for p in planted)


def test_x5s_keyframe_is_argmax_with_first_cut_tiebreak(spark):
    """x5s law against its own input: for every clip, the rank-1
    keyframe carries that clip's maximum x5k scene-change score; ranks
    are dense 1..K; equal scores rank the EARLIER frame first; and
    n_scored_frames equals the clip's 'ok' row count in x5k."""
    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _X5S_TOPK,
        x5k_scene_change,
        x5s_keyframe_select,
    )

    scored = {}
    for r in x5k_scene_change(spark, SF).collect():
        if r["scene_status"] == "ok":
            scored.setdefault(r["doc_id"], []).append(
                (r["frame_idx"], r["mean_abs_diff"])
            )

    picked = {}
    for r in x5s_keyframe_select(spark, SF).collect():
        picked.setdefault(r["doc_id"], []).append(r)

    assert set(picked) == set(scored)
    for doc_id, rows in picked.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(
            range(1, min(_X5S_TOPK, len(scored[doc_id])) + 1)
        )
        assert all(r["n_scored_frames"] == len(scored[doc_id]) for r in rows)
        assert rows[0]["mean_abs_diff"] == max(d for _, d in scored[doc_id])
        # the selected list must equal the python argsort by
        # (-diff, frame_idx) — the first-cut-wins tie law
        want = sorted(scored[doc_id], key=lambda t: (-t[1], t[0]))
        got = [(r["frame_idx"], r["mean_abs_diff"]) for r in rows]
        assert got == want[: len(rows)]


def test_x5t_gain_matches_python_closure_and_cap_law(spark):
    """x5t laws: (a) against the real fixture, every clip's gain equals
    the python recompute floor(1e6 * target / max(x5i rms)) capped at
    the max boost, with quiet/window counts matching; (b) the cap law
    (limited <=> raw gain exceeds the cap, gain then pinned AT the cap)
    pinned on literal peak values including a near-silent one the
    fixture can't produce."""
    import math

    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _X5T_GAIN,
        _X5T_MAX_GAIN_MICRO,
        x5i_audio_rms_profile,
        x5t_audio_gain_normalize,
    )
    from pyspark.sql import functions as F

    prof = {}
    for r in x5i_audio_rms_profile(spark, SF).collect():
        if r["profile_status"] == "ok":
            prof.setdefault(r["doc_id"], []).append(r["rms"])

    out = {r["doc_id"]: r for r in x5t_audio_gain_normalize(spark, SF).collect()}
    assert set(out) == {d for d, rms in prof.items() if max(rms) > 0}
    for doc_id, row in out.items():
        peak = max(prof[doc_id])
        raw = math.floor(1_000_000 * 1000.0 / peak)
        assert row["peak_rms"] == peak
        assert row["n_windows"] == len(prof[doc_id])
        assert row["quiet_windows"] == sum(1 for v in prof[doc_id] if v < 100.0)
        assert row["gain_micro"] == min(raw, _X5T_MAX_GAIN_MICRO)
        assert row["limited"] == (raw > _X5T_MAX_GAIN_MICRO)

    # (b) cap law on literal peaks: 0.01 -> raw 1e11, must pin AT the cap
    lit = spark.createDataFrame(
        [(0.01,), (500.0,), (1000.0,), (4000.0,)], "peak_rms double"
    ).select(
        "peak_rms",
        F.least(F.expr(_X5T_GAIN), F.lit(_X5T_MAX_GAIN_MICRO)).alias("g"),
        (F.expr(_X5T_GAIN) > _X5T_MAX_GAIN_MICRO).alias("limited"),
    )
    rows = {r["peak_rms"]: r for r in lit.collect()}
    assert rows[0.01]["limited"] and rows[0.01]["g"] == _X5T_MAX_GAIN_MICRO
    assert not rows[500.0]["limited"] and rows[500.0]["g"] == 2_000_000
    assert rows[1000.0]["g"] == 1_000_000
    assert rows[4000.0]["g"] == 250_000


def test_x5u_shots_tile_clips_and_match_python_cut_law(spark):
    """x5u law against its own input: recompute the cut roster in
    python from x5k's collected scores (d4 = round(mad*10000); cut iff
    10*n*d4 > 11*sum) and assert the shot table is exactly the
    running-sum segmentation — shot 0 starts at frame 0, shots tile
    0..n_frames-1 contiguously with no gaps or overlaps, every shot
    after 0 starts at a cut frame, and n_shots = 1 + n_cuts. The
    sf0.01 corpus exercises both branches (measured: 379 of 1250
    scored frames cut, 293 of 500 clips carry at least one cut)."""
    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _X5U_DEN,
        _X5U_NUM,
        x5k_scene_change,
        x5u_shot_segmentation,
    )

    scores = {}
    for r in x5k_scene_change(spark, SF).collect():
        if r["scene_status"] == "ok":
            scores.setdefault(r["doc_id"], []).append(
                (r["frame_idx"], round(r["mean_abs_diff"] * 10000))
            )

    # python reference segmentation
    want = {}
    any_cut = False
    for doc_id, rows in scores.items():
        rows.sort()
        s = sum(d for _, d in rows)
        c = len(rows)
        shots = [[0]]
        for f, d in rows:
            if _X5U_DEN * c * d > _X5U_NUM * s:
                shots.append([f])
                any_cut = True
            else:
                shots[-1].append(f)
        want[doc_id] = [
            (i, sh[0], sh[-1], len(sh)) for i, sh in enumerate(shots)
        ]
    assert any_cut, "fixture must exercise the cut branch"

    got = {}
    for r in x5u_shot_segmentation(spark, SF).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["shot_id"], r["start_frame"], r["end_frame"], r["n_frames"])
        )
    assert set(got) == set(want)
    for doc_id in want:
        assert sorted(got[doc_id]) == want[doc_id], doc_id
        # tiling: spans are contiguous and cover 0..max frame
        spans = sorted(got[doc_id])
        assert spans[0][1] == 0
        for (_, _, e1, _), (_, s2, _, _) in zip(spans, spans[1:]):
            assert s2 == e1 + 1


def test_ppm_maxval_law_strict_digits():
    """r16 advisory closure: the shared maxval law tolerates whitespace
    padding (the r15 unification's intent) but rejects signed,
    inner-whitespace, and non-digit tokens — and EVERY failure is the
    same descriptive ValueError, never int()'s generic message."""
    import pytest
    from ssn_college_software_architecture_assignments__spark.operators.multimodal import (
        _check_ppm_maxval,
    )

    for ok in (b"255", b" 255", b"255 ", b"\t255\n"):
        _check_ppm_maxval(ok)  # no raise
    for bad in (b"+255", b"-255", b"2 55", b"abc", b"256", b"", b"0xff"):
        with pytest.raises(ValueError, match="unsupported maxval"):
            _check_ppm_maxval(bad)


def test_x5u_no_phantom_shot_for_clips_without_ok_frames(spark):
    """r16 advisory closure: a clip whose x5k profile carries zero
    'ok' rows (non-video / all-error) emits NO shots — the planted
    shot-0 anchor exists only for clips with at least one scored
    frame. Patch x5k to a planted profile: doc 1 has ok frames with
    one cut, doc 2 only error rows, doc 3 is absent entirely."""
    import ssn_college_software_architecture_assignments__spark.operators.multimodal as mmod

    planted = spark.createDataFrame(
        [
            (1, 1, 0.01, "ok"),
            (1, 2, 9.00, "ok"),   # 10*2*90000 > 11*90100 -> cut
            (1, 3, 0.01, "ok"),
            (2, 1, 0.0, "bad frame magic at 0"),
            (2, 2, 0.0, "truncated frame"),
        ],
        mmod.SCENE_SCHEMA,
    )
    orig = mmod.x5k_scene_change
    mmod.x5k_scene_change = lambda spark, sf_dir: planted
    try:
        rows = mmod.x5u_shot_segmentation(spark, "x").collect()
    finally:
        mmod.x5k_scene_change = orig

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["shot_id"], r["start_frame"], r["end_frame"], r["n_frames"])
        )
    assert set(by_doc) == {1}, "error-only clip 2 must emit no shots"
    assert sorted(by_doc[1]) == [(0, 0, 1, 2), (1, 2, 3, 2)]
