"""Multimodal column handling (SURVEY.md §2.10 X5).

Binary payloads (image/audio/video) travel the pipeline as opaque
``binary`` columns wrapped with typed metadata; decode / feature-extract
steps are Arrow-batched ``mapInPandas`` operators. The actual media codecs
are not in this container, so the decode kernel is STUBBED (deterministic
fake behind the real Spark plumbing — schema, partitioning, batch shape
are all genuine and tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

# X5a — binary payload + metadata struct, full oracle ---------------------------

_X5_ORACLE = """
SELECT doc_id,
       base64(encode(text))                       AS payload_b64,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'text/plain'                               AS mime_type,
       md5(text)                                  AS checksum
FROM documents
"""


@register("x5_multimodal_payload", oracle=_X5_ORACLE, tags=("X5",))
def x5_multimodal_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry content as binary + typed metadata (mime, size, checksum)
    through the pipeline. Fixtures have no real media, so text bytes stand
    in for the payload; the column plumbing is identical for image/audio."""
    docs = Catalog(spark, sf_dir).documents
    payload = F.encode("text", "UTF-8")
    # Spark's base64 emits RFC-2045 line breaks every 76 chars; strip to
    # the canonical unchunked form (what DuckDB/python produce).
    b64 = F.regexp_replace(F.base64(payload), "[\\r\\n]", "")
    return docs.select(
        "doc_id",
        b64.alias("payload_b64"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.lit("text/plain").alias("mime_type"),
        F.md5("text").alias("checksum"),
    )


# X5b — decode / feature-extract kernel over mapInPandas -------------------------

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "decode_status string"
)


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode kernel. Real deployments plug PIL/ffmpeg in
    here; this container has neither, so decoding is a deterministic fake
    keyed on payload bytes (STUB — see module docstring). The iterator
    shape (pandas batches in/out) is exactly what a real decoder uses."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype("int64")
        try:
            raise NotImplementedError("media codecs not available in this container")
        except NotImplementedError:
            # Deterministic fake: pretend every payload decodes to a
            # (len % 640, len % 480, 3) "image".
            decoded = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": (n_bytes % 640).astype("int32"),
                    "height": (n_bytes % 480).astype("int32"),
                    "channels": 3,
                    "decode_status": "stubbed",
                }
            )
        yield decoded


_X5B_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT)       AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS INT)    AS width,
       CAST(octet_length(encode(text)) % 480 AS INT)    AS height,
       CAST(3 AS INT)                                   AS channels,
       'stubbed'                                        AS decode_status
FROM documents
"""


@register("x5b_multimodal_decode", oracle=_X5B_ORACLE, tags=("X5",))
def x5b_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode via mapInPandas: Arrow batches cross the JVM/Python
    boundary once per batch (not per row). The decode itself is a declared
    STUB, but its deterministic fake is SQL-expressible, so the Arrow
    plumbing (batch shape, schema, types) is still oracle-checked
    end-to-end."""
    docs = Catalog(spark, sf_dir).documents
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return with_payload.mapInPandas(decode_media_batch, DECODE_SCHEMA).orderBy(
        "doc_id"
    )


# X5d — resize: fixed-target thumbnail kernel ------------------------------------

RESIZE_SCHEMA = (
    "doc_id long, src_bytes long, target_w int, target_h int, "
    "thumb_bytes binary, resize_status string"
)

_TARGET_W, _TARGET_H = 224, 224


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched resize kernel (image -> fixed WxH thumbnail). Real
    deployments call PIL's ``Image.resize`` here; this container has no
    imaging libs, so the resample is a deterministic fake (STUB): the
    "thumbnail" is the payload strided down to ``target_w`` bytes. The
    batch shape, fixed-size output contract, and byte-typed column are
    the genuine plumbing a real resizer uses."""
    for pdf in batches:
        try:
            raise NotImplementedError("imaging libs not available in this container")
        except NotImplementedError:
            thumbs = []
            for payload in pdf["payload"]:
                stride = max(len(payload) // _TARGET_W, 1)
                thumbs.append(bytes(payload[::stride][:_TARGET_W]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_bytes": pdf["payload"].map(len).astype("int64"),
                    "target_w": _TARGET_W,
                    "target_h": _TARGET_H,
                    "thumb_bytes": thumbs,
                    "resize_status": "stubbed",
                }
            )


_X5D_ORACLE = """
-- ASCII-verified fixture: char positions == byte positions, so the
-- kernel's strided byte slice payload[::stride][:224] is reproduced by
-- picking characters at 0, stride, 2*stride, ... and re-encoding.
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         GREATEST(octet_length(encode(text)) // 224, 1) AS stride
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS src_bytes,
       CAST(224 AS INT)  AS target_w,
       CAST(224 AS INT)  AS target_h,
       upper(hex(encode(array_to_string(
         list_transform(
           range(LEAST((n + stride - 1) // stride, 224)),
           i -> substring(text, CAST(i * stride AS BIGINT) + 1, 1)
         ), '')))) AS thumb_hex,
       'stubbed' AS resize_status
FROM d
"""


@register("x5d_resize", oracle=_X5D_ORACLE, tags=("X5",))
def x5d_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize via mapInPandas: every payload maps to one fixed-size
    thumbnail row — output size is bounded per row regardless of input
    size, which is what makes the op safe at 100 TB (no row can blow the
    batch). The resample is a declared STUB with a deterministic strided
    fake; the checked projection carries the thumbnail as hex so the
    whole kernel is oracle-checked end-to-end."""
    docs = Catalog(spark, sf_dir).documents
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    resized = with_payload.mapInPandas(resize_batch, RESIZE_SCHEMA)
    return resized.select(
        "doc_id",
        "src_bytes",
        "target_w",
        "target_h",
        F.upper(F.hex("thumb_bytes")).alias("thumb_hex"),
        "resize_status",
    ).orderBy("doc_id")


# X5c — frame sampling: one input row -> N frame rows ----------------------------

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms long, frame_bytes binary, "
    "sample_status string"
)


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler (video -> evenly spaced frames). Real
    deployments call ffmpeg per payload here; this container has no
    codecs, so the sampler is a deterministic fake (STUB): payload length
    decides the frame count, each "frame" is a byte slice. Row explosion
    (1 video -> N frames) inside the kernel is the genuine shape."""
    for pdf in batches:
        out_rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) % 4) + 1  # stub: fake "duration"
            for i in range(n_frames):
                start = (i * len(payload)) // max(n_frames, 1)
                out_rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": i,
                        "frame_ts_ms": i * 1000,
                        "frame_bytes": payload[start : start + 16],
                        "sample_status": "stubbed",
                    }
                )
        yield pd.DataFrame(
            out_rows,
            columns=[
                "doc_id", "frame_idx", "frame_ts_ms", "frame_bytes", "sample_status",
            ],
        )


_X5C_ORACLE = """
-- DuckDB lacks BLOB substring; fixture text is verified pure ASCII
-- (octet_length == length for every row), so character slicing on the
-- VARCHAR followed by encode() is byte-identical to the kernel's slice.
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         octet_length(encode(text)) % 4 + 1 AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT)           AS frame_idx,
       CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
       upper(hex(encode(substring(text, CAST((i * n) // n_frames AS BIGINT) + 1, 16)))) AS frame_hex,
       'stubbed'                AS sample_status
FROM d, LATERAL (SELECT unnest(range(n_frames)) AS i) gen
"""


@register("x5c_frame_sample", oracle=_X5C_ORACLE, tags=("X5",))
def x5c_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling via mapInPandas: each binary payload row fans out to
    N frame rows inside the Arrow kernel (the UDTF shape for media). The
    sampler is a declared STUB, but its deterministic fake (length-keyed
    frame count, contiguous byte slices) is SQL-expressible, so the
    fan-out plumbing is oracle-checked end-to-end."""
    docs = Catalog(spark, sf_dir).documents
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = with_payload.mapInPandas(sample_frames_batch, FRAME_SCHEMA)
    # Binary columns normalize differently across comparator backends
    # (bytes vs bytearray), so the checked projection carries the frame
    # payload as hex — the kernel output itself stays binary.
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_ts_ms",
        F.upper(F.hex("frame_bytes")).alias("frame_hex"),
        "sample_status",
    ).orderBy("doc_id", "frame_idx")
