"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct
(the same shape a WARC-derived corpus uses for non-text records). The
decode/feature kernels are Arrow-batched ``mapInPandas`` stages — the
real Spark-side contract (schema, batch shape, partition-local
execution) is implemented and tested; the actual codec call is stubbed
behind ``_decode_stub`` because no image/audio libraries exist in this
container (swap in PIL/torchaudio/ffmpeg on a real cluster: the UDF
signature and batching do not change).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.util import spread
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature_dim", IntegerType()),
    ]
)


def attach_fake_payload(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic binary payload column from text docs —
    stands in for WARC media records in this sandbox."""
    return spread(docs).select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(f"{kind}/x-synthetic").alias("mime"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode. On a real cluster this is
    PIL.Image.open / soundfile.read / av.open — same return contract."""
    h = hashlib.md5(payload).hexdigest()
    w = 64 + int(h[:4], 16) % 1984  # fake dims derived from content
    return {
        "content_hash": h,
        "width": w,
        "height": 64 + int(h[4:8], 16) % 1984,
        "feature_dim": 512 if kind == "image" else 128,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: partition-local, Arrow-batched,
    no shuffle — each task decodes only its own batch of payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("timestamp_ms", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Video frame sampling: one input row → n_frames output rows
    (mapInPandas cardinality change — the real contract for an
    ffmpeg/av frame grabber; partition-local, no shuffle). The decode
    is stubbed deterministically: frame count = 1 + (md5 digits % 7),
    duration_ms = n_bytes (1 byte ≙ 1 ms), frame i grabbed at
    i·duration/n evenly-spaced timestamps, each frame identified by
    md5(content_hash ‖ '_' ‖ i) — all DuckDB-expressible, so the
    plumbing is value-checked end to end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p, nb in zip(pdf["media_id"], pdf["payload"], pdf["n_bytes"]):
                h = hashlib.md5(bytes(p)).hexdigest()
                n_frames = 1 + int(h[8:12], 16) % 7
                for i in range(n_frames):
                    rows.append(
                        (
                            mid,
                            i,
                            (i * int(nb)) // n_frames,
                            hashlib.md5(f"{h}_{i}".encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("scale", StringType()),  # 6-dp decimal string
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize-to-fit planning (the metadata half of
    a thumbnailer; the pixel op is the codec stub). Integer target
    dims via exact integer arithmetic — (w·max_side)//max(w,h) — so
    Spark and the DuckDB twin agree bit-for-bit; scale emitted as a
    6-dp string to dodge float-format drift across engines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = _decode_stub(bytes(p), "image")
                w, h = d["width"], d["height"]
                m = max(w, h)
                if m <= max_side:
                    ow, oh, sc = w, h, 1.0
                else:
                    ow = (w * max_side) // m
                    oh = (h * max_side) // m
                    sc = max_side / m
                rows.append((mid, w, h, ow, oh, f"{sc:.6f}"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)
