"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

The container ships no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features clearly marked as such; the real-codec entry
point raises NotImplementedError). Everything Spark-side is real and
tested: BinaryType schema, metadata struct, mapInPandas batch iteration,
output schema, and partition behavior — swap `_fake_decode` for a PIL/
librosa call and the pipeline is production-shaped.

Scale notes: binary payloads ride the columnar scan (parquet BYTE_ARRAY);
mapInPandas streams Arrow batches so one task never holds more than
spark.sql.execution.arrow.maxRecordsPerBatch rows of payload; decode
parallelism == partition count, so repartition by size before decoding
heavy media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.text import MOD

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "doc_id long, media_type string, byte_len long, checksum long, "
    "width long, height long, features array<double>"
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from `documents`: utf-8 payload standing in
    for an image/audio blob + deterministic typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.struct(
            (F.col("doc_id") % 640 + 1).cast("long").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("long").alias("height"),
            (F.col("doc_id") % 30 + 1).cast("long").alias("n_frames"),
        ).alias("meta"),
    )


def decode_real(content: bytes, media_type: str):
    """The real-codec entry point — not available in this environment."""
    raise NotImplementedError(
        "image/audio codecs are not installed; wire PIL/librosa/av here"
    )


def _fake_decode(content: bytes) -> list[float]:
    """STUB decode: deterministic features from raw bytes (mean-ish stats
    over fixed-size byte stripes) — stands in for pixel/spectral features."""
    n = max(1, len(content))
    stripe = max(1, n // FEATURE_DIM)
    out = []
    for i in range(FEATURE_DIM):
        chunk = content[i * stripe : (i + 1) * stripe] or b"\x00"
        out.append(float(sum(chunk)) / float(len(chunk)))
    return out


def extract_features(multimodal: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: byte stats + stubbed decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": content.map(len).astype("int64"),
                    "checksum": content.map(lambda b: sum(b) % MOD).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int64"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int64"),
                    "features": content.map(_fake_decode),
                }
            )

    return multimodal.mapInPandas(batches, schema=_FEATURES_SCHEMA)


FRAME_STRIDE = 5

_FRAMES_SCHEMA = (
    "doc_id long, n_frames long, frame_idx long, frame_len long, frame_checksum long"
)


def sample_frames(multimodal: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling for video payloads: every `stride`-th frame of the
    declared n_frames, as one row per sampled frame. The frame SPLIT is
    the deterministic stub (fixed-size byte stripes — swap for an
    av/ffmpeg demux in production); the Spark plumbing is real: filter
    on typed metadata, mapInPandas over Arrow batches, long-form scalar
    output rows. Decode parallelism follows partition count, so heavy
    video scans should be repartitioned by size first (see module
    docstring)."""
    video = multimodal.where(F.col("media_type") == "video/mp4")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "n_frames", "frame_idx",
                                     "frame_len", "frame_checksum")}
            for doc_id, content, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["meta"]
            ):
                n = len(content)
                nf = int(meta["n_frames"])
                fs = max(1, n // nf)
                for i in range(0, nf, stride):
                    chunk = content[i * fs : (i + 1) * fs]
                    out["doc_id"].append(doc_id)
                    out["n_frames"].append(nf)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(chunk))
                    out["frame_checksum"].append(sum(chunk) % MOD)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return video.mapInPandas(batches, schema=_FRAMES_SCHEMA)


RESIZE_W = 8
RESIZE_H = 6

_RESIZE_SCHEMA = (
    "doc_id long, width long, height long, out_w long, out_h long, "
    "n_sampled long, resized_checksum long"
)


def resize_images(
    multimodal: DataFrame, out_w: int = RESIZE_W, out_h: int = RESIZE_H
) -> DataFrame:
    """Image resize plumbing: nearest-neighbor downsample to a fixed
    out_w × out_h grid. The pixel SAMPLING is the deterministic stub
    (evenly-spaced byte taps standing in for a PIL `Image.resize` —
    same data movement, no codec); filter-on-metadata, Arrow batching
    and the fixed-size output contract are the real pipeline shape a
    vision-model preprocessor needs."""
    images = multimodal.where(F.col("media_type") == "image/png")
    n_px = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "width", "height", "out_w",
                                     "out_h", "n_sampled", "resized_checksum")}
            for doc_id, content, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["meta"]
            ):
                n = len(content)
                taps = [content[k * n // n_px] for k in range(n_px)] if n else []
                out["doc_id"].append(doc_id)
                out["width"].append(int(meta["width"]))
                out["height"].append(int(meta["height"]))
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["n_sampled"].append(len(taps))
                out["resized_checksum"].append(sum(taps) % MOD)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return images.mapInPandas(batches, schema=_RESIZE_SCHEMA)


def features_long(feats: DataFrame) -> DataFrame:
    """Long-form view: posexplode the feature vector into scalar
    (feature_idx, feature_value) rows.

    This is the canonical exchange format for downstream relational
    consumers (and the driver's correctness gate, whose canonicalizer
    sorts rows by every column — array columns are unsortable there):
    scalar rows survive any engine boundary, and at scale the explode
    is a narrow map (no shuffle)."""
    return feats.select(
        "doc_id",
        "media_type",
        "byte_len",
        "checksum",
        "width",
        "height",
        F.posexplode("features").alias("feature_idx", "feature_value"),
    ).withColumn("feature_idx", F.col("feature_idx").cast("long"))
