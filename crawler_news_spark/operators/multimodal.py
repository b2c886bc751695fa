"""Multimodal columns: opaque binary media + typed metadata.

Media payloads travel as ``binary`` columns with a typed metadata struct —
never decoded on the JVM.  Decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators whose Spark-side plumbing
(schema, batch shape, partitioning) is real and tested; the actual
image/audio codecs are NOT in this container, so the decode kernels are
STUBBED: ``decode_media(..., real_codecs=True)`` raises NotImplementedError,
and the default path emits a deterministic fake derived from the bytes
(stable across executors), clearly marked as such.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_kind string, n_bytes long, content_md5 string, "
    "width int, height int, n_frames int"
)


def synth_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary payload column from text (test corpus
    stand-in for real image/audio bytes) + its kind."""
    return docs.select(
        id_col,
        F.encode(F.col(text_col), "utf-8").alias("media_bytes"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_kind"),
    )


def decode_media(
    media: DataFrame, real_codecs: bool = False, codec=None
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched operator.

    ``codec`` is the injectable decode seam (the same pattern as the upload
    sink's caller-supplied transport — plans/sinks.py): a picklable callable
    ``codec(raw: bytes, kind: str) -> (width, height, n_frames)`` applied to
    each payload inside the Arrow batch loop.  In production it wraps
    PIL/ffmpeg; tests prove the seam with a deterministic fake that parses a
    synthetic header.  The operator itself always computes the
    payload-level columns (n_bytes, content_md5) — only the decode proper is
    delegated.

    With no codec injected, real_codecs=True is the production default path
    (PIL/ffmpeg) — unavailable in this container, so it raises; the stub
    path derives deterministic pseudo-metadata from the payload bytes
    (md5-seeded: each dimension uses its own 32-bit hex chunk, so a
    plain-SQL engine can reproduce it with BIGINT arithmetic), keeping
    schema, batching and partitioning behavior identical to the real
    kernel.
    """
    if real_codecs and codec is None:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "inject one via codec=... or run with real_codecs=False for "
            "the deterministic stub"
        )

    def stub_codec(raw: bytes, kind: str) -> tuple[int, int, int]:
        hx = hashlib.md5(raw).hexdigest()
        h1, h2, h3 = (int(hx[k : k + 8], 16) for k in (0, 8, 16))
        return 16 + h2 % 1920, 16 + h3 % 1080, 1 + h1 % 240

    decode = codec or stub_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, md5s, widths, heights, frames = [], [], [], [], []
            for b, kind in zip(pdf["media_bytes"], pdf["media_kind"]):
                raw = bytes(b)
                n_bytes.append(len(raw))
                md5s.append(hashlib.md5(raw).hexdigest())
                w, h, nf = decode(raw, kind)
                widths.append(int(w))
                heights.append(int(h))
                frames.append(int(nf))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": n_bytes,
                    "content_md5": md5s,
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                }
            )

    return media.mapInPandas(run, MEDIA_META_SCHEMA)


def resize_plan(meta: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving fit into (max_w, max_h) for image rows — the
    resize step's real Spark-side plumbing (integer arithmetic, exact in
    any engine); the pixel transform itself belongs to the stubbed codec
    kernel (decode_media real_codecs path).

    new_w = floor(w * s), new_h = floor(h * s) with s = min(max_w/w,
    max_h/h, 1) computed branch-free in integers: the limiting dimension
    decides, never upscale.
    """
    w, h = F.col("width").cast("long"), F.col("height").cast("long")

    def idiv(a, b):  # exact floor-div for positive ints (no float rounding)
        return ((a - F.pmod(a, b)) / b).cast("int")

    # scale by width limit:  (w', h') = (max_w, floor(h*max_w/w))
    by_w = F.struct(
        F.lit(max_w).cast("int").alias("w"), idiv(h * max_w, w).alias("h")
    )
    by_h = F.struct(
        idiv(w * max_h, h).alias("w"), F.lit(max_h).cast("int").alias("h")
    )
    keep = F.struct(w.cast("int").alias("w"), h.cast("int").alias("h"))
    fits = (w <= max_w) & (h <= max_h)
    width_limits = h * max_w <= max_h * w  # width is the binding side (exact)
    target = F.when(fits, keep).when(width_limits, by_w).otherwise(by_h)
    return (
        meta.filter(F.col("media_kind") == "image")
        .withColumn("_t", target)
        .select(
            "doc_id", "width", "height",
            F.col("_t.w").alias("target_w"), F.col("_t.h").alias("target_h"),
        )
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: a deterministic pseudo-embedding per
    payload (md5-chunk integers in [-1000, 1000]) in place of the real
    vision/audio encoder (absent in this container — the honest stub,
    same contract as decode_media).  One Arrow-batched pass; schema and
    partitioning identical to a real encoder's output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["media_bytes"]:
                hx = hashlib.md5(bytes(b)).hexdigest()
                vec = []
                for d in range(dim):
                    ch = hashlib.md5(f"{hx}:{d}".encode()).hexdigest()[:8]
                    vec.append(int(ch, 16) % 2001 - 1000)
                feats.append(vec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "feature_q": feats,
                }
            )

    return media.mapInPandas(
        run, "doc_id long, media_kind string, feature_q array<long>"
    )


def frame_sample(meta: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame-sampling plan for video rows — pure built-ins (sequence+explode)."""
    return (
        meta.filter(F.col("media_kind") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
