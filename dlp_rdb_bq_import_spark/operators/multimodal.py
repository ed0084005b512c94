"""Multimodal columns: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): media travels as a ``binary`` column
with a sibling metadata struct; decode / feature-extract / resize /
frame-sample are Pandas-UDF stages over ``mapInPandas`` so each Arrow
batch is processed vectorized and the (large) payload bytes never pass
through Python row-at-a-time.

The container has no image/audio codecs, so the actual decode is STUBBED
(``NotImplementedError`` by default, a deterministic fake for tests) —
but everything Spark-side is real and tested: the schema, the binary
column plumbing, the UDF signatures, the batch shapes, and the
partitioning posture (payload columns are pruned unless projected, so a
metadata-only query never reads the bytes — at 100 TB that is the
difference between a metadata scan and a full-corpus read).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, source_col: str, out: str = "payload") -> DataFrame:
    """Pack a column into the opaque binary payload column (fixtures have
    no real media; any bytes exercise the plumbing)."""
    return df.withColumn(out, F.encode(F.col(source_col).cast("string"), "UTF-8"))


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata-only pass: byte length + content digest, computed
    JVM-side. Column pruning keeps this off the slow path when payloads
    are parquet-backed."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB — image decode needs a codec library not present in this
    container. ``deterministic_fake`` yields a seeded 4x4 RGB array
    derived from the payload bytes for pipeline tests."""
    if deterministic_fake:
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "big") & 0xFFFFFFFF
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    raise NotImplementedError("image decode requires a codec library (not in this environment)")


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode → featurize stage shape: Arrow-batched, payload bytes in /
    small feature vector out (the 100 TB posture: features are thousands
    of times smaller than payloads, so this stage is where the data
    volume collapses). Uses the deterministic fake decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, means, feats = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload), deterministic_fake=True)
                ids.append(doc_id)
                lens.append(len(payload))
                means.append(float(img.mean()))
                feats.append(img.astype(np.float64).mean(axis=(0, 1)).tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "byte_len": lens, "mean_px": means, "feature": feats}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), payload_col).mapInPandas(
        run, schema=_FEATURE_SCHEMA
    )


def frame_sample_plan(duration_ms: F.Column, every_ms: int = 1000) -> F.Column:
    """Frame-sampling timestamps for a video payload: pure built-ins
    (sequence), no decode needed to *plan* the sample."""
    return F.sequence(F.lit(0), duration_ms, F.lit(every_ms))


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled timestamp
    (0, every_ms, 2·every_ms, … ≤ duration). The decode is the stubbed
    fake (a deterministic payload slice stands in for the real frame —
    no codec in this container); the Spark plumbing is the real design:
    Arrow-batched mapInPandas, per-frame rows out, payload bytes
    never crossing row-at-a-time Python, and the output carrying a
    digest rather than the frame itself (at 100 TB the frame store is a
    separate sink; the pipeline rows carry references/digests)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, md5s = [], [], [], []
            for doc_id, payload, dur in zip(
                pdf[id_col], pdf[payload_col], pdf[duration_col]
            ):
                b = bytes(payload) if payload is not None else b""
                for i, ts in enumerate(range(0, int(dur) + 1, every_ms)):
                    if b:
                        start = ts % len(b)
                        frame = (b[start:] + b[:start])[:64]
                    else:
                        frame = b"\0"
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(ts)
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame_md5": md5s}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        payload_col,
        F.col(duration_col).cast("long").alias(duration_col),
    ).mapInPandas(run, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int = 2,
    out_h: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode → resize → re-emit stage. The decode is the stubbed fake
    (no codec library in this environment); the resize itself is REAL —
    nearest-neighbor index sampling over the decoded array, the same
    arithmetic a production thumbnailer runs — and the Spark plumbing
    (Arrow batches, schema, digest output) is the production shape.
    Output carries dims + byte count + content digest rather than the
    pixels, so the stage output stays fixed-width no matter the image
    size."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload), deterministic_fake=True)
                h, w = img.shape[0], img.shape[1]
                yi = np.arange(out_h) * h // out_h
                xi = np.arange(out_w) * w // out_w
                raw = np.ascontiguousarray(img[yi][:, xi]).tobytes()
                rows.append(
                    (
                        int(doc_id),
                        out_w,
                        out_h,
                        len(raw),
                        hashlib.md5(raw).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "n_bytes", "content_md5"]
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), payload_col).mapInPandas(
        run, schema=_RESIZE_SCHEMA
    )
