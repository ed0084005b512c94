"""Tests for multimodal.image_dhash / image_neardup_pairs: manual bit
reference, brightness invariance, planted near-duplicates through the
banded Hamming join, and determinism."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators import media_codecs as codecs
from dlp_rdb_bq_import_spark.operators.multimodal import (
    dhash_pixels,
    image_dhash,
    image_neardup_pairs,
)


def _gradient_img(w=32, h=24, noise_seed=None):
    """Horizontal gradient (distinct neighbor comparisons everywhere),
    optional deterministic noise."""
    x = np.linspace(10, 240, w, dtype=np.uint8)
    img = np.repeat(np.tile(x, (h, 1))[:, :, None], 3, axis=2)
    if noise_seed is not None:
        rng = np.random.RandomState(noise_seed)
        img = np.clip(
            img.astype(np.int16) + rng.randint(-4, 5, img.shape), 0, 255
        ).astype(np.uint8)
    return img


def test_dhash_manual_reference_on_tiny_grid():
    # 8 rows x 9 cols, strictly increasing left to right in every row:
    # every comparison px[x+1] > px[x] is True -> all 64 bits set -> -1
    img = np.repeat(
        np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))[:, :, None], 3, axis=2
    )
    assert dhash_pixels(img) == -1  # 0xFFFFFFFFFFFFFFFF as signed int64
    # strictly decreasing -> no bit set
    assert dhash_pixels(img[:, ::-1]) == 0


def test_dhash_brightness_invariant():
    base = _gradient_img()
    shifted = np.clip(base.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    assert dhash_pixels(base) == dhash_pixels(shifted)


def test_dhash_rescale_invariant():
    base = _gradient_img(w=36, h=24)
    # nearest-neighbor upscale 2x preserves the 9x8 sample structure
    up = base.repeat(2, axis=0).repeat(2, axis=1)
    assert dhash_pixels(base) == dhash_pixels(up)


def test_image_dhash_matches_local_decode(spark):
    payloads = [(i, codecs.synthesize_image(i)) for i in range(6)]
    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(p)) for i, p in payloads],
        schema="doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    for i, p in payloads:
        assert got[i] == dhash_pixels(codecs.decode_image_payload(p))


def test_neardup_pairs_planted_duplicates(spark):
    # 0 and 1: same gradient, one brightness-shifted (hamming 0);
    # 2: lightly noised twin of the gradient (small hamming);
    # 3, 4: unrelated synthesized images.
    base = _gradient_img()
    shifted = np.clip(base.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    noisy = _gradient_img(noise_seed=7)
    rows = [
        (0, codecs.encode_bmp(base)),
        (1, codecs.encode_bmp(shifted)),
        (2, codecs.encode_bmp(noisy)),
        (3, codecs.synthesize_image(100)),
        (4, codecs.synthesize_image(200)),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(p)) for i, p in rows],
        schema="doc_id long, payload binary",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_neardup_pairs(df, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3
    # unrelated random images must not pair with the gradient family
    assert all(a not in (3, 4) and b not in (3, 4) for a, b in pairs)


def test_image_dhash_deterministic(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(codecs.synthesize_image(i))) for i in range(8)],
        schema="doc_id long, payload binary",
    )
    a = sorted(map(tuple, image_dhash(df).collect()))
    b = sorted(map(tuple, image_dhash(df).collect()))
    assert a == b


def test_dhash_stable_across_baseline_and_progressive_jpeg():
    """The same image encoded baseline vs progressive (SOF2) must
    decode to identical pixels (shared quantized coefficients) and so
    carry the SAME dHash — the near-dup screen cannot split on the
    entropy-coding profile of the container."""
    from dlp_rdb_bq_import_spark.operators.jpeg_codec import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    base = _gradient_img(w=40, h=24)
    for q in (70, 90):
        hb = dhash_pixels(codecs.decode_image_payload(encode_jpeg(base, quality=q)))
        hp = dhash_pixels(
            codecs.decode_image_payload(encode_jpeg_progressive(base, quality=q))
        )
        assert hb == hp
