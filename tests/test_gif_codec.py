"""GIF codec tests: a HAND-ASSEMBLED stream whose LZW codes and bit
packing were computed manually from the GIF89a spec (independent of
the encoder — decoder correctness does not rest on roundtripping a
shared bug), plus roundtrips across shapes/interlace, the 12-bit
dictionary boundary, frame-composition, animated first-frame policy,
probe parity, and the multimodal wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators import media_codecs as mc
from dlp_rdb_bq_import_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_hand_assembled_gif_decodes_pinned_pixels():
    """Pixels [1,1,2,2,1] (w=5,h=1), 4-color palette, min code size 2.

    Manual LZW trace (clear=4, eoi=5, width starts 3):
      emit 4(w3) 1(w3) 1(w3) 2(w3) — dict reaches entry #8, width→4 —
      then 2(w4) 1(w4) 5(w4).
    LSB-first packing of [100,001,001,010, 0010,1000,0101] gives
    exactly the three bytes 4C 24 51."""
    gct = bytes(
        [0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255]
    )  # black, red, green, blue
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 5, 1, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
        + gct
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 5, 1, 0)
        + bytes([2])  # LZW min code size
        + bytes([3, 0x4C, 0x24, 0x51, 0])  # one 3-byte sub-block
        + b"\x3b"
    )
    img = decode_gif(payload)
    expect = np.array(
        [[[255, 0, 0], [255, 0, 0], [0, 255, 0], [0, 255, 0], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert (img == expect).all()
    # the encoder reproduces the hand-computed LZW packing for the
    # same index stream and min code size
    idx = np.array([1, 1, 2, 2, 1], dtype=np.uint8)
    assert _lzw_encode(idx, 2) == bytes([0x4C, 0x24, 0x51])


def test_roundtrip_shapes_and_interlace():
    for seed in range(25):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        ncol = int(rng.integers(1, min(256, h * w) + 1))
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        for interlace in (False, True):
            assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()


def test_twelve_bit_dictionary_boundary_and_reset():
    # 300x300 of 200 colors forces codes past 2^11 and a dict reset
    rng = np.random.default_rng(99)
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, (300, 300))]
    enc = encode_gif(img)
    assert (decode_gif(enc) == img).all()
    assert len(enc) < 300 * 300 * 3  # actually compressed


def test_lzw_kwkwk_case():
    idx = np.array([0, 1, 0, 1, 0, 1, 0, 0, 0, 1, 1, 1] * 8, dtype=np.uint8)
    assert (_lzw_decode(_lzw_encode(idx, 2), 2, len(idx)) == idx).all()


def test_frame_composition_and_animated_first_frame():
    pal = np.array([[9, 9, 9], [200, 10, 10]], dtype=np.uint8)
    # hand-build: 4x3 screen, bg index 0, one 2x1 frame at (1,1) of color 1
    frame_idx = np.array([[1, 1]], dtype=np.uint8)
    lzw = _lzw_encode(frame_idx.reshape(-1), 2)
    gct = bytes([9, 9, 9, 200, 10, 10] + [0] * 6)  # padded to 4 entries
    img_block = (
        struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 1, 0)
        + bytes([2, len(lzw)])
        + lzw
        + b"\x00"
    )
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 4, 3, 0x80 | 0x01, 0, 0)
        + gct
        # a graphic-control extension to exercise the skip path
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        + img_block
        + img_block  # second frame: must be ignored
        + b"\x3b"
    )
    img = decode_gif(payload)
    assert img.shape == (3, 4, 3)
    assert (img[1, 1] == [200, 10, 10]).all() and (img[1, 2] == [200, 10, 10]).all()
    assert (img[0, 0] == [9, 9, 9]).all()  # background composed


def test_error_paths():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE")
    with pytest.raises(ValueError, match="unique colors"):
        rng = np.random.default_rng(1)
        encode_gif(rng.integers(0, 256, (40, 40, 3)).astype(np.uint8))
    # truncated LZW stream
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = bytearray(encode_gif(img))
    with pytest.raises(ValueError):
        decode_gif(bytes(enc[: len(enc) - 4]))
    with pytest.raises(ValueError, match="expects"):
        encode_gif(np.zeros((4, 4), dtype=np.uint8))


def test_cross_container_parity_and_probe():
    for seed in (0, 3, 17, 255):
        g = mc.synthesize_image(seed, container="gif")
        assert mc.sniff_format(g) == "gif"
        for other in ("bmp", "ppm", "png"):
            o = mc.synthesize_image(seed, container=other)
            assert (
                mc.decode_image_payload(g) == mc.decode_image_payload(o)
            ).all(), (seed, other)
        img = mc.decode_image_payload(g)
        probe = mc.probe_media_header(g[:4096], len(g))
        assert probe["media_format"] == "gif"
        assert probe["width"] == img.shape[1]
        assert probe["height"] == img.shape[0]
        assert probe["n_channels"] == 3


def test_multimodal_wiring(spark):
    from dlp_rdb_bq_import_spark.operators.multimodal import (
        attach_media,
        extract_features,
    )

    df = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    out = extract_features(attach_media(df, container="gif")).collect()
    assert len(out) == 8
    ref = extract_features(attach_media(df, container="bmp")).collect()
    by_id = {r.doc_id: r for r in out}
    for r in ref:  # lossless parity flows through the Spark stage too
        g = by_id[r.doc_id]
        assert (g.width, g.height, g.mean_px) == (r.width, r.height, r.mean_px)
