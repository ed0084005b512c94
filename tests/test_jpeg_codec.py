"""Baseline JPEG codec (operators/jpeg_codec.py) — pinned the way the
PNG path is pinned: hand-built streams with exactly-known pixels, an
independent trigonometric IDCT reference, round-trip error bounds, and
integration with the multimodal probe/feature/phash stages."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators import jpeg_codec as jc
from dlp_rdb_bq_import_spark.operators import media_codecs as mc


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# hand-built fixtures with exactly-known pixels
# ---------------------------------------------------------------------------


def test_flat_color_blocks_decode_exactly():
    """A flat block is DC-only; with the DC quantizer dividing the
    level-shifted value exactly, decode is bit-exact — no tolerance."""
    for v in (160, 96, 128, 0, 255):
        img = np.full((8, 8, 3), v, dtype=np.uint8)
        out = jc.decode_jpeg(jc.encode_jpeg(img, quality=90))
        # chroma of a grey block is 128 exactly; luma survives the
        # round trip within the DC quantizer's rounding of (v-128)*8
        assert np.abs(out.astype(int) - int(v)).max() <= 1


def _minimal_grey_jpeg(dc_coefs_by_block, w, h, quant=8):
    """Single-component baseline JPEG whose blocks carry exactly the
    given DC coefficients (quantized units) and no AC — every decoded
    pixel is then DC*quant/8 + 128, integer-exact."""
    out = bytearray(b"\xff\xd8")
    q = np.full(64, quant, dtype=np.int64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(int(x) for x in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    for tc, th, bits, vals in (
        (0, 0, jc.DC_LUMA_BITS, jc.DC_LUMA_VALS),
        (1, 0, jc.AC_LUMA_BITS, jc.AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    wtr = jc._BitWriter()
    enc_dc = jc._build_huff_encode(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS)
    enc_ac = jc._build_huff_encode(jc.AC_LUMA_BITS, jc.AC_LUMA_VALS)
    pred = 0
    for dc in dc_coefs_by_block:
        s, bits = jc._magnitude(dc - pred)
        code, ln = enc_dc[s]
        wtr.write(code, ln)
        if s:
            wtr.write(bits, s)
        code, ln = enc_ac[0x00]
        wtr.write(code, ln)
        pred = dc
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def test_handbuilt_grey_stream_pixels_exact():
    """Two blocks wide: DC 32 ⟹ pixels 32·8/8+128 = 160; DC −64 ⟹ 64."""
    payload = _minimal_grey_jpeg([32, -64], w=16, h=8)
    rgb = jc.decode_jpeg(payload)
    assert rgb.shape == (8, 16, 3)
    assert np.all(rgb[:, :8] == 160) and np.all(rgb[:, 8:] == 64)
    # all three channels equal for greyscale
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 2])


def test_handbuilt_single_ac_matches_cosine_reference():
    """One AC coefficient (zigzag position 1 = frequency (0,1)): the
    decoded row profile must match the direct T.81 cosine formula
    computed independently here (float loops, no shared code with the
    codec's matrix IDCT)."""
    out = bytearray(b"\xff\xd8")
    q = np.full(64, 16, dtype=np.int64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(int(x) for x in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    for tc, th, bits, vals in (
        (0, 0, jc.DC_LUMA_BITS, jc.DC_LUMA_VALS),
        (1, 0, jc.AC_LUMA_BITS, jc.AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    wtr = jc._BitWriter()
    enc_dc = jc._build_huff_encode(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS)
    enc_ac = jc._build_huff_encode(jc.AC_LUMA_BITS, jc.AC_LUMA_VALS)
    code, ln = enc_dc[0]  # DC diff 0
    wtr.write(code, ln)
    ac_val = 3  # quantized units at zigzag k=1 -> dequant 3*16 = 48
    s, bits = jc._magnitude(ac_val)
    code, ln = enc_ac[(0 << 4) | s]  # run 0, size s
    wtr.write(code, ln)
    wtr.write(bits, s)
    code, ln = enc_ac[0x00]  # EOB
    wtr.write(code, ln)
    wtr.flush()
    payload = bytes(out) + bytes(wtr.out) + b"\xff\xd9"
    rgb = jc.decode_jpeg(payload)
    # independent reference — the T.81 A.3.3 IDCT formula directly:
    # f(x,y) = ¼ Σ_u Σ_v c(u)c(v) F(u,v) cos((2x+1)uπ/16) cos((2y+1)vπ/16)
    # with only F(0,1)=48 nonzero: 128 + ¼·(1/√2)·48·cos((2·col+1)π/16)
    import math

    for col in range(8):
        expected = 128.0 + 0.25 * (1.0 / math.sqrt(2.0)) * 48.0 * math.cos(
            (2 * col + 1) * math.pi / 16.0
        )
        want = int(np.clip(round(expected), 0, 255))
        assert int(rgb[0, col, 0]) == want, (col, int(rgb[0, col, 0]), want)
    # constant down each column (frequency is horizontal)
    assert np.all(rgb[:, :, 0] == rgb[0:1, :, 0])


def test_420_subsampled_flat_quadrants_exact():
    """Hand-built 4:2:0 stream (2x2 luma blocks per MCU, flat values,
    neutral chroma): each 8x8 quadrant decodes to its exact grey."""
    out = bytearray(b"\xff\xd8")
    q = np.full(64, 8, dtype=np.int64)
    for tq in (0, 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in q
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc, th, bits, vals in (
        (0, 0, jc.DC_LUMA_BITS, jc.DC_LUMA_VALS),
        (1, 0, jc.AC_LUMA_BITS, jc.AC_LUMA_VALS),
        (0, 1, jc.DC_CHROMA_BITS, jc.DC_CHROMA_VALS),
        (1, 1, jc.AC_CHROMA_BITS, jc.AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    wtr = jc._BitWriter()
    enc_dc = [
        jc._build_huff_encode(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS),
        jc._build_huff_encode(jc.DC_CHROMA_BITS, jc.DC_CHROMA_VALS),
    ]
    enc_ac = [
        jc._build_huff_encode(jc.AC_LUMA_BITS, jc.AC_LUMA_VALS),
        jc._build_huff_encode(jc.AC_CHROMA_BITS, jc.AC_CHROMA_VALS),
    ]

    def put(dc_diff, t):
        s, bits = jc._magnitude(dc_diff)
        code, ln = enc_dc[t][s]
        wtr.write(code, ln)
        if s:
            wtr.write(bits, s)
        code, ln = enc_ac[t][0x00]
        wtr.write(code, ln)

    vals = [160, 96, 200, 64]
    pred = 0
    for v in vals:  # quant 8 ⟹ quantized DC = v − 128 exactly
        put((v - 128) - pred, 0)
        pred = v - 128
    put(0, 1)  # Cb 128
    put(0, 1)  # Cr 128
    wtr.flush()
    payload = bytes(out) + bytes(wtr.out) + b"\xff\xd9"
    rgb = jc.decode_jpeg(payload)
    assert rgb.shape == (16, 16, 3)
    exp = np.zeros((16, 16), dtype=int)
    exp[:8, :8], exp[:8, 8:], exp[8:, :8], exp[8:, 8:] = vals
    assert np.array_equal(rgb[:, :, 0].astype(int), exp)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 2])


# ---------------------------------------------------------------------------
# round-trip bounds, restart markers, odd sizes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(8, 8), (17, 23), (41, 57), (9, 64)])
def test_roundtrip_error_bounds(hw):
    h, w = hw
    img = _gradient(h, w, seed=h * 100 + w)
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # noise channel dominates; q95 baseline keeps worst-pixel error small
    assert err.max() <= 20 and err.mean() < 5.0


def test_quality_monotonicity():
    img = _gradient(32, 32, seed=3)
    errs = []
    for q in (95, 75, 40):
        out = jc.decode_jpeg(jc.encode_jpeg(img, quality=q))
        errs.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
    assert errs[0] <= errs[1] <= errs[2]
    # and files shrink as quality drops
    sizes = [len(jc.encode_jpeg(img, quality=q)) for q in (95, 75, 40)]
    assert sizes[0] > sizes[1] > sizes[2]


def test_restart_markers_roundtrip_identical():
    img = _gradient(24, 40, seed=11)
    plain = jc.decode_jpeg(jc.encode_jpeg(img, quality=85))
    with_rst = jc.encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xd0" in with_rst  # markers actually present
    assert np.array_equal(plain, jc.decode_jpeg(with_rst))


def test_progressive_and_malformed_raise():
    img = _gradient(8, 8)
    payload = bytearray(jc.encode_jpeg(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jc.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"not a jpeg")


# ---------------------------------------------------------------------------
# integration: sniff/dispatch, header probe, multimodal stages
# ---------------------------------------------------------------------------


def test_dispatch_and_header_probe():
    img = _gradient(19, 33, seed=5)
    payload = jc.encode_jpeg(img, quality=90)
    assert mc.sniff_format(payload) == "jpeg"
    out = mc.decode_image_payload(payload)
    assert out.shape == (19, 33, 3)
    probe = mc.probe_media_header(payload[:4096], len(payload))
    assert probe["media_format"] == "jpeg"
    assert (probe["width"], probe["height"], probe["n_channels"]) == (33, 19, 3)


def test_synthesize_jpeg_close_to_lossless_source():
    for seed in (2, 7, 30):
        jp = mc.synthesize_image(seed, container="jpeg")
        px_j = mc.decode_image_payload(jp).astype(int)
        px_l = mc.decode_image_payload(
            mc.synthesize_image(seed, container="png")
        ).astype(int)
        assert px_j.shape == px_l.shape
        # lossy but close: same source pixels at quality 90
        assert np.abs(px_j - px_l).mean() < 12.0


def test_phash_stable_across_jpeg_compression(spark):
    """dHash of the JPEG rendition matches the lossless rendition for
    gradient images — the compression-invariance property the near-dup
    stage depends on."""
    from dlp_rdb_bq_import_spark.operators.jpeg_codec import encode_jpeg
    from dlp_rdb_bq_import_spark.operators.multimodal import image_dhash

    rows = []
    for i, (h, w) in enumerate([(24, 32), (17, 40), (33, 21)]):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 // (w - 1)),
                (yy * 255 // (h - 1)),
                ((xx + 2 * yy) * 255 // (w + 2 * h - 3)),
            ],
            -1,
        ).astype(np.uint8)
        rows.append((i * 2, bytearray(mc.encode_png(img))))
        rows.append((i * 2 + 1, bytearray(encode_jpeg(img, quality=90))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    mask = (1 << 64) - 1
    for i in range(3):
        a, b = int(got[i * 2]) & mask, int(got[i * 2 + 1]) & mask
        ham = bin(a ^ b).count("1")
        assert ham <= 4, (i, ham)  # 64-bit dHash, compression-stable


def test_single_component_sampling_factors_normalized():
    """T.81 A.2.2: a single-component scan is non-interleaved — MCU is
    one block regardless of declared sampling factors. A grey stream
    declaring 0x22 must decode identically to one declaring 0x11."""
    def build(hv):
        out = bytearray(b"\xff\xd8")
        q = np.full(64, 8, dtype=np.int64)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
            int(x) for x in q
        )
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1) + bytes(
            [1, hv, 0]
        )
        for tc, th, bits, vals in (
            (0, 0, jc.DC_LUMA_BITS, jc.DC_LUMA_VALS),
            (1, 0, jc.AC_LUMA_BITS, jc.AC_LUMA_VALS),
        ):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        out += b"\x00\x3f\x00"
        wtr = jc._BitWriter()
        edc = jc._build_huff_encode(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS)
        eac = jc._build_huff_encode(jc.AC_LUMA_BITS, jc.AC_LUMA_VALS)
        pred = 0
        for v in (160, 64):
            s, bits = jc._magnitude((v - 128) - pred)
            pred = v - 128
            code, ln = edc[s]
            wtr.write(code, ln)
            if s:
                wtr.write(bits, s)
            code, ln = eac[0x00]
            wtr.write(code, ln)
        wtr.flush()
        return bytes(out) + bytes(wtr.out) + b"\xff\xd9"

    a = jc.decode_jpeg(build(0x11))
    b = jc.decode_jpeg(build(0x22))
    assert np.array_equal(a, b)
    assert np.all(a[:, :8, 0] == 160) and np.all(a[:, 8:, 0] == 64)
