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


def test_out_of_profile_and_malformed_raise():
    img = _gradient(8, 8)
    payload = bytearray(jc.encode_jpeg(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jc.decode_jpeg(bytes(payload))
    # SOF2 no longer raises — but a baseline scan header (interleaved,
    # Ss=0/Se=63) is MALFORMED under progressive rules
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        jc.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"not a jpeg")


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — Annex G
# ---------------------------------------------------------------------------


def test_progressive_decodes_identical_to_baseline():
    """Both encoders share _quantize_444, so the two streams carry the
    SAME quantized coefficients — progressive decode must reproduce the
    baseline decode EXACTLY (integer pixel equality), across content
    types and qualities. This round-trips every Annex G path the scan
    script emits: interleaved DC first+refine, AC spectral bands at
    Al=2 with two refinement passes, EOB runs, ZRL, correction bits."""
    for seed, h, w in ((1, 24, 40), (9, 17, 33), (13, 8, 8), (21, 5, 7)):
        img = _gradient(h, w, seed=seed)
        for q in (50, 85, 95):
            base = jc.decode_jpeg(jc.encode_jpeg(img, quality=q))
            prog = jc.decode_jpeg(jc.encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog), f"seed={seed} q={q}"


def test_progressive_flat_and_noise_extremes():
    rng = np.random.default_rng(5)
    flat = np.full((16, 24, 3), 130, dtype=np.uint8)
    noise = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    for img in (flat, noise):
        base = jc.decode_jpeg(jc.encode_jpeg(img, quality=85))
        prog = jc.decode_jpeg(jc.encode_jpeg_progressive(img, quality=85))
        assert np.array_equal(base, prog)


def test_progressive_truncated_stream_still_renders():
    """Progressive's point: a prefix of the scans is a coarser but
    valid image. Cut the stream after the 3rd scan's entropy data —
    decode must succeed with the right shape, and the DC-only
    approximation should be within coarse range of the original."""
    img = _gradient(16, 16, seed=4)
    full = jc.encode_jpeg_progressive(img, quality=85)
    # find the 4th SOS and cut just before it
    sos_positions = []
    i = 0
    while True:
        j = full.find(b"\xff\xda", i)
        if j < 0:
            break
        sos_positions.append(j)
        i = j + 2
    assert len(sos_positions) == 10
    cut = full[: sos_positions[3]]
    out = jc.decode_jpeg(cut)
    assert out.shape == (16, 16, 3)
    # DC scan landed, so the coarse image tracks the original loosely
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 64.0


def test_progressive_grayscale_hand_built():
    """Hand-built single-component progressive stream: an 8×8 gray
    block with DC = 64 units (table value 16 at index 0 → quantized
    DC=4), coded as DC-first at Al=1 (value 2) then one DC refinement
    bit (0) — decodes to the exact flat 64+128=192... computed below
    from the real IDCT: DC=4·16=64 → spatial 64/8=8 +128 = 136."""
    dqt = b"\xff\xdb" + bytes([0, 67]) + bytes([0]) + bytes([16] * 64)
    sof = b"\xff\xc2" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    # flat DC table: symbols 0..11 at length 4
    dht = (
        b"\xff\xc4"
        + bytes([0, 31, 0x00])
        + bytes([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        + bytes(range(12))
    )
    # scan 1: DC first, Al=1, value 2 -> diff 2: size-2 symbol is code
    # 0b0010 (canonical, 3rd of 12 at length 4), appended bits "10"
    sos1 = b"\xff\xda" + bytes([0, 8, 1, 1, 0x00, 0, 0, 0x01])
    ent1 = bytes([0b0010_10_11])  # sym(4b) + bits(2b) + 1-pad
    # scan 2: DC refine Al=0: one raw bit = 0
    sos2 = b"\xff\xda" + bytes([0, 8, 1, 1, 0x00, 0, 0, 0x10])
    ent2 = bytes([0b0_1111111])  # bit 0 + pad
    stream = (
        b"\xff\xd8" + dqt + sof + dht + sos1 + ent1 + sos2 + ent2 + b"\xff\xd9"
    )
    out = jc.decode_jpeg(stream)
    assert out.shape == (8, 8, 3)
    # DC quantized = 2<<1 = 4; dequant 4*16=64; IDCT: 64/8 + 128 = 136
    assert np.all(out == 136)


def test_progressive_refinement_actually_refines():
    """The refinement scans must change pixels vs the first-pass-only
    prefix (i.e. the correction-bit path is live, not a no-op)."""
    img = _gradient(16, 16, seed=8)
    full = jc.encode_jpeg_progressive(img, quality=85)
    sos_positions = []
    i = 0
    while True:
        j = full.find(b"\xff\xda", i)
        if j < 0:
            break
        sos_positions.append(j)
        i = j + 2
    coarse = jc.decode_jpeg(full[: sos_positions[5]])  # before refinements
    fine = jc.decode_jpeg(full)
    assert not np.array_equal(coarse, fine)
    err_c = np.abs(coarse.astype(int) - img.astype(int)).mean()
    err_f = np.abs(fine.astype(int) - img.astype(int)).mean()
    assert err_f < err_c  # refinement reduces error


def test_progressive_dispatch_and_probe():
    img = _gradient(19, 33, seed=5)
    payload = jc.encode_jpeg_progressive(img, quality=90)
    assert mc.sniff_format(payload) == "jpeg"
    out = mc.decode_image_payload(payload)
    assert out.shape == (19, 33, 3)
    probe = mc.probe_media_header(payload[:4096], len(payload))
    assert (probe["width"], probe["height"], probe["n_channels"]) == (33, 19, 3)


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


def test_progressive_restart_markers_roundtrip_identical():
    """RST markers inside progressive scans (DC prediction + EOB runs
    reset per interval) must not change a single pixel."""
    img = _gradient(24, 40, seed=11)
    plain = jc.decode_jpeg(jc.encode_jpeg_progressive(img, quality=85))
    with_rst = jc.encode_jpeg_progressive(img, quality=85, restart_interval=2)
    assert b"\xff\xd0" in with_rst  # markers actually present
    assert np.array_equal(plain, jc.decode_jpeg(with_rst))
    # and still identical to the baseline decode
    assert np.array_equal(plain, jc.decode_jpeg(jc.encode_jpeg(img, quality=85)))
