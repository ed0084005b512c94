"""Palette (PLTE/tRNS) and Adam7-interlaced PNG decode (VERDICT r12
task 5) — the highest-frequency codec gap left for real web crawls.

Discipline matches the JPEG/GIF tests: fixtures are HAND-BUILT from
the public spec (chunk layout, sub-byte big-endian sample packing
§2.3, the seven-pass interlace grid §2.6, per-row predictor filters
§6) so the decoder is checked against the specification, not against
our own encoder; plus encoder round-trips across every legal
depth/interlace/alpha combination and cross-container parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators import media_codecs as mc


def _chunked(ihdr_fields, *chunks):
    out = mc._PNG_SIG + mc._png_chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    for ctype, data in chunks:
        out += mc._png_chunk(ctype, data)
    return out + mc._png_chunk(b"IEND", b"")


# ------------------------------------------------------------ hand-built


def test_palette_4bit_hand_built_exact_pixels():
    """2×4 image, 4-bit palette indices packed two-per-byte big-endian
    (spec §2.3), filter 0 — decoded pixels must equal the hand-mapped
    palette entries exactly."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], dtype=np.uint8
    ).repeat(4, axis=0)[:16]  # 16 entries so any 4-bit index is legal
    # rows of indices: (0,1,2,3) and (15,14,13,12)
    row0 = bytes([0x01, 0x23])  # 0,1 | 2,3
    row1 = bytes([0xFE, 0xDC])  # 15,14 | 13,12
    idat = zlib.compress(b"\x00" + row0 + b"\x00" + row1)
    png = _chunked(
        (4, 2, 4, 3, 0, 0, 0),
        (b"PLTE", palette.tobytes()),
        (b"IDAT", idat),
    )
    out = mc.decode_png(png)
    want = palette[np.array([[0, 1, 2, 3], [15, 14, 13, 12]])]
    assert np.array_equal(out, want)


def test_palette_1bit_with_up_filter_hand_built():
    """1-bit indices (8 per byte), second row Up-filtered (§6.2) —
    exercises sub-byte unpacking THROUGH a non-zero filter."""
    palette = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    row0 = bytes([0b10110010])  # indices 1,0,1,1,0,0,1,0
    # second row = same as first (Up filter with all-zero deltas)
    idat = zlib.compress(b"\x00" + row0 + b"\x02" + bytes([0]))
    png = _chunked(
        (8, 2, 1, 3, 0, 0, 0),
        (b"PLTE", palette.tobytes()),
        (b"IDAT", idat),
    )
    out = mc.decode_png(png)
    idx = np.array([1, 0, 1, 1, 0, 0, 1, 0])
    assert np.array_equal(out[0], palette[idx])
    assert np.array_equal(out[1], palette[idx])


def test_adam7_hand_built_pass_layout():
    """4×4 RGB where pixel (y,x) = (y*40+x*10, 0, 0): serialize the
    seven Adam7 passes BY HAND per the spec §2.6 grid and check the
    decoder reassembles the exact full-frame positions."""
    h = w = 4
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (y * 40 + x * 10, 0, 0)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    stream = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            stream.append(0)  # filter 0
            stream.extend(row.reshape(-1).tobytes())
    png = _chunked((w, h, 8, 2, 0, 0, 1), (b"IDAT", zlib.compress(bytes(stream))))
    assert np.array_equal(mc.decode_png(png), img)


def test_adam7_with_sub_filter_inside_a_pass():
    """A pass's scanline filtered with Sub (type 1) must reconstruct
    within the PASS geometry (neighbor = previous pixel of the same
    pass, spec §2.6 'each pass is filtered independently')."""
    # 8×8 grey, pass 1 is the 1 pixel at (0,0), pass 6 covers odd x...
    h = w = 8
    img = np.random.default_rng(5).integers(0, 256, (h, w), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    stream = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx].astype(int)
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            stream.append(1)  # Sub filter: delta vs previous sample
            prev = 0
            for v in row:
                stream.append((v - prev) & 0xFF)
                prev = v
    png = _chunked((w, h, 8, 0, 0, 0, 1), (b"IDAT", zlib.compress(bytes(stream))))
    assert np.array_equal(mc.decode_png(png)[:, :, 0], img)


# -------------------------------------------------------------- round-trip


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_palette_roundtrip_all_depths(depth, interlace):
    rng = np.random.default_rng(depth * 2 + interlace)
    n = 1 << depth
    palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (11, 19), dtype=np.uint8)
    png = mc.encode_png(idx, palette=palette, depth=depth, interlace=interlace)
    assert np.array_equal(mc.decode_png(png), palette[idx])


@pytest.mark.parametrize("interlace", [False, True])
def test_trns_alpha_roundtrip(interlace):
    rng = np.random.default_rng(77)
    palette = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (9, 6), dtype=np.uint8)
    trns = bytes([0, 64, 128])  # entries 3,4 default to opaque 255
    png = mc.encode_png(idx, palette=palette, trns=trns, interlace=interlace)
    out = mc.decode_png(png)
    assert out.shape == (9, 6, 4)
    alpha = np.array([0, 64, 128, 255, 255], dtype=np.uint8)
    assert np.array_equal(out[:, :, :3], palette[idx])
    assert np.array_equal(out[:, :, 3], alpha[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_sub8bit_grey_scales_to_full_range(depth, interlace):
    rng = np.random.default_rng(depth + 10 * interlace)
    mx = (1 << depth) - 1
    g = rng.integers(0, mx + 1, (9, 14), dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(g, depth=depth, interlace=interlace))
    assert np.array_equal(out[:, :, 0], g * (255 // mx))


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (3, 2), (5, 5), (8, 1), (1, 8), (9, 13)])
def test_adam7_rgb_roundtrip_tiny_shapes(shape):
    """Edge geometries where several Adam7 passes are EMPTY."""
    h, w = shape
    img = np.random.default_rng(h * 16 + w).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(img, interlace=True)), img)


def test_adam7_rgba_and_grey_alpha_roundtrip():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (7, 9, 4), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(rgba, interlace=True)), rgba)
    ga = rng.integers(0, 256, (7, 9, 2), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(ga, interlace=True)), ga)


# ------------------------------------------------------------ guard rails


def test_palette_index_out_of_range_raises():
    palette = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)  # 2 entries
    idat = zlib.compress(b"\x00" + bytes([7]))  # index 7 > 1
    png = _chunked((1, 1, 8, 3, 0, 0, 0), (b"PLTE", palette.tobytes()), (b"IDAT", idat))
    with pytest.raises(ValueError, match="palette index"):
        mc.decode_png(png)


def test_bad_plte_length_raises():
    idat = zlib.compress(b"\x00\x00")
    png = _chunked((1, 1, 8, 3, 0, 0, 0), (b"PLTE", b"\x01\x02"), (b"IDAT", idat))
    with pytest.raises(ValueError, match="PLTE"):
        mc.decode_png(png)


def test_interlaced_truncated_stream_raises():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = mc.encode_png(img, interlace=True)
    # re-deflate a truncated pixel stream (CRCs stay valid)
    raw = zlib.decompress(
        good[good.index(b"IDAT") + 4 : good.rindex(b"IEND") - 8]
    )
    short = _chunked((4, 4, 8, 2, 0, 0, 1), (b"IDAT", zlib.compress(raw[:-5])))
    with pytest.raises(ValueError):
        mc.decode_png(short)


def test_sixteen_bit_grey_and_rgb_downscale_to_high_byte():
    """16-bit samples are big-endian (spec §2.3); the decoder keeps the
    most-significant byte for the uint8 pipeline."""
    rng = np.random.default_rng(31)
    hi = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    lo = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    stream = bytearray()
    for y in range(3):
        stream.append(0)
        for x in range(4):
            stream += bytes([hi[y, x], lo[y, x]])
    png = _chunked((4, 3, 16, 0, 0, 0, 0), (b"IDAT", zlib.compress(bytes(stream))))
    assert np.array_equal(mc.decode_png(png)[:, :, 0], hi)
    rgbhi = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    stream = bytearray()
    for y in range(2):
        stream.append(0)
        for x in range(3):
            for c in range(3):
                stream += bytes([rgbhi[y, x, c], 0x55])
    png = _chunked((3, 2, 16, 2, 0, 0, 0), (b"IDAT", zlib.compress(bytes(stream))))
    assert np.array_equal(mc.decode_png(png), rgbhi)


def test_sixteen_bit_palette_still_raises():
    """Depth 16 for color type 3 is outside the spec's legal table."""
    ihdr = (2, 2, 16, 3, 0, 0, 0)
    png = _chunked(
        ihdr,
        (b"PLTE", b"\x00" * 6),
        (b"IDAT", zlib.compress(b"\x00" * 10)),
    )
    with pytest.raises(NotImplementedError):
        mc.decode_png(png)


# ------------------------------------------------- pipeline-facing parity


def test_decode_image_payload_palette_and_interlaced():
    """The dispatch layer must hand palette/interlaced pixels to the
    feature stages exactly as the sequential form does: same image →
    same RGB, alpha dropped."""
    rng = np.random.default_rng(21)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (12, 10), dtype=np.uint8)
    want = palette[idx]
    seq = mc.decode_image_payload(mc.encode_png(idx, palette=palette, depth=4))
    il = mc.decode_image_payload(
        mc.encode_png(idx, palette=palette, depth=4, interlace=True)
    )
    withalpha = mc.decode_image_payload(
        mc.encode_png(idx, palette=palette, trns=bytes([100]))
    )
    assert np.array_equal(seq, want)
    assert np.array_equal(il, want)
    assert np.array_equal(withalpha, want)


def test_probe_reports_decoded_channels_for_palette():
    palette = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((6, 5), dtype=np.uint8)
    raw = mc.encode_png(idx, palette=palette, depth=2)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert (p["media_format"], p["width"], p["height"], p["n_channels"]) == (
        "png", 5, 6, 3,
    )


def test_probe_reports_4_channels_for_transparent_palette():
    """ADVICE r13: the header probe must agree with the decode path —
    palette PNGs WITH a tRNS chunk decode to RGBA (4 channels), so the
    probe walks the prefix chunk list for tRNS before answering."""
    import numpy as np

    from dlp_rdb_bq_import_spark.operators import media_codecs as mc

    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    opaque = mc.encode_png(idx, palette=pal)
    transparent = mc.encode_png(idx, palette=pal, trns=b"\x80\xff")
    p_op = mc.probe_media_header(opaque[: mc.HEADER_PROBE_BYTES], len(opaque))
    p_tr = mc.probe_media_header(
        transparent[: mc.HEADER_PROBE_BYTES], len(transparent)
    )
    assert p_op["n_channels"] == 3
    assert p_tr["n_channels"] == 4
    # the probe's answer matches what decode_png actually returns
    assert mc.decode_png(opaque).shape[2] == 3
    assert mc.decode_png(transparent).shape[2] == 4
