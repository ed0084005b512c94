"""Byte-exact tests for the pure-stdlib media codecs and the Spark
multimodal decode stages that consume them.

The codecs implement public uncompressed interchange formats (24-bit
BMP, P6 PPM, RIFF 16-bit-PCM WAV, YUV4MPEG2 C444) from their published
specs — every decoder is exercised both on our own encoder's output
(roundtrip) and on hand-built byte layouts covering the format corners
(BMP row padding / top-down rows / 32-bit pixels, PPM comments, WAV
unknown chunks, Y4M parameterized FRAME lines).
"""

import hashlib
import struct

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators import media_codecs as mc


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (5, 4), (6, 4), (7, 3), (16, 9), (33, 2)])
def test_bmp_ppm_roundtrip(w, h):
    rgb = np.random.default_rng(w * 100 + h).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(rgb)), rgb)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(rgb)), rgb)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = np.random.default_rng(channels).integers(
        0, 256, (7, 11, channels), dtype=np.uint8
    )
    out = mc.decode_png(mc.encode_png(img))
    assert np.array_equal(out, img)


def test_png_all_row_filters():
    """Hand-filter each row with a different predictor (0..4) per the
    PNG spec and check the decoder reconstructs the exact pixels —
    independent of our encoder, which only emits filter 0."""
    import zlib

    h, w, c = 5, 6, 3
    img = np.random.default_rng(3).integers(0, 256, (h, w, c), dtype=np.uint8)
    px = img.astype(int)
    stream = bytearray()
    prev = [0] * (w * c)
    for y in range(h):
        f = y % 5
        cur = list(px[y].reshape(-1))
        stream.append(f)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - ((a + b) >> 1)
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = cur[x] - pred
            stream.append(v & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + mc._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(png), img)


def test_png_unsupported_variants_raise():
    img = np.zeros((2, 2, 3), np.uint8)
    good = mc.encode_png(img)
    # corrupt a CRC byte → ValueError, not silent garbage
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # IEND CRC
    with pytest.raises(ValueError):
        mc.decode_png(bytes(bad))
    # an illegal depth/color-type pair → NotImplementedError (palette,
    # Adam7 and 16-bit grey/RGB are now real decode paths —
    # tests/test_png_palette_adam7.py); a palette header with no PLTE
    # chunk and a garbage IDAT → ValueError
    for depth, ctype, interlace, exc in (
        (16, 3, 0, NotImplementedError),  # 16-bit palette: not in spec
        (8, 3, 0, ValueError),  # missing PLTE
        (8, 2, 1, ValueError),  # IDAT not a zlib stream
    ):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        png = (
            mc._PNG_SIG
            + mc._png_chunk(b"IHDR", ihdr)
            + mc._png_chunk(b"IDAT", b"x")
            + mc._png_chunk(b"IEND", b"")
        )
        with pytest.raises(exc):
            mc.decode_png(png)


def test_png_probe_and_dispatch():
    rgb = np.random.default_rng(9).integers(0, 256, (7, 8, 3), dtype=np.uint8)
    raw = mc.encode_png(rgb)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert (p["media_format"], p["width"], p["height"], p["n_channels"]) == (
        "png", 8, 7, 3,
    )
    assert np.array_equal(mc.decode_image_payload(raw), rgb)
    # RGBA: alpha dropped; grey: broadcast to 3 channels
    rgba = np.random.default_rng(10).integers(0, 256, (4, 5, 4), dtype=np.uint8)
    assert np.array_equal(mc.decode_image_payload(mc.encode_png(rgba)), rgba[:, :, :3])
    grey = np.random.default_rng(11).integers(0, 256, (4, 5, 1), dtype=np.uint8)
    out = mc.decode_image_payload(mc.encode_png(grey))
    assert out.shape == (4, 5, 3) and np.array_equal(out[:, :, 0], grey[:, :, 0])


def test_synthesize_image_container_override():
    """Same seed → same pixels in every container; the seed-parity
    default mapping (even=bmp, odd=ppm) is unchanged."""
    for s in (0, 1, 7, 12):
        base = mc.decode_image_payload(mc.synthesize_image(s))
        for cont in ("bmp", "ppm", "png"):
            alt = mc.synthesize_image(s, container=cont)
            assert mc.sniff_format(alt) == cont
            assert np.array_equal(mc.decode_image_payload(alt), base)
    assert mc.sniff_format(mc.synthesize_image(2)) == "bmp"
    assert mc.sniff_format(mc.synthesize_image(3)) == "ppm"


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    s = np.random.default_rng(ch).integers(-32768, 32767, (777, ch)).astype(np.int16)
    decoded, rate = mc.decode_wav(mc.encode_wav(s, 44100))
    assert rate == 44100
    assert np.array_equal(decoded, s)


def test_y4m_roundtrip():
    frames = np.random.default_rng(3).integers(0, 256, (4, 6, 10, 3), dtype=np.uint8)
    decoded, num, den = mc.decode_y4m(mc.encode_y4m(frames, 30, 1))
    assert (num, den) == (30, 1)
    assert np.array_equal(decoded, frames)


# ---------------------------------------------------------------------------
# spec corners (hand-built bytes, not our encoder's output)
# ---------------------------------------------------------------------------


def test_bmp_top_down_and_32bit():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # top-down: negative height, rows in natural order
    base = mc.encode_bmp(rgb)
    w, h = 3, 2
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # natural order, BGR
    top_down = (
        base[:18]
        + struct.pack("<ii", w, -h)
        + base[26:54]
        + rows.tobytes()
    )
    assert np.array_equal(mc.decode_bmp(top_down), rgb)
    # 32-bit BGRA
    bgra = np.dstack([rgb[:, :, ::-1], np.full((h, w), 255, np.uint8)])
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + bgra.nbytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, bgra.nbytes, 0, 0, 0, 0)
    assert np.array_equal(mc.decode_bmp(header + info + bgra.tobytes()), rgb)


def test_ppm_comments_and_whitespace():
    rgb = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6 # inline comment\n# full-line comment\n 2\t2 \n255\n" + rgb.tobytes()
    assert np.array_equal(mc.decode_ppm(payload), rgb)


def test_wav_skips_unknown_chunks():
    s = np.arange(10, dtype=np.int16)
    encoded = mc.encode_wav(s, 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len → pad byte
    spliced = encoded[:fmt_end] + extra + encoded[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    decoded, rate = mc.decode_wav(spliced)
    assert rate == 8000
    assert np.array_equal(decoded[:, 0], s)


def test_y4m_parameterized_frame_line():
    frames = np.random.default_rng(9).integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
    payload = mc.encode_y4m(frames, 4, 1).replace(b"FRAME\n", b"FRAME Xmeta\n")
    decoded, _, _ = mc.decode_y4m(payload)
    assert np.array_equal(decoded, frames)


# ---------------------------------------------------------------------------
# sniffing + honest failures
# ---------------------------------------------------------------------------


def test_sniff_formats():
    assert mc.sniff_format(mc.synthesize_image(0)) == "bmp"
    assert mc.sniff_format(mc.synthesize_image(1)) == "ppm"
    assert mc.sniff_format(mc.synthesize_audio(0)) == "wav"
    assert mc.sniff_format(mc.synthesize_video(0)) == "y4m"
    assert mc.sniff_format(b"\x89PNG\r\n\x1a\n") == "png"
    assert mc.sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert mc.sniff_format(b"RIFFxxxxAVI LIST") == "unknown"  # RIFF but not WAVE
    assert mc.sniff_format(b"hello world") == "unknown"


def test_compressed_formats_raise():
    with pytest.raises(ValueError):
        # JPEG decodes for real now (baseline, jpeg_codec.py) —
        # truncated garbage after SOI is a ValueError, not a gap
        mc.decode_image_payload(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(ValueError):
        # GIF decodes for real now (LZW, gif_codec.py) — a header with
        # no image block is a ValueError, not a codec-library gap
        mc.decode_image_payload(b"GIF89a" + b"\x00" * 32)
    with pytest.raises(ValueError):
        # PNG decodes for real now — corrupt chunk bytes are a
        # ValueError (CRC/structure), not a codec-library gap
        mc.decode_image_payload(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        mc.decode_image_payload(b"not an image at all")
    with pytest.raises(NotImplementedError):
        # 8-bit palette BMP
        header = struct.pack("<2sIHHI", b"BM", 1000, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
        mc.decode_bmp(header + info + b"\x00" * 64)


def test_synthesis_deterministic_and_varied():
    assert mc.synthesize_image(42) == mc.synthesize_image(42)
    assert mc.synthesize_audio(42) == mc.synthesize_audio(42)
    assert mc.synthesize_video(42) == mc.synthesize_video(42)
    shapes = {mc.decode_image_payload(mc.synthesize_image(s)).shape for s in range(40)}
    assert len(shapes) > 5  # sizes genuinely vary (incl. padded-row widths)


# ---------------------------------------------------------------------------
# Spark decode stages over real payloads
# ---------------------------------------------------------------------------


def test_attach_media_metadata_matches_payload(spark):
    from dlp_rdb_bq_import_spark.operators.multimodal import attach_media

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    rows = attach_media(docs, media="image").collect()
    assert len(rows) == 50
    for r in rows:
        img = mc.decode_image_payload(bytes(r["payload"]))
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["format"] == ("ppm" if r["doc_id"] % 2 else "bmp")
    audio = attach_media(docs, media="audio").collect()
    for r in audio:
        samples, rate = mc.decode_wav(bytes(r["payload"]))
        assert r["duration_ms"] == len(samples) * 1000 // rate
    video = attach_media(docs, media="video").collect()
    for r in video:
        frames, num, den = mc.decode_y4m(bytes(r["payload"]))
        assert r["duration_ms"] == frames.shape[0] * 1000 * den // num


def test_extract_features_real_pixels(spark):
    """Feature rows must equal locally-decoded pixel statistics."""
    from dlp_rdb_bq_import_spark.operators.multimodal import attach_media, extract_features

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in extract_features(attach_media(docs)).collect()}
    for seed in range(20):
        img = mc.decode_image_payload(mc.synthesize_image(seed))
        r = out[seed]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["mean_px"] == pytest.approx(float(img.mean()))
        assert r["feature"] == pytest.approx(img.astype(np.float64).mean(axis=(0, 1)).tolist())


def test_extract_audio_features_real_samples(spark):
    from dlp_rdb_bq_import_spark.operators.multimodal import (
        attach_media,
        extract_audio_features,
    )

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in extract_audio_features(attach_media(docs, media="audio")).collect()}
    for seed in range(20):
        samples, rate = mc.decode_wav(mc.synthesize_audio(seed))
        mono = samples.astype(np.float64).mean(axis=1)
        r = out[seed]
        assert r["sample_rate"] == rate and r["n_samples"] == len(mono)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(mono**2))))
        assert r["zero_crossings"] == int(np.count_nonzero(np.diff(np.signbit(mono))))


def test_resize_digest_matches_local_math(spark):
    from dlp_rdb_bq_import_spark.operators.multimodal import attach_media, resize_images

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in resize_images(attach_media(docs), out_w=2, out_h=2).collect()}
    for seed in range(10):
        img = mc.decode_image_payload(mc.synthesize_image(seed))
        h, w = img.shape[:2]
        yi = np.arange(2) * h // 2
        xi = np.arange(2) * w // 2
        raw = np.ascontiguousarray(img[yi][:, xi]).tobytes()
        assert out[seed]["content_md5"] == hashlib.md5(raw).hexdigest()
        assert out[seed]["n_bytes"] == len(raw) == 12


def test_sample_frames_digests_real_frames(spark):
    from dlp_rdb_bq_import_spark.operators.multimodal import attach_media, sample_frames

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = sample_frames(attach_media(docs, media="video"), every_ms=250).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for seed in range(10):
        frames, num, den = mc.decode_y4m(mc.synthesize_video(seed))
        got = sorted(by_doc[seed], key=lambda r: r["frame_idx"])
        assert len(got) == frames.shape[0]  # 4 fps, 250 ms → every frame once
        for r in got:
            expect = hashlib.md5(
                np.ascontiguousarray(frames[r["src_frame"]]).tobytes()
            ).hexdigest()
            assert r["frame_md5"] == expect


def test_probe_media_header_matches_full_decode():
    """Header-only probe agrees with the full decoder on every
    synthesized container, given ONLY the 4 KB prefix — proof no body
    byte is needed."""
    for seed in range(6):
        raw = mc.synthesize_image(seed)
        p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
        img = mc.decode_image_payload(raw)
        assert (p["width"], p["height"]) == (img.shape[1], img.shape[0])
        assert p["media_format"] in ("bmp", "ppm")

        raw = mc.synthesize_audio(seed)
        p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
        samples, rate = mc.decode_wav(raw)
        assert p["sample_rate"] == rate
        assert p["n_samples"] == samples.shape[0]
        assert p["n_channels"] == samples.shape[1]
        assert p["duration_ms"] == samples.shape[0] * 1000 // rate

        raw = mc.synthesize_video(seed)
        p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
        frames, num, den = mc.decode_y4m(raw)
        assert (p["width"], p["height"]) == (frames.shape[2], frames.shape[1])
        assert p["n_frames"] == frames.shape[0]
        assert (p["fps_num"], p["fps_den"]) == (num, den)


def test_probe_media_header_never_raises_on_junk():
    for junk in (b"", b"\x00" * 64, b"\x89PNG\r\n\x1a\n" + b"x" * 32, b"P6 garbage"):
        p = mc.probe_media_header(junk, len(junk))
        assert "media_format" in p  # sniffed or 'unknown', no exception


def test_media_header_stats_prunes_payload_to_prefix(spark):
    """The Spark operator returns decode-parity dimensions for a mixed
    corpus while the Python side only ever receives the JVM-sliced
    prefix (plan projects substring(payload), never raw payload)."""
    from dlp_rdb_bq_import_spark.operators.multimodal import (
        attach_media,
        media_header_stats,
    )

    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    for media, decode in (
        ("image", None),
        ("audio", None),
        ("video", None),
    ):
        out = media_header_stats(attach_media(docs, media=media))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "substring(payload" in plan
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == set(range(8))
        for seed, r in rows.items():
            if media == "image":
                img = mc.decode_image_payload(mc.synthesize_image(seed))
                assert (r.width, r.height) == (img.shape[1], img.shape[0])
            elif media == "audio":
                samples, rate = mc.decode_wav(mc.synthesize_audio(seed))
                assert (r.sample_rate, r.n_samples) == (rate, samples.shape[0])
            else:
                frames, num, den = mc.decode_y4m(mc.synthesize_video(seed))
                assert (r.width, r.height, r.n_frames) == (
                    frames.shape[2], frames.shape[1], frames.shape[0],
                )


def test_wav_probe_extensible_and_odd_formats():
    """WAVE_FORMAT_EXTENSIBLE PCM resolves through its SubFormat GUID
    to a real frame count; extensible-wrapped compressed and plain
    compressed formats keep null counts (never-wrong contract); 24-bit
    PCM uses block_align, not a hard-coded 16-bit stride."""

    def wav_bytes(audio_fmt, ch, rate, block_align, bits, data_len, subfmt=None):
        fmt = struct.pack(
            "<HHIIHH", audio_fmt, ch, rate, rate * block_align, block_align, bits
        )
        if subfmt is not None:  # extensible: cbSize=22, valid bits, mask, GUID
            fmt += struct.pack("<HHI", 22, bits, 0)
            fmt += struct.pack("<H", subfmt) + b"\x00" * 14
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # extensible wrapping integer PCM, 24-bit stereo: 6-byte frames
    raw = wav_bytes(0xFFFE, 2, 48000, 6, 24, 600, subfmt=1)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert (p["n_channels"], p["sample_rate"], p["n_samples"]) == (2, 48000, 100)
    assert p["duration_ms"] == 100 * 1000 // 48000
    # extensible wrapping ADPCM (subformat 2): count must stay null
    raw = wav_bytes(0xFFFE, 2, 8000, 512, 4, 5120, subfmt=2)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert p["n_samples"] is None and p["duration_ms"] is None
    # plain 24-bit PCM (format 1): clen / block_align, not clen / (ch*2)
    raw = wav_bytes(1, 1, 16000, 3, 24, 300)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert p["n_samples"] == 100
    # IEEE float (format 3)
    raw = wav_bytes(3, 2, 44100, 8, 32, 800)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert p["n_samples"] == 100
    # plain compressed (MP3-in-WAV, format 0x55): null
    raw = wav_bytes(0x55, 2, 44100, 1, 16, 999)
    p = mc.probe_media_header(raw[: mc.HEADER_PROBE_BYTES], len(raw))
    assert p["n_samples"] is None


def test_png_roundtrip_property():
    """Property sweep: arbitrary shapes x channel counts round-trip
    bit-exactly, including 1-pixel and long-thin images."""
    rng = np.random.default_rng(99)
    for trial in range(40):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        c = int(rng.choice([1, 2, 3, 4]))
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        assert np.array_equal(mc.decode_png(mc.encode_png(img)), img), (h, w, c)


def test_png_truncation_always_valueerror():
    """Any prefix truncation of a valid PNG either raises ValueError —
    the documented bad-payload surface, never struct/zlib internals —
    or (when the cut lands exactly after the complete IDAT, leaving
    only IEND missing) still decodes the exact pixels: all image data
    is present, the lenient read browsers also perform."""
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    full = mc.encode_png(img)
    for cut in range(8, len(full)):
        try:
            out = mc.decode_png(full[:cut])
            assert np.array_equal(out, img), cut
        except ValueError:
            pass
