"""Pure-stdlib GIF codec (GIF87a/89a, CompuServe spec, public; LZW per
Welch 1984 as profiled by the GIF specification).

GIF is the third web image staple after JPEG and PNG; its pixel path
is fully specified in the public GIF89a document and needs nothing
beyond ``struct`` + numpy: a logical screen descriptor, palette color
tables, optional extension blocks, and image data as variable-width
LZW codes packed LSB-first into ≤255-byte sub-blocks.

Decoder support (``decode_gif``):
- GIF87a and GIF89a signatures,
- global AND local color tables,
- extension blocks skipped by sub-block arithmetic (graphic control,
  comment, application — transparency is deliberately ignored: the
  feature/phash stages want opaque RGB, matching the PNG path's
  alpha-drop),
- interlaced images (the four-pass row schedule),
- variable-width LZW with CLEAR/EOI handling, code-width growth at
  2^width up to the 12-bit cap, deferred-clear tolerant,
- FIRST frame only of animated streams (documented: frame 1 is the
  thumbnail/preview convention; later image blocks are ignored).

Out-of-profile streams fail loudly (the media_codecs honesty
contract): a missing color table, codes past the dictionary, or a
truncated stream raise ``ValueError``.

The encoder (``encode_gif``) emits a single non-interlaced GIF89a
frame with a global color table built from the image's unique colors
(≤256 required — it raises otherwise rather than quantizing), so
fixtures and round-trip tests get real LZW-compressed bytes.

Everything is plain Python over ``bytes`` + numpy, safe inside
Arrow-batched pandas UDFs.

Reference analogue: IMAGE column handling in the BigQuery row mapper
(BigQueryTableRowDoFn.java:42-46) ships image bytes opaquely; this
codec extends the real multimodal decode surface
(BMP/PPM/PNG/JPEG/WAV/Y4M) to the animated-web-graphics format.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


# ---------------------------------------------------------------------------
# LZW (GIF profile: variable 3..12-bit codes, LSB-first bit packing)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-profile LZW: ``data`` is the concatenated sub-block payload,
    ``min_code_size`` the root index width. Returns exactly
    ``n_pixels`` palette indices (uint8); raises on truncation or
    out-of-range codes."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"gif: LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # prefix/suffix dictionary as arrays (4096 max entries)
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = eoi + 1
    width = min_code_size + 1

    bitbuf = 0
    bitcnt = 0
    pos = 0
    prev = -1
    stack = bytearray()

    def expand(code: int) -> bytes:
        stack.clear()
        c = code
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c] if c >= clear else -1
        stack.reverse()
        return bytes(stack)

    while n_out < n_pixels:
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width

        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError(f"gif: first LZW code {code} not a root")
            seq = bytes([code])
        elif code < next_code:
            seq = expand(code)
        elif code == next_code:
            seq = expand(prev)
            seq = seq + seq[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: LZW code {code} beyond dictionary")
        take = min(len(seq), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(seq[:take], dtype=np.uint8)
        n_out += take
        if prev >= 0 and next_code < 4096:
            # new entry = expand(prev) + first byte of the current
            # expansion — and seq starts with that byte in BOTH the
            # ordinary and the KwKwK case
            prefix[next_code] = prev
            suffix[next_code] = seq[0]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError(f"gif: LZW produced {n_out} of {n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-profile LZW encoder: emits CLEAR first, grows code width at
    2^width, re-clears when the dictionary fills, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    emit(clear)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        # the just-added entry's value could be emitted as a FUTURE
        # code, so codes after an add of value 2^width take width+1
        # bits (the decoder's lagging dictionary grows one step later,
        # at its own next_code == 2^width — the schedules align)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(eoi)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a bytes → (h, w, 3) uint8 RGB of the FIRST frame,
    composed onto the logical screen's background where the frame is
    smaller than the screen. Truncated streams raise ``ValueError``."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"gif: truncated or malformed stream ({exc})") from exc


def _decode_gif(payload: bytes) -> np.ndarray:
    sw, sh, flags, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("gif: image has neither local nor global color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("gif: palette index out of range")
        rows = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder the four passes
            deinterlaced = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                deinterlaced[start:h:step] = rows[src : src + n_rows]
                src += n_rows
            rows = deinterlaced
        frame = table[rows]  # (h, w, 3)
        if (left, top, w, h) == (0, 0, sw, sh):
            return np.ascontiguousarray(frame)
        # compose the (smaller) frame onto the background-filled screen
        bg = (
            table[bg_idx]
            if gct is not None and bg_idx < len(gct)
            else np.zeros(3, np.uint8)
        )
        screen = np.broadcast_to(bg, (sh, sw, 3)).copy()
        screen[top : top + h, left : left + w] = frame
        return screen
    raise ValueError("gif: no image block before trailer")


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF89a bytes. The palette is
    the image's unique colors (raises past 256 — this is a fixture/
    round-trip encoder, not a quantizer)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif: {len(palette)} unique colors > 256")
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        passes = [idx[start::step] for start, step in _INTERLACE_PASSES]
        stream = np.concatenate(passes, axis=0).reshape(-1)
    else:
        stream = idx.reshape(-1)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(stream, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
