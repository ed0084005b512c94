"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public).

JPEG is the dominant image format in any real crawl corpus, and its
baseline profile needs no codec library: sequential DCT, 8-bit
samples, Huffman entropy coding — every stage is fully specified in
the public standard and decodable with ``struct`` + numpy:

- marker segments (SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI),
- canonical Huffman tables (BITS + HUFFVAL, Annex C),
- zigzag scan order, dequantization (Annex F),
- the 8×8 inverse DCT (orthonormal type-III via one matrix pair),
- byte-stuffing (FF 00) and restart markers (FFD0–D7, Annex B/E),
- chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0 sampling factors,
- JFIF YCbCr → RGB.

Progressive JPEG (SOF2, Annex G) decodes too: spectral-selection and
successive-approximation scans (DC/AC first + refinement passes, EOB
runs, per-scan restart intervals) accumulate into a shared coefficient
store and share the baseline path's dequant+IDCT tail — a truncated
progressive stream renders from whatever scans arrived, which is the
format's point. Out-of-profile streams still fail loudly: arithmetic
coding (SOF9+), 12-bit precision, lossless and hierarchical modes
raise ``NotImplementedError`` — the honesty contract of
``operators/media_codecs.py``, now two formats deeper.

The encoder emits baseline 4:4:4 with the Annex K example tables
(quality-scaled by the public libjpeg formula) — fixtures and
round-trip tests get real compressed bytes from it, and the lake's
write path gets a real (if unsubsampled) JPEG writer.

Everything is plain Python over ``bytes`` + numpy block math, safe
inside Arrow-batched pandas UDFs; per-component IDCTs run as ONE
batched tensordot over all blocks, not a Python loop per block.

Reference analogue: IMAGE column handling in the BigQuery row mapper
(BigQueryTableRowDoFn.java:42-46) ships image bytes opaquely; this
codec is what makes the multimodal feature/phash stages real for the
format those columns overwhelmingly contain.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants — all from the public standard
# ---------------------------------------------------------------------------

# zigzag index -> (row-major flat index); Annex F figure A.6
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example quantization tables (the de-facto standard ones)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """A[u, x] = c(u)/2 · cos((2x+1)uπ/16) — forward F = A·f·Aᵀ,
    inverse f = Aᵀ·F·A (the orthonormal pair; Annex A.3.3)."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_basis()


def _build_huff_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman table → {(length, code): symbol} (Annex C)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_huff_encode(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman table → {symbol: (code, length)}."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huff_decode(bits, vals).items()
    }


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """The public libjpeg quality→table mapping (jcparam.c's formula,
    restated): 50 = tables as-is, 100 = all ones, 1 = 50× coarser."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing
    byte stuffing (FF 00 → FF) and stopping at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):  # truncated stream: pad 1-bits
            self.buf = (self.buf << 8) | 0xFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt != 0x00:
                # a real marker terminates entropy data; per the spec a
                # decoder needing more bits here pads with 1-bits
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
            self.pos += 2
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.buf = 0
        self.nbits = 0

    def at_restart_marker(self) -> int | None:
        """After byte_align: the restart index 0-7 if the next two
        bytes are FFD0–FFD7, else None."""
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            return self.data[self.pos + 1] - 0xD0
        return None

    def skip_restart_marker(self) -> None:
        self.pos += 2


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: no Huffman code matched within 16 bits")


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decoding (Annex F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, 3) uint8 RGB.

    Supports SOF0/SOF1 (baseline/extended sequential, 8-bit) AND SOF2
    (progressive, Huffman — Annex G: spectral selection, successive
    approximation, DC/AC refinement scans, EOB runs), 1 or 3
    components, any sampling factors up to 4 (4:4:4/4:2:2/4:2:0
    included), DRI restart intervals, multiple DQT/DHT segments.
    Arithmetic coding, 12-bit precision, lossless and hierarchical
    modes raise ``NotImplementedError``; malformed streams raise
    ``ValueError``."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hi, vi, tq)]
    restart_interval = 0
    progressive = False
    coef = None  # progressive coefficient store, one array per component
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            if progressive and coef is not None:
                fh, fw, comps = frame
                return _idct_merge(fh, fw, comps, coef, qtables)
            raise ValueError("invalid JPEG: EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # parameterless
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg_end = pos + seglen
        body = payload[pos + 2 : seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    i += 64
                else:
                    tbl = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                qtables[tq] = tbl  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htables[(tc, th)] = _build_huff_decode(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported (8 only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/lossless/hierarchical JPEG not supported "
                f"(SOF marker 0x{marker:02X}; SOF0/SOF1/SOF2 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tda >> 4, tda & 0x0F))
            if not progressive:
                return _decode_scan(
                    payload, seg_end, frame, scan, qtables, htables, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coef is None:
                fh, fw, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-fw // (8 * hmax))
                mcus_y = -(-fh // (8 * vmax))
                coef = [
                    np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
                    for _, hi, vi, _ in comps
                ]
            pos = _decode_progressive_scan(
                payload,
                seg_end,
                frame,
                scan,
                (ss, se, ahal >> 4, ahal & 0x0F),
                htables,
                restart_interval,
                coef,
            )
            continue
        # APPn / COM / others: skip
        pos = seg_end
    if progressive and coef is not None:
        # truncated stream (no EOI): render what the scans delivered —
        # progressive's whole point is that a prefix is a valid image
        fh, fw, comps = frame
        return _idct_merge(fh, fw, comps, coef, qtables)
    raise ValueError("invalid JPEG: no SOS marker found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan,
    qtables,
    htables,
    restart_interval: int,
) -> np.ndarray:
    fh, fw, comps = frame
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) JPEG not supported")
    if len(comps) == 1:
        # a single-component scan is non-interleaved by definition
        # (T.81 A.2.2): MCU = one block, declared sampling factors do
        # not apply — normalize them so the MCU grid is per-block
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = []  # per-MCU decode order: (comp_index, hi, vi, tq, dc_tbl, ac_tbl)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        ci = [c[0] for c in comps].index(cs)
        _, hi, vi, tq = by_id[cs]
        order.append((ci, hi, vi, tq, htables[(0, td)], htables[(1, ta)]))
    # coefficient store per component: (blocks_y, blocks_x, 64)
    coef = []
    for _, hi, vi, _ in comps:
        coef.append(
            np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.byte_align()
                if reader.at_restart_marker() is None:
                    raise ValueError("invalid JPEG: expected restart marker")
                reader.skip_restart_marker()
                preds = [0] * len(comps)
            for ci, hi, vi, tq, dc_tbl, ac_tbl in order:
                for byy in range(vi):
                    for bxx in range(hi):
                        blk = coef[ci][my * vi + byy, mx * hi + bxx]
                        t = _decode_huff(reader, dc_tbl)
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("invalid JPEG: AC run overflow")
                            blk[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu_count += 1
    return _idct_merge(fh, fw, comps, coef, qtables)


def _idct_merge(fh, fw, comps, coef, qtables) -> np.ndarray:
    """Shared decode tail: dequantize + batched IDCT per component,
    chroma upsample, YCbCr→RGB merge, crop to frame size. Used by both
    the baseline single-scan path and the progressive finalizer (the
    coefficient store is identical once all scans have landed)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, hi, vi, tq), blocks in zip(comps, coef):
        if tq not in qtables:
            raise ValueError(f"invalid JPEG: missing quant table {tq}")
        by, bx, _ = blocks.shape
        dq = blocks * qtables[tq][None, None, :]  # both zigzag order
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = dq  # zigzag -> natural
        f = nat.reshape(by, bx, 8, 8)
        # batched f = Aᵀ·F·A over all blocks at once
        spatial = np.einsum("ux,yzuv,vw->yzxw", _A, f, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # replicate to full sampling grid then crop to frame size
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoding — T.81 Annex G (spectral selection + successive
# approximation). Coefficients live in zigzag order in the shared store;
# each scan deposits its band/bit-plane slice and the finalizer is the
# same dequant+IDCT tail the baseline path uses.
# ---------------------------------------------------------------------------


def _next_marker(data: bytes, pos: int) -> int:
    """Skip past entropy-coded bytes to the next real marker (not a
    stuffed FF00, not a restart)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:  # stray RST: entropy data
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _ac_first(reader, blk, ac_tbl, ss, se, al, eobrun) -> int:
    """First AC scan of a band (G.1.2.2): run/size coding like baseline
    but over [Ss..Se] only, values point-transformed up by Al, plus
    EOBn symbols coding a run of 2^r..2^(r+1)-1 all-zero-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of 2^r + appended-bits blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("invalid JPEG: AC run past Se")
            blk[k] = _extend(reader.read_bits(s), s) * (1 << al)
            k += 1
    return 0


def _ac_refine(reader, blk, ac_tbl, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (G.1.2.3): each
    previously-nonzero coefficient in the band gets one correction bit
    (add ±2^Al when set and that bit is still clear); newly-nonzero
    coefficients arrive as (run-of-zero-HISTORY, magnitude 1) symbols
    with an explicit sign bit; EOB runs cover whole blocks whose
    remaining coefficients get correction bits only."""
    bit = 1 << al

    def correct(c: int) -> int:
        if reader.read_bit() and (c & bit) == 0:
            return c + (bit if c > 0 else -bit)
        return c

    if eobrun > 0:
        for k in range(ss, se + 1):
            c = int(blk[k])
            if c != 0:
                blk[k] = correct(c)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        newval = 0
        if s == 0:
            if r < 15:  # EOBn — correction bits finish this block
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                for kk in range(k, se + 1):
                    c = int(blk[kk])
                    if c != 0:
                        blk[kk] = correct(c)
                return eobrun
            # r == 15: ZRL — skip 16 zero-history positions below
        else:
            if s != 1:
                raise ValueError(
                    "invalid JPEG: refinement magnitude must be 1"
                )
            newval = bit if reader.read_bit() else -bit
        # advance past r zero-HISTORY positions; nonzero-history ones
        # along the way take correction bits and do not count toward r
        while k <= se:
            c = int(blk[k])
            if c != 0:
                blk[k] = correct(c)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            blk[k] = newval
        k += 1
    return 0


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame,
    scan,
    band,
    htables,
    restart_interval: int,
    coef,
) -> int:
    """Decode ONE progressive scan's entropy data into the shared
    coefficient store; returns the offset of the next marker. DC scans
    (Ss=0) may be interleaved; AC scans are single-component with the
    component's own block grid (T.81 A.2.2 non-interleaved order)."""
    fh, fw, comps = frame
    ss, se, ah, al = band
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    ids = [c[0] for c in comps]
    if ss == 0 and se != 0:
        raise ValueError("invalid JPEG: DC scan with Se != 0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("invalid JPEG: interleaved AC scan")

    if len(scan) > 1:
        mcus_x = -(-fw // (8 * hmax))
        mcus_y = -(-fh // (8 * vmax))

        def mcus():
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blks = []
                    for cs, td, _ta in scan:
                        ci = ids.index(cs)
                        _, hi, vi, _ = comps[ci]
                        for yy in range(vi):
                            for xx in range(hi):
                                blks.append(
                                    (ci, my * vi + yy, mx * hi + xx, (0, td))
                                )
                    yield blks

    else:
        cs, td, ta = scan[0]
        if cs not in ids:
            raise ValueError(f"scan references unknown component {cs}")
        ci = ids.index(cs)
        _, hi, vi, _ = comps[ci]
        # non-interleaved block grid: the component's own dimensions
        cw = -(-fw * hi // hmax)  # ceil(fw·hi/hmax)
        ch = -(-fh * vi // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        tkey = (0, td) if ss == 0 else (1, ta)

        def mcus():
            for by in range(bh):
                for bx in range(bw):
                    yield [(ci, by, bx, tkey)]

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    eobrun = 0
    mcu_count = 0
    for blks in mcus():
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            reader.byte_align()
            if reader.at_restart_marker() is None:
                raise ValueError("invalid JPEG: expected restart marker")
            reader.skip_restart_marker()
            preds = [0] * len(comps)
            eobrun = 0
        for ci, by, bx, tkey in blks:
            blk = coef[ci][by, bx]
            if ss == 0:
                if ah == 0:  # first DC scan: diffs of DC >> Al
                    tbl = htables.get(tkey)
                    if tbl is None:
                        raise ValueError(f"missing Huffman table {tkey}")
                    t = _decode_huff(reader, tbl)
                    preds[ci] += _extend(reader.read_bits(t), t)
                    blk[0] = preds[ci] * (1 << al)
                else:  # DC refinement: one raw bit per block
                    if reader.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
            else:
                tbl = htables.get(tkey)
                if tbl is None:
                    raise ValueError(f"missing Huffman table {tkey}")
                if ah == 0:
                    eobrun = _ac_first(reader, blk, tbl, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, blk, tbl, ss, se, al, eobrun)
        mcu_count += 1
    return _next_marker(data, reader.pos)


# ---------------------------------------------------------------------------
# encoder — baseline 4:4:4, Annex K tables, optional restart interval
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (Annex B rule)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, appended bits) per Annex F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _quantize_444(
    rgb: np.ndarray, quality: int
) -> tuple[list[np.ndarray], int, int, np.ndarray, np.ndarray]:
    """Shared encode front half: RGB → YCbCr → per-block FDCT →
    quantized zigzag coefficients (4:4:4). Both the baseline and the
    progressive encoder run this identically, so the two streams carry
    the SAME coefficients — progressive is purely a different entropy
    ordering, which is what makes the decode-parity test exact."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # natural (row-major) order here; the DQT segment stores zigzag
    qy = _quality_scaled(QUANT_LUMA, quality)
    qc = _quality_scaled(QUANT_CHROMA, quality)

    def blockify(plane: np.ndarray) -> np.ndarray:
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        by, bx = ph // 8, pw // 8
        return (
            padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3),
            by,
            bx,
        )

    planes = [(y, 0), (cb, 1), (cr, 1)]
    quantized = []  # per component: (by, bx, 64 int zigzag)
    for plane, tclass in planes:
        blocks, by, bx = blockify(plane)
        fdct = np.einsum("ux,yzxw,vw->yzuv", _A, blocks - 128.0, _A)
        qtab = qy if tclass == 0 else qc
        qz = np.round(fdct.reshape(by, bx, 64) / qtab[None, None, :]).astype(
            np.int64
        )
        quantized.append(qz[:, :, ZIGZAG])  # natural -> zigzag
    by, bx = quantized[0].shape[:2]
    return quantized, by, bx, qy, qc


def encode_jpeg(
    rgb: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes (4:4:4 sampling,
    Annex K quant/Huffman tables scaled by ``quality``; DRI + restart
    markers when ``restart_interval`` MCUs is set)."""
    quantized, by, bx, qy, qc = _quantize_444(rgb, quality)
    h, w = rgb.shape[:2]
    enc_dc = [
        _build_huff_encode(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huff_encode(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    enc_ac = [
        _build_huff_encode(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huff_encode(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in tbl[ZIGZAG]  # DQT stores zigzag order
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 4:4:4
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, t in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, (t << 4) | t])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for baseline

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for myy in range(by):
        for mxx in range(bx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci in range(3):
                t = 0 if ci == 0 else 1
                blk = quantized[ci][myy, mxx]
                diff = int(blk[0]) - preds[ci]
                preds[ci] = int(blk[0])
                s, bits = _magnitude(diff)
                code, ln = enc_dc[t][s]
                writer.write(code, ln)
                if s:
                    writer.write(bits, s)
                run = 0
                last_nz = 0
                for k in range(63, 0, -1):
                    if blk[k] != 0:
                        last_nz = k
                        break
                for k in range(1, last_nz + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[t][0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(v)
                    code, ln = enc_ac[t][(run << 4) | s]
                    writer.write(code, ln)
                    writer.write(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[t][0x00]  # EOB
                    writer.write(code, ln)
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder — SOF2, fixed-length ("flat") Huffman tables,
# a libjpeg-style scan script. Exists chiefly so the decoder's Annex G
# paths (spectral selection, successive approximation, EOB runs,
# refinement correction bits) are exercised by an exact round trip:
# the quantized coefficients are IDENTICAL to the baseline encoder's,
# so progressive-decode must equal baseline-decode pixel-for-pixel.
# ---------------------------------------------------------------------------

# flat canonical tables: every symbol the same code length (length L is
# valid while count <= 2^L - 1, keeping the all-ones code unused). The
# Annex K tables lack the EOBn symbols (0x10..0xE0) progressive needs.
PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_VALS = list(range(12))
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]

# the scan script: (component indices, Ss, Se, Ah, Al). DC first at
# Al=1 then refined; luma AC split into two spectral bands at Al=2
# refined twice; chroma AC at Al=1 refined once — every Annex G decode
# path (first/refine × DC/AC × interleaved/single) gets traffic.
_PROG_SCRIPT = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0, 1, 2), 0, 0, 1, 0),
)


def encode_jpeg_progressive(
    rgb: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JFIF JPEG, 4:4:4,
    Annex K quantization scaled by ``quality``, flat Huffman tables,
    the 10-scan successive-approximation script above. Coefficients
    match :func:`encode_jpeg` exactly (shared ``_quantize_444``).
    ``restart_interval`` MCUs > 0 inserts DRI + per-scan RST markers
    (DC prediction and EOB runs reset at each — an EOB run never
    crosses a restart, per Annex G)."""
    quantized, by, bx, qy, qc = _quantize_444(rgb, quality)
    h, w = rgb.shape[:2]
    enc_dc = _build_huff_encode(PROG_DC_BITS, PROG_DC_VALS)
    enc_ac = _build_huff_encode(PROG_AC_BITS, PROG_AC_VALS)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in tbl[ZIGZAG]
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 4:4:4
    for tc, bits, vals in ((0, PROG_DC_BITS, PROG_DC_VALS), (1, PROG_AC_BITS, PROG_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)  # table id 0
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for comp_idx, ss, se, ah, al in _PROG_SCRIPT:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_idx), len(comp_idx))
        for ci in comp_idx:
            out += bytes([ci + 1, 0x00])  # component id; dc/ac table 0
        out += bytes([ss, se, (ah << 4) | al])
        writer = _BitWriter()
        if ss == 0:
            _encode_dc_scan(
                writer, quantized, comp_idx, by, bx, ah, al, enc_dc,
                restart_interval,
            )
        else:
            _encode_ac_scan(
                writer, quantized[comp_idx[0]], by, bx, ss, se, ah, al,
                enc_ac, restart_interval,
            )
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_scan(
    writer, quantized, comp_idx, by, bx, ah, al, enc_dc, restart_interval=0
) -> None:
    preds = {ci: 0 for ci in comp_idx}
    mcu_count = 0
    rst = 0
    for myy in range(by):
        for mxx in range(bx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = {ci: 0 for ci in comp_idx}
            for ci in comp_idx:
                if ah == 0:  # first: diff-code DC >> Al (G.1.2.1)
                    v = int(quantized[ci][myy, mxx, 0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s, bits = _magnitude(diff)
                    code, ln = enc_dc[s]
                    writer.write(code, ln)
                    if s:
                        writer.write(bits, s)
                else:  # refinement: one raw bit (the Al bit of DC)
                    writer.write(
                        (int(quantized[ci][myy, mxx, 0]) >> al) & 1, 1
                    )
            mcu_count += 1


def _encode_ac_scan(
    writer, qblocks, by, bx, ss, se, ah, al, enc_ac, restart_interval=0
) -> None:
    """One AC scan (single component, blocks in row-major order):
    first pass (Ah=0) run/size+EOBn coding of the point-transformed
    band; refinement pass the G.1.2.3 correction-bit algorithm with
    cross-block buffered bits."""
    state = {"eobrun": 0, "be_bits": []}

    def emit_sym(sym: int) -> None:
        code, ln = enc_ac[sym]
        writer.write(code, ln)

    def flush_eobrun() -> None:
        run = state["eobrun"]
        if run > 0:
            n = run.bit_length() - 1
            emit_sym(n << 4)
            if n:
                writer.write(run - (1 << n), n)
            state["eobrun"] = 0
            for bbit in state["be_bits"]:
                writer.write(bbit, 1)
            state["be_bits"] = []

    mcu_count = 0
    rst = 0
    for myy in range(by):
        for mxx in range(bx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                flush_eobrun()  # an EOB run may not cross a restart
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
            mcu_count += 1
            blk = qblocks[myy, mxx]
            if ah == 0:
                vals = [
                    int(abs(int(blk[k])) >> al) * (1 if blk[k] >= 0 else -1)
                    for k in range(ss, se + 1)
                ]
                r = 0
                for t in vals:
                    if t == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        emit_sym(0xF0)
                        r -= 16
                    s, bits = _magnitude(t)
                    emit_sym((r << 4) | s)
                    writer.write(bits, s)
                    r = 0
                if r > 0:
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        flush_eobrun()
            else:
                bit = 1 << al
                absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                # last newly-nonzero position gates ZRL-vs-EOB folding
                eob_i = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eob_i = i
                r = 0
                br_bits: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob_i:
                        flush_eobrun()
                        emit_sym(0xF0)
                        r -= 16
                        for bbit in br_bits:
                            writer.write(bbit, 1)
                        br_bits = []
                    if t > 1:  # history-nonzero: correction bit only
                        br_bits.append(t & 1)
                        continue
                    flush_eobrun()
                    emit_sym((r << 4) | 1)
                    writer.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
                    for bbit in br_bits:
                        writer.write(bbit, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    state["eobrun"] += 1
                    state["be_bits"].extend(br_bits)
                    if state["eobrun"] == 0x7FFF:
                        flush_eobrun()
    flush_eobrun()


def probe_jpeg_header(prefix: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, n_components) from marker segments in a header
    prefix — dimension probing without entropy decode (the 4 KB
    header-probe contract). None fields when SOF lies past the prefix."""
    pos = 2
    n = len(prefix)
    while pos + 4 <= n:
        if prefix[pos] != 0xFF:
            return None, None, None
        marker = prefix[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack_from(">H", prefix, pos)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            if pos + 8 > n:
                break
            _, fh, fw, nc = struct.unpack_from(">BHHB", prefix, pos + 2)
            return fw, fh, nc
        if marker == 0xDA:
            break
        pos += seglen
    return None, None, None
