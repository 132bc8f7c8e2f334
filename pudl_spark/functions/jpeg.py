"""JPEG codec (baseline sequential + progressive), stdlib + numpy.

Decoder: baseline DCT (SOF0/1) AND progressive (SOF2), 8-bit, 1 or 3
components, sampling factors 1-2 in each axis (4:4:4 / 4:2:2 /
4:2:0), restart intervals, standard or custom Huffman/quant tables,
spectral selection + successive approximation with EOB-run
accumulation (T.81 F.2.2 / G.2) — the JFIF files ordinary tooling
writes, sequential or progressive. Arithmetic coding, hierarchical,
and 12-bit precision raise NotImplementedError (honest gating, same
policy as the PNG codec).

Encoders: `encode_jpeg` (sequential: grayscale or RGB, 4:4:4/4:2:2/
4:2:0, DRI/RSTn restart emission, Annex K tables) and
`encode_jpeg_progressive` (SOF2 scan scripts: spectral bands,
successive-approximation first/refinement passes, flat custom
Huffman tables carrying the EOBn symbols). The default quantization
table is all-ones, which makes images whose 8x8 blocks are CONSTANT
round-trip pixel-exactly (a constant block has only a DC
coefficient; 8*(c-128) is an integer, so quantize/dequantize at q=1
is the identity and the IDCT reproduces c everywhere) — the property
the driver-facing oracle query relies on; and the progressive
encoder emits exactly the sequential encoder's coefficients, so a
full-precision scan script decodes pixel-identically to the
sequential file (the property the progressive tests pin).

Everything here implements the public ITU T.81 / JFIF specifications;
the standard Huffman and quantization tables are Annex K constants.
Ref parity note: the reference handles imagery through the
PIL/geopandas ecosystem; this self-contained codec is the container-
friendly equivalent for the multimodal pipeline (SURVEY.md LLM ops).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Annex K.1/K.2 typical quantization tables (natural order)
STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Orthonormal 8-point DCT basis: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# ------------------------------------------------------------ bit plumbing


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # pad with 1-bits per spec


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops AT any
    marker (0xFF followed by non-zero) and reports it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise EOFError("truncated JPEG entropy segment")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart markers are consumed by the caller
                raise _RestartMarker(nxt)
            else:
                self.marker = nxt
                raise EOFError("hit marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Drop pending bits and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise EOFError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, code: int) -> None:
        self.code = code


# ------------------------------------------------------------ Huffman


def _build_encode_table(bits: list[int],
                        vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 C.2."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _HuffDecoder:
    """Canonical Huffman decode via per-length min/max code bounds —
    the T.81 F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("bad Huffman code")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (category t, t-bit code)."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t, (v if v >= 0 else v + (1 << t) - 1)


# ------------------------------------------------------------- encoder


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a plane to (ph, pw) by edge replication."""
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    if ph > h:
        pp[h:, :w] = p[h - 1:h, :]
    if pw > w:
        pp[:, w:] = pp[:, w - 1:w]
    return pp


def _downsample(p: np.ndarray, sh: int, sv: int) -> np.ndarray:
    """Chroma downsample by sh x sv box averaging (edge-replicated to
    a multiple first, so partial boxes average real samples)."""
    h, w = p.shape
    ph = -(-h // sv) * sv
    pw = -(-w // sh) * sh
    pp = _pad_edge(p, ph, pw)
    ds = pp.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
    return np.clip(np.round(ds), 0, 255)


def _encode_block(bw: "_BitWriter", block: np.ndarray, quant: np.ndarray,
                  dc_tab: dict, ac_tab: dict, prev_dc: int) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns new DC."""
    coef = np.round(_fdct(block - 128.0) / quant.reshape(8, 8)
                    ).astype(np.int64)
    seq = coef.reshape(64)[ZIGZAG]
    diff = int(seq[0]) - prev_dc
    tt, code = _magnitude(diff)
    hc, hl = dc_tab[tt]
    bw.write(hc, hl)
    bw.write(code, tt)
    run = 0
    last = 63
    while last > 0 and seq[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(seq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_tab[0xF0]                         # ZRL
            bw.write(hc, hl)
            run -= 16
        tt, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | tt]
        bw.write(hc, hl)
        bw.write(code, tt)
        run = 0
    if last < 63:
        hc, hl = ac_tab[0x00]                             # EOB
        bw.write(hc, hl)
    return int(seq[0])


def encode_jpeg(arr: np.ndarray, quant: np.ndarray | None = None,
                subsampling: tuple[int, int] = (1, 1),
                restart_interval: int = 0) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as a baseline
    JFIF JPEG. ``subsampling`` is the luma sampling factor (sh, sv):
    (1, 1) = 4:4:4, (2, 1) = 4:2:2, (2, 2) = 4:2:0 — chroma is box-
    averaged down by the same factors (ignored for grayscale).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (byte-aligned, DC predictors reset) every N MCUs. ``quant`` is a
    length-64 natural-order table applied to every component; the
    default all-ones table makes constant 8x8 blocks round-trip
    exactly."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if quant is None:
        quant = np.ones(64, dtype=np.int32)
    quant = np.asarray(quant, dtype=np.int32).reshape(64)
    sh, sv = (1, 1) if gray else subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")

    if gray:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if (sh, sv) != (1, 1):
            cb = _downsample(cb, sh, sv)
            cr = _downsample(cr, sh, sv)
        planes = [y, cb, cr]
        factors = [(sh, sv), (1, 1), (1, 1)]

    out = bytearray()
    out += b"\xff\xd8"                                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"         + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    zz = quant[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])         + bytes(int(q) for q in zz)                    # DQT id 0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        fh, fv = factors[cid - 1]
        sof += bytes([cid, (fh << 4) | fv, 0])            # qtable 0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + sof

    def _dht(tclass: int, tid: int, bits: list[int], vals: list[int]):
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tid = 0 if cid == 1 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_enc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_enc = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # MCU grid: hmax*8 x vmax*8 pixels per MCU; each plane is padded
    # (edge replicate) to its own block multiple of the grid.
    mcux = (w + 8 * sh - 1) // (8 * sh)
    mcuy = (h + 8 * sv - 1) // (8 * sv)
    padded = [_pad_edge(p, mcuy * 8 * fv, mcux * 8 * fh)
              for p, (fh, fv) in zip(planes, factors)]

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    mcu_count = 0
    rst_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count                and mcu_count % restart_interval == 0:
                # Byte-align, emit RSTn (cycling D0..D7), reset DC.
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_count % 8)])
                rst_count += 1
                prev_dc = [0] * len(planes)
            for ci, (p, (fh, fv)) in enumerate(zip(padded, factors)):
                t = 0 if ci == 0 else 1
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8]
                        prev_dc[ci] = _encode_block(
                            bw, block, quant, dc_enc[t], ac_enc[t],
                            prev_dc[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2)
    JPEG to uint8 (h, w) grayscale or (h, w, 3) RGB. Supports 1/3
    components, sampling factors up to 2x2, restart intervals,
    multiple DQT/DHT segments, and the full progressive scan
    repertoire: interleaved/non-interleaved DC scans, spectral-
    selection AC bands, successive approximation (first + refinement
    passes with EOB-run accumulation, T.81 G.2/F.2.2). Arithmetic
    coding, hierarchical, and 12-bit precision raise
    NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None   # per-comp (nby, nbx, 64) seq
    geom: dict | None = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes — skip them before reading the marker id,
        # else the id reads as 0xFF and a bogus segment length is
        # unpacked from entropy-ish bytes.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0x00:
            # stuffed 0xFF00 inside leftover entropy bytes (reached
            # when resuming the walk after a progressive scan) — data,
            # not a marker
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:                                 # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq:                                     # 16-bit table
                    tbl = np.frombuffer(body, dtype=">u2",
                                        count=64, offset=off + 1)
                    off += 129
                else:
                    tbl = np.frombuffer(body, dtype=np.uint8,
                                        count=64, offset=off + 1)
                    off += 65
                nat = np.empty(64, dtype=np.int32)
                nat[ZIGZAG] = tbl
                quant[tq] = nat
        elif marker == 0xC4:                               # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = list(body[off + 17:off + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):                 # SOF0/1/2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            off = 6
            for _ in range(nc):
                cid, sf, tq = body[off], body[off + 1], body[off + 2]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF,
                              "tq": tq})
                off += 3
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (non-baseline) not supported")
        elif marker == 0xDD:                               # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                               # SOS
            ns = body[0]
            off = 1
            scan = []
            for _ in range(ns):
                cid, tables = body[off], body[off + 1]
                comp = next(c for c in comps if c["id"] == cid)
                comp["td"] = tables >> 4
                comp["ta"] = tables & 0xF
                scan.append(comp)
                off += 2
            if not progressive:
                pos += seglen
                return _decode_scan(data, pos, scan, quant, huff_dc,
                                    huff_ac, h, w, restart_interval)
            ss, se = body[off], body[off + 1]
            ah, al = body[off + 2] >> 4, body[off + 2] & 0xF
            if geom is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                geom = {"hmax": hmax, "vmax": vmax,
                        "mcux": (w + 8 * hmax - 1) // (8 * hmax),
                        "mcuy": (h + 8 * vmax - 1) // (8 * vmax)}
                coefs = [np.zeros((geom["mcuy"] * c["v"],
                                   geom["mcux"] * c["h"], 64),
                                  dtype=np.int64) for c in comps]
            pos = _decode_progressive_scan(
                data, pos + seglen, scan, comps, coefs, huff_dc,
                huff_ac, geom, w, h, ss, se, ah, al, restart_interval)
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _finalize_progressive(comps, coefs, quant, geom, w, h)
    raise ValueError("no SOS marker found")


def _decode_scan(data: bytes, pos: int, comps: list[dict],
                 quant: dict, huff_dc: dict, huff_ac: dict,
                 h: int, w: int, restart_interval: int) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])))
    br = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count            and mcu_count % restart_interval == 0:
                br.sync_restart()
                prev_dc = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    qnat = quant[c["tq"]]
                    dc_dec = huff_dc[c["td"]]
                    ac_dec = huff_ac[c["ta"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            seq = np.zeros(64, dtype=np.int64)
                            t = dc_dec.decode(br)
                            diff = _extend(br.bits(t), t)
                            prev_dc[ci] += diff
                            seq[0] = prev_dc[ci]
                            k = 1
                            while k < 64:
                                rs = ac_dec.decode(br)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16           # ZRL
                                        continue
                                    break                 # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                seq[k] = _extend(br.bits(s), s)
                                k += 1
                            coef = np.zeros(64, dtype=np.float64)
                            coef[ZIGZAG] = seq * qnat[ZIGZAG]
                            px = _idct(coef.reshape(8, 8)) + 128.0
                            px = np.clip(np.round(px), 0, 255)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None
            mcu_count += 1
    # upsample to full resolution (pixel replication) and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return full[0].astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive decoding


def _refine_nonzero(br: "_BitReader", seq: np.ndarray, k: int,
                    p1: int, m1: int) -> None:
    """One AC-refinement correction bit for a nonzero-history
    coefficient (T.81 G.2.2): a 1-bit moves the magnitude up by one
    unit at the current precision, toward the coefficient's sign."""
    if br.bit():
        if (int(seq[k]) & p1) == 0:
            seq[k] += p1 if seq[k] > 0 else m1


def _decode_progressive_scan(data: bytes, pos: int, scan: list[dict],
                             comps: list[dict], coefs: list[np.ndarray],
                             huff_dc: dict, huff_ac: dict, geom: dict,
                             w: int, h: int, ss: int, se: int,
                             ah: int, al: int,
                             restart_interval: int) -> int:
    """Decode ONE progressive scan into the per-component coefficient
    store (seq = zigzag order). Returns the stream position after the
    scan's entropy data (pointing at the next marker). Implements the
    four scan kinds of T.81 F.2.2 / G.2: DC first, DC refinement,
    AC first (spectral band, EOB runs), AC refinement (correction
    bits)."""
    br = _BitReader(data, pos)
    state = {"eobrun": 0}
    prev_dc = {c["id"]: 0 for c in scan}

    def dc_block(c: dict, seq: np.ndarray) -> None:
        if ah == 0:
            t = huff_dc[c["td"]].decode(br)
            diff = _extend(br.bits(t), t)
            prev_dc[c["id"]] += diff
            seq[0] = prev_dc[c["id"]] << al
        else:
            if br.bit():
                seq[0] = int(seq[0]) | (1 << al)

    def ac_first(c: dict, seq: np.ndarray) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac = huff_ac[c["ta"]]
        k = ss
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.bits(r)
                    return
                k += 16                                    # ZRL
            else:
                k += r
                if k > se:
                    raise ValueError("AC band overflow")
                seq[k] = _extend(br.bits(s), s) << al
                k += 1

    def ac_refine(c: dict, seq: np.ndarray) -> None:
        ac = huff_ac[c["ta"]]
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = ac.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.bits(r)
                        break
                    val = 0                                # ZRL: 16 zeros
                elif s == 1:
                    val = p1 if br.bit() else m1
                else:
                    raise ValueError("bad refinement magnitude")
                # advance over r zero-history slots, correcting the
                # nonzero-history coefficients passed along the way
                while k <= se:
                    if seq[k] != 0:
                        _refine_nonzero(br, seq, k, p1, m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    seq[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if seq[k] != 0:
                    _refine_nonzero(br, seq, k, p1, m1)
                k += 1
            state["eobrun"] -= 1

    def do_block(c: dict, seq: np.ndarray) -> None:
        if ss == 0:
            dc_block(c, seq)
        elif ah == 0:
            ac_first(c, seq)
        else:
            ac_refine(c, seq)

    def restart() -> None:
        br.sync_restart()
        for cid in prev_dc:
            prev_dc[cid] = 0
        state["eobrun"] = 0

    unit = 0
    if len(scan) > 1:
        if ss != 0:
            raise ValueError("interleaved AC scan is illegal")
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                if restart_interval and unit \
                        and unit % restart_interval == 0:
                    restart()
                for c in scan:
                    ci = comps.index(c)
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(c, coefs[ci][my * c["v"] + by,
                                                  mx * c["h"] + bx])
                unit += 1
    else:
        c = scan[0]
        ci = comps.index(c)
        cw = (w * c["h"] + geom["hmax"] - 1) // geom["hmax"]
        ch_ = (h * c["v"] + geom["vmax"] - 1) // geom["vmax"]
        nbx = (cw + 7) // 8
        nby = (ch_ + 7) // 8
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and unit \
                        and unit % restart_interval == 0:
                    restart()
                do_block(c, coefs[ci][by, bx])
                unit += 1
    # consume any pad bits; the marker walk resumes at br.pos (which
    # sits on or before the next 0xFF marker byte)
    return br.pos


def _finalize_progressive(comps: list[dict], coefs: list[np.ndarray],
                          quant: dict, geom: dict, w: int,
                          h: int) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient store and
    assemble the image exactly like the sequential path (replication
    upsample, crop, JFIF YCbCr -> RGB)."""
    hmax, vmax = geom["hmax"], geom["vmax"]
    full = []
    for c, cc in zip(comps, coefs):
        qnat = quant[c["tq"]]
        nby, nbx, _ = cc.shape
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = cc[by, bx] * qnat[ZIGZAG]
                px = _idct(coef.reshape(8, 8)) + 128.0
                plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                    np.clip(np.round(px), 0, 255)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return full[0].astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive encoding

# Flat canonical Huffman tables for progressive scans. The Annex K
# AC tables lack the EOBn symbols (r<<4 for r=1..14) that EOB-run
# accumulation needs, so progressive encoders always ship custom
# tables (libjpeg computes optimal ones; a flat table is simpler and
# also exercises the decoder's custom-DHT path). All DC symbols at
# length 4 (12 < 2^4 - 1), all AC symbols at length 9 (176 < 2^9 - 1,
# all-ones code left unused as T.81 C.2 requires).
FLAT_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
FLAT_DC_VALS = list(range(12))
FLAT_AC_VALS = ([0x00] + [r << 4 for r in range(1, 15)] + [0xF0]
                + [(r << 4) | s for r in range(16) for s in range(1, 11)])
FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(FLAT_AC_VALS),
                0, 0, 0, 0, 0, 0, 0]


def _default_scan_script(ncomp: int) -> list[dict]:
    """A libjpeg-style progressive scan script: DC with one level of
    successive approximation, luma AC in two spectral bands with two
    levels, chroma AC with one level — every band ends at Al=0, so
    the quantized coefficients reconstruct exactly."""
    if ncomp == 1:
        return [
            {"c": [0], "ss": 0, "se": 0, "ah": 0, "al": 1},
            {"c": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
            {"c": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
            {"c": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
            {"c": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
            {"c": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        ]
    return [
        {"c": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
        {"c": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
        {"c": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"c": [2], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"c": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
        {"c": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
        {"c": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0},
        {"c": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"c": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"c": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
    ]


class _ProgScanWriter:
    """Entropy state for one progressive scan: EOB-run accumulation
    plus the correction bits buffered WITH the run (refinement
    scans). These are the BE bits of T.81 G.1.2.3 — corrections for
    nonzero-history coefficients inside EOB-covered block tails; the
    decoder reads them while draining the run, so they are written
    immediately after the EOBn symbol. Block-local correction bits
    (BR — read by the decoder while advancing within one symbol's
    span) are buffered by the refine block encoder and written after
    each RS symbol instead."""

    def __init__(self, bw: _BitWriter, ac_tab: dict | None) -> None:
        self.bw = bw
        self.ac = ac_tab
        self.eobrun = 0
        self.pending: list[int] = []          # BE correction bits

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            hc, hl = self.ac[r << 4]
            self.bw.write(hc, hl)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending = []


def _ac_point(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): divide by 2^Al truncating
    toward zero."""
    return (abs(int(v)) >> al) * (1 if v >= 0 else -1)


def _encode_prog_dc(bw, st, seq, dc_tab, prev_dc, cid, ah, al):
    if ah == 0:
        v = int(seq[0]) >> al                  # arithmetic shift
        diff = v - prev_dc[cid]
        prev_dc[cid] = v
        t, code = _magnitude(diff)
        hc, hl = dc_tab[t]
        bw.write(hc, hl)
        bw.write(code, t)
    else:
        bw.write((int(seq[0]) >> al) & 1, 1)


def _encode_prog_ac_first(bw, st, seq, ac_tab, ss, se, al):
    vals = [_ac_point(seq[k], al) for k in range(ss, se + 1)]
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()
        return
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run > 15:
            hc, hl = ac_tab[0xF0]
            bw.write(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | s]
        bw.write(hc, hl)
        bw.write(code, s)
        run = 0
    if last < len(vals) - 1:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _encode_prog_ac_refine(bw, st, seq, ac_tab, ss, se, al):
    absv = [abs(int(seq[k])) >> al for k in range(ss, se + 1)]
    eobpos = -1                  # last NEWLY-significant position
    for i, t in enumerate(absv):
        if t == 1:
            eobpos = i
    run = 0
    br_bits: list[int] = []      # block-local correction bits (BR)
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eobpos:
            st.flush_eobrun()
            hc, hl = ac_tab[0xF0]
            bw.write(hc, hl)
            run -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:
            # history coefficient: buffer its correction bit; the run
            # of zero-history slots is NOT consumed by it
            br_bits.append(t & 1)
            continue
        # newly-significant coefficient (magnitude 1 at this level):
        # symbol, then sign, then the corrections the decoder reads
        # while advancing over this symbol's span
        st.flush_eobrun()
        hc, hl = ac_tab[(run << 4) | 1]
        bw.write(hc, hl)
        bw.write(1 if seq[ss + i] > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        run = 0
    if run > 0 or br_bits:
        # the block tail is an EOB: its corrections travel WITH the
        # run and are written right after the EOBn symbol
        st.eobrun += 1
        st.pending.extend(br_bits)
        if st.eobrun == 0x7FFF or len(st.pending) > 900:
            st.flush_eobrun()


def encode_jpeg_progressive(arr: np.ndarray,
                            quant: np.ndarray | None = None,
                            scans: list[dict] | None = None,
                            subsampling: tuple[int, int] = (1, 1),
                            restart_interval: int = 0) -> bytes:
    """Encode uint8 gray/(h,w,3) RGB as a PROGRESSIVE (SOF2) JFIF
    JPEG. The coefficients are exactly the sequential encoder's
    (same FDCT + quantization), split across the scan script —
    spectral selection bands and successive-approximation first/
    refinement passes — so with the default script (every band ends
    at Al=0) the file decodes pixel-identically to the sequential
    encoding of the same image. ``scans`` entries are
    {c: [comp indexes], ss, se, ah, al}; DC scans (ss=0) may be
    interleaved, AC scans are per-component as T.81 requires."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if quant is None:
        quant = np.ones(64, dtype=np.int32)
    quant = np.asarray(quant, dtype=np.int32).reshape(64)
    sh, sv = (1, 1) if gray else subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")

    if gray:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if (sh, sv) != (1, 1):
            cb = _downsample(cb, sh, sv)
            cr = _downsample(cr, sh, sv)
        planes = [y, cb, cr]
        factors = [(sh, sv), (1, 1), (1, 1)]
    ncomp = len(planes)
    if scans is None:
        scans = _default_scan_script(ncomp)

    mcux = (w + 8 * sh - 1) // (8 * sh)
    mcuy = (h + 8 * sv - 1) // (8 * sv)
    # quantized zigzag-order coefficients per component, full
    # interleaved grid (identical math to the sequential encoder)
    coefs = []
    for p, (fh, fv) in zip(planes, factors):
        pp = _pad_edge(p, mcuy * 8 * fv, mcux * 8 * fh)
        nby, nbx = mcuy * fv, mcux * fh
        cc = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = pp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = np.round(_fdct(block - 128.0)
                                / quant.reshape(8, 8)).astype(np.int64)
                cc[by, bx] = coef.reshape(64)[ZIGZAG]
        coefs.append(cc)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    zz = quant[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(q) for q in zz)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        fh, fv = factors[cid - 1]
        sof += bytes([cid, (fh << 4) | fv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * ncomp) + sof

    def _dht(tclass, tid, bits, vals):
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht(0, 0, FLAT_DC_BITS, FLAT_DC_VALS)
    out += _dht(1, 0, FLAT_AC_BITS, FLAT_AC_VALS)
    if ncomp > 1:
        out += _dht(0, 1, FLAT_DC_BITS, FLAT_DC_VALS)
        out += _dht(1, 1, FLAT_AC_BITS, FLAT_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_enc = _build_encode_table(FLAT_DC_BITS, FLAT_DC_VALS)
    ac_enc = _build_encode_table(FLAT_AC_BITS, FLAT_AC_VALS)

    for scan in scans:
        cs = scan["c"]
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        if ss != 0 and len(cs) != 1:
            raise ValueError("AC scans must be single-component")
        sos = bytes([len(cs)])
        for ci in cs:
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        bw = _BitWriter()
        st = _ProgScanWriter(bw, ac_enc)
        prev_dc = {ci: 0 for ci in cs}
        rst_count = 0
        unit = 0

        def emit_restart():
            nonlocal rst_count
            st.flush_eobrun()
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst_count % 8)])
            rst_count += 1
            for ci in prev_dc:
                prev_dc[ci] = 0

        def do_block(ci, seq):
            if ss == 0:
                _encode_prog_dc(bw, st, seq, dc_enc, prev_dc, ci, ah, al)
            elif ah == 0:
                _encode_prog_ac_first(bw, st, seq, ac_enc, ss, se, al)
            else:
                _encode_prog_ac_refine(bw, st, seq, ac_enc, ss, se, al)

        if len(cs) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit \
                            and unit % restart_interval == 0:
                        emit_restart()
                    for ci in cs:
                        fh, fv = factors[ci]
                        for by in range(fv):
                            for bx in range(fh):
                                do_block(ci, coefs[ci][my * fv + by,
                                                       mx * fh + bx])
                    unit += 1
        else:
            ci = cs[0]
            fh, fv = factors[ci]
            cw = (w * fh + sh - 1) // sh
            ch_ = (h * fv + sv - 1) // sv
            nbx = (cw + 7) // 8
            nby = (ch_ + 7) // 8
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and unit \
                            and unit % restart_interval == 0:
                        emit_restart()
                    do_block(ci, coefs[ci][by, bx])
                    unit += 1
        st.flush_eobrun()
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
