"""GIF codec (87a/89a), stdlib + numpy only.

Decoder: logical screen + global/local color tables, variable-width
LSB-first LZW with CLEAR/EOI handling (including the KwKwK
first-use-of-unassigned-code case and full-table CLEAR resets),
four-pass row interlacing, and the 89a graphic-control transparency
extension (transparent index -> RGBA). Multi-frame files decode to
their FIRST frame composited on the logical screen (animation
playback is out of scope for a feature pipeline). Returns uint8
(h, w, 3) — or (h, w, 4) when a transparent index is declared.

Encoder: single-frame GIF89a with a real dictionary LZW compressor
(not the emit-clear-every-pixel shortcut), so round-trips exercise
the decoder's dictionary growth, width increments, and KwKwK paths.

Everything implements the public GIF89a specification (CompuServe,
1990) and Welch's LZW as profiled there. Ref parity note: the
reference handles imagery through the PIL ecosystem; this is the
container-friendly equivalent for the multimodal pipeline (SURVEY.md
LLM ops), same policy as functions/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


# --------------------------------------------------------------- LZW


class _LsbBitWriter:
    """LSB-first bit packer (GIF convention, opposite of JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, width: int) -> None:
        self.acc |= (value & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def lzw_compress(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-profile LZW: variable code width starting at min_code+1,
    growing when the next code to allocate reaches 2^width (up to
    12 bits), CLEAR emitted when the table fills."""
    clear = 1 << min_code
    end = clear + 1
    bw = _LsbBitWriter()

    def fresh():
        return ({(i,): i for i in range(clear)}, end + 1, min_code + 1)

    table, next_code, width = fresh()
    bw.write(clear, width)
    cur: tuple = ()
    for k in map(int, indices):
        nxt = cur + (k,)
        if nxt in table:
            cur = nxt
            continue
        bw.write(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table, next_code, width = fresh()
        cur = (k,)
    if cur:
        bw.write(table[cur], width)
    bw.write(end, width)
    return bw.done()


def lzw_decompress(data: bytes, min_code: int, n_expected: int
                   ) -> np.ndarray:
    """Inverse of :func:`lzw_compress` — the decoder side also
    accepts streams from other encoders: KwKwK (code == next
    unassigned) resolves to prev + prev[0] per the spec."""
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0

    table: list[bytes] = []
    width = min_code + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    while n_out < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]            # KwKwK
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        if prev is not None and len(table) == (1 << width) - 1 \
                and width < 12:
            width += 1
        take = min(len(entry), n_expected - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take],
                                                dtype=np.uint8)
        n_out += take
        prev = entry
    if n_out < n_expected:
        raise ValueError("LZW stream ended early")
    return out


# --------------------------------------------------------------- decode


def _iter_gif_frames(data: bytes):
    """Walk a GIF stream yielding one dict per image descriptor:
    {idx (fh, fw) uint8, left, top, ct, transparent, disposal,
    screen (w, h, bg, gct)} — shared machinery for the single-frame
    and animation decoders."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    screen = {"w": w, "h": h, "bg": bg, "gct": gct}
    transparent = None
    disposal = 0
    yielded = False
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                      # trailer
            break
        if block == 0x21:                      # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:                  # graphic control
                size = data[pos]
                flags = data[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = data[pos + 4] if flags & 0x01 else None
                pos += 1 + size
            # skip remaining sub-blocks (and all other extensions)
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB",
                                                   data[pos:pos + 9])
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                               offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw += data[pos + 1:pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = lzw_decompress(bytes(lzw), min_code, fw * fh)
        frame = idx.reshape(fh, fw)
        if fpacked & 0x40:                     # interlaced rows
            # the stream carries rows in four-pass order; image row y
            # is stream row seq[y]
            seq = np.empty(fh, dtype=np.int64)
            i = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    seq[y] = i
                    i += 1
            frame = frame[seq]
        yield {"idx": frame, "left": left, "top": top, "ct": ct,
               "transparent": transparent, "disposal": disposal,
               "screen": screen}
        transparent = None
        disposal = 0
        yielded = True
    if not yielded:
        raise ValueError("no image descriptor in GIF stream")


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a stream to uint8
    (h, w, 3), or (h, w, 4) when the frame declares a transparent
    index."""
    fr = next(iter(_iter_gif_frames(data)))
    scr = fr["screen"]
    h, w, bg = scr["h"], scr["w"], scr["bg"]
    ct = fr["ct"]
    canvas = np.full((h, w), bg, dtype=np.uint8)
    fh, fw = fr["idx"].shape
    canvas[fr["top"]:fr["top"] + fh, fr["left"]:fr["left"] + fw] = \
        fr["idx"]
    rgb = ct[np.minimum(canvas, len(ct) - 1)]
    if fr["transparent"] is None:
        return rgb
    alpha = np.where(canvas == fr["transparent"], 0, 255
                     ).astype(np.uint8)
    return np.concatenate([rgb, alpha[:, :, None]], axis=2)


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode EVERY frame of an (animated) GIF to a list of
    composited uint8 (h, w, 3) canvas snapshots, honoring the GIF89a
    animation model: transparent pixels leave the previous canvas
    visible; disposal method 2 restores the frame's rectangle to the
    background color before the next frame, method 3 restores the
    previous canvas, 0/1 leave the frame in place. This is the REAL
    video-frame path of the multimodal pipeline — an animated GIF is
    the one motion format a stdlib-only container can decode."""
    frames: list[np.ndarray] = []
    canvas = None
    for fr in _iter_gif_frames(data):
        scr = fr["screen"]
        if canvas is None:
            canvas = np.full((scr["h"], scr["w"]), scr["bg"],
                             dtype=np.uint8)
        before = canvas.copy()
        fh, fw = fr["idx"].shape
        region = canvas[fr["top"]:fr["top"] + fh,
                        fr["left"]:fr["left"] + fw]
        if fr["transparent"] is None:
            region[:] = fr["idx"]
        else:
            keep = fr["idx"] == fr["transparent"]
            region[:] = np.where(keep, region, fr["idx"])
        ct = fr["ct"]
        frames.append(ct[np.minimum(canvas, len(ct) - 1)])
        if fr["disposal"] == 2:
            canvas[fr["top"]:fr["top"] + fh,
                   fr["left"]:fr["left"] + fw] = scr["bg"]
        elif fr["disposal"] == 3:
            canvas = before
    return frames


# --------------------------------------------------------------- encode


def _frame_block(idx: np.ndarray, bits: int, interlace: bool,
                 left: int = 0, top: int = 0) -> bytes:
    """One image-descriptor + LZW data block."""
    h, w = idx.shape
    out = bytearray()
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h,
                                 0x40 if interlace else 0)
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        stream = idx[order].reshape(-1)
    else:
        stream = idx.reshape(-1)
    min_code = max(2, bits)
    out += bytes([min_code])
    lzw = lzw_compress(stream, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _gif_header(w: int, h: int, palette: np.ndarray) -> tuple[bytes, int]:
    pal = np.asarray(palette, dtype=np.uint8)
    bits = max(1, int(len(pal) - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[:len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += full.tobytes()
    return bytes(out), bits


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               transparent: int | None = None,
               interlace: bool = False) -> bytes:
    """Encode a (h, w) uint8 index array + (n, 3) palette as a
    single-frame GIF89a. ``transparent`` adds a graphic-control
    extension; ``interlace`` writes the four-pass row order."""
    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    out, bits = _gif_header(w, h, palette)
    out = bytearray(out)
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += _frame_block(idx, bits, interlace)
    out += b"\x3b"
    return bytes(out)


def encode_gif_animation(frames: list[np.ndarray], palette: np.ndarray,
                         transparent: int | None = None,
                         disposal: int = 0,
                         delay_cs: int = 10) -> bytes:
    """Encode a list of (h, w) index arrays as an ANIMATED GIF89a:
    one graphic-control extension (disposal method, delay, optional
    transparency) + image descriptor per frame, shared global color
    table. The real video container of the multimodal pipeline."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    out, bits = _gif_header(w, h, palette)
    out = bytearray(out)
    flags = (disposal & 0x07) << 2
    tr = 0
    if transparent is not None:
        flags |= 0x01
        tr = transparent
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        out += bytes([0x21, 0xF9, 4, flags]) \
            + struct.pack("<H", delay_cs) + bytes([tr, 0])
        out += _frame_block(f, bits, False)
    out += b"\x3b"
    return bytes(out)
