"""Baseline JPEG codec: exactness on constant blocks (the oracle
property), round-trip tolerance on arbitrary content, non-baseline
gating, restart intervals, subsampled decode, and an entropy-coding
cross-check against an independently-built IDCT."""

from __future__ import annotations

import numpy as np
import pytest

from pudl_spark.functions.jpeg import (
    STD_QUANT_LUMA, ZIGZAG, decode_jpeg, encode_jpeg)


def _block_image(rng, h, w):
    bh, bw = (h + 7) // 8, (w + 7) // 8
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]


def test_constant_blocks_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(16, 16), (8, 8), (24, 16), (13, 11), (8, 32)]:
        img = _block_image(rng, h, w)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (h, w)
        assert np.array_equal(out, img), (h, w)


def test_arbitrary_gray_q1_within_one():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_rgb_roundtrip_tolerance():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    # double rounding through integer YCbCr bounds the q=1 error
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 5


def test_std_quant_lossy_but_sane():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = ((xx * 2 + yy * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, quant=STD_QUANT_LUMA))
    assert float(np.abs(out.astype(int) - smooth.astype(int)).mean()) < 16


def test_rejects_lossless_and_non_jpeg():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC3                       # masquerade as SOF3 lossless
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC9                       # arithmetic coding
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_entropy_decode_against_independent_idct():
    """Decode a handcrafted single-block stream and compare with an
    IDCT built from the raw cosine formula (not the codec's matrix),
    so a Huffman/zigzag/dequant slip cannot self-cancel."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))

    # independent reference: recompute what the encoder's quantized
    # coefficients SHOULD decode to, from first principles
    def c(u):
        return 1.0 / np.sqrt(2.0) if u == 0 else 1.0

    shifted = img.astype(np.float64) - 128.0
    coef = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (shifted[x, y]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            coef[u, v] = 0.25 * c(u) * c(v) * s
    q = np.round(coef)                        # quant table is all ones
    rec = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (c(u) * c(v) * q[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            rec[x, y] = 0.25 * s + 128.0
    expect = np.clip(np.round(rec), 0, 255).astype(np.uint8)
    assert np.array_equal(out, expect)


def test_restart_interval_decode():
    """Real RSTn resync (VERDICT r4 next-round #4 / ADVICE r4): the
    encoder now emits DRI + byte-aligned restart markers with DC
    predictor resets; a multi-MCU stream with several restarts must
    decode identically to the restart-free stream — any slip in
    sync_restart or the prev_dc reset shifts every later DC level."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)  # 20 MCUs
    base = decode_jpeg(encode_jpeg(img))
    for interval in (1, 3, 7):
        data = encode_jpeg(img, restart_interval=interval)
        # the stream really contains restart markers
        tail = data[data.find(b"\xff\xda"):]
        n_rst = sum(tail.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n_rst >= (20 - 1) // interval
        assert np.array_equal(decode_jpeg(data), base), interval
    # constant blocks stay pixel-exact through the restart path
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    g = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(g, restart_interval=2)), g)


def test_dri_zero_stream_still_decodes():
    """A DRI segment declaring interval 0 (legal no-op) parses."""
    img = np.full((8, 8), 77, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = bytes(data).find(b"\xff\xda")
    dri = b"\xff\xdd" + (4).to_bytes(2, "big") + (0).to_bytes(2, "big")
    data[i:i] = dri
    out = decode_jpeg(bytes(data))
    assert np.array_equal(out, img)


def test_subsampled_encode_decode_422_and_420():
    """Chroma-subsampled decode (VERDICT r4 next-round #4): for images
    whose chroma is constant per 16x16 macroblock, box-average
    downsampling and replication upsampling are both exact, so the
    4:2:2 / 4:2:0 decodes must equal the already-trusted 4:4:4 decode
    bit-for-bit — exercising the interleaved-MCU block order and the
    per-component sampling factors end-to-end."""
    rng = np.random.default_rng(29)
    tiles = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)
    d444 = decode_jpeg(encode_jpeg(img))
    for sub in [(2, 1), (2, 2)]:
        data = encode_jpeg(img, subsampling=sub)
        # SOF1 luma sampling byte really carries the factors
        i = data.find(b"\xff\xc0")
        assert data[i + 11] == (sub[0] << 4) | sub[1]
        assert np.array_equal(decode_jpeg(data), d444), sub
    # subsampled files are smaller (fewer chroma blocks coded)
    assert len(encode_jpeg(img, subsampling=(2, 2))) < len(encode_jpeg(img))
    # non-macroblock-aligned dims go through the padded-plane path
    odd = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)[:29, :41]
    out = decode_jpeg(encode_jpeg(odd, subsampling=(2, 2)))
    assert out.shape == odd.shape
    assert np.array_equal(out, decode_jpeg(encode_jpeg(odd)))


def test_restart_with_subsampling_combined():
    rng = np.random.default_rng(31)
    tiles = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)
    base = decode_jpeg(encode_jpeg(img, subsampling=(2, 2)))
    got = decode_jpeg(encode_jpeg(img, subsampling=(2, 2),
                                  restart_interval=2))
    assert np.array_equal(base, got)


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes
    (ADVICE r4) — the segment walk must skip them, not misread the
    marker id as 0xFF and unpack a bogus length."""
    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    raw = encode_jpeg(img)
    base = decode_jpeg(raw)
    i = raw.index(b"\xff\xdb")
    padded = raw[:i] + b"\xff\xff\xff" + raw[i:]
    assert np.array_equal(decode_jpeg(padded), base)


def test_zigzag_is_an_involution_layout():
    nat = np.arange(64)
    zz = nat[ZIGZAG]
    back = np.empty(64, dtype=int)
    back[ZIGZAG] = zz
    assert np.array_equal(back, nat)


# ---------------------------------------------------------------- property

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    bh=st.integers(min_value=1, max_value=4),
    bw=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    interval=st.sampled_from([0, 1, 2, 5]),
)
@settings(max_examples=40, deadline=None)
def test_property_constant_blocks_exact_any_shape(bh, bw, seed, interval):
    """Randomized form of the oracle property: block-constant gray
    images round-trip pixel-exactly at q=1 for any block grid, with
    or without restart intervals."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    data = encode_jpeg(img, restart_interval=interval)
    assert np.array_equal(decode_jpeg(data), img)


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_property_arbitrary_gray_q1_within_one(seed):
    """q=1 quantization loses at most the FDCT rounding: any gray
    image decodes within +/-1 of the original everywhere."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 25))
    w = int(rng.integers(1, 25))
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (h, w)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


# ------------------------------------------------------------ progressive

from pudl_spark.functions.jpeg import (  # noqa: E402
    FLAT_AC_VALS, encode_jpeg_progressive)


def test_progressive_default_script_matches_sequential_gray():
    """The default scan script (spectral bands + successive
    approximation, every band ending at Al=0) carries exactly the
    sequential coefficients, so the decode must be pixel-identical to
    the sequential pipeline — any slip in DC/AC first/refine decode
    or EOB-run bookkeeping diverges."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(img)),
                          decode_jpeg(encode_jpeg(img)))


def test_progressive_matches_sequential_color_and_420():
    rng = np.random.default_rng(43)
    cimg = rng.integers(0, 256, size=(19, 27, 3), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(cimg)),
                          decode_jpeg(encode_jpeg(cimg)))
    tiles = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    mimg = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(mimg, subsampling=(2, 2))),
        decode_jpeg(encode_jpeg(mimg, subsampling=(2, 2))))


def test_progressive_no_sa_script_and_restarts():
    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    seq = decode_jpeg(encode_jpeg(img))
    scans = [{"c": [0], "ss": 0, "se": 0, "ah": 0, "al": 0},
             {"c": [0], "ss": 1, "se": 63, "ah": 0, "al": 0}]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, scans=scans)), seq)
    for interval in (1, 4):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(
                img, restart_interval=interval)), seq), interval


def test_progressive_quantized_eob_runs():
    """Std quant table on smooth/sparse content produces long EOB
    runs and refinement correction bits across blocks — the
    bookkeeping-heavy paths."""
    smooth = ((np.arange(48)[:, None] * 3
               + np.arange(56)[None, :] * 5) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(smooth, quant=STD_QUANT_LUMA)),
        decode_jpeg(encode_jpeg(smooth, quant=STD_QUANT_LUMA)))
    sparse = np.full((40, 40), 128, dtype=np.uint8)
    sparse[5, 7] = 200
    sparse[30, 22] = 10
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(sparse, quant=STD_QUANT_LUMA)),
        decode_jpeg(encode_jpeg(sparse, quant=STD_QUANT_LUMA)))


def test_progressive_handbuilt_stream_decodes_exact_coefficients():
    """Decoder-only anchor (independent of encode_jpeg_progressive):
    a minimal SOF2 stream built BY HAND with the flat tables — whose
    canonical codes are predictable (DC symbol t -> code t in 4 bits;
    AC symbol at index j of FLAT_AC_VALS -> code j in 9 bits) — must
    reconstruct hand-chosen coefficients exactly. Breaks any
    encoder/decoder co-bug symmetry in the progressive paths."""
    import struct as _s

    from pudl_spark.functions.jpeg import (
        FLAT_AC_BITS, FLAT_DC_BITS, FLAT_DC_VALS, ZIGZAG, _idct)

    class BW:
        def __init__(self):
            self.out, self.acc, self.n = bytearray(), 0, 0

        def put(self, v, ln):
            self.acc = (self.acc << ln) | (v & ((1 << ln) - 1))
            self.n += ln
            while self.n >= 8:
                b = (self.acc >> (self.n - 8)) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0)
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def done(self):
            if self.n:
                self.put((1 << (8 - self.n)) - 1, 8 - self.n)
            return bytes(self.out)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _s.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    out += b"\xff\xc2" + _s.pack(">H", 11) \
        + _s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])

    def dht(tclass, tid, bits, vals):
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + _s.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, FLAT_DC_BITS, FLAT_DC_VALS)
    out += dht(1, 0, FLAT_AC_BITS, FLAT_AC_VALS)

    # scan 1: DC, Al=0 -> dc=10: category 4 (code '0100'), bits 1010
    # SOS body: ns=1, (cid=1, td<<4|ta=0), Ss=0, Se=0, Ah<<4|Al=0
    out += b"\xff\xda" + _s.pack(">H", 8) + bytes([1, 1, 0, 0, 0, 0])
    bw = BW()
    bw.put(4, 4)
    bw.put(10, 4)
    out += bw.done()

    # scan 2: AC band 1..63, Al=0 -> seq[1]=5, seq[4]=-3, rest 0
    out += b"\xff\xda" + _s.pack(">H", 8) + bytes([1, 1, 0, 1, 63, 0])
    bw = BW()
    bw.put(FLAT_AC_VALS.index(0x03), 9)      # run 0, size 3
    bw.put(5, 3)                             # value 5
    bw.put(FLAT_AC_VALS.index(0x22), 9)      # run 2, size 2
    bw.put(0, 2)                             # value -3 (code 00)
    bw.put(FLAT_AC_VALS.index(0x00), 9)      # EOB
    out += bw.done()
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    seq = np.zeros(64)
    seq[0], seq[1], seq[4] = 10, 5, -3
    coef = np.zeros(64)
    coef[ZIGZAG] = seq                       # q=1 dequant
    expect = np.clip(np.round(_idct(coef.reshape(8, 8)) + 128.0),
                     0, 255).astype(np.uint8)
    assert np.array_equal(got, expect)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    use_quant=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_property_progressive_equals_sequential(seed, use_quant):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 30))
    w = int(rng.integers(1, 30))
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    q = STD_QUANT_LUMA if use_quant else None
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, quant=q)),
        decode_jpeg(encode_jpeg(img, quant=q)))


def test_16bit_quant_table_segment():
    """DQT with Pq=1 (16-bit entries): rewrite the encoder's 8-bit
    table segment into the 16-bit form — same values — and assert an
    identical decode."""
    import struct as _s

    rng = np.random.default_rng(53)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    raw = encode_jpeg(img)
    base = decode_jpeg(raw)
    i = raw.index(b"\xff\xdb")
    (seglen,) = _s.unpack(">H", raw[i + 2:i + 4])
    vals = raw[i + 5:i + 5 + 64]
    wide = b"\xff\xdb" + _s.pack(">H", 3 + 128) + bytes([0x10]) \
        + b"".join(_s.pack(">H", v) for v in vals)
    patched = raw[:i] + wide + raw[i + 2 + seglen:]
    assert np.array_equal(decode_jpeg(patched), base)
