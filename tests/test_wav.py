"""RIFF/WAVE codec: exact roundtrip, chunk-walk robustness, honest
gating of unsupported encodings."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pudl_spark.functions.multimodal import decode_wav, encode_wav


def test_wav_roundtrip_exact():
    s = np.array([0, 1, -1, 32767, -32768, 12345, -12345], dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, rate=44100))
    assert rate == 44100
    assert np.array_equal(out, s)


def test_wav_tolerates_extra_chunks_and_alignment():
    s = np.array([5, -7, 9], dtype=np.int16)
    raw = encode_wav(s, rate=8000)
    # splice a LIST/INFO chunk with an ODD size between fmt and data —
    # the reader must skip it honoring RIFF word alignment
    fmt_end = 12 + 8 + 16
    extra_body = b"INFOx"                       # 5 bytes, odd
    extra = b"LIST" + struct.pack("<I", len(extra_body)) + extra_body + b"\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert rate == 8000
    assert np.array_equal(out, s)


def test_wav_rejects_non_pcm():
    s = np.array([1, 2], dtype=np.int16)
    raw = bytearray(encode_wav(s))
    raw[20:22] = struct.pack("<H", 3)  # IEEE float format code
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))
    with pytest.raises(NotImplementedError):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_wav_sample_stats_spark(spark):
    from pudl_spark.functions.multimodal import wav_sample_stats

    rows = []
    for mid in (0, 1, 2):
        s = np.arange(-mid * 10, 50 + mid, dtype=np.int16)
        rows.append((mid, bytearray(encode_wav(s, rate=16000))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in wav_sample_stats(df).collect()}
    for mid in (0, 1, 2):
        s = np.arange(-mid * 10, 50 + mid, dtype=np.int64)
        assert got[mid]["n_samples"] == len(s)
        assert got[mid]["sum_samples"] == int(s.sum())
        assert got[mid]["sum_abs"] == int(np.abs(s).sum())
        assert got[mid]["peak"] == int(np.abs(s).max())
        assert got[mid]["sample_rate"] == 16000


def test_stereo_and_8bit_roundtrip():
    import numpy as np

    from pudl_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(71)
    # stereo 16-bit: (n, 2) interleaved frames round-trip exactly
    st = rng.integers(-32768, 32768, size=(37, 2)).astype(np.int16)
    got, rate = decode_wav(encode_wav(st, rate=16000))
    assert rate == 16000 and got.shape == (37, 2)
    assert np.array_equal(got, st)
    # 8-bit unsigned mono: widened to int16 by (x-128)<<8
    u8 = rng.integers(0, 256, size=41).astype(np.uint8)
    got8, _ = decode_wav(encode_wav(u8, bits=8))
    assert got8.dtype == np.int16
    assert np.array_equal(got8, (u8.astype(np.int16) - 128) << 8)
    # odd-length 8-bit data chunk gets a RIFF pad byte, still decodes
    assert len(encode_wav(u8, bits=8)) % 2 == 0
    # 8-bit stereo
    u8s = rng.integers(0, 256, size=(23, 2)).astype(np.uint8)
    gots, _ = decode_wav(encode_wav(u8s, bits=8))
    assert gots.shape == (23, 2)
    assert np.array_equal(gots, (u8s.astype(np.int16) - 128) << 8)


def test_float_wav_still_gated():
    import struct as _s

    import numpy as np
    import pytest

    from pudl_spark.functions.multimodal import decode_wav, encode_wav

    raw = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    i = bytes(raw).find(b"fmt ")
    raw[i + 8:i + 10] = _s.pack("<H", 3)       # IEEE float fmt code
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))
