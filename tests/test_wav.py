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
