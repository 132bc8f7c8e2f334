"""GIF codec: LZW round-trips (table growth, CLEAR resets, KwKwK),
interlacing, transparency, and gating."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pudl_spark.functions.gif import (
    decode_gif, encode_gif, lzw_compress, lzw_decompress)


def test_lzw_roundtrip_shapes():
    rng = np.random.default_rng(15)
    for n, alpha in [(50, 4), (5000, 4), (20000, 16), (300, 2), (1, 2)]:
        s = rng.integers(0, alpha, size=n).astype(np.uint8)
        mc = max(2, int(alpha - 1).bit_length())
        assert np.array_equal(
            lzw_decompress(lzw_compress(s, mc), mc, n), s), (n, alpha)


def test_lzw_kwkwk_and_runs():
    s = np.array(([0, 1] * 3 + [0] * 4 + [1] * 4) * 50, dtype=np.uint8)
    assert np.array_equal(
        lzw_decompress(lzw_compress(s, 2), 2, len(s)), s)


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(16)
    pal = rng.integers(0, 256, size=(7, 3)).astype(np.uint8)
    for shape in [(8, 8), (13, 5), (1, 1), (20, 33), (64, 64)]:
        idx = rng.integers(0, 7, size=shape).astype(np.uint8)
        for il in (False, True):
            data = encode_gif(idx, pal, interlace=il)
            assert data[:6] == b"GIF89a"
            assert np.array_equal(decode_gif(data), pal[idx]), (shape, il)


def test_gif_transparency_rgba():
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, size=(7, 3)).astype(np.uint8)
    idx = rng.integers(0, 7, size=(6, 9)).astype(np.uint8)
    out = decode_gif(encode_gif(idx, pal, transparent=3))
    assert out.shape == (6, 9, 4)
    assert np.array_equal(out[..., :3], pal[idx])
    assert np.array_equal(out[..., 3], np.where(idx == 3, 0, 255))


def test_gif_low_entropy_forces_wide_codes():
    """200x300 smooth gradient: dictionary reaches the 12-bit cap and
    CLEAR-resets mid-stream."""
    pal = np.arange(21, dtype=np.uint8).reshape(7, 3)
    big = (np.arange(200 * 300) % 250 // 50).astype(np.uint8) \
        .reshape(200, 300) % 7
    assert np.array_equal(decode_gif(encode_gif(big, pal)), pal[big])


def test_gif_dispatch_and_gating():
    from pudl_spark.functions.multimodal import decode_image

    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    assert np.array_equal(decode_image(encode_gif(idx, pal)), pal[idx])
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF....")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBP")  # WebP stays gated


@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       il=st.booleans())
@settings(max_examples=30, deadline=None)
def test_property_gif_roundtrip(seed, il):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 24))
    w = int(rng.integers(1, 24))
    nc = int(rng.integers(2, 9))
    pal = rng.integers(0, 256, size=(nc, 3)).astype(np.uint8)
    idx = rng.integers(0, nc, size=(h, w)).astype(np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(idx, pal, interlace=il)), pal[idx])


def test_animated_gif_frames_and_compositing():
    from pudl_spark.functions.gif import (
        decode_gif_frames, encode_gif_animation)

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    frames = [rng.integers(0, 8, size=(10, 12)).astype(np.uint8)
              for _ in range(4)]
    got = decode_gif_frames(encode_gif_animation(frames, pal))
    assert len(got) == 4
    assert all(np.array_equal(g, pal[f]) for g, f in zip(got, frames))
    # transparency: transparent pixels show the PREVIOUS frame
    f0 = np.zeros((6, 6), dtype=np.uint8)
    f1 = np.full((6, 6), 7, dtype=np.uint8)
    f1[2:4, 2:4] = 3
    g = decode_gif_frames(encode_gif_animation([f0, f1], pal,
                                               transparent=3))
    assert np.array_equal(g[1], pal[np.where(f1 == 3, f0, f1)])
    # disposal 2: canvas restored to background between frames
    f2 = np.full((6, 6), 5, dtype=np.uint8)
    g = decode_gif_frames(encode_gif_animation([f1, f2], pal,
                                               transparent=3,
                                               disposal=2))
    assert np.array_equal(
        g[0], pal[np.where(f1 == 3, np.zeros_like(f1), f1)])
    assert np.array_equal(g[1], pal[f2])
    # single-frame decode = first animation frame
    assert np.array_equal(
        decode_gif_frames(encode_gif(frames[0], pal))[0],
        pal[frames[0]])


def test_extract_video_frames_kernel(spark):
    import numpy as np

    from pudl_spark.functions.gif import encode_gif_animation
    from pudl_spark.functions.multimodal import extract_video_frames

    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30]], dtype=np.uint8)
    frames = [np.full((4, 4), k % 3, dtype=np.uint8) for k in range(5)]
    df = spark.createDataFrame(
        [(9, bytearray(encode_gif_animation(frames, pal)))],
        "media_id long, content binary")
    rows = sorted(extract_video_frames(df, every_n=2).collect(),
                  key=lambda r: r.frame_no)
    assert [r.frame_no for r in rows] == [0, 2, 4]
    for r in rows:
        v = pal[r.frame_no % 3]                # constant frame color
        assert r.px_sum == int(v.astype(int).sum()) * 16
        assert (r.width, r.height) == (4, 4)
