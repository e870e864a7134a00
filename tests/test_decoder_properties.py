"""Property-based round-trip tests for the pure-stdlib media decoders:
random images across sizes, depths, row orders, palettes, interlacing,
and chroma subsampling must decode bit-exactly (PNG/BMP/GIF) or within
quantization tolerance (baseline JPEG). Encoders live in
tests/test_components.py and are independent implementations."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_components import (
    _encode_bmp,
    _encode_gif,
    _encode_jpeg,
    _encode_png,
)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    bottom_up=st.booleans(),
)
def test_bmp_roundtrip_property(h, w, seed, bottom_up):
    from solar_data_tools_spark.operators.multimodal import decode_bmp

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    out = decode_bmp(_encode_bmp(img, bottom_up=bottom_up))
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    n_colors=st.integers(1, 32),
    interlaced=st.booleans(),
)
def test_gif_roundtrip_property(h, w, seed, n_colors, interlaced):
    from solar_data_tools_spark.operators.multimodal import decode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    img = palette[idx]
    out = decode_gif(_encode_gif(img, interlaced=interlaced))
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    filt=st.integers(0, 4),
)
def test_png_roundtrip_property(h, w, seed, filt):
    from solar_data_tools_spark.operators.multimodal import decode_png

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    out = decode_png(_encode_png(img, filters=[filt] * h))
    assert np.array_equal(out, img)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property_444(h, w, seed):
    """Smooth gradient + bounded noise at arbitrary (non-multiple-of-8)
    sizes: flat-quant baseline JPEG recovers pixels within DCT-rounding
    tolerance."""
    from solar_data_tools_spark.operators.multimodal import decode_jpeg

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 5 + int(rng.integers(0, 100))) % 256
    img = np.stack([base, (base * 2) % 256, 255 - base], axis=2)
    img = np.clip(
        img + rng.integers(-6, 7, img.shape), 0, 255
    ).astype(np.uint8)
    out = decode_jpeg(_encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


@settings(max_examples=10, deadline=None)
@given(
    h2=st.integers(1, 10),
    w2=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
    restart=st.integers(0, 3),
)
def test_jpeg_roundtrip_property_420(h2, w2, seed, restart):
    """4:2:0 with 2x2-constant chroma (lossless subsample) at random
    even sizes, with and without restart markers."""
    from solar_data_tools_spark.operators.multimodal import decode_jpeg

    rng = np.random.default_rng(seed)
    half = rng.integers(0, 256, size=(h2, w2, 3), dtype=np.uint8)
    img = half.repeat(2, axis=0).repeat(2, axis=1)
    out = decode_jpeg(
        _encode_jpeg(img, subsample=True, restart_interval=restart)
    )
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(4, 28),
    w=st.integers(4, 28),
    seed=st.integers(0, 10_000),
    al=st.integers(1, 2),
    band_split=st.integers(1, 62),
)
def test_jpeg_progressive_matches_baseline_property(h, w, seed, al, band_split):
    """For ANY image and scan script, the progressive stream (same
    quantized coefficients) decodes bit-identically to the baseline
    stream."""
    import numpy as np

    from solar_data_tools_spark.operators.multimodal import decode_jpeg
    from tests.test_components import _encode_jpeg, _encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    # mix of smooth + blocky content exercises EOB runs and ZRL paths
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((yy * 7 + xx * 13) % 256).astype(np.uint8)
    img = np.stack([img, 255 - img, rng.integers(0, 256, (h, w))], axis=2)
    img = img.astype(np.uint8)
    want = decode_jpeg(_encode_jpeg(img))
    got = decode_jpeg(_encode_jpeg_progressive(img, al=al, band_split=band_split))
    assert np.array_equal(got, want)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    oh=st.integers(1, 17),
    ow=st.integers(1, 17),
    seed=st.integers(0, 10_000),
)
def test_resize_bilinear_matches_bruteforce(h, w, oh, ow, seed):
    """The vectorized bilinear resize agrees exactly with a per-pixel
    reference implementation of center-aligned bilinear sampling."""
    import numpy as np

    from solar_data_tools_spark.operators.multimodal import resize_image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    want = np.empty((oh, ow, 3), dtype=np.uint8)
    ry, rx = h / oh, w / ow  # same precomputed ratios as the product
    for i in range(oh):
        for j in range(ow):
            ys = (i + 0.5) * ry - 0.5
            xs = (j + 0.5) * rx - 0.5
            y0 = min(max(int(np.floor(ys)), 0), h - 1)
            x0 = min(max(int(np.floor(xs)), 0), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(ys - y0, 0.0), 1.0)
            wx = min(max(xs - x0, 0.0), 1.0)
            for c in range(3):
                top = img[y0, x0, c] * (1 - wx) + img[y0, x1, c] * wx
                bot = img[y1, x0, c] * (1 - wx) + img[y1, x1, c] * wx
                want[i, j, c] = np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255)
    got = resize_image(img, oh, ow)
    assert np.array_equal(got, want)
