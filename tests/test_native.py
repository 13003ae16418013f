"""Native C++ loader: builds, decodes, and matches the PIL path bit-for-bit
within quantization tolerance."""

import numpy as np
import pytest

from tinynerf_tpu import native
from tinynerf_tpu.data.parsers import _load_image_rgb


@pytest.fixture(scope="module")
def png_paths(synthetic_scene):
    return sorted((synthetic_scene / "train").glob("*.png"))


def test_native_builds_and_loads(png_paths):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    out = native.load_images(png_paths, (1.0, 1.0, 1.0))
    assert out is not None
    assert out.shape == (len(png_paths), 64, 64, 3)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_native_matches_pil(png_paths):
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    out = native.load_images(png_paths, (1.0, 1.0, 1.0))
    for i, p in enumerate(png_paths):
        pil = _load_image_rgb(p, (255, 255, 255))
        # the native loader ports Pillow's integer compositing exactly, so
        # results are bit-identical to the PIL fallback
        np.testing.assert_array_equal(out[i], pil)


def test_native_nonexistent_file():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    from pathlib import Path

    assert native.load_images([Path("/nonexistent/x.png")], (1, 1, 1)) is None


def test_parser_uses_native_or_falls_back(synthetic_scene):
    """parse_nerf_synthetic must give identical results either way."""
    from tinynerf_tpu.data import parse_nerf_synthetic

    data = parse_nerf_synthetic(synthetic_scene, "train")
    assert len(data.imgs) == 2
    assert data.imgs[0].shape == (64, 64, 3)
