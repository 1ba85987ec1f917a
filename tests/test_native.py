"""Native C++ runtime library: BVH builder + PNG scanline codec."""

import numpy as np
import pytest

from raytrace_tpu import bvh as bvh_mod
from raytrace_tpu import native
from raytrace_tpu.utils import image as image_util

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="g++ unavailable")


@needs_native
def test_native_bvh_matches_python_exactly():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 1.0, 300).astype(np.float32)
    lo, hi = centers - radii[:, None], centers + radii[:, None]

    tree_native = bvh_mod.build_bvh(lo, hi)
    orig = native.build_bvh_native
    native.build_bvh_native = lambda *a, **k: None
    try:
        tree_python = bvh_mod.build_bvh(lo, hi)
    finally:
        native.build_bvh_native = orig

    for f in ("node_min", "node_max", "node_skip", "node_first",
              "node_count", "prim_index"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tree_native, f)),
            np.asarray(getattr(tree_python, f)), err_msg=f)


@needs_native
def test_native_png_roundtrip_all_filters():
    rng = np.random.default_rng(2)
    # smooth gradient (exercises Paeth prediction) + noise + flat area
    img = np.zeros((48, 64, 3), np.uint8)
    img[:16] = (np.linspace(0, 255, 64)[None, :, None]
                .astype(np.uint8))
    img[16:32] = rng.integers(0, 256, (16, 64, 3), dtype=np.uint8)
    img[32:] = 128
    image_util.write_png("/tmp/rt_native_test.png", img)
    back = image_util.read_png("/tmp/rt_native_test.png")
    np.testing.assert_array_equal(back, img)


@needs_native
def test_native_unfilter_matches_python():
    """Decode a python-written (filter-0) PNG through the native path."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    orig = native.png_filter_paeth_native
    native.png_filter_paeth_native = lambda *a, **k: None  # force filter 0
    try:
        image_util.write_png("/tmp/rt_f0.png", img)
    finally:
        native.png_filter_paeth_native = orig
    back = image_util.read_png("/tmp/rt_f0.png")  # native unfilter path
    np.testing.assert_array_equal(back, img)


def test_python_fallback_roundtrip():
    """The pure-Python path must still work when native is absent."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    o1, o2 = native.png_filter_paeth_native, native.png_unfilter_native
    native.png_filter_paeth_native = lambda *a, **k: None
    native.png_unfilter_native = lambda *a, **k: None
    try:
        image_util.write_png("/tmp/rt_py.png", img)
        back = image_util.read_png("/tmp/rt_py.png")
    finally:
        native.png_filter_paeth_native = o1
        native.png_unfilter_native = o2
    np.testing.assert_array_equal(back, img)
