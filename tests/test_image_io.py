"""PNG/PPM round trips."""

import numpy as np

from raytrace_tpu.utils import image as im


def test_png_roundtrip_rgb(tmp_path):
    rs = np.random.default_rng(0)
    img = rs.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    im.write_png(p, img)
    back = im.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_rgba(tmp_path):
    rs = np.random.default_rng(1)
    img = rs.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    im.write_png(p, img)
    np.testing.assert_array_equal(im.read_png(p), img)


def test_read_reference_demo_png():
    img = im.read_png(
        "/root/reference/demo-assets/sphere_reflections_light.png")
    assert img.shape == (600, 800, 3)


def test_ppm(tmp_path):
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p = str(tmp_path / "x.ppm")
    im.write_ppm(p, img)
    txt = open(p).read().split()
    assert txt[0] == "P3" and txt[1] == "3" and txt[2] == "2"
    assert [int(x) for x in txt[4:]] == list(range(18))
