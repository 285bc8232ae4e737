"""Round-trip tests for the dependency-free image codecs."""
import numpy as np
import pytest

from hobbyraytracer_tpu.io import hdr, images


@pytest.fixture
def rgb(tmp_path):
    rs = np.random.RandomState(0)
    return rs.randint(0, 256, (13, 17, 3), np.uint8)


def test_png_roundtrip(tmp_path, rgb):
    p = str(tmp_path / "x.png")
    images.write_png(p, rgb)
    np.testing.assert_array_equal(images.read_png(p), rgb)


def test_tga_roundtrip(tmp_path, rgb):
    p = str(tmp_path / "x.tga")
    images.write_tga(p, rgb)
    np.testing.assert_array_equal(images.read_tga(p), rgb)


def test_bmp_roundtrip(tmp_path, rgb):
    p = str(tmp_path / "x.bmp")
    images.write_bmp(p, rgb)
    np.testing.assert_array_equal(images.read_bmp(p), rgb)


def test_reads_reference_golden_png():
    # decode one of the reference's checked-in sample images
    img = images.read_image("/root/reference/sampleImages/Cornell-Box.png")
    assert img.ndim == 3 and img.shape[2] in (3, 4)
    assert img.shape[0] > 100 and img.shape[1] > 100


def test_hdr_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    img = (rs.rand(9, 33, 3) * 10.0).astype(np.float32)
    p = str(tmp_path / "x.hdr")
    hdr.write_hdr(p, img)
    back = hdr.read_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent across RGB: per-pixel precision is bounded by
    # the max channel / 256, not by each component's own magnitude.
    tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
    assert np.all(np.abs(back - img) <= tol)
