"""Tests for the native C++ decoder + prefetcher (ctypes bindings)."""

import os

import numpy as np
import pytest

from viso_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _write_png(path, img):
    import cv2

    cv2.imwrite(path, img)


def test_decode_matches_opencv(tmp_path, rng):
    img = rng.integers(0, 255, size=(120, 200)).astype(np.uint8)
    p = os.path.join(tmp_path, "img.png")
    _write_png(p, img)
    out = native.decode_gray(p)
    assert out is not None
    assert out.dtype == np.float32
    assert np.array_equal(out.astype(np.uint8), img)


def test_decode_color_and_16bit(tmp_path, rng):
    imgc = rng.integers(0, 255, size=(40, 50, 3)).astype(np.uint8)
    pc = os.path.join(tmp_path, "c.png")
    _write_png(pc, imgc)
    oc = native.decode_gray(pc)
    assert oc is not None and oc.shape == (40, 50)
    img16 = rng.integers(0, 65535, size=(32, 32)).astype(np.uint16)
    p16 = os.path.join(tmp_path, "d16.png")
    _write_png(p16, img16)
    o16 = native.decode_gray(p16)
    assert o16 is not None
    assert np.allclose(o16, img16 >> 8, atol=1)


def test_decode_pgm(tmp_path, rng):
    img = rng.integers(0, 255, size=(30, 40)).astype(np.uint8)
    p = os.path.join(tmp_path, "img.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n40 30\n255\n" + img.tobytes())
    out = native.decode_gray(p)
    assert out is not None
    assert np.array_equal(out.astype(np.uint8), img)


def test_prefetcher_order_and_completeness(tmp_path, rng):
    paths = []
    truth = []
    for i in range(9):
        img = rng.integers(0, 255, size=(48, 64)).astype(np.uint8)
        p = os.path.join(tmp_path, f"{i}.png")
        _write_png(p, img)
        paths.append(p)
        truth.append(img)
    pf = native.Prefetcher(paths, ring=3, threads=2)
    for i, img in enumerate(pf):
        assert np.array_equal(img.astype(np.uint8), truth[i]), i
    assert i == 8
    pf.close()


def test_decode_missing_file():
    assert native.decode_gray("/nonexistent/nope.png") is None
