"""Tests for the native (C++) frame feeder: PNG/PGM decode correctness and
ordered prefetch (native/frame_feeder.cpp, native/png_decode.cpp)."""

import os

import numpy as np
import pytest

from android_svo_tpu.data import native_feeder


@pytest.fixture(scope="module")
def lib_ok():
    if not native_feeder.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


def _write_pgm(path, img):
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(img.astype(np.uint8).tobytes())


def _write_png(path, img):
    from PIL import Image
    Image.fromarray(img.astype(np.uint8), mode="L").save(path)


def test_decode_pgm(tmp_path, lib_ok):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), np.uint8)
    p = str(tmp_path / "a.pgm")
    _write_pgm(p, img)
    out = native_feeder.decode_image(p)
    assert out.shape == (48, 64)
    np.testing.assert_allclose(out, img.astype(np.float32),
                               atol=1e-6)


def test_decode_png_matches_pil(tmp_path, lib_ok):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 53), np.uint8)
    p = str(tmp_path / "a.png")
    _write_png(p, img)
    out = native_feeder.decode_image(p)
    np.testing.assert_allclose(out, img.astype(np.float32),
                               atol=1e-6)


def test_feeder_order_and_content(tmp_path, lib_ok):
    rng = np.random.default_rng(2)
    paths, imgs = [], []
    for i in range(12):
        img = rng.integers(0, 256, (32, 40), np.uint8)
        p = str(tmp_path / f"f{i:03d}.pgm")
        _write_pgm(p, img)
        paths.append(p)
        imgs.append(img)
    feeder = native_feeder.NativeFrameFeeder(paths, capacity=4, n_threads=3)
    assert (feeder.height, feeder.width) == (32, 40)
    assert len(feeder) == 12
    seen = []
    for idx, frame in feeder:
        seen.append(idx)
        np.testing.assert_allclose(
            frame, imgs[idx].astype(np.float32), atol=1e-6)
    assert seen == list(range(12))
    feeder.close()


def test_decode_missing_file_raises(lib_ok):
    with pytest.raises(IOError):
        native_feeder.decode_image("/nonexistent/file.png")
