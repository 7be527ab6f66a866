"""PNG writer (the headless display path, utils/png.py)."""

import numpy as np
import pytest

from cudagaussianrenderer_tpu.utils.png import write_png

PIL = pytest.importorskip("PIL.Image")


def test_png_roundtrip_rgba(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
    path = tmp_path / "x.png"
    write_png(path, img)
    back = np.asarray(PIL.open(path))
    np.testing.assert_array_equal(back, img)


def test_png_rectangular_and_rgb(tmp_path):
    img = np.zeros((16, 128, 3), np.uint8)
    img[:, ::2, 1] = 255
    path = tmp_path / "y.png"
    write_png(path, img)
    back = np.asarray(PIL.open(path))
    np.testing.assert_array_equal(back, img)
