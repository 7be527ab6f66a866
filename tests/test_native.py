"""Native C++ loader vs the pure-Python importer: identical scenes."""

import numpy as np
import pytest

from cudagaussianrenderer_tpu.ply import PlyError, load_gaussian_ply, write_gaussian_ply
from cudagaussianrenderer_tpu.utils.native import native_available


@pytest.fixture(scope="module")
def scene_file(tmp_path_factory):
    rng = np.random.default_rng(5)
    n, degree = 64, 2
    per_channel = (degree + 1) ** 2 - 1
    path = tmp_path_factory.mktemp("scenes") / "scene.ply"
    write_gaussian_ply(
        path,
        rng.normal(size=(n, 3)).astype(np.float32) * 2,
        rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 2,
        rng.normal(size=(n, 4)).astype(np.float32),
        rng.normal(size=n).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 3, per_channel)).astype(np.float32) * 0.2,
    )
    return path


@pytest.mark.skipif(not native_available(), reason="libgsply.so not built")
def test_native_matches_python(scene_file):
    native = load_gaussian_ply(scene_file, use_native=True)
    python = load_gaussian_ply(scene_file, use_native=False)
    assert native.count == python.count
    assert native.sh_degree == python.sh_degree == 2
    np.testing.assert_allclose(
        np.asarray(native.means), np.asarray(python.means), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(native.scales), np.asarray(python.scales), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(native.quats), np.asarray(python.quats))
    np.testing.assert_allclose(
        np.asarray(native.opacities), np.asarray(python.opacities), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(native.colors), np.asarray(python.colors), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(native.sh), np.asarray(python.sh), rtol=1e-6
    )
    np.testing.assert_allclose(native.bounds_min, python.bounds_min, rtol=1e-5)
    np.testing.assert_allclose(native.bounds_max, python.bounds_max, rtol=1e-5)


@pytest.mark.skipif(not native_available(), reason="libgsply.so not built")
def test_native_error_messages(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_bytes(
        b"ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
        b"property float x\nend_header\n" + b"\x00" * 4
    )
    with pytest.raises(PlyError, match="Missing property"):
        load_gaussian_ply(bad, use_native=True)
