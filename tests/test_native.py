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
    with pytest.raises(PlyError, match="Required property absent"):
        load_gaussian_ply(bad, use_native=True)


@pytest.mark.skipif(not native_available(), reason="libgsply.so not built")
def test_native_rejects_hostile_and_malformed_counts(scene_file, tmp_path):
    """Header-count hardening: a claimed count the file cannot hold must
    error cleanly BEFORE sizing any allocation (a LONG_MAX count used to
    overflow sizeof(float)*3*n and write through a wild pointer), and
    non-numeric / zero counts must error like the Python importer
    instead of silently loading an empty scene."""
    good = scene_file.read_bytes()
    for count, match in [
        (b"9223372036854775807", "ends early"),
        (b"99999999999999999999", "Malformed vertex count"),  # > LONG_MAX
        (b"garbage", "Malformed vertex count"),
        (b"-5", "Malformed vertex count"),
        (b"0", "declares zero vertices"),
    ]:
        bad = tmp_path / "bad_count.ply"
        bad.write_bytes(good.replace(b"element vertex 64", b"element vertex " + count))
        with pytest.raises(PlyError, match=match):
            load_gaussian_ply(bad, use_native=True)


@pytest.mark.skipif(not native_available(), reason="libgsply.so not built")
def test_native_truncated_body_keeps_message(scene_file, tmp_path):
    """Regression: the truncated-data error path used to release (memset)
    the scene struct AFTER writing the message, raising an empty-string
    PlyError for the most common malformed-file case."""
    good = scene_file.read_bytes()
    bad = tmp_path / "truncated.ply"
    bad.write_bytes(good[: len(good) - 64])
    with pytest.raises(PlyError, match="ends early"):
        load_gaussian_ply(bad, use_native=True)


@pytest.mark.skipif(not native_available(), reason="libgsply.so not built")
def test_native_long_comment_line(scene_file, tmp_path):
    """A header line longer than the parser's 512-byte buffer (legal for
    comments) must be consumed as ONE line — the tail used to be
    re-parsed as fresh header lines (a tail starting 'element vertex 0'
    silently overrode the real count)."""
    good = scene_file.read_bytes()
    marker = b"format binary_little_endian 1.0\n"
    long_comment = b"comment " + b"y" * 600 + b"element vertex 0\n"
    bad = tmp_path / "long_comment.ply"
    bad.write_bytes(good.replace(marker, marker + long_comment))
    scene = load_gaussian_ply(bad, use_native=True)
    assert scene.count == 64  # the real count, not the comment's tail


@pytest.mark.skipif(not native_available(), reason="libgsply.so not built")
def test_zero_norm_quat_parity(tmp_path):
    """An all-zero rot row has no direction: both loaders must leave it
    raw (quantized zeros) rather than emit 0/0 NaN rotations."""
    n = 4
    rng = np.random.default_rng(3)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats[1] = 0.0
    path = tmp_path / "zero_quat.ply"
    write_gaussian_ply(
        path,
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        quats,
        rng.normal(size=n).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        None,
    )
    native = load_gaussian_ply(path, use_native=True)
    python = load_gaussian_ply(path, use_native=False)
    np.testing.assert_array_equal(np.asarray(native.quats), np.asarray(python.quats))
