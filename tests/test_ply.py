"""PLY importer tests: header validation, activations, SH inference/reorder.

Behavioral parity targets: /root/reference/src/PlyParser.cpp.
"""

import io

import numpy as np
import pytest

from cudagaussianrenderer_tpu.models.scene import SH_C0
from cudagaussianrenderer_tpu.ply import (
    PlyError,
    infer_sh_degree,
    load_gaussian_ply,
    parse_header,
    parse_ply_columns,
    write_gaussian_ply,
)


def _make_scene_bytes(n=16, degree=0, seed=0, extra=None):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    scales_log = rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 2.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.normal(size=n).astype(np.float32)
    f_dc = rng.normal(size=(n, 3)).astype(np.float32)
    f_rest = None
    if degree > 0:
        per_channel = (degree + 1) ** 2 - 1
        f_rest = rng.normal(size=(n, 3, per_channel)).astype(np.float32) * 0.2
    buf = io.BytesIO()
    write_gaussian_ply(
        buf, means, scales_log, quats, opacity, f_dc, f_rest, extra_properties=extra
    )
    buf.seek(0)
    return buf, dict(
        means=means, scales_log=scales_log, quats=quats,
        opacity=opacity, f_dc=f_dc, f_rest=f_rest,
    )


def test_header_rejects_big_endian():
    data = b"ply\nformat binary_big_endian 1.0\nelement vertex 1\nproperty float x\nend_header\n"
    with pytest.raises(PlyError):
        parse_header(io.BytesIO(data))


def test_header_rejects_duplicate_property():
    data = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
        b"property float x\nproperty float x\nend_header\n"
    )
    with pytest.raises(PlyError, match="declared twice"):
        parse_header(io.BytesIO(data))


def test_header_rejects_non_float_property():
    data = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
        b"property uchar red\nend_header\n"
    )
    with pytest.raises(PlyError, match="only float"):
        parse_header(io.BytesIO(data))


def test_header_ignores_comments():
    data = (
        b"ply\ncomment made by nobody\nformat binary_little_endian 1.0\n"
        b"element vertex 0\nproperty float x\nend_header\n"
    )
    props, n = parse_header(io.BytesIO(data))
    assert props == ["x"] and n == 0


def test_header_rejects_missing_end():
    data = b"ply\nformat binary_little_endian 1.0\nelement vertex 1\nproperty float x\n"
    with pytest.raises(PlyError, match="end_header.*not found"):
        parse_header(io.BytesIO(data))


def test_columns_roundtrip():
    buf, raw = _make_scene_bytes(n=8)
    cols, n = parse_ply_columns(buf)
    assert n == 8
    np.testing.assert_array_equal(cols["x"], raw["means"][:, 0])
    np.testing.assert_array_equal(cols["opacity"], raw["opacity"])


def test_sh_degree_inference():
    # Degrees add (2(d+1)+1)*3 extra coefficients: 9, 15, 21, 27.
    assert infer_sh_degree(0) == 0
    assert infer_sh_degree(9) == 1
    assert infer_sh_degree(24) == 2
    assert infer_sh_degree(45) == 3
    assert infer_sh_degree(72) == 4
    with pytest.raises(PlyError, match="does not complete an SH degree"):
        infer_sh_degree(10)


def test_activations_and_quantization():
    buf, raw = _make_scene_bytes(n=32, seed=3)
    scene = load_gaussian_ply(buf)
    assert scene.count == 32
    np.testing.assert_allclose(np.asarray(scene.means).T, raw["means"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scene.scales).T, np.exp(raw["scales_log"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scene.opacities), 1.0 / (1.0 + np.exp(-raw["opacity"])), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scene.colors).T, raw["f_dc"] * SH_C0 + 0.5, rtol=1e-5
    )
    # Quantized rotations decode to within 8-bit error of the normalized quat.
    from cudagaussianrenderer_tpu.utils.quantize import decode_quat_xyzw

    qn = raw["quats"] / np.linalg.norm(raw["quats"], axis=1, keepdims=True)
    dec = decode_quat_xyzw(np.asarray(scene.quats))
    np.testing.assert_allclose(dec, qn[:, [1, 2, 3, 0]], atol=2.0 / 255.0 + 1e-6)
    # Bounds = AABB of the means.
    np.testing.assert_allclose(scene.bounds_min, raw["means"].min(axis=0), rtol=1e-5)
    np.testing.assert_allclose(scene.bounds_max, raw["means"].max(axis=0), rtol=1e-5)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_sh_reorder(degree):
    buf, raw = _make_scene_bytes(n=8, degree=degree, seed=7)
    scene = load_gaussian_ply(buf)
    assert scene.sh_degree == degree
    k = (degree + 1) ** 2
    assert scene.sh.shape == (3, k, 8)
    sh = np.transpose(np.asarray(scene.sh), (2, 1, 0))
    # Band 0 = raw f_dc; band j>=1 channel c = f_rest[c][j-1] (planar source).
    np.testing.assert_allclose(sh[:, 0, :], raw["f_dc"], rtol=1e-6)
    for c in range(3):
        np.testing.assert_allclose(
            sh[:, 1:, c], raw["f_rest"][:, c, :], rtol=1e-6
        )


def test_missing_required_property():
    buf = io.BytesIO(
        b"ply\nformat binary_little_endian 1.0\nelement vertex 0\n"
        b"property float x\nproperty float y\nend_header\n"
    )
    with pytest.raises(PlyError, match="Required property absent"):
        load_gaussian_ply(buf)


def test_bad_sh_count_rejected():
    extra = {f"f_rest_{i}": np.zeros(4, np.float32) for i in range(5)}
    buf, _ = _make_scene_bytes(n=4, degree=0, extra=extra)
    with pytest.raises(PlyError, match="does not complete an SH degree"):
        load_gaussian_ply(buf)


def test_header_rejects_negative_count():
    data = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex -3\n"
        b"property float x\nend_header\n"
    )
    with pytest.raises(PlyError, match="Malformed vertex count"):
        parse_header(io.BytesIO(data))


def test_empty_vertex_element_rejected():
    """An n=0 scene has no bounds; the typed importer rejects it with a
    clear message (matching the native loader) instead of crashing on
    an empty min/max downstream."""
    buf, _ = _make_scene_bytes(n=1)
    data = buf.getvalue().replace(b"element vertex 1", b"element vertex 0")
    with pytest.raises(PlyError, match="declares zero vertices"):
        load_gaussian_ply(io.BytesIO(data[: data.index(b"end_header\n") + 11]))


class _DribbleStream(io.RawIOBase):
    """read() returns at most 7 bytes per call — models raw/pipe streams
    where one read() syscall returns less than requested."""

    def __init__(self, data):
        self._buf = io.BytesIO(data)

    def read(self, n=-1):
        return self._buf.read(min(n, 7) if n is not None and n >= 0 else 7)

    def readline(self, *a):
        return self._buf.readline(*a)


def test_short_read_streams_load_fully():
    """Regression: a single stream.read(4*n*p) was assumed complete; a
    dribbling stream made valid files raise 'truncated' errors"""
    buf, ref = _make_scene_bytes(n=16)
    scene = load_gaussian_ply(_DribbleStream(buf.getvalue()))
    assert scene.count == 16
    np.testing.assert_allclose(
        np.asarray(scene.means).T, ref["means"], rtol=1e-6
    )
