""".splat format io (splatfile.py): roundtrip, validation, render parity.

The format is the antimatter15 32-byte record stream — a degree-0 scene
with the .ply importer's activations pre-baked, so a roundtrip must
preserve every field up to the format's own 8-bit quantization.
"""

import io

import numpy as np
import pytest

from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.splatfile import (
    RECORD_BYTES,
    SplatError,
    load_scene,
    load_splat,
    write_splat,
)
from cudagaussianrenderer_tpu.utils.quantize import decode_quat_xyzw


def _roundtrip(scene):
    buf = io.BytesIO()
    write_splat(buf, scene)
    assert buf.tell() == scene.count * RECORD_BYTES
    buf.seek(0)
    return load_splat(buf)


def test_roundtrip_preserves_fields():
    scene = random_scene(64, seed=7)
    back = _roundtrip(scene)
    assert back.count == scene.count
    assert back.sh_degree == 0 and back.sh is None
    # float fields are stored as raw f32 — exact.
    np.testing.assert_array_equal(np.asarray(back.means), np.asarray(scene.means))
    np.testing.assert_array_equal(np.asarray(back.scales), np.asarray(scene.scales))
    # Bounds are recomputed from the means' AABB on load (the headerless
    # format stores none; random_scene's original bounds are its extent
    # box, which is legitimately larger).
    m = np.asarray(back.means)
    np.testing.assert_allclose(back.bounds_min, m.min(axis=1), rtol=1e-6)
    np.testing.assert_allclose(back.bounds_max, m.max(axis=1), rtol=1e-6)
    # color/opacity quantize to 8 bits (round-to-nearest on write).
    np.testing.assert_allclose(
        np.asarray(back.colors),
        np.clip(np.asarray(scene.colors), 0, 1),
        atol=0.5 / 255.0 + 1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(back.opacities), np.asarray(scene.opacities),
        atol=0.5 / 255.0 + 1e-7,
    )
    # rotation: both grids are 8-bit; the double quantization error is
    # bounded by one step of each grid (before re-normalization).
    q0 = decode_quat_xyzw(np.asarray(scene.quats))
    q0 /= np.maximum(np.linalg.norm(q0, axis=1, keepdims=True), 1e-30)
    q1 = decode_quat_xyzw(np.asarray(back.quats))
    q1 /= np.maximum(np.linalg.norm(q1, axis=1, keepdims=True), 1e-30)
    # quaternion sign is not observable; compare up to sign.
    dot = np.abs(np.sum(q0 * q1, axis=1))
    assert dot.min() > 1.0 - 4.0 / 128.0


def test_second_roundtrip_is_stable():
    # Once on the .splat 8-bit grids, a second write/load changes no
    # float field; the rotation hops between two different 8-bit grids
    # (the format's q*128+128 and the scene's reference (q+1)*127.5
    # pack) so it may dither by a grid step, but no further.
    scene = random_scene(32, seed=3)
    once = _roundtrip(scene)
    twice = _roundtrip(once)
    for f in ("means", "scales", "opacities", "colors"):
        np.testing.assert_array_equal(
            np.asarray(getattr(once, f)), np.asarray(getattr(twice, f))
        )
    q1 = decode_quat_xyzw(np.asarray(once.quats))
    q2 = decode_quat_xyzw(np.asarray(twice.quats))
    q1 /= np.maximum(np.linalg.norm(q1, axis=1, keepdims=True), 1e-30)
    q2 /= np.maximum(np.linalg.norm(q2, axis=1, keepdims=True), 1e-30)
    assert np.abs(np.sum(q1 * q2, axis=1)).min() > 1.0 - 2.0 / 128.0


def test_rejects_malformed_input():
    with pytest.raises(SplatError, match="Empty"):
        load_splat(io.BytesIO(b""))
    with pytest.raises(SplatError, match="multiple"):
        load_splat(io.BytesIO(b"\x00" * 33))
    # NaN position / negative scale records fail the structural checks.
    bad = np.zeros(32, np.uint8)
    bad[:4] = np.frombuffer(np.float32(np.nan).tobytes(), np.uint8)
    with pytest.raises(SplatError, match="finite"):
        load_splat(io.BytesIO(bad.tobytes()))
    bad = np.zeros(32, np.uint8)
    bad[12:16] = np.frombuffer(np.float32(-1.0).tobytes(), np.uint8)
    with pytest.raises(SplatError, match="scale"):
        load_splat(io.BytesIO(bad.tobytes()))


@pytest.mark.slow
def test_render_parity_with_direct_scene(tmp_path):
    """A scene written to .splat and reloaded renders ~identically:
    only the 8-bit color/opacity/rotation re-quantization may move
    pixels, and only by a few LSB."""
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import Camera
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(300, seed=11)
    path = tmp_path / "scene.splat"
    write_splat(path, scene)
    back = load_scene(path)

    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img_a = np.asarray(Renderer(scene, config).render(cam)).astype(np.int32)
    img_b = np.asarray(Renderer(back, config).render(cam)).astype(np.int32)
    assert (img_b[..., :3] > 0).any()
    delta = np.abs(img_a - img_b)
    assert delta.max() <= 16, delta.max()
    # the rotation re-quantization (two different 8-bit grids) dithers
    # every covariance slightly; ~0.5 LSB mean drift is the format cost.
    assert float(delta.mean()) < 1.0


def test_cli_convert_roundtrip(tmp_path):
    """ply -> splat -> ply via the CLI; the reloaded scene matches the
    .splat quantization of the original."""
    from cudagaussianrenderer_tpu.cli import main
    from cudagaussianrenderer_tpu.ply import load_gaussian_ply, write_gaussian_ply

    rng = np.random.default_rng(5)
    n = 24
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales_log = rng.uniform(-4, -1, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity_logit = rng.uniform(-2, 2, size=n).astype(np.float32)
    f_dc = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    ply_in = tmp_path / "in.ply"
    write_gaussian_ply(ply_in, means, scales_log, quats, opacity_logit, f_dc)

    splat_mid = tmp_path / "mid.splat"
    ply_out = tmp_path / "out.ply"
    main(["convert", str(ply_in), str(splat_mid)])
    main(["convert", str(splat_mid), str(ply_out)])

    a = load_splat(splat_mid)
    b = load_gaussian_ply(ply_out)
    np.testing.assert_array_equal(np.asarray(a.means), np.asarray(b.means))
    np.testing.assert_allclose(
        np.asarray(a.scales), np.asarray(b.scales), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.opacities), np.asarray(b.opacities), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.colors), np.asarray(b.colors), atol=1e-5
    )
