"""End-to-end pipeline vs the golden NumPy oracle, on the procedural scene.

This is the TPU analog of the reference's debug workflow: render the
random-splat fixture and check the pixels (SURVEY.md §4).  Runs the REAL
Pallas kernel in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.golden import golden_render, scene_to_numpy
from cudagaussianrenderer_tpu.models.camera import Camera, orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.render import Renderer, render_frame


def _image_close(got, want, *, pix_tol=8, frac=0.02, msg=""):
    """Images match when almost all pixels are within pix_tol levels.

    A small mismatch budget absorbs f32-vs-f64 tile-boundary flips, which
    shift whole splat/tile contributions."""
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    bad = (diff > pix_tol).any(axis=-1).mean()
    assert bad <= frac, f"{msg}: {bad:.4f} of pixels differ by more than {pix_tol}"


@pytest.mark.parametrize(
    "falloff",
    ["gaussian", pytest.param("epanechnikov", marks=pytest.mark.slow)],
)
def test_render_matches_golden(falloff):
    scene = random_scene(300, seed=2)
    config = RenderConfig(screen_size=128, falloff=falloff)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)

    r = Renderer(scene, config)
    got = r.render(cam)
    want = golden_render(scene_to_numpy(scene), cam.camera_data(), config)
    assert got.shape == want.shape == (128, 128, 4)
    assert got[..., 3].max() == 255  # something rendered
    _image_close(got, want, msg=falloff)


@pytest.mark.slow
def test_rectangular_viewport_matches_golden():
    """192x128 viewport: per-axis tile math, aspect-corrected camera and
    per-axis trace bump must all agree with the float64 oracle."""
    scene = random_scene(250, seed=6)
    config = RenderConfig(screen_size=192, screen_height=128)
    assert config.tiles_x == 12 and config.tiles_y == 8
    cam = Camera(aspect=config.aspect).framed(scene.bounds_min, scene.bounds_max)

    r = Renderer(scene, config)
    got = r.render(cam)
    want = golden_render(scene_to_numpy(scene), cam.camera_data(), config)
    assert got.shape == want.shape == (128, 192, 4)
    assert got[..., 3].max() == 255
    _image_close(got, want, msg="rect")


@pytest.mark.slow
def test_render_sh_scene_matches_golden():
    scene = random_scene(200, seed=8, sh_degree=3)
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    r = Renderer(scene, config)
    got = r.render(cam)
    want = golden_render(scene_to_numpy(scene), cam.camera_data(), config)
    _image_close(got, want, msg="sh")


@pytest.mark.slow
def test_empty_view_renders_black():
    scene = random_scene(50, seed=4)
    config = RenderConfig(screen_size=128)
    cam = Camera(position=np.array([0.0, 0.0, -500.0], np.float32), aspect=1.0)
    r = Renderer(scene, config)
    img = r.render(cam)
    assert img.sum() == 0  # untouched framebuffer stays zeroed (alpha too)


@pytest.mark.slow
def test_saturation_doubles_capacity():
    scene = random_scene(400, seed=9)
    config = RenderConfig(screen_size=128, capacity=512)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    r = Renderer(scene, config)
    r.render(cam)
    assert r.saturated
    cap0 = r.capacity
    r.render(cam)
    assert r.capacity == cap0 * 2  # Demo.cpp:356-366 behavior


@pytest.mark.slow
def test_jit_render_frame_is_traceable():
    scene = random_scene(100, seed=1).pad_to_multiple(256)
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    fn = jax.jit(
        lambda s, c: render_frame(s, c, config, 2048, interpret=True)[0]
    )
    img = np.asarray(fn(scene, cam.camera_data()))
    assert img.shape == (128, 128, 4)
    img2 = np.asarray(fn(scene, cam.camera_data()))
    np.testing.assert_array_equal(img, img2)  # deterministic


@pytest.mark.slow
def test_ply_roundtrip_renders_identically(tmp_path):
    """End-to-end .ply path: export -> import -> render matches rendering
    the original in-memory scene (activation/quantization round-trips)."""
    from cudagaussianrenderer_tpu.ply import load_gaussian_ply, write_gaussian_ply

    from cudagaussianrenderer_tpu.models.scene import SH_C0
    from cudagaussianrenderer_tpu.utils.quantize import decode_quat_xyzw

    scene = random_scene(200, seed=14, sh_degree=2)
    # Reconstruct the raw (pre-activation) .ply fields from the scene.
    opac = np.clip(np.asarray(scene.opacities), 1e-6, 1 - 1e-6)
    xyzw = decode_quat_xyzw(np.asarray(scene.quats))
    sh = np.transpose(np.asarray(scene.sh), (2, 0, 1))  # [N, 3, K]
    path = tmp_path / "scene.ply"
    write_gaussian_ply(
        path,
        np.asarray(scene.means).T,
        np.log(np.asarray(scene.scales).T),
        xyzw[:, [3, 0, 1, 2]],  # wxyz
        np.log(opac / (1.0 - opac)),
        (np.asarray(scene.colors).T - 0.5) / SH_C0,
        sh[:, :, 1:],
    )
    loaded = load_gaussian_ply(path, use_native=False)
    assert loaded.count == scene.count and loaded.sh_degree == 2

    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img_orig = Renderer(scene, config).render(cam)
    img_ply = Renderer(loaded, config).render(cam)
    # Rotations re-quantize through the 8-bit lattice (+-1 LSB), so allow
    # slightly more than exactness.
    _image_close(img_ply, img_orig, pix_tol=4, frac=0.005, msg="ply roundtrip")


@pytest.mark.slow
def test_orbit_consistency():
    """Render from two nearby orbit cameras; images differ but both cover."""
    scene = random_scene(150, seed=3)
    config = RenderConfig(screen_size=128)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)
    r = Renderer(scene, config)
    img0 = r.render(cams[0])
    img1 = r.render(cams[1])
    assert img0[..., 3].max() == 255 and img1[..., 3].max() == 255
    assert not np.array_equal(img0, img1)
