"""Projection stage vs the float64 golden oracle + eigen sanity checks."""

import numpy as np
import pytest

import jax

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.golden import golden_project, scene_to_numpy
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.projection import project_splats


@pytest.fixture(scope="module")
def setup():
    scene = random_scene(256, seed=5)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    config = RenderConfig(screen_size=256)
    sn = scene_to_numpy(scene)
    clip = jax.jit(lambda m, s, q, c: project_splats(m, s, q, c, config))(
        scene.means, scene.scales, scene.quats, cam.camera_data()
    )
    gold = golden_project(sn["means"], sn["scales"], sn["quats"], cam.camera_data(), config)
    return clip, gold, scene, cam, config


def test_clip_positions_match_golden(setup):
    clip, gold, *_ = setup
    np.testing.assert_allclose(np.asarray(clip.clip_xy), gold["clip_xy"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(clip.clip_z), gold["clip_z"], atol=2e-4)


def test_ellipse_matches_golden(setup):
    clip, gold, *_ = setup
    got = np.asarray(clip.ellipse)
    want = gold["ellipse"]
    # cos/sin may flip sign together (eigenvector direction ambiguity is
    # resolved identically by both, but keep the check orientation-safe).
    np.testing.assert_allclose(got[:, 2:], want[:, 2:], rtol=1e-3, atol=1e-5)
    dot = got[:, 0] * want[:, 0] + got[:, 1] * want[:, 1]
    assert np.all(np.abs(dot) > 1.0 - 1e-3)


def test_conic_matches_golden(setup):
    clip, gold, *_ = setup
    got = np.asarray(clip.conic)
    want = gold["conic"]
    # Conics scale like 1/det; compare with generous relative tolerance.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-2)


def test_eigenvalues_match_numpy_eigh(setup):
    """Closed-form 2x2 eigenvalues vs numpy.linalg.eigvalsh on the same
    covariances (recomputed here in float64)."""
    clip, gold, scene, cam, config = setup
    got = np.asarray(clip.ellipse)
    sf = config.sigma_factor
    lam0 = (got[:, 2] / sf) ** 2
    lam1 = (got[:, 3] / sf) ** 2
    # Recover golden covariance eigenvalues from the golden conic+extents.
    glam0 = (gold["ellipse"][:, 2] / sf) ** 2
    glam1 = (gold["ellipse"][:, 3] / sf) ** 2
    vis = gold["ellipse"][:, 2] > 0
    np.testing.assert_allclose(lam0[vis], glam0[vis], rtol=2e-3, atol=1e-10)
    np.testing.assert_allclose(lam1[vis], glam1[vis], rtol=2e-2, atol=1e-9)


def test_culling_marks_out_of_frustum(setup):
    clip, gold, scene, cam, config = setup
    got_culled = np.asarray(clip.clip_xy)[:, 0] == -128.0
    want_culled = gold["clip_xy"][:, 0] == -128.0
    assert np.mean(got_culled == want_culled) > 0.99  # borderline f32/f64 flips
    # Behind-camera splats must always be culled.
    cam2 = Camera(position=np.array([0, 0, -1000.0], np.float32), aspect=1.0)
    clip2 = jax.jit(lambda m, s, q, c: project_splats(m, s, q, c, config))(
        scene.means, scene.scales, scene.quats, cam2.camera_data()
    )
    assert np.all(np.asarray(clip2.clip_xy)[:, 0] == -128.0)
    assert np.all(np.asarray(clip2.ellipse)[:, 2:] == 0.0)


def test_trace_bump_keeps_distant_splats_visible():
    """A tiny splat far from the camera must still get a >= texel-ish
    ellipse thanks to the trace bump (GaussianRender.cu:267-276)."""
    from cudagaussianrenderer_tpu.models.scene import scene_from_arrays

    scene = scene_from_arrays(
        means=np.array([[0.0, 0.0, 0.0]], np.float32),
        scales=np.full((1, 3), 1e-5, np.float32),
        quats_xyzw=np.array([[0.0, 0.0, 0.0, 1.0]], np.float32),
        opacities=np.array([1.0], np.float32),
    )
    cam = Camera(position=np.array([0, 0, 50.0], np.float32), aspect=1.0)
    config = RenderConfig(screen_size=1024)
    clip = jax.jit(lambda m, s, q, c: project_splats(m, s, q, c, config))(
        scene.means, scene.scales, scene.quats, cam.camera_data()
    )
    ext = np.asarray(clip.ellipse)[0, 2:]
    texel_clip = 2.0 / 1024
    assert ext[0] > texel_clip  # 3-sigma of the bumped covariance
    assert np.asarray(clip.clip_xy)[0, 0] != -128.0


def test_zero_opacity_splats_cull_outright():
    """Opacity == 0 splats (the inert scene-padding entries) must emit
    ZERO candidate pairs: projection culls them before binning, so
    padding a scene never changes its pair list (round 5 — before, the
    trace bump gave each ~texel extents and one pair-list slot)."""
    from cudagaussianrenderer_tpu.ops.binning import (
        splat_row_packs,
        splat_tile_rects,
    )

    scene = random_scene(200, seed=11)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    config = RenderConfig(screen_size=128)

    def candidates(s):
        clip = project_splats(
            s.means, s.scales, s.quats, cam.camera_data(), config,
            opacities=s.opacities,
        )
        rects = splat_tile_rects(clip, config)
        return int(np.asarray(splat_row_packs(clip, rects, config).counts.sum()))

    base = candidates(scene)
    assert base > 0
    assert candidates(scene.pad_to(4096)) == base
