"""Capacity-ceiling semantics and opacity-aware extent truncation.

Pins the behaviors added for round 4: (a) arbitrary capacities round up
to the emit kernel's block grain at every public entry point, (b) a
frame whose candidate count exceeds the kernel's hard MAX_CAPACITY warns
loudly and renders truncated FOREVER (the generalization of the
reference's grow-on-saturation, Demo.cpp:356-366, which grows without
bound), and (c) opacity-aware confidence-ellipse truncation
(RenderConfig.opacity_aware_extents) cuts the emitted pair count with
sub-output-LSB pixel impact versus the reference's fixed 3-sigma
extents (GaussianRender.cu:295-302).
"""

import dataclasses
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.expand import MAX_BLOCK
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.render import Renderer, render_frame, round_capacity


# ---------------------------------------------------------------------------
# round_capacity
# ---------------------------------------------------------------------------


def test_round_capacity_block_grain():
    # TPU path: whole emit GRID STEPS (block x blocks-per-step) — an odd
    # block count silently degrades the kernel's step batching to 1.
    from cudagaussianrenderer_tpu.ops.expand import BLOCKS_PER_STEP

    step = MAX_BLOCK * BLOCKS_PER_STEP
    assert round_capacity(1, interpret=False) == step
    assert round_capacity(step, interpret=False) == step
    assert round_capacity(step + 1, interpret=False) == 2 * step
    # Interpret mode shrinks the kernel block down to one 8x128 tile.
    assert round_capacity(256, interpret=True) == 256
    assert round_capacity(300, interpret=True) == 384


@pytest.mark.slow
def test_render_frame_accepts_unaligned_capacity():
    """A sub-block capacity must render, not raise (ADVICE round 3)."""
    scene = random_scene(100, seed=1).pad_to_multiple(256)
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img, aux = render_frame(scene, cam.camera_data(), config, 300, interpret=True)
    assert np.asarray(img).shape == (128, 128, 4)


# ---------------------------------------------------------------------------
# MAX_CAPACITY ceiling: warn + truncate forever
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_capacity_ceiling_warns_and_truncates_forever(monkeypatch):
    scene = random_scene(400, seed=9)
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)

    # Shrink the ceiling below this scene's candidate count so the clamp
    # engages at test scale.
    monkeypatch.setattr(Renderer, "MAX_CAPACITY", 1024)
    r = Renderer(scene, config)
    assert r.capacity == 1024

    with pytest.warns(RuntimeWarning, match="capacity ceiling"):
        img = r.render(cam)
    assert img[..., 3].max() == 255  # still renders (truncated)
    # Adaptive bucketing cannot exceed the ceiling: truncate-forever.
    assert r.capacity == 1024

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # warn fires once per renderer
        r.render(cam)
    assert r.capacity == 1024


# ---------------------------------------------------------------------------
# Opacity-aware extents
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def extent_setup():
    scene = random_scene(300, seed=2)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    return scene, cam


@pytest.mark.parametrize("falloff", ["gaussian", "epanechnikov"])
def test_opacity_extents_shrink_only_and_cull_subfloor(extent_setup, falloff):
    scene, cam = extent_setup
    base_cfg = RenderConfig(
        screen_size=128, falloff=falloff, opacity_aware_extents=False
    )
    trunc_cfg = dataclasses.replace(base_cfg, opacity_aware_extents=True)

    def ext(cfg, opac):
        clip = jax.jit(
            lambda m, s, q, c, o: project_splats(m, s, q, c, cfg, opacities=o)
        )(scene.means, scene.scales, scene.quats, cam.camera_data(), opac)
        return np.asarray(clip.ellipse)[:, 2:]

    full = ext(base_cfg, scene.opacities)
    cut = ext(trunc_cfg, scene.opacities)
    assert (cut <= full + 1e-6).all()  # truncation never grows the support
    # alpha = 1.0 keeps the reference extent (exactly for gaussian, whose
    # truncation radius clamps at 3 sigma; epanechnikov's linear falloff
    # hits the 1/255 floor just inside its support: factor sqrt(1-1/255)).
    ones = ext(trunc_cfg, jnp.ones_like(scene.opacities))
    factor = 1.0 if falloff == "gaussian" else np.sqrt(1.0 - 1.0 / 255.0)
    np.testing.assert_allclose(ones, full * factor, rtol=1e-5, atol=1e-6)
    # alpha <= 1/255 never contributes a full output level: zero extent.
    sub = ext(trunc_cfg, jnp.full_like(scene.opacities, 1.0 / 300.0))
    assert (sub <= 1e-6).all()


@pytest.mark.slow
def test_opacity_extents_cut_pairs_with_sub_lsb_image_delta(extent_setup):
    scene, cam = extent_setup
    base_cfg = RenderConfig(screen_size=128, opacity_aware_extents=False)
    trunc_cfg = dataclasses.replace(base_cfg, opacity_aware_extents=True)
    padded = scene.pad_to_multiple(256)

    img0, aux0 = render_frame(padded, cam.camera_data(), base_cfg, 8192, interpret=True)
    img1, aux1 = render_frame(padded, cam.camera_data(), trunc_cfg, 8192, interpret=True)
    n0, n1 = int(aux0["num_candidates"]), int(aux1["num_candidates"])
    assert n1 < n0, f"expected a pair cut, got {n0} -> {n1}"
    # Per-splat contribution below the 8-bit floor; allow a few LSB of
    # accumulated error across overlapping truncated splats.
    diff = np.abs(np.asarray(img0).astype(np.int32) - np.asarray(img1).astype(np.int32))
    frac_bad = (diff > 3).any(axis=-1).mean()
    assert frac_bad <= 0.005, f"truncation changed {frac_bad:.4f} of pixels by >3"


@pytest.mark.slow
def test_multipass_matches_single_pass():
    """render_frame_multipass: the capacity-ceiling escape hatch renders
    the same frame as single-pass, with per-pass capacity BELOW the
    frame's total candidate count (the whole point)."""
    from cudagaussianrenderer_tpu.render import render_frame_multipass

    scene = random_scene(300, seed=2).pad_to_multiple(256)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cfg = RenderConfig(screen_size=128)
    img0, aux0 = render_frame(scene, cam.camera_data(), cfg, 8192, interpret=True)
    total = int(aux0["num_candidates"])
    per_pass = 1024  # < total: single-pass at this capacity would truncate
    assert per_pass < total
    img1, aux1 = render_frame_multipass(
        scene, cam.camera_data(), cfg, per_pass, 4, interpret=True
    )
    assert int(aux1["num_candidates"]) == total
    assert int(aux1["num_pairs"]) == total  # nothing truncated
    # Per-pass counts expose per-slab saturation to callers (the CLI
    # warns on pass_pairs < pass_candidates).
    assert np.asarray(aux1["pass_candidates"]).sum() == total
    np.testing.assert_array_equal(
        np.asarray(aux1["pass_pairs"]), np.asarray(aux1["pass_candidates"])
    )
    d = np.abs(np.asarray(img0).astype(int) - np.asarray(img1).astype(int))
    assert (d > 2).any(axis=-1).mean() == 0.0


@pytest.mark.slow
def test_banded_per_band_ceiling_warns(monkeypatch):
    """Banded capacity saturates PER BAND at MAX_CAPACITY / G; a single
    hot band hitting that ceiling must warn even when the GLOBAL
    candidate count is below MAX_CAPACITY (regression: the global check
    alone left per-band ceiling truncation permanently silent)."""
    import dataclasses

    import jax.numpy as jnp

    scene = random_scene(400, seed=9)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    # Squash the splats into a thin horizontal stripe in one band's rows
    # (the camera keeps the ORIGINAL framing): one band carries ~3x the
    # other, and a band cannot be rebalanced below one tile row.
    m = np.asarray(scene.means).copy()
    m[1] = m[1] * 0.05 + 2.0
    scene = dataclasses.replace(scene, means=jnp.asarray(m))

    config = RenderConfig(screen_size=128, sort_bands=2)
    monkeypatch.setattr(Renderer, "MAX_CAPACITY", 2560)
    r = Renderer(scene, config)

    with pytest.warns(RuntimeWarning, match="capacity ceiling"):
        img = r.render(cam)
    # The global count stays below the ceiling — only the per-band
    # check can have fired — and the frame still renders (truncated).
    assert r.last_candidates <= r.MAX_CAPACITY
    assert img[..., 3].max() == 255
