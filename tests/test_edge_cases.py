"""Degenerate-input hardening: tiny scenes, tiny screens, extreme splats.

The reference handles these implicitly (or crashes — it asserts on zero
splats, Demo.cpp:443); the TPU pipeline must keep static shapes sane.
"""

import dataclasses

import numpy as np
import pytest

import jax

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene, scene_from_arrays
from cudagaussianrenderer_tpu.render import Renderer


@pytest.mark.slow
def test_single_splat_renders():
    scene = scene_from_arrays(
        means=np.zeros((1, 3), np.float32),
        scales=np.full((1, 3), 0.3, np.float32),
        quats_xyzw=np.array([[0.0, 0.0, 0.0, 1.0]], np.float32),
        opacities=np.array([0.9], np.float32),
        colors=np.array([[1.0, 0.2, 0.1]], np.float32),
    )
    scene = dataclasses.replace(
        scene, bounds_min=(-1.0, -1.0, -1.0), bounds_max=(1.0, 1.0, 1.0)
    )
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img = Renderer(scene, config).render(cam)
    # The red-ish splat covers the image center.
    c = img[60:68, 60:68]
    assert c[..., 0].max() > 100 and c[..., 3].max() == 255


@pytest.mark.slow
def test_one_tile_screen():
    """16px screen = exactly one tile; tiles_per_cell must be adjusted."""
    config = RenderConfig(screen_size=16, tiles_per_cell=1)
    assert config.total_tiles == 1
    scene = random_scene(64, seed=1)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img = Renderer(scene, config).render(cam)
    assert img.shape == (16, 16, 4)
    assert img[..., 3].max() == 255


def test_tiles_per_cell_must_divide():
    with pytest.raises(ValueError):
        RenderConfig(screen_size=16, tiles_per_cell=8)  # 8 > 1 tile
    # The default auto-selects the largest of 16/8/4/2/1 that divides
    # the grid it rasterizes (hardware-measured optimum at 1024^2 is
    # 16), per-context: full screens, multipass slices and per-device
    # tile-row bands each resolve independently.
    assert RenderConfig(screen_size=16).cell_tiles() == 1
    assert RenderConfig(screen_size=1024).cell_tiles() == 16
    assert RenderConfig(screen_size=128).cell_tiles(8) == 8  # 8-tile shard
    assert RenderConfig(screen_size=128, tiles_per_cell=4).cell_tiles(8) == 4


@pytest.mark.slow
def test_huge_splat_covers_screen():
    """One splat larger than the frustum: its rect clamps to the full tile
    grid and every pixel blends it."""
    scene = scene_from_arrays(
        means=np.zeros((1, 3), np.float32),
        scales=np.full((1, 3), 50.0, np.float32),
        quats_xyzw=np.array([[0.0, 0.0, 0.0, 1.0]], np.float32),
        opacities=np.array([1.0], np.float32),
        colors=np.array([[0.0, 1.0, 0.0]], np.float32),
    )
    scene = dataclasses.replace(
        scene, bounds_min=(-1.0, -1.0, -1.0), bounds_max=(1.0, 1.0, 1.0)
    )
    config = RenderConfig(screen_size=64, tiles_per_cell=4)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img = Renderer(scene, config).render(cam)
    assert (img[..., 1] > 200).mean() > 0.99  # green everywhere
    assert (img[..., 3] == 255).all()


@pytest.mark.slow
def test_all_splats_at_same_depth():
    """Massive depth-key ties must not break ordering invariants."""
    n = 128
    rng = np.random.default_rng(3)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    means[:, 2] = 0.0  # identical camera-space depth plane
    scene = scene_from_arrays(
        means=means,
        scales=np.full((n, 3), 0.1, np.float32),
        quats_xyzw=np.tile(np.array([[0, 0, 0, 1.0]], np.float32), (n, 1)),
        opacities=np.full(n, 0.5, np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
    )
    scene = dataclasses.replace(
        scene, bounds_min=(-1.0, -1.0, -1.0), bounds_max=(1.0, 1.0, 1.0)
    )
    config = RenderConfig(screen_size=64, tiles_per_cell=4)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    r = Renderer(scene, config)
    r.render(cam)  # first render adapts capacity (a different program)
    img1 = r.render(cam)
    img2 = r.render(cam)
    # Deterministic despite ties — for a fixed compiled program.  (Across
    # capacity changes, unstable-sort tie order may differ; opt into
    # config.stable_sort for layout-independent tie order.)
    np.testing.assert_array_equal(img1, img2)
    assert img1[..., 3].max() == 255


@pytest.mark.slow
def test_zero_opacity_scene_renders_black():
    scene = random_scene(100, seed=5)
    scene = dataclasses.replace(
        scene, opacities=jax.numpy.zeros_like(scene.opacities)
    )
    config = RenderConfig(screen_size=64, tiles_per_cell=4)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img = Renderer(scene, config).render(cam)
    # Pairs exist (coverage alpha = 255 on touched tiles) but colors are 0.
    assert img[..., :3].max() == 0


def test_initial_capacity_clamped_and_rounded():
    """A scene big enough that capacity_factor * count exceeds the emit
    kernel's exact-f32 limit must construct (and the clamp must round to
    a block multiple); an explicit non-multiple capacity must round up
    instead of crashing the first render."""
    import jax.numpy as jnp

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.ops.expand import MAX_CAPACITY
    from cudagaussianrenderer_tpu.parallel.distributed import (
        DistributedRenderer,
        make_mesh,
    )
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(300, seed=0)
    # capacity_factor estimate blows past the kernel limit.
    r = Renderer(scene, RenderConfig(screen_size=128, capacity_factor=10**6))
    assert r.capacity <= MAX_CAPACITY
    assert r.capacity % 128 == 0

    dr = DistributedRenderer(
        scene, RenderConfig(screen_size=128, capacity_factor=10**6),
        mesh=make_mesh(1),
    )
    assert dr.capacity <= MAX_CAPACITY

    # Explicit capacity that is not a block multiple: rounds up, renders.
    r2 = Renderer(scene, RenderConfig(screen_size=128, capacity=1000))
    assert r2.capacity % 128 == 0 and r2.capacity >= 1000
