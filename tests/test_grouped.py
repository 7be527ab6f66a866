"""Keyspace-grouped emission + batched per-group sort vs the flat path.

The grouped pipeline (binning.build_tile_pairs_grouped et al.) emits AABB
candidates and culls with the per-candidate exact ellipse/rect test; the
flat path emits per-row exact ranges directly (binning.splat_row_packs).
Both reproduce the reference's pair-culling semantics, but the flat path
may additionally keep boundary-grazing tiles its conservative rounding
admits (density below the ellipse cutoff) and the full-width rows of very
tall splats — so images must agree to within a few output levels, not
bit-for-bit, and the flat candidate count is the smaller exact one.
"""

import numpy as np

import jax

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs_grouped
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges_grouped
from cudagaussianrenderer_tpu.ops.sorting import sort_pairs_grouped
from cudagaussianrenderer_tpu.render import Renderer, render_frame


def _setup(n=500, seed=3, screen=128):
    scene = random_scene(n, seed=seed).pad_to_multiple(256)
    # stable sort: grouped-vs-flat bit-identity requires reproducible tie
    # order across the two list shapes.
    config = RenderConfig(screen_size=screen, stable_sort=True)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    return scene, config, cam


def test_grouped_image_matches_flat():
    scene, config, cam = _setup()
    flat = jax.jit(lambda s, c: render_frame(s, c, config, 16384))(
        scene, cam.camera_data()
    )
    for n_groups in (1, 4, 8):
        grouped = jax.jit(
            lambda s, c, g=n_groups: render_frame(
                s, c, config, 0, groups=(g, 16384 // g)
            )
        )(scene, cam.camera_data())
        diff = np.abs(
            np.asarray(grouped[0]).astype(np.int32)
            - np.asarray(flat[0]).astype(np.int32)
        )
        # Pair sets agree except sub-cutoff grazers (see module docstring);
        # those contribute at most a few output levels on a few pixels.
        bad = (diff > 4).any(axis=-1).mean()
        assert bad <= 0.002, f"G={n_groups}: {bad:.4f} pixels differ by >4"
        # Flat emission is exact; grouped counts the (larger) AABB superset
        # but culls to the same pairs modulo grazers.
        assert int(grouped[1]["num_candidates"]) >= int(flat[1]["num_candidates"])
        assert (
            abs(int(grouped[1]["num_pairs"]) - int(flat[1]["num_pairs"]))
            <= int(flat[1]["num_pairs"]) // 20
        )


def test_grouped_ranges_invariants():
    scene, config, cam = _setup(seed=5)
    n_groups, gcap = 8, 2048

    @jax.jit
    def fn(s, c):
        clip = project_splats(s.means, s.scales, s.quats, c, config)
        pairs, bounds, gcount = build_tile_pairs_grouped(
            clip, s.colors, s.opacities, config, n_groups, gcap
        )
        keys, _, attrs = sort_pairs_grouped(pairs, n_groups, gcap)
        starts, counts = tile_ranges_grouped(keys, bounds, gcap, config)
        return pairs, bounds, gcount, keys[0], starts, counts

    pairs, bounds, gcount, keys, starts, counts = fn(scene, cam.camera_data())
    bounds = np.asarray(bounds)
    gcount = np.asarray(gcount)
    keys = np.asarray(keys)
    starts, counts = np.asarray(starts), np.asarray(counts)

    # Group boundaries tile-partition the screen.
    assert bounds[0] == 0 and bounds[-1] == config.total_tiles
    assert (np.diff(bounds) >= 0).all()
    assert gcount.sum() == int(pairs.num_candidates)
    # Flattened per-group-sorted keys are globally sorted (sentinel design).
    assert (np.diff(keys.astype(np.int64)) >= 0).all()
    # Ranges partition exactly the valid pairs.
    assert counts.sum() == int(pairs.num_pairs)
    t = np.arange(config.total_tiles)
    g_of_t = np.searchsorted(bounds, t, side="right") - 1
    assert (starts >= g_of_t * gcap).all()
    assert (starts + counts <= g_of_t * gcap + gcap).all()
    # Every counted entry's key belongs to its tile.
    for tile in np.nonzero(counts)[0][:50]:
        seg = keys[starts[tile] : starts[tile] + counts[tile]]
        assert ((seg >> 19) == tile).all()


def test_grouped_saturation_truncates():
    scene, config, cam = _setup(seed=7)
    img, aux = jax.jit(
        lambda s, c: render_frame(s, c, config, 0, groups=(4, 256))
    )(scene, cam.camera_data())
    assert np.asarray(img).shape == (128, 128, 4)
    assert int(aux["max_group_candidates"]) > 256  # saturated signal


def test_renderer_uses_groups_and_adapts():
    scene, config, cam = _setup(seed=9)
    import dataclasses

    config = dataclasses.replace(config, use_grouped_sort=True)
    r = Renderer(scene, config)
    assert r.use_groups
    img = r.render(cam)
    assert img.shape == (128, 128, 4) and img[..., 3].max() == 255
    cap0 = r.group_capacity
    img2 = r.render(cam)
    assert r.group_capacity <= cap0  # adapted to measured max group
    np.testing.assert_array_equal(img, img2)
