"""Band-segmented sort path (config.sort_bands): correctness vs flat.

The banded pipeline — band-major emission (ops.banded.emit_pairs_banded),
batched per-band sort (ops.banded.sort_pairs_banded), band-offset range
starts (ranges.tile_ranges band args) — must produce the SAME pair set
as the flat pipeline for any splat order and any band boundaries; images
may differ only by unstable-sort tie order (<= a couple of levels).
"""

from collections import Counter

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import Camera, orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.banded import (
    band_counts,
    build_tile_pairs_banded,
)
from cudagaussianrenderer_tpu.ops.binning import (
    build_tile_pairs,
    splat_row_packs,
    splat_tile_rects,
)
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.render import (
    Renderer,
    _splat_colors,
    render_frame,
    reorder_scene_by_tile_row,
    uniform_band_rows,
)


def _pair_multiset(pairs):
    k = np.asarray(pairs.keys[0]).astype(np.uint64)
    if len(pairs.keys) > 1:
        k = (k << np.uint64(32)) | np.asarray(pairs.keys[1]).astype(np.uint64)
    v = np.asarray(pairs.values)
    m = v >= 0
    return Counter(zip(k[m].tolist(), v[m].tolist()))


@pytest.fixture(scope="module")
def setup():
    scene = random_scene(300, seed=2).pad_to_multiple(256)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    return scene, cam.camera_data()


@pytest.mark.slow
@pytest.mark.parametrize("depth_bits", [19, 32])
def test_banded_pairs_match_flat_exactly(setup, depth_bits):
    scene, cam = setup
    cfgf = RenderConfig(screen_size=128, depth_bits=depth_bits)
    cfgb = RenderConfig(screen_size=128, depth_bits=depth_bits, sort_bands=4)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, cam, cfgb,
        opacities=scene.opacities,
    )
    colors = _splat_colors(scene, cam)
    pf = build_tile_pairs(clip, colors, scene.opacities, cfgf, 8192, interpret=True)
    pb, totals, _ = build_tile_pairs_banded(
        clip, colors, scene.opacities, cfgb, 8192,
        jnp.asarray(uniform_band_rows(cfgb)),
        compact_capacity=4 * scene.padded_count,  # no compact saturation
        interpret=True,
    )
    assert int(pf.num_candidates) == int(pb.num_candidates)
    assert int(np.asarray(totals).sum()) == int(pb.num_candidates)
    assert _pair_multiset(pf) == _pair_multiset(pb)


@pytest.mark.slow
def test_banded_pairs_match_flat_after_reorder(setup):
    """Regression: the banded prefix padding must not replicate the LAST
    splat's live segment into the pad columns (a reordered scene puts a
    live splat at the array end of the last band)."""
    scene, cam = setup
    cfgf = RenderConfig(screen_size=128)
    cfgb = RenderConfig(screen_size=128, sort_bands=4)
    sc2 = reorder_scene_by_tile_row(scene, cam, cfgf)
    clip = project_splats(
        sc2.means, sc2.scales, sc2.quats, cam, cfgb, opacities=sc2.opacities
    )
    colors = _splat_colors(sc2, cam)
    pf = build_tile_pairs(clip, colors, sc2.opacities, cfgf, 8192, interpret=True)
    pb, _, _ = build_tile_pairs_banded(
        clip, colors, sc2.opacities, cfgb, 8192,
        jnp.asarray(uniform_band_rows(cfgb)),
        compact_capacity=4 * scene.padded_count,
        interpret=True,
    )
    assert _pair_multiset(pf) == _pair_multiset(pb)


def test_band_counts_partition_totals(setup):
    """Per-band counts over any row partition must sum to the exact
    per-splat totals, including tall (h > 8) and wide (w > 63) rects."""
    scene = random_scene(120, seed=7, min_scale=0.05, max_scale=1.2)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cfg = RenderConfig(screen_size=256)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, cam.camera_data(), cfg,
        opacities=scene.opacities,
    )
    rects = splat_tile_rects(clip, cfg)
    packs = splat_row_packs(clip, rects, cfg)
    for band_rows in ([0, 4, 8, 12, 16], [0, 1, 9, 16], [0, 16]):
        cb = band_counts(rects, packs, jnp.asarray(band_rows, jnp.int32))
        np.testing.assert_array_equal(
            np.asarray(cb).sum(axis=0), np.asarray(packs.counts),
            err_msg=str(band_rows),
        )


@pytest.mark.slow
def test_banded_image_matches_flat_dynamic_bands(setup):
    scene, cam = setup
    cfgf = RenderConfig(screen_size=128)
    cfgb = RenderConfig(screen_size=128, sort_bands=4)
    img0, aux0 = render_frame(scene, cam, cfgf, 8192, interpret=True)
    img1, aux1 = render_frame(
        scene, cam, cfgb, 8192,
        band_rows=jnp.asarray([0, 3, 4, 6, 8], jnp.int32),
        compact_capacity=4 * scene.padded_count, interpret=True,
    )
    assert int(aux0["num_pairs"]) == int(aux1["num_pairs"])
    d = np.abs(np.asarray(img0).astype(int) - np.asarray(img1).astype(int))
    assert d.max() <= 2  # unstable-sort tie order only


@pytest.mark.slow
def test_banded_saturation_truncates_per_band(setup):
    """Pair saturation (band totals > capacity/G) must TRUNCATE: every
    emitted pair is one of the flat pipeline's pairs (regression: kept
    pair-dry splats used to break the compacted p_incl row's
    monotonicity and fabricate garbage pairs frame-wide — the count
    alone cannot catch that, the garbage fills it exactly)."""
    scene, cam = setup
    cfgf = RenderConfig(screen_size=128)
    cfgb = RenderConfig(screen_size=128, sort_bands=4)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, cam, cfgb,
        opacities=scene.opacities,
    )
    colors = _splat_colors(scene, cam)
    pf = build_tile_pairs(
        clip, colors, scene.opacities, cfgf, 8192, interpret=True
    )
    pb, totals, _ = build_tile_pairs_banded(
        clip, colors, scene.opacities, cfgb, 1024,
        jnp.asarray(uniform_band_rows(cfgb)),
        compact_capacity=4 * scene.padded_count,  # no compact saturation
        interpret=True,
    )
    per_band = 1024 // 4
    totals = np.asarray(totals)
    assert (totals > per_band).any()  # the fixture saturates some band
    mb, mf = _pair_multiset(pb), _pair_multiset(pf)
    assert sum(mb.values()) == int(np.minimum(totals, per_band).sum())
    assert mb <= mf  # truncation only — no fabricated pairs

    img, aux = render_frame(scene, cam, cfgb, 1024, interpret=True)
    assert int(aux["num_pairs"]) == sum(mb.values())
    assert np.asarray(img)[..., 3].max() == 255  # still renders


@pytest.mark.slow
def test_banded_renderer_rebalances_and_matches():
    scene = random_scene(400, seed=9)
    cfgf = RenderConfig(screen_size=128)
    cfgb = RenderConfig(screen_size=128, sort_bands=4)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 4)
    rf = Renderer(scene, cfgf)
    rb = Renderer(scene, cfgb)
    # The padded test scene clusters its pad splats in one band; give the
    # compacted axis full headroom so every frame matches flat exactly.
    rb.compact_capacity = rb._round_banded(4 * rb.scene.padded_count)
    rows0 = rb.band_rows.copy()
    for c in cams:
        d = np.abs(rf.render(c).astype(int) - rb.render(c).astype(int))
        assert (d > 2).any(axis=-1).mean() <= 0.001
    assert not np.array_equal(rb.band_rows, rows0)  # controller moved
    assert rb.band_rows[0] == 0 and rb.band_rows[-1] == cfgb.tiles_y
    assert (np.diff(rb.band_rows) >= 0).all()


@pytest.mark.slow
def test_compact_saturation_truncates_per_band(setup):
    """A band whose in-band splat count exceeds its compacted share
    drops trailing splats' pairs for the frame (and ONLY those): emitted
    pairs equal the per-band clamped expectation, and nothing garbage
    leaks past the band pair ends."""
    scene, cam = setup
    cfgb = RenderConfig(screen_size=128, sort_bands=4)
    img, aux = render_frame(
        scene, cam, cfgb, 8192,
        compact_capacity=512,  # 128 splat slots per band (padding splats
        # are culled outright since round 5, so saturation must come
        # from the 300 LIVE splats)
        interpret=True,
    )
    totals = np.asarray(aux["band_totals"])
    splats = np.asarray(aux["band_splats"])
    assert (splats > 128).any()  # the fixture saturates at least one band
    assert int(aux["num_pairs"]) < int(totals.sum())
    assert np.asarray(img)[..., 3].max() == 255


@pytest.mark.slow
def test_banded_stable_sort_smoke(setup):
    """config.stable_sort threads through the banded path (regression:
    it was silently dropped)."""
    scene, cam = setup
    cfgb = RenderConfig(screen_size=128, sort_bands=4, stable_sort=True)
    img, aux = render_frame(
        scene, cam, cfgb, 8192,
        compact_capacity=4 * scene.padded_count, interpret=True,
    )
    img2, _ = render_frame(
        scene, cam, cfgb, 8192,
        compact_capacity=4 * scene.padded_count, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
    assert np.asarray(img)[..., 3].max() == 255


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 23])
def test_banded_fuzz_matches_flat(seed):
    """Randomized scenes, scales, band counts and boundaries: the banded
    pair multiset must equal flat exactly whenever nothing saturates."""
    rng = np.random.default_rng(seed)
    scene = random_scene(
        int(rng.integers(150, 400)), seed=seed,
        min_scale=float(rng.uniform(0.005, 0.05)),
        max_scale=float(rng.uniform(0.2, 0.9)),
    ).pad_to_multiple(256)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    g = int(rng.choice([2, 4, 8]))
    cfgf = RenderConfig(screen_size=256)
    cfgb = RenderConfig(screen_size=256, sort_bands=g)
    # random non-uniform boundaries
    cuts = np.sort(rng.choice(np.arange(1, 16), size=g - 1, replace=False))
    band_rows = jnp.asarray(np.concatenate([[0], cuts, [16]]), jnp.int32)

    clip = project_splats(
        scene.means, scene.scales, scene.quats, cam.camera_data(), cfgb,
        opacities=scene.opacities,
    )
    colors = _splat_colors(scene, cam.camera_data())
    cap = 16384 * 2
    pf = build_tile_pairs(clip, colors, scene.opacities, cfgf, cap, interpret=True)
    pb, totals, splats = build_tile_pairs_banded(
        clip, colors, scene.opacities, cfgb, cap, band_rows,
        compact_capacity=g * scene.padded_count, interpret=True,
    )
    assert int(np.asarray(totals).max()) <= cap // g, "fixture saturated"
    assert _pair_multiset(pf) == _pair_multiset(pb)

    # Saturated replay of the SAME random frame: a small pair capacity
    # forces pair saturation in at least one band; emitted pairs must be
    # a subset of the flat pipeline's pairs at the per-band clamped
    # count (the round-4 corruption class: garbage pairs matching the
    # count exactly).
    grain = 128 * g
    totals_np = np.asarray(totals)
    small = max(grain, int(totals_np.max()) * g // 2 // grain * grain)
    pb_s, totals_s, _ = build_tile_pairs_banded(
        clip, colors, scene.opacities, cfgb, small, band_rows,
        compact_capacity=g * scene.padded_count, interpret=True,
    )
    totals_s = np.asarray(totals_s)
    np.testing.assert_array_equal(totals_s, totals_np)  # capacity-independent
    assert (totals_s > small // g).any(), "saturated replay fixture too big"
    mb = _pair_multiset(pb_s)
    assert sum(mb.values()) == int(np.minimum(totals_s, small // g).sum())
    assert mb <= _pair_multiset(pf)


def test_band_rows_length_validated(setup):
    """A band_rows whose length disagrees with config.sort_bands would
    silently desynchronize the emit/sort/ranges segmenting — it must
    raise instead."""
    scene, cam = setup
    cfgb = RenderConfig(screen_size=128, sort_bands=8)
    with pytest.raises(ValueError, match="band_rows"):
        render_frame(
            scene, cam, cfgb, 8192,
            band_rows=jnp.asarray([0, 4, 8], jnp.int32), interpret=True,
        )
