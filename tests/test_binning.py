"""Tile binning: overlap geometry, expansion, keys, sort + range invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.golden import golden_ellipse_rect_overlap, golden_project, scene_to_numpy
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.binning import (
    DEPTH_BITS_PACKED,
    SENTINEL_KEY_U32,
    build_tile_pairs,
    ellipse_rect_overlap,
    splat_tile_rects,
)
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
from cudagaussianrenderer_tpu.ops.sorting import sort_pairs


def test_overlap_matches_golden_scalar():
    rng = np.random.default_rng(0)
    n = 500
    center = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    theta = rng.uniform(0, np.pi, n)
    cos_sin = np.stack([np.cos(theta), np.sin(theta)], axis=1).astype(np.float32)
    extent = rng.uniform(0.01, 0.5, (n, 2)).astype(np.float32)
    extent[:, 1] = np.minimum(extent[:, 0], extent[:, 1])
    rmin = rng.uniform(-1, 0.8, (n, 2)).astype(np.float32)
    rsize = rng.uniform(0.01, 0.5, (n, 2)).astype(np.float32)
    rmax = rmin + rsize

    got = np.asarray(
        jax.jit(ellipse_rect_overlap)(
            jnp.asarray(center[:, 0]),
            jnp.asarray(center[:, 1]),
            jnp.asarray(cos_sin[:, 0]),
            jnp.asarray(cos_sin[:, 1]),
            jnp.asarray(extent[:, 0]),
            jnp.asarray(extent[:, 1]),
            jnp.asarray(rmin[:, 0]),
            jnp.asarray(rmin[:, 1]),
            jnp.asarray(rmax[:, 0]),
            jnp.asarray(rmax[:, 1]),
        )
    )
    for i in range(n):
        want = golden_ellipse_rect_overlap(
            center[i], cos_sin[i], extent[i], rmin[i], rmax[i]
        )
        assert got[i] == want, f"mismatch at {i}"


def test_overlap_vs_monte_carlo():
    """Property test: the exact test must agree with dense point sampling
    whenever the sampled verdict is unambiguous."""
    rng = np.random.default_rng(1)
    overlap_fn = jax.jit(ellipse_rect_overlap)
    for i in range(50):
        center = rng.uniform(-0.5, 0.5, 2)
        theta = rng.uniform(0, np.pi)
        extent = np.array([rng.uniform(0.05, 0.4), rng.uniform(0.02, 0.2)])
        rmin = rng.uniform(-0.6, 0.4, 2)
        rmax = rmin + rng.uniform(0.05, 0.4, 2)
        # Sample the rect densely; check if any point falls inside ellipse.
        xs = np.linspace(rmin[0], rmax[0], 40)
        ys = np.linspace(rmin[1], rmax[1], 40)
        gx, gy = np.meshgrid(xs, ys)
        dx, dy = gx - center[0], gy - center[1]
        c, s = np.cos(theta), np.sin(theta)
        lx = (dx * c + dy * s) / extent[0]
        ly = (dy * c - dx * s) / extent[1]
        r2 = lx * lx + ly * ly
        sampled_overlap = bool((r2 < 0.98).any())
        sampled_clear = bool((r2 < 1.02).any())
        got = bool(
            np.asarray(
                overlap_fn(
                    jnp.float32(center[0]),
                    jnp.float32(center[1]),
                    jnp.float32(c),
                    jnp.float32(s),
                    jnp.float32(extent[0]),
                    jnp.float32(extent[1]),
                    jnp.float32(rmin[0]),
                    jnp.float32(rmin[1]),
                    jnp.float32(rmax[0]),
                    jnp.float32(rmax[1]),
                )
            )
        )
        if sampled_overlap:
            assert got, f"case {i}: sampling found overlap, exact test missed it"
        if not sampled_clear:
            assert not got, f"case {i}: no sampled overlap, exact test claimed one"


@pytest.fixture(scope="module")
def pipeline_state():
    scene = random_scene(512, seed=11)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    # Rect-overlap semantics: these tests validate the strip runs
    # against the golden per-candidate ellipse/RECT test; the default
    # center-sampled runs deliberately drop pixel-free grazing tiles
    # (validated separately by test_center_sampled_runs_*).
    config = RenderConfig(screen_size=256, center_sampled_runs=False)
    capacity = 16384  # ample: the 512-splat fixture emits ~9k candidates

    @jax.jit
    def fn(sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, c, config)
        return clip, build_tile_pairs(clip, sc.colors, sc.opacities, config, capacity)

    clip, pairs = fn(scene, cam.camera_data())
    return scene, cam, config, clip, capacity, pairs


def test_counts_match_golden_aabbs(pipeline_state):
    scene, cam, config, clip, capacity, pairs = pipeline_state
    rects = jax.jit(lambda c: splat_tile_rects(c, config))(clip)
    sn = scene_to_numpy(scene)
    gold = golden_project(sn["means"], sn["scales"], sn["quats"], cam.camera_data(), config)
    tps = config.tiles_per_screen
    counts = np.asarray(rects.counts)
    for i in range(scene.count):
        cx, cy = gold["clip_xy"][i]
        ct, st, e0, e1 = gold["ellipse"][i]
        hx = abs(ct * e0) + abs(st * e1)
        hy = abs(st * e0) + abs(ct * e1)
        x0 = min(max(int(np.floor((cx - hx + 1) * 0.5 * tps)), 0), tps)
        y0 = min(max(int(np.floor((cy - hy + 1) * 0.5 * tps)), 0), tps)
        x1 = min(max(int(np.ceil((cx + hx + 1) * 0.5 * tps)), 0), tps)
        y1 = min(max(int(np.ceil((cy + hy + 1) * 0.5 * tps)), 0), tps)
        want = max(0, (x1 - x0) * (y1 - y0))
        # f32/f64 boundary flips can change the AABB by one tile row/col.
        assert abs(counts[i] - want) <= max(3, x1 - x0, y1 - y0), i


def test_emission_matches_golden_exact_test(pipeline_state):
    """The per-row exact-range emission (splat_row_packs + emit kernel)
    must reproduce the golden per-candidate ellipse/rect test's pair set:
    a SUPERSET (conservative float rounding may add boundary-grazing
    tiles whose density is below the ellipse cutoff) that never misses a
    pair the exact test keeps, and never leaves the candidate AABB."""
    scene, cam, config, clip, capacity, pairs = pipeline_state
    keys = np.asarray(pairs.keys[0])
    values = np.asarray(pairs.values)
    valid = values >= 0
    emitted = set(
        zip(values[valid].tolist(), (keys[valid] >> DEPTH_BITS_PACKED).tolist())
    )

    sn = scene_to_numpy(scene)
    gold = golden_project(sn["means"], sn["scales"], sn["quats"], cam.camera_data(), config)
    tps = config.tiles_per_screen
    ts_clip = 2.0 / tps
    n_exact = 0
    n_extra = len(emitted)
    for i in range(scene.count):
        cx, cy = gold["clip_xy"][i]
        ct, st, e0, e1 = gold["ellipse"][i]
        hx = abs(ct * e0) + abs(st * e1)
        hy = abs(st * e0) + abs(ct * e1)
        x0 = min(max(int(np.floor((cx - hx + 1) * 0.5 * tps)), 0), tps)
        y0 = min(max(int(np.floor((cy - hy + 1) * 0.5 * tps)), 0), tps)
        x1 = min(max(int(np.ceil((cx + hx + 1) * 0.5 * tps)), 0), tps)
        y1 = min(max(int(np.ceil((cy + hy + 1) * 0.5 * tps)), 0), tps)
        for gy in range(y0, y1):
            for gx in range(x0, x1):
                rmin = (gx * ts_clip - 1, gy * ts_clip - 1)
                rmax = (rmin[0] + ts_clip, rmin[1] + ts_clip)
                hit = golden_ellipse_rect_overlap(
                    (cx, cy), (ct, st), (e0, e1), rmin, rmax
                )
                pair = (i, gy * tps + gx)
                if hit:
                    n_exact += 1
                    assert pair in emitted, f"missing exact pair {pair}"
                if pair in emitted:
                    n_extra -= 1
    # Anything left in `emitted` beyond AABB candidates would be a bug;
    # extras inside the AABB are bounded (full-width rows of very tall
    # splats + float-boundary grazers).
    assert n_extra == 0, f"{n_extra} pairs emitted outside candidate AABBs"
    assert len(emitted) >= n_exact
    assert len(emitted) - n_exact <= max(8, n_exact // 20), (
        len(emitted), n_exact,
    )


def test_pair_list_structure(pipeline_state):
    scene, cam, config, clip, capacity, pairs = pipeline_state
    keys = np.asarray(pairs.keys[0])
    values = np.asarray(pairs.values)
    n_cand = int(pairs.num_candidates)
    n_pairs = int(pairs.num_pairs)
    assert 0 < n_pairs <= min(n_cand, capacity)
    assert n_cand <= capacity  # fixture is sized to avoid saturation
    valid = keys != np.uint32(SENTINEL_KEY_U32)
    assert valid.sum() == n_pairs
    # Valid entries reference real splats; sentinels carry -1.
    assert np.all(values[valid] >= 0)
    assert np.all(values[valid] < scene.padded_count)
    assert np.all(values[~valid] == -1)
    # Tile ids in range.
    tiles = keys[valid] >> DEPTH_BITS_PACKED
    assert tiles.max() < config.total_tiles


def test_sorted_ranges_partition_list(pipeline_state):
    scene, cam, config, clip, capacity, pairs = pipeline_state

    @jax.jit
    def fn(pairs):
        sorted_keys, sorted_vals, sorted_attrs = sort_pairs(pairs, with_values=True)
        starts, counts = tile_ranges(sorted_keys, config)
        return sorted_keys, sorted_vals, sorted_attrs, starts, counts

    sorted_keys, sorted_vals, sorted_attrs, starts, counts = fn(pairs)
    keys = np.asarray(sorted_keys[0])
    assert np.all(keys[:-1] <= keys[1:])  # sorted
    starts, counts = np.asarray(starts), np.asarray(counts)
    n_pairs = int(pairs.num_pairs)
    # Ranges are disjoint, ordered, and cover exactly the valid prefix.
    assert counts.sum() == n_pairs
    ends = starts + counts
    assert np.all(starts[1:] >= ends[:-1])
    # Within each tile, depth is non-decreasing.
    depth_mask = (1 << DEPTH_BITS_PACKED) - 1
    for t in np.nonzero(counts > 1)[0][:50]:
        seg = keys[starts[t] : ends[t]]
        assert np.all((seg >> DEPTH_BITS_PACKED) == t)
        d = seg & depth_mask
        assert np.all(d[:-1] <= d[1:])


@pytest.mark.slow
def test_lex_sort_mode_equivalent(pipeline_state):
    scene, cam, config, clip, capacity, pairs19 = pipeline_state
    # Match the fixture config (rect-overlap semantics).
    cfg32 = RenderConfig(
        screen_size=256, depth_bits=32, center_sampled_runs=False
    )

    @jax.jit
    def fn32(clip):
        pairs32 = build_tile_pairs(
            clip, scene.colors, scene.opacities, cfg32, capacity
        )
        return tile_ranges(sort_pairs(pairs32)[0], cfg32)

    @jax.jit
    def fn19(pairs):
        return tile_ranges(sort_pairs(pairs)[0], config)

    starts32, counts32 = fn32(clip)
    starts19, counts19 = fn19(pairs19)
    np.testing.assert_array_equal(np.asarray(counts32), np.asarray(counts19))
    np.testing.assert_array_equal(np.asarray(starts32), np.asarray(starts19))


def test_capacity_truncation():
    """When capacity is too small, the list truncates (the reference aborts
    writes at capacity, cu:700-703) and reports saturation via counts."""
    scene = random_scene(512, seed=11)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    config = RenderConfig(screen_size=256, capacity=256)

    @jax.jit
    def fn(sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, c, config)
        return build_tile_pairs(clip, sc.colors, sc.opacities, config, 256)

    pairs = fn(scene, cam.camera_data())
    assert int(pairs.num_candidates) > 256  # saturated
    assert int(pairs.num_pairs) <= 256
    assert np.asarray(pairs.keys[0]).shape == (256,)


def test_sorted_attrs_match_value_gather(pipeline_state):
    """The gather-free segmented fill + variadic sort must reproduce the
    obvious gather-by-splat-index bit-exactly."""
    scene, cam, config, clip, capacity, pairs = pipeline_state
    keys, vals, attrs = jax.jit(lambda p: sort_pairs(p, with_values=True))(pairs)
    vals = np.asarray(vals)
    attrs = np.stack([np.asarray(a) for a in attrs])
    valid = vals >= 0
    idx = vals[valid]
    colors = np.clip(np.asarray(scene.colors), 0.0, 1.0)
    packed = (
        ((colors[0] * 255).astype(np.uint32) << 16)
        | ((colors[1] * 255).astype(np.uint32) << 8)
        | (colors[2] * 255).astype(np.uint32)
    )
    cx = np.asarray(clip.cx)[idx]
    cy = np.asarray(clip.cy)[idx]
    qx = (np.clip((cx + 1.0) * 0.5, 0, 1) * 65535.0 + 0.5).astype(np.uint32)
    qy = (np.clip((cy + 1.0) * 0.5, 0, 1) * 65535.0 + 0.5).astype(np.uint32)

    # Independent numpy replica of geometry.pack_conic_u32 / pack_rgba_u32.
    MF12_K = (127 - 8) << 7  # minifloat window [2^-8, 2^24), geometry.py

    def mf12(x):
        bits = np.asarray(x, np.float32).view(np.uint32)
        b16 = (bits + 0x7FFF + ((bits >> 16) & 1)) >> 16
        return np.clip(b16.astype(np.int64) - MF12_K, 0, 4095).astype(np.uint32)

    def mf12_dec(q):
        return ((q + np.uint32(MF12_K)) << np.uint32(16)).view(np.float32)

    qa = mf12(np.asarray(clip.con_a)[idx])
    qc = mf12(np.asarray(clip.con_c)[idx])
    rho = np.asarray(clip.con_b)[idx] / np.maximum(
        np.sqrt(mf12_dec(qa).astype(np.float64) * mf12_dec(qc)), 1e-30
    )
    q_rho = np.clip(
        np.floor((rho + 1.0) * 127.5 + 0.5), 0.0, 255.0
    ).astype(np.uint32)
    conic = (qa << 20) | (qc << 8) | q_rho
    alpha8 = (
        np.clip(np.asarray(scene.opacities)[idx], 0.0, 1.0) * 255.0 + 0.5
    ).astype(np.uint32)
    rgba = (packed[idx] << 8) | alpha8
    want = np.stack(
        [
            ((qx << 16) | qy).astype(np.float64),
            conic.astype(np.float64),
            rgba.astype(np.float64),
        ]
    )
    np.testing.assert_array_equal(attrs[:, valid].astype(np.float64), want)


@pytest.mark.slow
def test_emit_production_no_pad_path_matches_fallback():
    """The production interleave path (splat count an exact PREP_BLK
    multiple: prefix rows derived in-kernel, trailing zero block) must
    produce the same pair multiset as the jnp.pad fallback path the
    small 256-padded CPU scenes exercise — including splats near the
    array end whose emit windows overrun into the pad block."""
    from collections import Counter

    from cudagaussianrenderer_tpu.ops.expand import PREP_BLK

    scene = random_scene(300, seed=4)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    config = RenderConfig(screen_size=128)

    def multiset(s):
        clip = project_splats(
            s.means, s.scales, s.quats, cam.camera_data(), config,
            opacities=s.opacities,
        )
        pairs = build_tile_pairs(
            clip, s.colors, s.opacities, config, 4096, interpret=True
        )
        k = np.asarray(pairs.keys[0]).astype(np.uint64)
        v = np.asarray(pairs.values)
        m = v >= 0
        return Counter(zip(k[m].tolist(), v[m].tolist()))

    fallback = multiset(scene.pad_to_multiple(256))      # n % PREP_BLK != 0
    prod = multiset(scene.pad_to_multiple(PREP_BLK))     # exact multiple
    assert len(fallback) > 0
    assert prod == fallback


@pytest.mark.slow
def test_center_sampled_runs_drop_only_centerless_tiles():
    """center_sampled_runs (the default) must emit a subset of the
    rect-overlap pair set, and every dropped tile must contain NO pixel
    center inside the splat's ellipse — i.e. only sub-output-floor
    grazers are dropped (f64 check over all 256 pixel centers)."""
    from cudagaussianrenderer_tpu.ops.binning import splat_row_packs

    scene = random_scene(400, seed=13)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cfg_c = RenderConfig(screen_size=256)
    cfg_r = RenderConfig(screen_size=256, center_sampled_runs=False)

    def pair_set(cfg):
        clip = project_splats(
            scene.means, scene.scales, scene.quats, cam.camera_data(), cfg,
            opacities=scene.opacities,
        )
        pairs = build_tile_pairs(
            clip, scene.colors, scene.opacities, cfg, 16384, interpret=True
        )
        k = np.asarray(pairs.keys[0])
        v = np.asarray(pairs.values)
        m = v >= 0
        return clip, set(
            zip(v[m].tolist(), (k[m] >> DEPTH_BITS_PACKED).tolist())
        )

    clip, centered = pair_set(cfg_c)
    _, rect = pair_set(cfg_r)
    dropped = rect - centered
    # Ignore tall-rect full-width fallthrough rows (identical in both
    # modes) by construction; the subset relation can only be violated
    # by the run formulas themselves.
    assert len(centered - rect) == 0
    assert len(dropped) > 0  # the fixture must exercise the cut

    cx = np.asarray(clip.cx, np.float64)
    cy = np.asarray(clip.cy, np.float64)
    ct = np.asarray(clip.cos_t, np.float64)
    st = np.asarray(clip.sin_t, np.float64)
    e0 = np.maximum(np.asarray(clip.e0, np.float64), 1e-12)
    e1 = np.maximum(np.asarray(clip.e1, np.float64), 1e-12)
    ts = cfg_c.tile_size
    tps = cfg_c.tiles_per_screen
    px = np.arange(ts)
    gx, gy = np.meshgrid(px, px)
    for splat, tile in dropped:
        tx, ty = tile % tps, tile // tps
        pcx = (tx * ts + gx) * (2.0 / cfg_c.screen_w) - 1.0
        pcy = (ty * ts + gy) * (2.0 / cfg_c.screen_h) - 1.0
        dx, dy = pcx - cx[splat], pcy - cy[splat]
        u = (dx * ct[splat] + dy * st[splat]) / e0[splat]
        v = (dy * ct[splat] - dx * st[splat]) / e1[splat]
        # No pixel center inside the ellipse (small f32->f64 slack).
        assert (u * u + v * v).min() > 1.0 - 1e-3, (splat, tile)
