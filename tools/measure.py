#!/usr/bin/env python
"""Consolidated TPU measurement harness (replaces the round-scoped
measure_r*.py scratch scripts; their recorded numbers live in
docs/PERF_NOTES.md).

Method (docs/PERF_NOTES.md "benchmarking rules"):
  * device-side lax.scan over REPS salted reps per dispatch (salt
    something the body CONSUMES or XLA hoists it),
  * best-of-3 outer reps, np.asarray to force materialization
    (block_until_ready is unreliable through the axon tunnel),
  * trivial-dispatch baseline subtracted for "net" numbers,
  * consume >= 1 element of EVERY lax.sort output operand (XLA DCEs
    unused payload operands and you time a key-only sort),
  * never reshape a flat sort to [1, n] (pathological lowering).

Usage: python tools/measure.py <subcommand> [...]
  sort      flat vs batched pair-sort shapes + operand-count sweep
  gather    2-op (key, idx) sort + post-sort payload gather vs 4-op
  shardsim  one shard of the D-chip pipeline measured on one chip
  shardbal  same, with balanced_bands per-frame equal-work boundaries
  reorder   splat re-order cost (band-sort prerequisite) + cumsum costs
  extents   opacity-aware extents A/B: candidates + frame time
  emit      emit kernel A/B (window / blocks-per-step / limb probe)
  raster    raster chunk + scan-limb variants
  bandsort  flat vs band-segmented pipeline A/B (G sweep, reorder
            on/off, stale-order locality)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
except Exception:
    pass

REPS = 8

# Bench workload (must match bench.py): 1M splats at the reference's
# Lilly Boquet density (~4 exact pairs/splat), 1024^2, orbit camera 0.
BENCH_N = 1_000_000
BENCH_CAPACITY = 4_587_520  # round-3 bench bucket at this workload


def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        t0 = time.perf_counter()
        np.asarray(fn(jnp.float32(0.0), *args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for it in range(1, 4):
            t0 = time.perf_counter()
            np.asarray(fn(jnp.float32(it), *args))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / REPS
        print(f"{name:44s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def scanned(body):
    def fn(salt, *args):
        def step(c, s):
            return c + body(s, *args), 0

        c, _ = jax.lax.scan(
            step, jnp.float32(0.0), salt + jnp.arange(REPS, dtype=jnp.float32)
        )
        return c

    return fn


def dispatch_baseline():
    return timed(
        "dispatch baseline",
        scanned(lambda s, x: jnp.sum(x) + s),
        jnp.ones((8, 128), jnp.float32),
    )


def bench_scene(n=BENCH_N, sh_degree=0):
    from cudagaussianrenderer_tpu.models.scene import random_scene

    return random_scene(
        n, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0,
        sh_degree=sh_degree,
    ).pad_to_multiple(4096)


def bench_camera(scene, idx=0, n=8):
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras

    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, n)[idx].camera_data()
    return jax.tree.map(jnp.asarray, cam)


# ---------------------------------------------------------------------------
# sort: flat vs batched shapes, operand count
# ---------------------------------------------------------------------------


def cmd_sort(capacity=BENCH_CAPACITY):
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 31, capacity, dtype=np.uint32))
    payloads = [
        jnp.asarray(rng.integers(0, 1 << 32, capacity, dtype=np.uint32))
        for _ in range(3)
    ]
    base = dispatch_baseline()

    def net(ms):
        return ms - base if (ms is not None and base is not None) else float("nan")

    def flat_body(s, k, *ps):
        out = jax.lax.sort(
            (k ^ s.astype(jnp.uint32), *ps), num_keys=1, is_stable=False
        )
        return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

    m = timed(f"flat 4-op sort @{capacity}", scanned(flat_body), key, *payloads)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    for g in (8, 16, 32, 64, 128):
        seg = capacity // g
        if seg * g != capacity:
            continue
        k2 = key.reshape(g, seg)
        p2 = [p.reshape(g, seg) for p in payloads]

        def body(s, k, *ps):
            out = jax.lax.sort(
                (k ^ s.astype(jnp.uint32), *ps),
                dimension=1, num_keys=1, is_stable=False,
            )
            return sum(o[0, 0].astype(jnp.float32) * 1e-9 for o in out)

        m = timed(f"batched [{g},{seg}] 4-op", scanned(body), k2, *p2)
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)


# ---------------------------------------------------------------------------
# shardsim: one shard of the multi-chip pipeline, measured on one chip
# ---------------------------------------------------------------------------


def cmd_shardsim():
    """Measure the per-device program of the tile-row-sharded pipeline
    (parallel/distributed._render_shard) on the ONE available chip.

    A D-chip frame is limited by its slowest shard: the WORST tile-row
    band (probed over the orbit like bench.py sizes capacity).  This
    body reproduces that shard's compute exactly, minus the collectives:

      * projection runs over the FULL splat set here (the real shard
        projects N/D then all-gathers) — a deliberate overestimate;
      * the all-gather itself cannot run on one chip; its transport is
        bounded analytically below and printed alongside.

    Projected D-chip frame time = measured worst-shard ms + the gather
    bound; this replaces the round-3 'sort-arithmetic' extrapolation
    with a measured per-shard program (VERDICT missing #5).
    """
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.ops.binning import (
        build_tile_pairs,
        splat_row_packs,
        splat_tile_rects,
    )
    from cudagaussianrenderer_tpu.ops.projection import project_splats
    from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
    from cudagaussianrenderer_tpu.ops.raster import (
        pack_pair_data,
        rasterize_tiles,
        tiles_to_image,
    )
    from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

    scene = bench_scene()
    config = RenderConfig()
    n_frames = 8
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, n_frames)
    cam_stack = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c.camera_data() for c in cams],
    )
    base = dispatch_baseline()

    # ICI transport bound: the all-gather moves the clip SoA (10 rows) +
    # colors (3) + opacities (1) = 14 f32/splat; each device receives
    # (D-1)/D of it.  v5e ICI ~45 GB/s one-way per link (public
    # scaling-book figure); XLA can overlap the gather with projection,
    # so this is an upper bound on the exposed cost.
    bytes_per_splat = 14 * 4

    def probe_band(cam, lo, hi):
        clip = project_splats(
            scene.means, scene.scales, scene.quats, cam, config,
            opacities=scene.opacities,
        )
        rects = splat_tile_rects(clip, config, row_band=(lo, hi))
        return jnp.sum(splat_row_packs(clip, rects, config).counts)

    for n_dev in (2, 4):
        rows = config.tiles_y // n_dev
        worst = (0, 0)  # (candidates, band_lo)
        for b in range(n_dev):
            pb = jax.jit(functools.partial(probe_band, lo=b * rows, hi=(b + 1) * rows))
            for i in range(n_frames):
                c = int(np.asarray(pb(jax.tree.map(lambda x: x[i], cam_stack))))
                worst = max(worst, (c, b * rows))
        cand, lo = worst
        capacity = -(-int(cand * 1.005) // 1024) * 1024
        band_tiles = rows * config.tiles_x

        def frame(s, scene, cam):
            view = cam["view"].at[0, 3].add(s * 1e-6)
            cam = dict(cam, view=view)
            clip = project_splats(
                scene.means, scene.scales, scene.quats, cam, config,
                opacities=scene.opacities,
            )
            pairs = build_tile_pairs(
                clip, scene.colors, scene.opacities, config, capacity,
                row_band=(lo, lo + rows),
            )
            keys, _, attrs = sort_pairs(pairs, stable=config.stable_sort)
            starts, counts = tile_ranges(keys, config)
            starts_b = jax.lax.dynamic_slice(starts, (lo * config.tiles_x,), (band_tiles,))
            counts_b = jax.lax.dynamic_slice(counts, (lo * config.tiles_x,), (band_tiles,))
            tiles = rasterize_tiles(
                pack_pair_data(attrs, config.raster_chunk),
                starts_b, counts_b, config,
                num_tiles=band_tiles, tile_row_offset=lo,
            )
            img = tiles_to_image(tiles, config)
            return jnp.sum(img[::64, ::64, 0].astype(jnp.float32))

        m = timed(
            f"worst shard of {n_dev} (band row {lo}, cap {capacity})",
            scanned(frame), scene, jax.tree.map(lambda x: x[0], cam_stack),
        )
        net = m - base if (m is not None and base is not None) else float("nan")
        gather_ms = (
            scene.padded_count * bytes_per_splat * (n_dev - 1) / n_dev / 45e9 * 1e3
        )
        total = net + gather_ms
        print(
            f"{'':44s} net {net:7.3f} ms + gather bound {gather_ms:5.3f} ms"
            f" -> projected {n_dev}-chip {total:6.3f} ms/frame"
            f" ({1e3 / total:5.1f} FPS)",
            flush=True,
        )


# ---------------------------------------------------------------------------
# shardbal: the balanced-bands worst shard, measured on one chip
# ---------------------------------------------------------------------------


def cmd_shardbal():
    """Measure the per-device program of config.balanced_bands=True
    (parallel/distributed._render_shard, balanced branch) on one chip.

    Same method as ``shardsim`` — reproduce the worst device's compute
    exactly, bound the collectives analytically — but with the per-frame
    equal-work band boundaries traced INSIDE the body (their histogram +
    cumsum cost is part of the shard), the 2x-uniform static raster
    buffer with masked out-of-band tiles, and the extra psum_scatter
    that reassembles uniform row sharding (bounded analytically: one
    (n-1)/n uint8 frame over ICI).  The delta vs ``shardsim`` is the
    measured skew-tax recovery at D devices.  The frame body is the
    shared parallel.distributed.render_band — the same code the
    shard_map program runs per device (incl. the pre-scatter band
    placement).
    """
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.ops.binning import (
        splat_row_packs,
        splat_tile_rects,
    )
    from cudagaussianrenderer_tpu.ops.projection import project_splats
    from cudagaussianrenderer_tpu.parallel.distributed import (
        _band_bounds,
        _band_weights,
        render_band,
    )

    scene = bench_scene()
    config = RenderConfig()
    n_frames = 8
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, n_frames)
    cam_stack = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c.camera_data() for c in cams],
    )
    base = dispatch_baseline()
    bytes_per_splat = 14 * 4  # clip SoA (10) + colors (3) + opacity (1)
    frame_bytes = config.screen_h * config.screen_w * 4  # RGBA u8

    for n_dev in (2, 4):
        rows = config.tiles_y // n_dev
        max_rows = min(config.tiles_y, 2 * rows)

        def probe(cam):
            clip = project_splats(
                scene.means, scene.scales, scene.quats, cam, config,
                opacities=scene.opacities,
            )
            bounds = _band_bounds(_band_weights(clip, config), n_dev, max_rows)

            def count(j):
                rects = splat_tile_rects(
                    clip, config, row_band=(bounds[j], bounds[j + 1])
                )
                return jnp.sum(splat_row_packs(clip, rects, config).counts)

            return jnp.stack([count(j) for j in range(n_dev)])

        pb = jax.jit(probe)
        worst = (0, 0)  # (candidates, device index)
        for i in range(n_frames):
            c = np.asarray(pb(jax.tree.map(lambda x: x[i], cam_stack)))
            j = int(c.argmax())
            worst = max(worst, (int(c[j]), j))
        cand, dev = worst
        capacity = -(-int(cand * 1.02) // 1024) * 1024

        def frame(s, scene, cam):
            view = cam["view"].at[0, 3].add(s * 1e-6)
            cam = dict(cam, view=view)
            full, _ = render_band(scene, cam, config, capacity, n_dev, dev)
            return jnp.sum(full[::64, ::64, 0].astype(jnp.float32))

        m = timed(
            f"balanced worst shard of {n_dev} (dev {dev}, cap {capacity})",
            scanned(frame), scene, jax.tree.map(lambda x: x[0], cam_stack),
        )
        net = m - base if (m is not None and base is not None) else float("nan")
        gather_ms = (
            scene.padded_count * bytes_per_splat * (n_dev - 1) / n_dev / 45e9 * 1e3
        )
        scatter_ms = frame_bytes * (n_dev - 1) / n_dev / 45e9 * 1e3
        total = net + gather_ms + scatter_ms
        print(
            f"{'':44s} net {net:7.3f} ms + gather {gather_ms:5.3f}"
            f" + scatter {scatter_ms:5.3f} ms"
            f" -> projected {n_dev}-chip {total:6.3f} ms/frame"
            f" ({1e3 / total:5.1f} FPS)",
            flush=True,
        )


# ---------------------------------------------------------------------------
# gather: 2-op (key, idx) sort + post-sort payload gather vs 4-op sort
# ---------------------------------------------------------------------------


def cmd_gather(capacity=BENCH_CAPACITY):
    """The one sort formulation round 3 rejected on reasoning alone
    ("general permutation has no TPU primitive"): sort only (key, pair
    index) — 2 operands instead of 4 — then apply the permutation to the
    3 packed attribute operands with an XLA gather.  Wins only if the
    4.59M-random-index gather costs less than the ~2 payload operands it
    removes from the sort (~3-4 ms by the round-3 operand cost model).
    Measured pieces: production 4-op sort, 2-op sort, the gather alone,
    and the fused 2-op + gather body; plus an i32-vs-u32 key-type probe
    (cost expected identical — comparison-network sort).
    """
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 31, capacity, dtype=np.uint32))
    payloads = [
        jnp.asarray(rng.integers(0, 1 << 32, capacity, dtype=np.uint32))
        for _ in range(3)
    ]
    idx = jnp.arange(capacity, dtype=jnp.uint32)
    base = dispatch_baseline()

    def net(ms):
        return ms - base if (ms is not None and base is not None) else float("nan")

    def flat4(s, k, *ps):
        out = jax.lax.sort(
            (k ^ s.astype(jnp.uint32), *ps), num_keys=1, is_stable=False
        )
        return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

    m = timed(f"flat 4-op sort @{capacity}", scanned(flat4), key, *payloads)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    def flat2(s, k, i):
        out = jax.lax.sort(
            (k ^ s.astype(jnp.uint32), i), num_keys=1, is_stable=False
        )
        return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

    m = timed("flat 2-op (key, idx) sort", scanned(flat2), key, idx)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # Gather alone: a random permutation applied to 3 u32 rows.  The
    # permutation is data (pre-shuffled), salted by a cheap index rotate
    # so the runtime can't memoize while indices stay in-range.
    perm = jnp.asarray(rng.permutation(capacity).astype(np.int32))

    def gather3(s, pm, *ps):
        pm = (pm + s.astype(jnp.int32)) % capacity
        return sum(p[pm][0].astype(jnp.float32) * 1e-9 for p in ps)

    m = timed("gather 3 u32 rows by random perm", scanned(gather3), perm, *payloads)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    def sort2_gather(s, k, i, *ps):
        sk, si = jax.lax.sort(
            (k ^ s.astype(jnp.uint32), i), num_keys=1, is_stable=False
        )
        g = si.astype(jnp.int32)
        return sk[0].astype(jnp.float32) * 1e-9 + sum(
            p[g][0].astype(jnp.float32) * 1e-9 for p in ps
        )

    m = timed("2-op sort + 3-row gather (fused)", scanned(sort2_gather),
              key, idx, *payloads)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # Key-dtype probe: i32 vs u32 keys (same bits, reinterpreted).
    key_i = jax.lax.bitcast_convert_type(key >> 1, jnp.int32)

    def flat4_i(s, k, *ps):
        out = jax.lax.sort(
            (k ^ s.astype(jnp.int32), *ps), num_keys=1, is_stable=False
        )
        return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

    m = timed("flat 4-op sort, i32 key", scanned(flat4_i), key_i, *payloads)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)


# ---------------------------------------------------------------------------
# reorder: splat re-order by center tile row (band-sort prerequisite)
# ---------------------------------------------------------------------------


def cmd_reorder(n=BENCH_N):
    """Cost of sorting the raw scene columns by a [0,64) band key, plus
    the banded-count building blocks ([G,N] count matrix + axis-1
    cumsum).  The re-order is a locality optimization only — band-
    clamped emission is exact for ANY splat order — so it can also be
    amortized across frames."""
    rng = np.random.default_rng(0)
    base = dispatch_baseline()

    def net(ms):
        return ms - base if (ms is not None and base is not None) else float("nan")

    band = jnp.asarray(rng.integers(0, 64, n, dtype=np.uint32))
    f32cols = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(6)]
    u32cols = [
        jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32)) for _ in range(2)
    ]

    # Scene re-order: key + means(3) + scales(3) + quat + rgba = 9 ops.
    def body9(s, k, *cols):
        out = jax.lax.sort(
            (k ^ s.astype(jnp.uint32), *cols), num_keys=1, is_stable=False
        )
        return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

    m = timed(f"reorder 1key+8payload @{n}", scanned(body9), band, *f32cols, *u32cols)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # (key, idx) only — floor for a gather-based (non-viable) plan.
    def body2(s, k, i):
        out = jax.lax.sort((k ^ s.astype(jnp.uint32), i), num_keys=1, is_stable=False)
        return out[0][0].astype(jnp.float32) * 1e-9 + out[1][0].astype(jnp.float32)

    m = timed(f"reorder 1key+1idx @{n}", scanned(body2), band,
              jnp.arange(n, dtype=jnp.uint32))
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # Banded-count building blocks.
    counts = jnp.asarray(rng.integers(0, 8, n).astype(np.float32))
    y0 = jnp.asarray(rng.integers(0, 64, n).astype(np.float32))
    for g in (8, 16, 32, 64):
        def body_cnt(s, c, y, _g=g):
            # count matrix: per-band in-band counts (select per band).
            rows_per = 64 // _g
            bids = jnp.floor(y / rows_per)
            mat = jnp.stack(
                [jnp.where(bids == float(b), c + s * 1e-9, 0.0) for b in range(_g)]
            )
            incl = jnp.cumsum(mat, axis=1)
            return jnp.sum(incl[:, -1]) * 1e-9

        m = timed(f"count-matrix+cumsum [{g},{n}]", scanned(body_cnt), counts, y0)
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)


# ---------------------------------------------------------------------------
# extents: opacity-aware extents A/B
# ---------------------------------------------------------------------------


def cmd_extents():
    import dataclasses

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.ops.binning import (
        splat_row_packs, splat_tile_rects,
    )
    from cudagaussianrenderer_tpu.ops.projection import project_splats
    from cudagaussianrenderer_tpu.render import render_frame

    scene = bench_scene()
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)
    base_cfg = RenderConfig(screen_size=1024, opacity_aware_extents=False)
    trunc_cfg = dataclasses.replace(base_cfg, opacity_aware_extents=True)

    for name, cfg in (("exact 3-sigma", base_cfg), ("opacity-aware", trunc_cfg)):
        def count(s, c, _cfg=cfg):
            clip = project_splats(
                s.means, s.scales, s.quats, c, _cfg, opacities=s.opacities
            )
            rects = splat_tile_rects(clip, _cfg)
            return jnp.sum(splat_row_packs(clip, rects, _cfg).counts)

        jc = jax.jit(count)
        per_cam = [int(jc(scene, c.camera_data())) for c in cams]
        print(f"{name:20s} candidates: max {max(per_cam)} "
              f"mean {sum(per_cam)//len(per_cam)} per-cam {per_cam}", flush=True)

    cap = -(-int(
        max(
            int(jax.jit(lambda s, c: jnp.sum(splat_row_packs(
                project_splats(s.means, s.scales, s.quats, c, base_cfg,
                               opacities=s.opacities),
                splat_tile_rects(project_splats(
                    s.means, s.scales, s.quats, c, base_cfg,
                    opacities=s.opacities), base_cfg), base_cfg).counts))(
                        scene, c.camera_data()))
            for c in cams
        ) * 1.02
    ) // 1024) * 1024

    cam0 = bench_camera(scene)
    for name, cfg in (("frame exact 3-sigma", base_cfg),
                      ("frame opacity-aware", trunc_cfg)):
        def body(s, sc, c, _cfg=cfg):
            c2 = dict(c, view=c["view"].at[0, 3].add(s * 1e-6))
            img, aux = render_frame(sc, c2, _cfg, cap)
            return (jnp.sum(img[::64, ::64, 0].astype(jnp.float32)) * 1e-9
                    + aux["num_pairs"].astype(jnp.float32) * 1e-12)

        timed(name, scanned(body), scene, cam0)


# ---------------------------------------------------------------------------
# emit: kernel-only A/B (window / blocks-per-step / limbs)
# ---------------------------------------------------------------------------


def cmd_emit():
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.ops import expand as expand_mod
    from cudagaussianrenderer_tpu.ops.binning import (
        build_tile_pairs, splat_row_packs, splat_tile_rects,
    )
    from cudagaussianrenderer_tpu.ops.expand import emit_pairs
    from cudagaussianrenderer_tpu.ops.geometry import pack_rgb_u32
    from cudagaussianrenderer_tpu.ops.projection import project_splats
    from cudagaussianrenderer_tpu.ops.binning import quantize_depth

    cfg = RenderConfig(screen_size=1024)
    scene = bench_scene()
    cam = bench_camera(scene)
    capacity = BENCH_CAPACITY
    base = dispatch_baseline()

    def net(ms):
        return ms - base if (ms is not None and base is not None) else float("nan")

    def make_inputs(clip, s):
        rects = splat_tile_rects(clip, cfg)
        packs = splat_row_packs(clip, rects, cfg)
        incl = jnp.cumsum(packs.counts)
        geom = (
            (rects.x0.astype(jnp.float32) * 256.0
             + rects.y0.astype(jnp.float32)) * 256.0
            + rects.w.astype(jnp.float32)
        )
        cols = (
            geom,
            quantize_depth(clip.clip_z, 19).astype(jnp.float32),
            clip.cx, clip.cy, clip.con_a, clip.con_b, clip.con_c,
            pack_rgb_u32(s.colors).astype(jnp.float32),
            s.opacities,
            *packs.packs,
        )
        return cols, incl

    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg,
                                    opacities=s.opacities)
    )(scene, cam)
    cols, incl = jax.jit(make_inputs)(clip, scene)
    jax.block_until_ready((cols, incl))

    def make_body(limbs):
        def body(s, cols, incl):
            c2 = (*cols[:2], cols[2] + s * 1e-9, *cols[3:])  # salt cx
            out = emit_pairs(c2, incl, capacity, cfg, unsafe_sel_limbs=limbs)
            return jnp.sum(out[0][:128].astype(jnp.float32)) * 1e-9

        return body

    for window, bps, limbs in ((512, 4, 3), (512, 4, 1), (256, 8, 3), (512, 1, 3)):
        expand_mod.WINDOW = window
        expand_mod.BLOCKS_PER_STEP = bps
        m = timed(f"emit kernel W={window} bps={bps} limbs={limbs}",
                  scanned(make_body(limbs)), cols, incl)
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)
    expand_mod.WINDOW = 512
    expand_mod.BLOCKS_PER_STEP = 4

    def full_body(s, sc, clip):
        clip2 = clip._replace(cx=clip.cx + s * 1e-9)
        p = build_tile_pairs(clip2, sc.colors, sc.opacities, cfg, capacity)
        return (p.keys[0][0].astype(jnp.float32) * 1e-9
                + p.num_pairs.astype(jnp.float32) * 1e-12)

    m = timed("build_tile_pairs end-to-end", scanned(full_body), scene, clip)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)


# ---------------------------------------------------------------------------
# raster: chunk + scan-limb variants
# ---------------------------------------------------------------------------


def cmd_raster():
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.ops import raster as raster_mod
    from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
    from cudagaussianrenderer_tpu.ops.projection import project_splats
    from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
    from cudagaussianrenderer_tpu.ops.raster import (
        pack_pair_data, rasterize_tiles, tiles_to_image,
    )
    from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

    scene = bench_scene()
    cam = bench_camera(scene)
    capacity = BENCH_CAPACITY
    base = dispatch_baseline()

    cfg = RenderConfig(screen_size=1024)
    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg,
                                    opacities=s.opacities)
    )(scene, cam)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, cfg, capacity)
    )(clip, scene)
    skeys, _, sattrs = jax.jit(lambda p: sort_pairs(p))(pairs)
    starts, counts = jax.jit(lambda k: tile_ranges(k, cfg))(skeys)
    jax.block_until_ready((sattrs, starts, counts))

    for name, chunk, limbs, quad_bf16 in (
        ("chunk=128 limbs=1 (prod)", 128, 1, False),
        ("chunk=128 limbs=1 QUAD_BF16", 128, 1, True),
        ("chunk=128 limbs=2", 128, 2, False),
        ("chunk=256 limbs=1", 256, 1, False),
    ):
        raster_mod.SCAN_LIMBS = limbs
        raster_mod.QUAD_BF16 = quad_bf16
        cfgv = RenderConfig(screen_size=1024, raster_chunk=chunk)

        def body(s, a0, a1, a2, st, ct, _cfg=cfgv, _ck=chunk):
            return jnp.sum(
                tiles_to_image(
                    rasterize_tiles(
                        pack_pair_data((a0, a1, a2 ^ s.astype(jnp.uint32)), _ck),
                        st, ct, _cfg,
                    ),
                    _cfg,
                )[::64, ::64, 0].astype(jnp.float32)
            )

        m = timed(name, scanned(body), *sattrs, starts, counts)
        if m is not None and base is not None:
            print(f"{'':44s} net {m - base:9.3f} ms", flush=True)
    raster_mod.SCAN_LIMBS = 1
    raster_mod.QUAD_BF16 = False


def cmd_bandsort():
    """Flat vs band-segmented (compaction two-pass) pipeline A/B.

    Measures, in one process (cross-process timing is +-1 ms noise):
      1. whole-frame flat vs banded at G in {4, 8, 16} — the banded
         path is order-independent (in-frame MXU band compaction), so
         one camera represents every camera;
      2. the isolated batched-sort win at the same shapes (cmd_sort
         covers the sweep; here the frame-level net decides keep/delete
         per the round-3/4 cost models in PERF_NOTES);
      3. the re-order experiment kept for reference (the rejected
         persistent-order design's cost).
    """
    import dataclasses

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.render import (
        render_frame, reorder_scene_by_tile_row, uniform_band_rows,
    )

    scene = bench_scene()
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 32)
    cam0 = jax.tree.map(jnp.asarray, cams[0].camera_data())
    flat_cfg = RenderConfig(screen_size=1024)
    capacity = BENCH_CAPACITY
    base = dispatch_baseline()

    def net(ms):
        return ms - base if (ms is not None and base is not None) else float("nan")


    def frame_body(cfg, band_rows):
        g = max(1, cfg.sort_bands)
        ccap = -(-3 * scene.padded_count // (g * 1024)) * (g * 1024)

        def body(s, sc, c):
            c2 = dict(c, view=c["view"].at[0, 3].add(s * 1e-6))
            img, aux = render_frame(
                sc, c2, cfg, capacity, band_rows=band_rows,
                compact_capacity=ccap,
            )
            return (jnp.sum(img[::64, ::64, 0].astype(jnp.float32)) * 1e-9
                    + aux["num_pairs"].astype(jnp.float32) * 1e-12)

        return body

    m = timed("frame flat", scanned(frame_body(flat_cfg, None)), scene, cam0)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    for g in (4, 8, 16):
        cfg = dataclasses.replace(flat_cfg, sort_bands=g)
        br = jnp.asarray(uniform_band_rows(cfg))
        m = timed(f"frame banded G={g}",
                  scanned(frame_body(cfg, br)), scene, cam0)
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # Isolated stage A/Bs at G=16 so frame-level deltas attribute:
    # banded buildTileList (compaction + banded emit) vs flat, and the
    # batched vs flat sort at the bench shapes.
    import dataclasses as _dc

    from cudagaussianrenderer_tpu.ops.banded import build_tile_pairs_banded
    from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
    from cudagaussianrenderer_tpu.ops.projection import project_splats

    cfg16 = _dc.replace(flat_cfg, sort_bands=16)
    br16 = jnp.asarray(uniform_band_rows(cfg16))
    ccap16 = -(-3 * scene.padded_count // (16 * 1024)) * (16 * 1024)
    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, flat_cfg,
                                    opacities=s.opacities)
    )(scene, cam0)
    jax.block_until_ready(clip.cx)

    def flat_build(s, cl, sc):
        p = build_tile_pairs(
            cl._replace(cx=cl.cx + s * 1e-9), sc.colors, sc.opacities,
            flat_cfg, capacity,
        )
        return (p.keys[0][0].astype(jnp.float32) * 1e-9
                + p.num_pairs.astype(jnp.float32) * 1e-12)

    m = timed("buildTileList flat", scanned(flat_build), clip, scene)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    def banded_build(s, cl, sc):
        p, totals, splats = build_tile_pairs_banded(
            cl._replace(cx=cl.cx + s * 1e-9), sc.colors, sc.opacities,
            cfg16, capacity, br16, compact_capacity=ccap16,
        )
        return (p.keys[0][0].astype(jnp.float32) * 1e-9
                + p.num_pairs.astype(jnp.float32) * 1e-12
                + jnp.max(splats).astype(jnp.float32) * 1e-12)

    m = timed("buildTileList banded G=16", scanned(banded_build), clip, scene)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    def reorder_body(s, sc, c):
        c2 = dict(c, view=c["view"].at[0, 3].add(s * 1e-6))
        out = reorder_scene_by_tile_row(sc, c2, flat_cfg)
        return (jnp.sum(out.means[:, :128]) * 1e-9
                + out.opacities[0] * 1e-12)

    m = timed("reorder_scene_by_tile_row @1M", scanned(reorder_body),
              scene, cam0)
    print(f"{'':44s} net {net(m):9.3f} ms", flush=True)




def cmd_trainscale():
    """Training-step scaling (docs/PERF_NOTES.md "training-step
    scaling"): single-view fit step at growing splat counts and
    resolutions, remat auto (the >=512^2 rows NEED it: stored blend
    residuals exceed HBM otherwise)."""
    import optax

    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer, round_capacity

    for n_splats, size in ((10_000, 256), (50_000, 512), (100_000, 512)):
        scene = random_scene(n_splats, seed=3)
        config = RenderConfig(screen_size=size)
        r = Renderer(scene, config)
        cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 1)[0]
        target = (np.asarray(r.render(cam))[..., :3]
                  .astype(np.float32) / 255.0)
        params = diff.from_scene(scene)
        cd = cam.camera_data()
        capacity = round_capacity(16 * n_splats)
        structure = diff.build_structure(params, cd, config, capacity)
        k_max = max(256, 2 * diff.max_tile_count(structure))
        tx = optax.adam(1e-3)

        @jax.jit
        def step(p, o, cam, t):
            def lf(p):
                img, _s = diff.render_diff(p, cam, config, capacity,
                                           k_max)
                e = img[..., :3] - t
                return (0.8 * jnp.mean(jnp.abs(e))
                        + 0.2 * (1.0 - diff.ssim(img[..., :3], t)))

            loss, g = jax.value_and_grad(lf)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        opt = tx.init(params)
        p2, o2, loss = step(params, opt, cd, target)
        _ = np.asarray(loss)
        p2, o2, loss = step(p2, o2, cd, target)
        _ = np.asarray(loss)
        t0 = time.perf_counter()
        n = 8
        for _i in range(n):
            p2, o2, loss = step(p2, o2, cd, target)
        _ = np.asarray(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"{n_splats} splats @ {size}^2: k_max={k_max} "
              f"capacity={capacity} step={1e3 * dt:.0f} ms "
              f"loss={float(np.asarray(loss)):.4f}", flush=True)


def cmd_dpstep():
    """Data-parallel training step on a 1-device mesh (the exact
    per-device program of an N-chip DP fit; docs/PERF_NOTES.md
    "DP training step").  Beware the second-call output-sharding
    recompile — steady state is what matters."""
    import optax
    from jax.sharding import Mesh

    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.parallel import train
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(3000, seed=7)
    config = RenderConfig(screen_size=256)
    r = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 4)
    targets = [np.asarray(r.render(c))[..., :3].astype(np.float32)
               / 255.0 for c in cams]
    cd = [c.camera_data() for c in cams]
    params = diff.random_init(2000, scene.bounds_min, scene.bounds_max,
                              seed=0, scale=0.05)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    tx = optax.adam(5e-3)
    step, _ = train.make_train_step_dp(config, 65536, 512, tx, mesh)
    opt = tx.init(params)
    batches = [train.view_batch(cd[i:i + 1], targets[i:i + 1])
               for i in range(4)]
    p2, o2, loss = step(params, opt, *batches[0])
    _ = np.asarray(loss)
    for i in range(4):  # settle (incl. the output-sharding recompile)
        p2, o2, loss = step(p2, o2, *batches[i])
    _ = np.asarray(loss)
    t0 = time.perf_counter()
    n = 16
    for i in range(n):
        p2, o2, loss = step(p2, o2, *batches[i % 4])
    _ = np.asarray(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"dp train step (mesh of 1): {1e3 * dt:.1f} ms/step, "
          f"loss {float(np.asarray(loss)):.4f}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    cmds = {
        "sort": cmd_sort,
        "gather": cmd_gather,
        "shardsim": cmd_shardsim,
        "shardbal": cmd_shardbal,
        "reorder": cmd_reorder,
        "extents": cmd_extents,
        "emit": cmd_emit,
        "raster": cmd_raster,
        "bandsort": cmd_bandsort,
        "trainscale": cmd_trainscale,
        "dpstep": cmd_dpstep,
    }
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which not in cmds:
        print(__doc__)
        sys.exit(1)
    cmds[which]()
