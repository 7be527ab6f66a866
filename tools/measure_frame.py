#!/usr/bin/env python
"""Localize the fused-frame overhead (round 3): the per-stage scans sum
to ~4 ms less than the fused whole-frame time.  Times progressively
truncated frame pipelines under the same scan-amortized method to find
where the extra cost sits.

Method per docs/PERF_NOTES.md: scan of 8 salted reps, best-of-3,
dispatch baseline subtracted.
"""

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

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
from cudagaussianrenderer_tpu.ops.raster import (
    pack_pair_data,
    rasterize_tiles,
    tiles_to_image,
)
from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

REPS = 8
CAPACITY = 4_182_016


def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        t0 = time.perf_counter()
        np.asarray(fn(jnp.float32(0.0), *args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for it in range(1, 4):
            t0 = time.perf_counter()
            out = fn(jnp.float32(it), *args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / REPS
        print(f"{name:44s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = RenderConfig(screen_size=1024)
    scene = random_scene(
        1_000_000, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0
    ).pad_to_multiple(256)
    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data()
    cam = jax.tree.map(jnp.asarray, cam)

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    def net(ms):
        return None if ms is None or base is None else round(ms - base, 3)

    def salted_cam(s, c):
        return dict(c, view=c["view"].at[0, 3].add(s * 1e-6))

    def upto_clip(s, sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, salted_cam(s, c), cfg)
        return jnp.sum(clip.cx[:128]) * 1e-9

    def upto_bin(s, sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, salted_cam(s, c), cfg)
        p = build_tile_pairs(clip, sc.colors, sc.opacities, cfg, CAPACITY)
        return (
            jnp.sum(p.keys[0][:128].astype(jnp.float32))
            + sum(jnp.sum(a[:128].astype(jnp.float32)) for a in p.attrs)
        ) * 1e-9

    def upto_sort(s, sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, salted_cam(s, c), cfg)
        p = build_tile_pairs(clip, sc.colors, sc.opacities, cfg, CAPACITY)
        keys, _, attrs = sort_pairs(p, stable=cfg.stable_sort)
        return (
            jnp.sum(keys[0][:128].astype(jnp.float32))
            + sum(jnp.sum(a[:128].astype(jnp.float32)) for a in attrs)
        ) * 1e-9

    def upto_ranges(s, sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, salted_cam(s, c), cfg)
        p = build_tile_pairs(clip, sc.colors, sc.opacities, cfg, CAPACITY)
        keys, _, attrs = sort_pairs(p, stable=cfg.stable_sort)
        starts, counts = tile_ranges(keys, cfg)
        pd = pack_pair_data(attrs, cfg.raster_chunk)
        return (
            jnp.sum(starts[:128].astype(jnp.float32))
            + jnp.sum(pd[:, :128].astype(jnp.float32))
        ) * 1e-9

    def full(s, sc, c):
        clip = project_splats(sc.means, sc.scales, sc.quats, salted_cam(s, c), cfg)
        p = build_tile_pairs(clip, sc.colors, sc.opacities, cfg, CAPACITY)
        keys, _, attrs = sort_pairs(p, stable=cfg.stable_sort)
        starts, counts = tile_ranges(keys, cfg)
        pd = pack_pair_data(attrs, cfg.raster_chunk)
        tiles = rasterize_tiles(pd, starts, counts, cfg)
        img = tiles_to_image(tiles, cfg)
        return jnp.sum(img[::64, ::64, 0].astype(jnp.float32))

    for name, body in (
        ("frame upto clip", upto_clip),
        ("frame upto binning", upto_bin),
        ("frame upto sort", upto_sort),
        ("frame upto ranges+pack", upto_ranges),
        ("frame full", full),
    ):
        m = timed(name, scanned(body), scene, cam)
        if m is not None:
            print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # ---- same-process FULL-FRAME A/Bs of the round-3 session-3 changes
    # (between-process stage numbers swing +-1 ms; only these deltas are
    # trustworthy).
    import cudagaussianrenderer_tpu.ops.expand as expand_mod
    import cudagaussianrenderer_tpu.ops.raster as raster_mod

    variants = (
        ("full: emit bps=1 W=384 (prior emit)", dict(bps=1, window=384)),
        ("full: raster SCAN_LIMBS=2 (prior scan)", dict(limbs=2)),
        ("full: raster chunk=256", dict(chunk=256)),
    )
    for name, v in variants:
        expand_mod.BLOCKS_PER_STEP = v.get("bps", 4)
        expand_mod.WINDOW = v.get("window", 512)
        raster_mod.SCAN_LIMBS = v.get("limbs", 1)
        vcfg = RenderConfig(screen_size=1024, raster_chunk=v.get("chunk", 128))

        def vfull(s, sc, c, _cfg=vcfg):
            clip = project_splats(
                sc.means, sc.scales, sc.quats, salted_cam(s, c), _cfg
            )
            p = build_tile_pairs(clip, sc.colors, sc.opacities, _cfg, CAPACITY)
            keys, _, attrs = sort_pairs(p, stable=_cfg.stable_sort)
            starts, counts = tile_ranges(keys, _cfg)
            pd = pack_pair_data(attrs, _cfg.raster_chunk)
            tiles = rasterize_tiles(pd, starts, counts, _cfg)
            img = tiles_to_image(tiles, _cfg)
            return jnp.sum(img[::64, ::64, 0].astype(jnp.float32))

        m = timed(name, scanned(vfull), scene, cam)
        if m is not None:
            print(f"{'':44s} net {net(m):9.3f} ms", flush=True)
    expand_mod.BLOCKS_PER_STEP = 4
    expand_mod.WINDOW = 512
    raster_mod.SCAN_LIMBS = 1


if __name__ == "__main__":
    main()
