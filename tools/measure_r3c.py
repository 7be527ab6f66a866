#!/usr/bin/env python
"""Round-3 cleanup measurements (run on the real TPU).

1. Emit kernel alone: WINDOW 256 vs 512 under the round-3 single-DMA
   window + w0/w1 cross-block prefetch (512 halves the DMA issue count
   at the same match-matrix area).
2. In-frame sort penalty bisection: is the penalty tied to CONSUMING the
   emit output (ruled out for fusion/aliasing by measure_frame2), or to
   merely EXECUTING a Pallas kernel before the sort in the same program?
     a. sort alone on settled pair arrays          (isolated re-baseline)
     b. emit kernel + sort of the SETTLED arrays   (independent sort)
     c. emit kernel + sort of the emit output      (the frame path)
   b ~ a+emit => no interaction (penalty specific to c's data path);
   b ~ c => any preceding kernel perturbs the sort (scheduler effect).
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

import cudagaussianrenderer_tpu.ops.expand as expand_mod
from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.binning import (
    build_tile_pairs,
    pack_rgb_u32,
    quantize_depth,
    splat_row_packs,
    splat_tile_rects,
)
from cudagaussianrenderer_tpu.ops.projection import project_splats

REPS = 8
CAPACITY = 4_325_376


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

    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg)
    )(scene, cam)

    def make_inputs(cl, sc):
        rects = splat_tile_rects(cl, cfg)
        packs = splat_row_packs(cl, rects, cfg)
        incl = jnp.cumsum(packs.counts)
        qdepth = quantize_depth(cl.clip_z, 19)
        rgb = pack_rgb_u32(sc.colors)
        n = packs.counts.shape[0]
        geom = (
            (rects.x0.astype(jnp.float32) * 256.0 + rects.y0.astype(jnp.float32))
            * 256.0
            + rects.w.astype(jnp.float32)
        )
        rows = (
            geom, qdepth.astype(jnp.float32),
            cl.cx, cl.cy, cl.con_a, cl.con_b, cl.con_c,
            rgb.astype(jnp.float32), sc.opacities, *packs.packs,
        )
        return rows, incl

    rows, incl = jax.jit(make_inputs)(clip, scene)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, cfg, CAPACITY)
    )(clip, scene)
    settled = tuple(jax.device_put(np.asarray(o)) for o in (*pairs.keys, *pairs.attrs))
    jax.block_until_ready((rows, incl, settled))

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    def net(ms):
        return None if ms is None or base is None else round(ms - base, 3)

    def consume(ops):
        return sum(jnp.sum(o[:128].astype(jnp.float32)) for o in ops) * 1e-9

    # ---- 1. emit kernel alone, WINDOW sweep ----
    def kernel_body(s, rows, incl):
        r = (*rows[:2], rows[2] + s * 1e-9, *rows[3:])
        out = expand_mod.emit_pairs(r, incl, CAPACITY, cfg)
        return jnp.sum(out[0][:128].astype(jnp.float32)) * 1e-9

    for window in (256, 512):
        expand_mod.WINDOW = window
        m = timed(f"emit kernel only W={window}", scanned(kernel_body), rows, incl)
        if m is not None:
            print(f"{'':44s} net {net(m):9.3f} ms", flush=True)
    expand_mod.WINDOW = 256

    # ---- 2. sort interaction bisection ----
    def sort_alone(s, *ops):
        k = ops[0] ^ s.astype(jnp.uint32)
        out = jax.lax.sort((k, *ops[1:]), num_keys=1, is_stable=False)
        return consume(out)

    m = timed("sort alone (settled arrays)", scanned(sort_alone), *settled)
    if m is not None:
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    def emit_plus_indep_sort(s, rows, incl, *ops):
        r = (*rows[:2], rows[2] + s * 1e-9, *rows[3:])
        emitted = expand_mod.emit_pairs(r, incl, CAPACITY, cfg)
        k = ops[0] ^ s.astype(jnp.uint32)
        out = jax.lax.sort((k, *ops[1:]), num_keys=1, is_stable=False)
        return consume(out) + jnp.sum(emitted[0][:128].astype(jnp.float32)) * 1e-9

    m = timed("emit + INDEPENDENT sort", scanned(emit_plus_indep_sort),
              rows, incl, *settled)
    if m is not None:
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    def emit_plus_own_sort(s, rows, incl):
        r = (*rows[:2], rows[2] + s * 1e-9, *rows[3:])
        out8 = expand_mod.emit_pairs(r, incl, CAPACITY, cfg)
        ops = (out8[0], out8[3], out8[4], out8[5])
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return consume(out)

    m = timed("emit + sort of its output", scanned(emit_plus_own_sort), rows, incl)
    if m is not None:
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
