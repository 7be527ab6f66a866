#!/usr/bin/env python
"""Round-3 follow-up: WHY is the in-frame sort ~3.3 ms slower than the
isolated sort (14.6 vs 11.3 ms at 4.33M x 4 operands)?

Hypotheses tested, all as scan-amortized bodies ending right after the
sort (consuming every output operand):
  A. baseline:     sort directly on the emit kernel's output slices
  B. barrier:      jax.lax.optimization_barrier between emit and sort
  C. forced copy:  key ^ salt and attrs ^ 0-valued salt (fresh buffers,
                   no producer fusion into the sort)
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

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    def net(ms):
        return None if ms is None or base is None else round(ms - base, 3)

    def build(s, sc, c):
        camd = dict(c, view=c["view"].at[0, 3].add(s * 1e-6))
        clip = project_splats(sc.means, sc.scales, sc.quats, camd, cfg)
        return build_tile_pairs(clip, sc.colors, sc.opacities, cfg, CAPACITY)

    def consume(ops):
        return sum(jnp.sum(o[:128].astype(jnp.float32)) for o in ops) * 1e-9

    def body_direct(s, sc, c):
        p = build(s, sc, c)
        out = jax.lax.sort((*p.keys, *p.attrs), num_keys=1, is_stable=False)
        return consume(out)

    def body_barrier(s, sc, c):
        p = build(s, sc, c)
        ops = jax.lax.optimization_barrier((*p.keys, *p.attrs))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return consume(out)

    def body_copy(s, sc, c):
        p = build(s, sc, c)
        z = s.astype(jnp.uint32) & jnp.uint32(0)  # data-dependent zero
        ops = tuple(o ^ z for o in (*p.keys, *p.attrs))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return consume(out)

    for name, body in (
        ("emit+sort direct", body_direct),
        ("emit+sort barrier", body_barrier),
        ("emit+sort xor-copy", body_copy),
    ):
        m = timed(name, scanned(body), scene, cam)
        if m is not None:
            print(f"{'':44s} net {net(m):9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
