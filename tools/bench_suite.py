#!/usr/bin/env python
"""The five BASELINE.json benchmark configs (+ one diagnostic), one JSON line each.

    1. Procedural ~10k splats, SH deg-0 baked colors, 256x256, static camera
    2. .ply scene ~100k splats (synthesized + loaded through the importer),
       SH deg-0, 512x512, full pipeline, orbit
    3. View-dependent SH degree-3, 1024x1024, orbiting camera, 1M splats
    4. Kernel-variant raster: Gaussian vs Epanechnikov falloff (with the
       quantized-rotation unpack path, which every config exercises)
    5. Large scene (1M splats) animated fly-through with per-frame re-sort
       at 1024x1024 — the headline config, same as bench.py

Method identical to bench.py: device-side scan over frames with salted
cameras, best-of-3, dispatch amortized.  Run on the TPU:

    python tools/bench_suite.py            # all configs
    python tools/bench_suite.py 1 3        # a subset
"""

import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def throughput(scene, config, frames, *, static_camera=False):
    import jax
    import jax.numpy as jnp

    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.render import render_frame

    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, frames)
    if static_camera:
        cams = [cams[0]] * frames
    cam_stack = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c.camera_data() for c in cams],
    )

    # Capacity policy matches bench.py: probe the exact candidate count of
    # EVERY rendered camera (binning phase 1 only — a trivial compile),
    # 0.5% headroom for the 1e-6 view salt, 1024-slot grain.
    from cudagaussianrenderer_tpu.ops.binning import (
        splat_row_packs,
        splat_tile_rects,
    )
    from cudagaussianrenderer_tpu.ops.projection import project_splats

    def count_candidates(s, c):
        clip = project_splats(
            s.means, s.scales, s.quats, c, config, opacities=s.opacities
        )
        rects = splat_tile_rects(clip, config)
        return jnp.sum(splat_row_packs(clip, rects, config).counts)

    probe = jax.jit(count_candidates)
    probe_frames = [0] if static_camera else range(frames)
    candidates = max(
        int(np.asarray(probe(scene, jax.tree.map(lambda x: x[i], cam_stack))))
        for i in probe_frames
    )
    grain = 4096  # whole emit grid steps: odd block counts degrade bps to 1
    capacity = max(4096, -(-int(candidates * 1.005) // grain) * grain)

    def body(salt, scene, cam_stack):
        # Salt the view translation so every scan step really executes.
        view = cam_stack["view"].at[:, 0, 3].add(salt * 1e-6)
        cam_stack = dict(cam_stack, view=view)

        def step(carry, cam):
            img, aux = render_frame(scene, cam, config, capacity)
            return carry + jnp.sum(img[::32, ::32, 0].astype(jnp.float32)), aux[
                "num_pairs"
            ]

        return jax.lax.scan(step, jnp.float32(0.0), cam_stack)

    jfn = jax.jit(body)
    out = jfn(jnp.float32(0.0), scene, cam_stack)
    np.asarray(out[0])
    best = float("inf")
    for it in range(1, 4):
        t0 = time.perf_counter()
        out = jfn(jnp.float32(it), scene, cam_stack)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / frames
    return dict(
        ms_per_frame=round(ms, 3),
        fps=round(1e3 / ms, 2),
        pairs_per_frame=int(np.asarray(out[1]).mean()),
        capacity=capacity,
    )


def synth_ply(n, seed):
    """Synthesize a raw .ply through the exporter and load it back through
    the importer (exercising the full scene-ingestion path)."""
    from cudagaussianrenderer_tpu.models.scene import SH_C0, random_scene
    from cudagaussianrenderer_tpu.ply import load_gaussian_ply, write_gaussian_ply
    from cudagaussianrenderer_tpu.utils.quantize import decode_quat_xyzw

    scene = random_scene(n, seed=seed, min_scale=0.002, max_scale=0.053)
    opac = np.clip(np.asarray(scene.opacities), 1e-6, 1 - 1e-6)
    xyzw = decode_quat_xyzw(np.asarray(scene.quats))
    buf = io.BytesIO()
    write_gaussian_ply(
        buf,
        np.asarray(scene.means).T,
        np.log(np.asarray(scene.scales).T),
        xyzw[:, [3, 0, 1, 2]],
        np.log(opac / (1.0 - opac)),
        (np.asarray(scene.colors).T - 0.5) / SH_C0,
    )
    buf.seek(0)
    return load_gaussian_ply(buf)


def main():
    which = {int(a) for a in sys.argv[1:]} or {1, 2, 3, 4, 5, 6}

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.scene import random_scene

    if 1 in which:
        scene = random_scene(10_000, seed=0, min_scale=0.002, max_scale=0.053)
        r = throughput(scene, RenderConfig(screen_size=256), 16, static_camera=True)
        print(json.dumps(dict(config="1_procedural_10k_256px_static", **r)))

    if 2 in which:
        scene = synth_ply(100_000, seed=1)
        r = throughput(scene, RenderConfig(screen_size=512), 16)
        print(json.dumps(dict(config="2_ply_100k_512px_orbit", **r)))

    if 3 in which:
        scene = random_scene(
            1_000_000, seed=0, min_scale=0.002, max_scale=0.053, sh_degree=3
        )
        r = throughput(scene, RenderConfig(screen_size=1024), 8)
        print(json.dumps(dict(config="3_sh_deg3_1m_1024px_orbit", **r)))

    if 4 in which:
        scene = random_scene(1_000_000, seed=0, min_scale=0.002, max_scale=0.053)
        for falloff in ("gaussian", "epanechnikov"):
            r = throughput(
                scene, RenderConfig(screen_size=1024, falloff=falloff), 8
            )
            print(json.dumps(dict(config=f"4_falloff_{falloff}_1m_1024px", **r)))

    if 5 in which:
        scene = random_scene(1_000_000, seed=0, min_scale=0.002, max_scale=0.053)
        r = throughput(scene, RenderConfig(screen_size=1024), 16)
        print(json.dumps(dict(config="5_flythrough_1m_1024px", **r)))

    if 6 in which:
        # Diagnostic (not in BASELINE.json): trained-3DGS-like opacities
        # (heavy low-alpha tail) — where the opacity-aware extent
        # truncation cuts ~18% of pairs (docs/PERF_NOTES.md round 4).
        import dataclasses

        import jax.numpy as jnp

        scene = random_scene(1_000_000, seed=0, min_scale=0.002, max_scale=0.053)
        alpha = np.random.default_rng(1).beta(
            0.5, 1.5, scene.opacities.shape[0]
        ).astype(np.float32)
        scene = dataclasses.replace(scene, opacities=jnp.asarray(alpha))
        for flag in (False, True):
            r = throughput(
                scene,
                RenderConfig(screen_size=1024, opacity_aware_extents=flag),
                8,
            )
            name = "aware" if flag else "exact3sigma"
            print(json.dumps(dict(config=f"6_realistic_alpha_{name}_1m", **r)))


if __name__ == "__main__":
    main()
