#!/usr/bin/env python
"""Headline-config artifact run (verdict r2 #6): a 1M-splat SH-degree-3
scene written to a real .ply, ingested through the NATIVE C++ importer,
benched end-to-end at 1024x1024 on the TPU, with PNG frames saved.

This proves the headline numbers hold for scene-shaped data through the
full ingestion path (quantized rotations, SH reorder, AABB) rather than
only for baked-color procedural arrays.

    python tools/make_artifact.py [--frames 8] [--out artifacts/]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--ply", default="/tmp/scene_1m_sh3.ply")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import SH_C0
    from cudagaussianrenderer_tpu.ply import load_gaussian_ply, write_gaussian_ply
    from cudagaussianrenderer_tpu.render import render_frame
    from cudagaussianrenderer_tpu.utils.png import write_png

    # ---- synthesize the raw .ply (pre-activation storage format) ----
    # Pure numpy, mirroring models.scene.random_scene's distributions
    # (Demo.cpp:119-143 semantics) WITHOUT a device round trip — pulling
    # a 200 MB SH scene back through the tunnel is prohibitively slow.
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    n = args.n
    means = rng.uniform(-4.0, 4.0, (n, 3)).astype(np.float32)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.0, np.pi, n)
    s, c = np.sin(angle * 0.5), np.cos(angle * 0.5)
    xyzw = np.concatenate([axis * s[:, None], c[:, None]], axis=1).astype(np.float32)
    scales = rng.uniform(0.002, 0.053, (n, 3)).astype(np.float32)
    rgba = rng.uniform(0.0, 1.0, (n, 4)).astype(np.float32)
    k = 16  # (deg 3 + 1)^2 SH bands
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0, :] = (rgba[:, :3] - 0.5) / SH_C0
    sh[:, 1:, :] = rng.normal(scale=0.15, size=(n, k - 1, 3))
    opac = np.clip(rgba[:, 3], 1e-6, 1 - 1e-6)
    write_gaussian_ply(
        args.ply,
        means,
        np.log(scales),
        xyzw[:, [3, 0, 1, 2]],
        np.log(opac / (1.0 - opac)),
        sh[:, 0, :],                            # f_dc
        np.transpose(sh[:, 1:, :], (0, 2, 1)),  # f_rest [N, 3, K-1]
    )
    size_mb = Path(args.ply).stat().st_size / 1e6
    print(f"wrote {args.ply} ({size_mb:.0f} MB) in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # ---- ingest through the native importer ----
    t0 = time.perf_counter()
    scene = load_gaussian_ply(args.ply, use_native=True).pad_to_multiple(4096)
    load_s = time.perf_counter() - t0
    print(f"native import: {scene.count} splats, SH degree {scene.sh_degree}, "
          f"{load_s:.2f}s", file=sys.stderr)
    assert scene.sh_degree == 3 and scene.count == args.n

    # ---- bench: scan-amortized orbit at 1024x1024 (bench.py method) ----
    config = RenderConfig(screen_size=1024)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, args.frames)
    cam_stack = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c.camera_data() for c in cams],
    )
    probe = jax.jit(
        lambda s, c: render_frame(s, c, config, config.tile_capacity(s.count))[1][
            "num_candidates"
        ]
    )
    candidates = max(
        int(np.asarray(probe(scene, jax.tree.map(lambda x: x[i], cam_stack))))
        for i in (0, args.frames // 2)
    )
    grain = 1 << 16
    capacity = max(grain, -(-int(candidates * 1.04) // grain) * grain)

    def body(salt, scene, cam_stack):
        view = cam_stack["view"].at[:, 0, 3].add(salt * 1e-6)
        cam_stack = dict(cam_stack, view=view)

        def step(carry, cam):
            img, aux = render_frame(scene, cam, config, capacity)
            return carry + jnp.sum(img[::64, ::64, 0].astype(jnp.float32)), aux[
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
    ms = best * 1e3 / args.frames

    # ---- save PNG frames ----
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    render = jax.jit(lambda s, c: render_frame(s, c, config, capacity)[0])
    for i in (0, args.frames // 2):
        cam = jax.tree.map(lambda x: x[i], cam_stack)
        write_png(outdir / f"artifact_1m_sh3_frame{i}.png", np.asarray(render(scene, cam)))

    result = dict(
        config="artifact_1m_sh3_native_ply_1024px",
        splats=args.n,
        sh_degree=3,
        ply_mb=round(size_mb, 1),
        native_import_s=round(load_s, 2),
        ms_per_frame=round(ms, 2),
        fps=round(1e3 / ms, 2),
        pairs_per_frame=int(np.asarray(out[1]).mean()),
        capacity=capacity,
    )
    print(json.dumps(result))
    (outdir / "artifact_1m_sh3.json").write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
