#!/usr/bin/env python
"""Training-path convergence artifact: fit splats to a posed-image
dataset and record PSNR before/after, on whatever backend runs this.

The loop this proves end to end: procedural scene -> production render
of an orbit -> dataset.export_dataset (transforms.json + PNGs) ->
dataset.load_dataset -> diff.fit with the 3DGS L1 + D-SSIM loss (and
optional density control) -> production render of the FITTED scene ->
PSNR against the targets.  The CUDA reference is forward-only
(SURVEY.md §2); this artifact backs the training-capability claim with
a measured convergence number instead of only unit-test losses.

    python tools/fit_artifact.py [--steps 600] [--out artifacts]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-splats", type=int, default=3000)
    ap.add_argument("--fit-splats", type=int, default=2000)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--densify-every", type=int, default=0)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--optimizer", choices=("adam", "3dgs"), default="adam")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--dataset-dir", default="/tmp/fit_dataset")
    args = ap.parse_args()

    import jax

    from cudagaussianrenderer_tpu import dataset, diff
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer, round_capacity
    from cudagaussianrenderer_tpu.utils.png import write_png

    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # 1. Ground-truth scene -> dataset on disk (the exportable layout).
    scene = random_scene(args.scene_splats, seed=7)
    config = RenderConfig(screen_size=args.size)
    renderer = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, args.views)
    t0 = time.perf_counter()
    tpath = dataset.export_dataset(args.dataset_dir, renderer, cams)
    print(f"exported {args.views} views -> {tpath} "
          f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    # 2. Load it back the way a user with captured data would.
    loaded_cams, targets = dataset.load_dataset(args.dataset_dir)
    cam_data = [c.camera_data() for c in loaded_cams]

    # 3. Random init inside rig-derived bounds; PSNR before.
    lo, hi = dataset.init_bounds_from_cameras(loaded_cams)
    params = diff.random_init(args.fit_splats, lo, hi, seed=0, scale=0.05)

    def eval_psnr(p):
        r = Renderer(diff.to_scene(p), config)
        vals = []
        for cam, tgt in zip(loaded_cams, targets):
            img = np.asarray(r.render(cam)).astype(np.float32) / 255.0
            rgb = img[..., :3] * img[..., 3:4]  # over black, like targets
            vals.append(psnr(rgb, tgt))
        return float(np.mean(vals)), r

    psnr_init, r_init = eval_psnr(params)
    write_png(out / "fit_init.png", r_init.render(loaded_cams[0]))

    # 4. Fit with the 3DGS loss (L1 0.8 + D-SSIM 0.2, L2 dropped).
    capacity = round_capacity(32 * args.fit_splats)
    structure = diff.build_structure(params, cam_data[0], config, capacity)
    k_max = max(256, 2 * diff.max_tile_count(structure))
    print(f"fitting {args.fit_splats} splats, capacity {capacity}, "
          f"k_max {k_max}, {args.steps} steps", file=sys.stderr)
    tx = None
    if args.optimizer == "3dgs":
        extent = float(np.linalg.norm(np.asarray(hi) - np.asarray(lo)))
        tx = diff.tx_3dgs(extent, args.steps)
    t0 = time.perf_counter()
    params, losses = diff.fit(
        params, cam_data, targets, config,
        capacity=capacity, k_max=k_max, steps=args.steps,
        learning_rate=args.lr, tx=tx,
        l1_weight=0.8, ssim_weight=0.2, l2_weight=0.0,
        densify_every=args.densify_every,
        log_every=max(1, args.steps // 10),
    )
    dt = time.perf_counter() - t0

    psnr_fit, r_fit = eval_psnr(params)
    write_png(out / "fit_final.png", r_fit.render(loaded_cams[0]))
    write_png(out / "fit_target.png",
              (targets[0] * 255 + 0.5).astype(np.uint8))

    rec = {
        "backend": jax.devices()[0].platform,
        "scene_splats": args.scene_splats,
        "fit_splats_final": int(params.means.shape[-1]),
        "views": args.views,
        "size": args.size,
        "steps": args.steps,
        "densify_every": args.densify_every,
        "optimizer": args.optimizer,
        "loss_first": round(float(losses[0]), 5),
        "loss_last": round(float(losses[-1]), 5),
        "psnr_init_db": round(psnr_init, 2),
        "psnr_fit_db": round(psnr_fit, 2),
        "fit_seconds": round(dt, 1),
        "ms_per_step": round(1e3 * dt / args.steps, 1),
    }
    (out / "fit_dataset.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
