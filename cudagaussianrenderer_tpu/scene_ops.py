"""Host-side scene editing: crop / filter / decimate / merge / rigid
transform.

Splat-ecosystem housekeeping the reference leaves to external tools
(it only reads a .ply, SURVEY.md §2): trimming floaters outside a box,
dropping sub-threshold opacities, capping splat counts for a target
device, merging captures, and re-posing a scene.  All operations are
numpy on the already-activated GaussianScene arrays — the packed
uint32 rotations pass through untouched except for ``transform``'s
rotation composition (decode -> Hamilton product -> re-encode, the
same 8-bit quantization the importer applies, PlyParser.cpp:330).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .models.scene import SH_C0, GaussianScene
from .utils.quantize import decode_quat_xyzw, encode_quat_xyzw


def _live(scene: GaussianScene):
    """The true (unpadded) splat arrays as numpy, splat axis last."""
    n = scene.count
    return dict(
        means=np.asarray(scene.means)[:, :n],
        scales=np.asarray(scene.scales)[:, :n],
        quats=np.asarray(scene.quats)[:n],
        opacities=np.asarray(scene.opacities)[:n],
        colors=np.asarray(scene.colors)[:, :n],
        sh=None if scene.sh is None else np.asarray(scene.sh)[:, :, :n],
    )


def _rebuild(scene: GaussianScene, a: dict) -> GaussianScene:
    n = int(a["means"].shape[-1])
    if n == 0:
        raise ValueError("operation would leave an empty scene")
    bmin = a["means"].min(axis=1)
    bmax = a["means"].max(axis=1)
    return dataclasses.replace(
        scene,
        means=jnp.asarray(np.ascontiguousarray(a["means"])),
        scales=jnp.asarray(np.ascontiguousarray(a["scales"])),
        quats=jnp.asarray(np.ascontiguousarray(a["quats"])),
        opacities=jnp.asarray(np.ascontiguousarray(a["opacities"])),
        colors=jnp.asarray(np.ascontiguousarray(a["colors"])),
        sh=None if a["sh"] is None else jnp.asarray(
            np.ascontiguousarray(a["sh"])
        ),
        count=n,
        bounds_min=tuple(float(x) for x in bmin),
        bounds_max=tuple(float(x) for x in bmax),
    )


def take(scene: GaussianScene, indices) -> GaussianScene:
    """A new scene holding the given splat indices (bounds recomputed)."""
    idx = np.asarray(indices)
    a = _live(scene)
    out = dict(
        means=a["means"][:, idx],
        scales=a["scales"][:, idx],
        quats=a["quats"][idx],
        opacities=a["opacities"][idx],
        colors=a["colors"][:, idx],
        sh=None if a["sh"] is None else a["sh"][:, :, idx],
    )
    return _rebuild(scene, out)


def crop(scene: GaussianScene, lo, hi) -> GaussianScene:
    """Keep splats whose CENTERS lie inside the axis-aligned box."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    m = np.asarray(scene.means)[:, : scene.count]
    keep = np.all((m >= lo[:, None]) & (m <= hi[:, None]), axis=0)
    return take(scene, np.flatnonzero(keep))


def filter_opacity(scene: GaussianScene, min_opacity: float) -> GaussianScene:
    """Drop splats whose opacity is below ``min_opacity`` (floaters and
    pruning leftovers; below 1/255 they cannot touch an 8-bit pixel)."""
    op = np.asarray(scene.opacities)[: scene.count]
    return take(scene, np.flatnonzero(op >= min_opacity))


def decimate(
    scene: GaussianScene,
    max_splats: int,
    *,
    mode: str = "importance",
    seed: int = 0,
) -> GaussianScene:
    """Cap the splat count.  ``importance`` keeps the highest
    opacity x mean-scale splats (what a far viewer sees most of);
    ``random`` subsamples uniformly.  Order is preserved."""
    n = scene.count
    if max_splats >= n:
        return scene
    if max_splats <= 0:
        raise ValueError("max_splats must be positive")
    if mode == "importance":
        op = np.asarray(scene.opacities)[:n].astype(np.float64)
        sc = np.asarray(scene.scales)[:, :n].astype(np.float64)
        score = op * np.cbrt(np.maximum(sc.prod(axis=0), 1e-30))
        idx = np.argsort(-score, kind="stable")[:max_splats]
    elif mode == "random":
        idx = np.random.default_rng(seed).choice(n, max_splats,
                                                 replace=False)
    else:
        raise ValueError(f"unknown decimate mode {mode!r}")
    idx.sort()
    return take(scene, idx)


def merge(scenes: Sequence[GaussianScene]) -> GaussianScene:
    """Concatenate scenes.  SH degrees may differ: every scene promotes
    to the maximum degree (missing DC synthesized from the baked color,
    higher bands zero — exactly how a degree-0 splat renders)."""
    if not scenes:
        raise ValueError("nothing to merge")
    deg = max(s.sh_degree for s in scenes)
    k = (deg + 1) ** 2
    parts = [_live(s) for s in scenes]
    for s, a in zip(scenes, parts):
        n = a["means"].shape[-1]
        if deg == 0:
            a["sh"] = None
            continue
        sh = np.zeros((3, k, n), np.float32)
        if a["sh"] is not None:
            sh[:, : a["sh"].shape[1]] = a["sh"]
        else:
            sh[:, 0] = (a["colors"] - 0.5) / SH_C0
        a["sh"] = sh
    out = dict(
        means=np.concatenate([a["means"] for a in parts], axis=1),
        scales=np.concatenate([a["scales"] for a in parts], axis=1),
        quats=np.concatenate([a["quats"] for a in parts]),
        opacities=np.concatenate([a["opacities"] for a in parts]),
        colors=np.concatenate([a["colors"] for a in parts], axis=1),
        sh=None if deg == 0 else np.concatenate(
            [a["sh"] for a in parts], axis=2
        ),
    )
    base = dataclasses.replace(scenes[0], sh_degree=deg)
    return _rebuild(base, out)


def _hamilton_xyzw(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Quaternion product a*b, (x, y, z, w) component order, [..., 4]."""
    ax, ay, az, aw = (a[..., i] for i in range(4))
    bx, by, bz, bw = (b[..., i] for i in range(4))
    return np.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def transform(
    scene: GaussianScene,
    *,
    translate=(0.0, 0.0, 0.0),
    scale: float = 1.0,
    rotate_xyzw: Optional[np.ndarray] = None,
) -> GaussianScene:
    """Similarity transform: means' = scale * R @ means + translate;
    per-axis std-devs multiply by |scale|; rotations compose on the
    left (world-side) and re-quantize to 8 bits like the importer.
    SH coefficients are kept as-is — view-dependent lobes rotate with
    the scene only approximately; exact SH rotation is out of scope
    and irrelevant at degree 0."""
    if scale == 0.0:
        raise ValueError("scale must be nonzero")
    a = _live(scene)
    t = np.asarray(translate, np.float32).reshape(3, 1)
    if rotate_xyzw is not None:
        q = np.asarray(rotate_xyzw, np.float64)
        q = q / np.linalg.norm(q)
        x, y, z, w = q
        rot = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        a["means"] = (rot @ a["means"].astype(np.float64)).astype(np.float32)
        qs = decode_quat_xyzw(a["quats"])
        composed = _hamilton_xyzw(
            np.broadcast_to(q.astype(np.float32), qs.shape), qs
        )
        norm = np.linalg.norm(composed, axis=-1, keepdims=True)
        a["quats"] = encode_quat_xyzw(
            (composed / np.maximum(norm, 1e-12)).astype(np.float32)
        ).astype(np.uint32)
    a["means"] = np.float32(scale) * a["means"] + t
    a["scales"] = np.float32(abs(scale)) * a["scales"]
    return _rebuild(scene, a)
