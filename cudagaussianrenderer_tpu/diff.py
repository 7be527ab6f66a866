"""Differentiable rendering — gradients through the splat pipeline.

The CUDA reference is a forward-only viewer; training a scene against it
means hand-writing backward kernels (the upstream 3DGS codebase carries
~2k lines of CUDA backward).  On TPU the framework is jax, so the
backward pass is free: this module exposes the render as a function of
raw splat parameters that `jax.grad` differentiates end-to-end, enabling
scene fitting / 3DGS-style training against rendered targets — a
capability the reference (/root/reference/src/GaussianRender.cu, forward
only) does not have.

Design — structure/value split (the standard 3DGS autodiff treatment,
and the only one that makes sense under XLA's static shapes):

- The pair STRUCTURE (which (tile, splat) pairs exist, their
  front-to-back order, the per-tile ranges) is discrete; it comes from
  the production pipeline — projection -> exact binning -> variadic
  sort carrying the splat indices (`ops.sorting.sort_pairs(...,
  with_values=True)`) -> histogram ranges — under `stop_gradient`.
- The pair VALUES (clip center, conic, color, opacity per splat) are
  recomputed differentiably at full f32 (none of the production sort
  operand packing: geometry.py's 16/12/8-bit quantizers have no useful
  gradients) and gathered per sorted pair.
- Blending runs in the log domain (exclusive cumsum of log1p(-alpha)),
  mirroring the production raster's log-domain scan (ops/raster.py) —
  smooth, and its gradient is exact for alpha < 1 (alpha is clamped to
  ``alpha_max`` so the 1/(1-alpha) backward term stays finite; the
  forward-value deviation is below one 8-bit output level).

Gradients flow to: means, scales, rotations (full-precision float
quaternions — `project_splats(quat_components=...)` bypasses the
reference's 8-bit packed decode), opacities, colors and SH coefficients.
Binning truncation (which tiles a splat touches) and depth ORDER are
treated as locally constant, exactly like the reference 3DGS backward.

Parameters are carried unconstrained (`DiffSplats`: log-scales, opacity
logits, unnormalized quaternions) so any optimizer step stays feasible;
`from_scene` / `to_scene` convert to and from the production
`GaussianScene` (and from there to .ply via ply.write_ply).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .models.scene import GaussianScene, scene_from_arrays
from .ops.binning import build_tile_pairs
from .ops.projection import SplatClipData, project_splats
from .ops.ranges import tile_ranges
from .ops.sh import evaluate_sh_colors, num_sh_coeffs
from .ops.sorting import sort_pairs
from .utils.quantize import decode_quat_components


class DiffSplats(NamedTuple):
    """Unconstrained splat parameters (all leaves differentiable).

    means:          [3, N] world centers (same planar layout as
                    GaussianScene).
    log_scales:     [3, N] log of the per-axis std-dev.
    quats:          [4, N] UNNORMALIZED (x, y, z, w) rows; normalized in
                    the forward pass (the production path deliberately
                    skips normalization to match the reference,
                    projection.py:106; here it is required so rotation
                    gradients stay on the quaternion sphere).
    opacity_logits: [N]; opacity = sigmoid(logits).
    colors:         [3, N] raw; color = clip(colors, 0, 1).  Ignored
                    when ``sh`` is present.
    sh:             [3, K, N] SH coefficients or None; color =
                    clip(basis . sh + 0.5, 0, 1) exactly like the
                    production stage A (ops/sh.py).  The degree is
                    derived from K (a static shape under jit).
    """

    means: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray
    opacity_logits: jnp.ndarray
    colors: jnp.ndarray
    sh: Optional[jnp.ndarray] = None

    @property
    def sh_degree(self) -> int:
        if self.sh is None:
            return 0
        return int(math.isqrt(self.sh.shape[1])) - 1


class PairStructure(NamedTuple):
    """Frozen (stop-gradient) pair structure for one camera.

    sids:   [C] int32 splat index per sorted pair (-1 on sentinel slots).
    starts: [T] int32 first pair slot of each tile.
    counts: [T] int32 pairs per tile.
    num_candidates: scalar int32 — exact candidate count (saturation
        check: > C means the frame rendered with a truncated list).
    """

    sids: jnp.ndarray
    starts: jnp.ndarray
    counts: jnp.ndarray
    num_candidates: jnp.ndarray


def from_scene(scene: GaussianScene, *, min_scale: float = 1e-8) -> DiffSplats:
    """GaussianScene -> unconstrained parameters (inverse activations)."""
    qx, qy, qz, qw = decode_quat_components(scene.quats, xp=jnp)
    op = jnp.clip(scene.opacities, 1e-4, 1.0 - 1e-4)
    return DiffSplats(
        means=scene.means,
        log_scales=jnp.log(jnp.maximum(scene.scales, min_scale)),
        quats=jnp.stack([qx, qy, qz, qw]),
        opacity_logits=jnp.log(op) - jnp.log1p(-op),
        colors=scene.colors,
        sh=scene.sh,
    )


def to_scene(params: DiffSplats) -> GaussianScene:
    """Parameters -> production GaussianScene (quantizes rotations to the
    packed uint32 representation like the reference importer)."""
    n = params.means.shape[-1]
    scales, (qx, qy, qz, qw), opac = _activate(params)
    quats = np.stack(
        [np.asarray(qx), np.asarray(qy), np.asarray(qz), np.asarray(qw)],
        axis=-1,
    )
    colors = np.clip(np.asarray(params.colors).T, 0.0, 1.0)
    sh = params.sh
    return scene_from_arrays(
        np.asarray(params.means).T,
        np.asarray(scales).T,
        quats,
        np.asarray(opac),
        colors,
        None if sh is None else np.transpose(np.asarray(sh), (2, 1, 0)),
        params.sh_degree,
    )


def _activate(params: DiffSplats):
    """Unconstrained -> model quantities: (scales [3,N],
    (qx, qy, qz, qw) unit rows, opacities [N])."""
    scales = jnp.exp(params.log_scales)
    q = params.quats
    inv = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(q * q, axis=0)), 1e-12)
    opac = jax.nn.sigmoid(params.opacity_logits)
    return scales, (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv), opac


def _diff_colors(params: DiffSplats, camera_position) -> jnp.ndarray:
    """Stage A, differentiable: [3, N] colors in [0, 1]."""
    if params.sh is not None and params.sh_degree > 0:
        return evaluate_sh_colors(
            params.means, params.sh, camera_position, params.sh_degree
        )
    if params.sh is not None:
        # Degree 0: DC band only, same affine map as the importer.
        return jnp.clip(params.sh[:, 0] * 0.28209479177387814 + 0.5, 0.0, 1.0)
    return jnp.clip(params.colors, 0.0, 1.0)


def _project(params: DiffSplats, camera_data: dict, config: RenderConfig):
    scales, qc, opac = _activate(params)
    clip = project_splats(
        params.means, scales, None, camera_data, config,
        opacities=opac, quat_components=qc,
    )
    return clip, opac


def build_structure(
    params: DiffSplats,
    camera_data: dict,
    config: RenderConfig,
    capacity: int,
    *,
    interpret=None,
) -> PairStructure:
    """Freeze the pair structure for one camera via the production
    pipeline (stop-gradient; jittable, capacity static).

    Runs stage B/C/D/E exactly as render_frame does, but the sort
    additionally carries the splat indices (`with_values=True`, which
    forces the stable sort — front-to-back ties resolve by emission
    order, matching the golden oracle).
    """
    from .render import round_capacity

    capacity = round_capacity(capacity, interpret)
    p = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    # The camera may carry pose-refinement tangents (fit
    # optimize_cameras); the frozen structure must not differentiate
    # through the Pallas emit/sort stages any more than the params do.
    camera_data = jax.tree_util.tree_map(
        jax.lax.stop_gradient, dict(camera_data)
    )
    clip, opac = _project(p, camera_data, config)
    colors = _diff_colors(p, camera_data["position"])
    pairs = build_tile_pairs(
        clip, colors, opac, config, capacity, interpret=interpret
    )
    keys, sids, _ = sort_pairs(pairs, with_values=True)
    starts, counts = tile_ranges(keys, config, interpret=interpret)
    return PairStructure(
        sids=sids,
        starts=starts.astype(jnp.int32),
        counts=counts.astype(jnp.int32),
        num_candidates=pairs.num_candidates,
    )


class CameraDeltas(NamedTuple):
    """Learnable per-view pose corrections (fit(optimize_cameras=True)).

    dr: [V, 3] rotation vectors (radians, camera-frame, Rodrigues).
    dt: [V, 3] translations (camera-frame: x right, y up, z backward —
        the OpenGL axes the view matrix maps into).
    """

    dr: jnp.ndarray
    dt: jnp.ndarray


def zero_camera_deltas(num_views: int) -> CameraDeltas:
    return CameraDeltas(
        dr=jnp.zeros((num_views, 3), jnp.float32),
        dt=jnp.zeros((num_views, 3), jnp.float32),
    )


class Exposure(NamedTuple):
    """Learnable per-view color correction (fit(optimize_exposure=True)):
    rendered' = rendered * gain + bias per channel — absorbs the
    auto-exposure / white-balance drift of real captures so it does not
    get baked into the splats (the appearance-compensation idea of
    NeRF-W, as production 3DGS trainers apply it per image).

    gain: [V, 3] (identity 1), bias: [V, 3] (identity 0).
    """

    gain: jnp.ndarray
    bias: jnp.ndarray


def identity_exposure(num_views: int) -> Exposure:
    return Exposure(
        gain=jnp.ones((num_views, 3), jnp.float32),
        bias=jnp.zeros((num_views, 3), jnp.float32),
    )


def _rodrigues(r: jnp.ndarray) -> jnp.ndarray:
    """[3] rotation vector -> [3, 3] rotation matrix, differentiable at
    the identity (Taylor branches keep the gradient finite at ||r||=0)."""
    theta2 = jnp.sum(r * r)
    small = theta2 < 1e-12
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe
    )
    z = jnp.zeros((), r.dtype)
    k = jnp.stack([
        jnp.stack([z, -r[2], r[1]]),
        jnp.stack([r[2], z, -r[0]]),
        jnp.stack([-r[1], r[0], z]),
    ])
    return jnp.eye(3, dtype=r.dtype) + a * k + b * (k @ k)


def apply_camera_delta(
    camera_data: dict, dr: jnp.ndarray, dt: jnp.ndarray
) -> dict:
    """Right-multiply the camera-to-world pose by the small SE(3)
    correction (R(dr), dt) — i.e. a correction expressed in the camera's
    own frame — and return the updated camera_data pytree.  Only the
    ``view`` matrix and ``position`` change; intrinsics stay.

    With M = camera-to-world = inv(view) and A = [[R, t], [0, 1]]:
    M' = M @ A, so view' = inv(A) @ view and position' = position +
    Mᵣ @ t (Mᵣ = view rotation block transposed).  Differentiable in
    (dr, dt); zero deltas are exactly the identity.
    """
    rot = _rodrigues(dr)
    view = camera_data["view"]
    r3 = view[:3, :3]
    t3 = view[:3, 3:4]
    inv_r = rot.T
    new_top = jnp.concatenate(
        [inv_r @ r3, inv_r @ t3 - (inv_r @ dt)[:, None]], axis=1
    )
    new_view = jnp.concatenate([new_top, view[3:4, :]], axis=0)
    new_pos = camera_data["position"] + r3.T @ dt
    out = dict(camera_data)
    out["view"] = new_view
    out["position"] = new_pos
    return out


def refined_camera(camera, dr, dt):
    """Host-side: bake a fitted pose correction into a models.camera
    .Camera (for exporting refined datasets).  Matches
    apply_camera_delta: camera_data(refined_camera(c, dr, dt)) ==
    apply_camera_delta(c.camera_data(), dr, dt)."""
    import dataclasses

    from .models.camera import quat_from_matrix, quat_to_matrix

    dr = np.asarray(dr, np.float64)
    dt = np.asarray(dt, np.float64)
    rot = np.asarray(_rodrigues(jnp.asarray(dr)), np.float64)
    r_c2w = quat_to_matrix(camera.rotation).astype(np.float64)
    return dataclasses.replace(
        camera,
        position=(
            np.asarray(camera.position, np.float64) + r_c2w @ dt
        ).astype(np.float32),
        rotation=quat_from_matrix((r_c2w @ rot).astype(np.float32)),
    )


def max_tile_count(structure: PairStructure) -> int:
    """Host-side helper: the largest per-tile pair count (use to pick a
    static ``k_max``)."""
    return int(np.asarray(jnp.max(structure.counts)))


def rasterize_diff(
    clip: SplatClipData,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    structure: PairStructure,
    config: RenderConfig,
    k_max: int,
    *,
    tile_batch: int = 64,
    alpha_max: float = 0.9995,
    return_depth: bool = False,
    remat: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable rasterizer.  Returns [H, W, 4] float32 in [0, 1];
    with ``return_depth``, a ([H, W, 4], depth [H, W]) pair where depth
    is the alpha-weighted expected linear clip depth Σ wᵢ·zᵢ
    (z ∈ [-1, 1] as the projection emits it; divide by the accumulated
    alpha 1 − T for the conditional expectation, and map through the
    camera's depth scale/bias for view-space z).  Depth-supervised
    losses differentiate through it like through color.

    Per tile, gathers its first ``k_max`` sorted pairs (front-to-back)
    and alpha-blends them in the log domain with the production
    semantics (golden.py:249-274): alpha = opacity * clip(density, 0, 1),
    color += c * T * alpha, T *= 1 - alpha, with the chunk-granular
    saturation exit (a tile whose every pixel has T <= transmittance_eps
    after a chunk contributes nothing further — reproduced exactly, as a
    multiplicative mask, so forward values match the production raster).

    ``k_max`` is a static cap on pairs per tile; tiles with more pairs
    truncate their tail (those pairs sit behind accumulated opacity —
    pick k_max >= max_tile_count(structure) for exactness).
    ``alpha_max`` bounds alpha away from 1 so the log-domain backward
    term 1/(1 - alpha) stays finite; the forward deviation is below one
    8-bit output level.

    ``remat`` checkpoints the per-chunk blend body: the backward pass
    recomputes each chunk's [tiles, pixels, chunk] activations instead
    of storing all of them — memory drops from O(k_max) to O(chunk)
    per pixel at ~3% step cost (measured; gradients pinned identical).
    Default None auto-enables when the estimated stored residuals
    (pixels x k_max x ~16 B) exceed ~2 GB — the measured v5e OOM point
    is ~27 GB at 512^2 / k_max 6.4k.  Pass False to force storing.
    """
    if remat is None:
        px = config.screen_w * config.screen_h
        remat = px * k_max * 16 > 2 << 30
    ts = config.tile_size
    ntx, nty = config.tiles_x, config.tiles_y
    t_total = config.total_tiles
    chunk = min(config.raster_chunk, max(8, k_max))
    n_chunks = max(1, -(-k_max // chunk))
    cap = structure.sids.shape[0]
    p_tile = ts * ts
    gauss = config.falloff == "gaussian"
    log_eps = float(np.log(config.transmittance_eps))

    if t_total % tile_batch != 0:
        tile_batch = next(
            d for d in (32, 16, 8, 4, 2, 1) if t_total % d == 0
        )
    n_batches = t_total // tile_batch

    # Pixel clip coordinates per tile (golden.py:256-257: pixel corner,
    # not center — parity with the production raster).
    all_tids = jnp.arange(t_total, dtype=jnp.int32)
    col = jnp.arange(ts, dtype=jnp.float32)
    sx, sy = 2.0 / config.screen_w, 2.0 / config.screen_h

    sids = jnp.maximum(structure.sids, 0)
    valid_sid = structure.sids >= 0

    def tile_block(tids):
        """Render ``tile_batch`` tiles -> [TB, p_tile, 4]."""
        tx = (tids % ntx).astype(jnp.float32)
        ty = (tids // ntx).astype(jnp.float32)
        px = (tx[:, None] * ts + col[None, :]) * sx - 1.0  # [TB, ts]
        py = (ty[:, None] * ts + col[None, :]) * sy - 1.0
        # Flattened pixel index r * ts + c (image row-major).
        pxf = jnp.tile(px, (1, ts))                        # [TB, p]
        pyf = jnp.repeat(py, ts, axis=1)
        starts = structure.starts[tids]                    # [TB]
        counts = structure.counts[tids]

        def body(carry, k0):
            rgb, log_t, dep = carry
            k = k0 + jnp.arange(chunk, dtype=jnp.int32)    # [chunk]
            idx = starts[:, None] + k[None, :]             # [TB, chunk]
            live = k[None, :] < counts[:, None]
            idx = jnp.clip(idx, 0, cap - 1)
            sid = sids[idx]                                # [TB, chunk]
            live = live & valid_sid[idx]
            # Saturation exit at chunk granularity (golden.py:271-272).
            active = jnp.any(log_t > log_eps, axis=-1)     # [TB]
            live = live & active[:, None]

            cx = clip.cx[sid]
            cy = clip.cy[sid]
            ca = clip.con_a[sid]
            cb = clip.con_b[sid]
            cc = clip.con_c[sid]
            op = opacities[sid]
            cr = colors[0][sid]
            cg = colors[1][sid]
            cbl = colors[2][sid]

            dx = pxf[:, :, None] - cx[:, None, :]          # [TB, p, chunk]
            dy = pyf[:, :, None] - cy[:, None, :]
            dpow = (
                ca[:, None, :] * dx * dx
                + cc[:, None, :] * dy * dy
                + 2.0 * cb[:, None, :] * dx * dy
            )
            if gauss:
                density = jnp.exp(-0.5 * dpow)
            else:
                density = 1.0 - dpow * (1.0 / 7.0)
            alpha = op[:, None, :] * jnp.clip(density, 0.0, 1.0)
            alpha = jnp.minimum(alpha, alpha_max)
            alpha = jnp.where(live[:, None, :], alpha, 0.0)

            l1m = jnp.log1p(-alpha)                        # [TB, p, chunk]
            cum = jnp.cumsum(l1m, axis=-1)
            log_t_k = log_t[:, :, None] + (cum - l1m)      # exclusive
            w = jnp.exp(log_t_k) * alpha                   # [TB, p, chunk]
            rgb = rgb + jnp.stack(
                [
                    jnp.sum(w * cr[:, None, :], axis=-1),
                    jnp.sum(w * cg[:, None, :], axis=-1),
                    jnp.sum(w * cbl[:, None, :], axis=-1),
                ],
                axis=-1,
            )
            if return_depth:
                cz = clip.z[sid]                           # [TB, chunk]
                dep = dep + jnp.sum(w * cz[:, None, :], axis=-1)
            return (rgb, log_t + cum[:, :, -1], dep), None

        rgb0 = jnp.zeros((tids.shape[0], p_tile, 3), jnp.float32)
        lt0 = jnp.zeros((tids.shape[0], p_tile), jnp.float32)
        dep0 = jnp.zeros((tids.shape[0], p_tile), jnp.float32)
        (rgb, log_t_f, dep_f), _ = jax.lax.scan(
            jax.checkpoint(body) if remat else body,
            (rgb0, lt0, dep0),
            jnp.arange(n_chunks, dtype=jnp.int32) * chunk,
        )
        if config.background is not None:
            # Same semantics as the production raster + tiles_to_image:
            # composite the opaque background with the remaining
            # transmittance (differentiable — gradients reach the
            # occluding alphas through log_t_f).
            bg = jnp.asarray(config.background, jnp.float32)
            rgb = rgb + jnp.exp(log_t_f)[:, :, None] * bg[None, None, :]
            a = jnp.ones((tids.shape[0], p_tile), jnp.float32)
        else:
            a = jnp.broadcast_to(
                (counts > 0).astype(jnp.float32)[:, None],
                (tids.shape[0], p_tile),
            )
        out = [rgb, a[:, :, None]]
        if return_depth:
            out.append(dep_f[:, :, None])
        return jnp.concatenate(out, axis=-1)

    nc = 5 if return_depth else 4
    tiles = jax.lax.map(tile_block, all_tids.reshape(n_batches, tile_batch))
    tiles = tiles.reshape(nty, ntx, ts, ts, nc)
    image = tiles.transpose(0, 2, 1, 3, 4).reshape(
        config.screen_h, config.screen_w, nc
    )
    rgba = jnp.clip(image[..., :4], 0.0, 1.0)
    if return_depth:
        return rgba, image[..., 4]
    return rgba


def render_diff(
    params: DiffSplats,
    camera_data: dict,
    config: RenderConfig,
    capacity: int,
    k_max: int,
    *,
    structure: Optional[PairStructure] = None,
    tile_batch: int = 64,
    alpha_max: float = 0.9995,
    return_depth: bool = False,
    remat: Optional[bool] = None,
    interpret=None,
) -> Tuple[jnp.ndarray, PairStructure]:
    """Differentiable frame render.  Jittable (config, capacity, k_max
    static); gradients flow to every DiffSplats leaf.

    Returns (image [H, W, 4] float32, structure) — or (image, depth
    [H, W], structure) with ``return_depth`` (expected linear clip
    depth; see rasterize_diff).  Pass ``structure`` to reuse a frozen
    one (e.g. several gradient steps per camera); by default it is
    rebuilt for this camera under stop_gradient.
    """
    if structure is None:
        structure = build_structure(
            params, camera_data, config, capacity, interpret=interpret
        )
    clip, opac = _project(params, camera_data, config)
    colors = _diff_colors(params, camera_data["position"])
    out = rasterize_diff(
        clip, colors, opac, structure, config, k_max,
        tile_batch=tile_batch, alpha_max=alpha_max,
        return_depth=return_depth, remat=remat,
    )
    if return_depth:
        image, depth = out
        return image, depth, structure
    return out, structure


# ---------------------------------------------------------------------------
# Training losses
# ---------------------------------------------------------------------------


def ssim(a: jnp.ndarray, b: jnp.ndarray, *, window: int = 11,
         sigma: float = 1.5, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2
         ) -> jnp.ndarray:
    """Mean SSIM between two [H, W, C] images in [0, 1] (differentiable).

    The standard Wang et al. formulation with a gaussian window,
    evaluated as separable depthwise convolutions — the same statistic
    the 3DGS training loss uses (1 - SSIM as D-SSIM)."""
    r = window // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)

    def blur(img):  # [C, H, W] gaussian filter, SAME padding
        c = img.shape[0]
        img = img[:, None]  # [C, 1, H, W]
        kh = jnp.broadcast_to(g[None, None, :, None], (1, 1, window, 1))
        kw = jnp.broadcast_to(g[None, None, None, :], (1, 1, 1, window))
        dn = jax.lax.conv_dimension_numbers(
            img.shape, kh.shape, ("NCHW", "OIHW", "NCHW")
        )
        # Precision HIGHEST is load-bearing: with the default precision
        # the TPU MXU runs these convs in bf16, and the moment estimate
        # blur(a*a) - mu*mu picks up ~1e-3 cancellation error on flat
        # regions — enough to flip the SSIM denominator sign (c2 is only
        # 9e-4) and drive the training loss below its true 0 floor.
        out = jax.lax.conv_general_dilated(
            img, kh, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn,
            feature_group_count=1, precision=jax.lax.Precision.HIGHEST,
        )
        out = jax.lax.conv_general_dilated(
            out, kw, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn,
            feature_group_count=1, precision=jax.lax.Precision.HIGHEST,
        )
        return out[:, 0]

    ac = jnp.transpose(a, (2, 0, 1)).astype(jnp.float32)
    bc = jnp.transpose(b, (2, 0, 1)).astype(jnp.float32)
    mu_a, mu_b = blur(ac), blur(bc)
    # Enforce the moment invariants (true variance >= 0 and
    # |cov| <= sqrt(var_a * var_b)) against residual floating-point
    # cancellation; together they pin SSIM to its mathematical [-1, 1]
    # range on any backend, so 1 - SSIM (the D-SSIM loss term) can
    # never go negative.
    var_a = jnp.maximum(blur(ac * ac) - mu_a * mu_a, 0.0)
    var_b = jnp.maximum(blur(bc * bc) - mu_b * mu_b, 0.0)
    cov = blur(ac * bc) - mu_a * mu_b
    # stop_gradient: the bound is a numerical guard, not an objective
    # term, and d(sqrt)/d(var) blows up at var = 0 (flat patches).
    cov_bound = jax.lax.stop_gradient(jnp.sqrt(var_a * var_b))
    cov = jnp.clip(cov, -cov_bound, cov_bound)
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def tx_3dgs(
    scene_extent: float,
    total_steps: int,
    *,
    lr_scale: float = 1.0,
    position_lr: float = 1.6e-4,
    position_lr_final_ratio: float = 0.01,
    scale_lr: float = 5e-3,
    quat_lr: float = 1e-3,
    opacity_lr: float = 5e-2,
    color_lr: float = 2.5e-3,
    sh_rest_div: float = 20.0,
    eps: float = 1e-15,
):
    """The 3DGS per-parameter Adam schedule as an optax transformation.

    A single global learning rate couples parameters whose natural step
    sizes differ by orders of magnitude (a world-space mean vs an
    opacity logit); the original 3DGS trainer therefore runs Adam with
    per-group rates — positions at ``position_lr * scene_extent``
    exponentially decayed by ``position_lr_final_ratio`` over the run,
    opacity logits hot (5e-2), rotations cool (1e-3), and the SH rest
    bands at 1/20 of the DC band.  This reproduces that schedule over
    the DiffSplats leaves (means / log_scales / quats / opacity_logits
    / colors / sh); pass the result as ``fit(tx=...)``.

    ``scene_extent`` should be the world diagonal of the splat cloud
    (fit() computes the same quantity for density control).  The decay
    clock restarts when fit() re-inits the optimizer after a densify
    step; with the standard densify_until = steps/2 schedule the
    position rate rejoins the envelope in the homestretch.
    """
    import optax

    adam = optax.scale_by_adam(eps=eps)
    lo = float(position_lr_final_ratio)

    def init(params):
        return (adam.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        inner, count = state
        upd, inner = adam.update(grads, inner, params)
        t = jnp.clip(
            count.astype(jnp.float32) / float(max(1, total_steps)), 0.0, 1.0
        )
        pos_lr = position_lr * scene_extent * jnp.power(lo, t)
        s = -lr_scale
        sh = upd.sh
        if sh is not None:
            k = sh.shape[1]
            mult = jnp.full((1, k, 1), color_lr / sh_rest_div, sh.dtype)
            mult = mult.at[:, 0].set(color_lr)
            sh = sh * (s * mult)
        new = DiffSplats(
            means=upd.means * (s * pos_lr),
            log_scales=upd.log_scales * (s * scale_lr),
            quats=upd.quats * (s * quat_lr),
            opacity_logits=upd.opacity_logits * (s * opacity_lr),
            colors=upd.colors * (s * color_lr),
            sh=sh,
        )
        return new, (inner, count + 1)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Adaptive density control (3DGS clone / split / prune)
# ---------------------------------------------------------------------------


def densify_and_prune(
    params: DiffSplats,
    mean_grad_norm: np.ndarray,
    *,
    grad_threshold: float = 2e-4,
    dense_scale: float = 0.01,
    scene_extent: float = 1.0,
    split_factor: float = 1.6,
    prune_opacity: float = 1.0 / 255.0,
    max_splats: Optional[int] = None,
    seed: int = 0,
) -> DiffSplats:
    """One adaptive-density step (host-side; the splat count changes, so
    jitted programs recompile on the next call — run it BETWEEN training
    phases, the standard 3DGS schedule).

    Rules (the original 3DGS density control):
    - Splats whose accumulated mean positional-gradient norm exceeds
      ``grad_threshold`` are under-reconstructing.  Small ones (max
      scale < dense_scale * scene_extent) are CLONED in place — the
      optimizer pulls the copies apart; large ones are SPLIT into two
      samples drawn from their own distribution with scales divided by
      ``split_factor``.
    - Splats whose opacity fell below ``prune_opacity`` (the 8-bit
      output floor — they cannot contribute a level) are PRUNED.

    ``mean_grad_norm``: [N] per-splat average |d loss / d mean| over the
    steps since the last call (fit(densify_every=...) maintains it).
    ``max_splats`` caps growth (highest-gradient splats win).
    """
    rng = np.random.default_rng(seed)
    n = params.means.shape[-1]
    g = np.asarray(mean_grad_norm, np.float32)
    if g.shape != (n,):
        raise ValueError(f"mean_grad_norm must be [{n}], got {g.shape}")

    means = np.asarray(params.means)
    log_scales = np.asarray(params.log_scales)
    quats = np.asarray(params.quats)
    logits = np.asarray(params.opacity_logits)
    colors = np.asarray(params.colors)
    sh = None if params.sh is None else np.asarray(params.sh)

    opac = 1.0 / (1.0 + np.exp(-logits))
    keep = opac >= prune_opacity

    scales = np.exp(log_scales)
    big = scales.max(axis=0) >= dense_scale * scene_extent
    hot = (g >= grad_threshold) & keep
    clone = hot & ~big
    split = hot & big
    if max_splats is not None:
        budget = max(0, max_splats - int(keep.sum()))
        grow = np.flatnonzero(clone | split)
        if grow.size > budget:
            # Highest-gradient splats win the budget.
            order = grow[np.argsort(-g[grow])]
            drop = order[budget:]
            clone[drop] = False
            split[drop] = False

    def gather(a, mask):
        return a[..., mask]

    pieces = []

    def emit(sel_means, sel_ls, sel_q, sel_lo, sel_c, sel_sh):
        pieces.append((sel_means, sel_ls, sel_q, sel_lo, sel_c, sel_sh))

    # Survivors (split parents are replaced by their two children, the
    # paper's behavior; clone parents stay).
    surv = keep & ~split
    emit(
        gather(means, surv), gather(log_scales, surv), gather(quats, surv),
        logits[surv], gather(colors, surv),
        None if sh is None else gather(sh, surv),
    )
    # Clones: exact copies.
    if clone.any():
        emit(
            gather(means, clone), gather(log_scales, clone),
            gather(quats, clone), logits[clone], gather(colors, clone),
            None if sh is None else gather(sh, clone),
        )
    # Splits: two samples from the parent's own gaussian, shrunk.
    if split.any():
        idx = np.flatnonzero(split)
        q = quats[:, idx].T.astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        from .utils.quantize import quat_xyzw_to_rotation_matrix

        rot = quat_xyzw_to_rotation_matrix(q, xp=np)  # [M, 3, 3]
        s = scales[:, idx].T  # [M, 3]
        for _ in range(2):
            z = rng.normal(size=s.shape).astype(np.float32) * s
            offs = np.einsum("mij,mj->mi", rot, z).astype(np.float32)
            emit(
                means[:, idx] + offs.T,
                log_scales[:, idx] - np.float32(np.log(split_factor)),
                quats[:, idx], logits[idx], colors[:, idx],
                None if sh is None else sh[..., idx],
            )

    cat = lambda i: np.concatenate([p[i] for p in pieces], axis=-1)
    new_sh = None
    if sh is not None:
        new_sh = jnp.asarray(cat(5))
    return DiffSplats(
        means=jnp.asarray(cat(0)),
        log_scales=jnp.asarray(cat(1)),
        quats=jnp.asarray(cat(2)),
        opacity_logits=jnp.asarray(cat(3)),
        colors=jnp.asarray(cat(4)),
        sh=new_sh,
    )


# ---------------------------------------------------------------------------
# Scene fitting (training loop)
# ---------------------------------------------------------------------------


def fit(
    params: DiffSplats,
    cameras_data,
    targets,
    config: RenderConfig,
    *,
    capacity: int,
    k_max: int,
    steps: int = 200,
    learning_rate: float = 5e-3,
    tx=None,
    l1_weight: float = 0.0,
    ssim_weight: float = 0.0,
    l2_weight: float = 1.0,
    depth_weight: float = 0.0,
    depth_targets=None,
    densify_every: int = 0,
    densify_until: Optional[int] = None,
    densify_args: Optional[dict] = None,
    optimize_cameras: bool = False,
    camera_lr: float = 1e-4,
    optimize_exposure: bool = False,
    exposure_lr: float = 1e-3,
    sh_warmup_every: int = 0,
    remat: Optional[bool] = None,
    checkpoint_every: int = 0,
    checkpoint_path=None,
    start_step: int = 0,
    opt_state=None,
    camera_deltas: Optional[CameraDeltas] = None,
    exposure: Optional[Exposure] = None,
    interpret=None,
    log_every: int = 0,
):
    """Fit splat parameters to target images by gradient descent.

    cameras_data: list of camera_data pytrees (models.camera.Camera
    .camera_data()), cycled round-robin; targets: matching list/array of
    [H, W, >=3] images (uint8 or float in [0, 1]; only RGB is fitted).
    The pair structure is rebuilt EVERY step for the step's camera
    (binning follows the splats as they move), inside the jitted step.

    ``densify_every`` > 0 enables adaptive density control: every that
    many steps (until step ``densify_until``, default steps // 2) the
    accumulated positional-gradient norms drive densify_and_prune
    (clone / split / prune; ``densify_args`` forwards its keyword
    arguments), the optimizer state resets and the step recompiles for
    the new splat count — the standard 3DGS schedule.

    ``depth_weight`` > 0 with ``depth_targets`` (matching list of
    [H, W] expected linear-clip-depth maps; NaN marks pixels without
    supervision) adds a masked depth L1 term — the depth-regularized
    3DGS recipe, rendered via render_diff(return_depth=True).

    ``optimize_cameras=True`` additionally learns a per-view SE(3) pose
    correction (CameraDeltas, its own adam at ``camera_lr``) — gradients
    reach the pose through the projection/SH math, and the per-step
    structure rebuild keeps binning consistent with the corrected
    camera.  Standard for real captures whose COLMAP poses are noisy.

    ``sh_warmup_every`` > 0 reproduces the 3DGS SH warm-up
    (oneupSHdegree): gradients to SH bands above the active degree are
    masked, and the active degree grows from 0 by one every that many
    steps up to the model's degree — view-independent color settles
    before view-dependence trains.

    ``optimize_exposure=True`` learns a per-view color correction
    (Exposure: rendered*gain + bias per channel, its own adam at
    ``exposure_lr``), absorbing auto-exposure / white-balance drift of
    real captures instead of baking it into the splats.  The correction
    applies to the RENDER during loss evaluation only; exports and
    previews stay uncorrected.

    Checkpoint/resume: ``checkpoint_every`` > 0 writes
    save_checkpoint(``checkpoint_path``) every that many steps (and at
    the end); resume by passing load_checkpoint's ``params``, ``step``
    (as ``start_step``), ``opt_state``, ``camera_deltas`` and
    ``exposure`` back in — the camera rotation, densify schedule and
    loss indexing continue where they left off.  The splat-optimizer
    state round-trips exactly (same ``tx``); the per-view extras'
    adam moments warm-restart, so a resumed trajectory matches the
    uninterrupted one to tight tolerance rather than bitwise
    (pinned by test).

    Returns (params, losses: np.ndarray [steps]); when enabled, the
    fitted CameraDeltas and then the Exposure append in that order.
    ``tx`` overrides the default optax.adam(learning_rate).
    """
    import optax

    if tx is None:
        tx = optax.adam(learning_rate)
    if densify_until is None:
        densify_until = steps // 2

    tgts = [
        jnp.asarray(np.asarray(t)[..., :3], jnp.float32)
        / (255.0 if np.asarray(t).dtype == np.uint8 else 1.0)
        for t in targets
    ]

    use_depth = depth_weight > 0 and depth_targets is not None
    if use_depth:
        dtgts = [
            jnp.asarray(np.asarray(d), jnp.float32) for d in depth_targets
        ]
        if len(dtgts) != len(cameras_data):
            raise ValueError(
                f"{len(dtgts)} depth targets for "
                f"{len(cameras_data)} cameras"
            )

    def loss_fn(p, cam, target, dtarget, gain=None, bias=None):
        if use_depth:
            image, depth, structure = render_diff(
                p, cam, config, capacity, k_max, return_depth=True,
                remat=remat, interpret=interpret,
            )
        else:
            image, structure = render_diff(
                p, cam, config, capacity, k_max, remat=remat,
                interpret=interpret,
            )
        rgb = image[..., :3]
        if gain is not None:
            # Per-view exposure correction on the RENDER, so the target
            # stays the ground truth and the splats learn exposure-free
            # color.
            rgb = rgb * gain[None, None, :] + bias[None, None, :]
        err = rgb - target
        loss = l2_weight * jnp.mean(err * err) if l2_weight else 0.0
        if l1_weight:
            loss = loss + l1_weight * jnp.mean(jnp.abs(err))
        if ssim_weight:
            # The 3DGS D-SSIM term (1 - SSIM); the paper's loss is
            # l1_weight=0.8, ssim_weight=0.2, l2_weight=0.
            loss = loss + ssim_weight * (1.0 - ssim(rgb, target))
        if use_depth:
            # Masked L1 on expected linear clip depth: supervise only
            # pixels whose target is finite (NaN = unknown depth).
            m = jnp.isfinite(dtarget)
            d0 = jnp.where(m, dtarget, 0.0)
            n_valid = jnp.maximum(1.0, jnp.sum(m.astype(jnp.float32)))
            dloss = jnp.sum(jnp.abs(depth - d0) * m) / n_valid
            loss = loss + depth_weight * dloss
        return loss, structure.num_candidates

    # Optional per-view parameters ("extras") train alongside the
    # splats, each with its own optimizer.  Their adam moments are not
    # checkpointed (the values are); a resume warm-restarts them.
    n_views = len(cameras_data)
    extras = {}
    txs = {}
    if optimize_cameras:
        extras["cam"] = (
            camera_deltas
            if camera_deltas is not None
            else zero_camera_deltas(n_views)
        )
        txs["cam"] = optax.adam(camera_lr)
    if optimize_exposure:
        extras["exp"] = (
            exposure if exposure is not None else identity_exposure(n_views)
        )
        txs["exp"] = optax.adam(exposure_lr)
    extra_state = {k: txs[k].init(v) for k, v in extras.items()}
    has_cam = "cam" in extras
    has_exp = "exp" in extras

    # SH warm-up: [K] band index per coefficient (0, 1,1,1, 2,... —
    # static), compared against the traced active degree to mask grads.
    use_sh_warmup = sh_warmup_every > 0 and params.sh is not None
    if sh_warmup_every > 0 and params.sh is None:
        import warnings

        warnings.warn(
            "sh_warmup_every set but the model has no SH bands "
            "(sh_degree 0) — the warm-up schedule has nothing to do",
            RuntimeWarning,
        )
    if use_sh_warmup:
        k_coeffs = params.sh.shape[1]
        sh_bands = jnp.asarray(
            np.floor(np.sqrt(np.arange(k_coeffs))).astype(np.int32)
        )

    @jax.jit
    def step(p, ex, opt_state, ex_state, cam, target, dtarget, idx,
             sh_active):
        def full_loss(p, ex):
            cam2 = (
                apply_camera_delta(cam, ex["cam"].dr[idx], ex["cam"].dt[idx])
                if has_cam
                else cam
            )
            gain = ex["exp"].gain[idx] if has_exp else None
            bias = ex["exp"].bias[idx] if has_exp else None
            return loss_fn(p, cam2, target, dtarget, gain, bias)

        (loss, cand), (gp, gex) = jax.value_and_grad(
            full_loss, argnums=(0, 1), has_aux=True
        )(p, ex)
        if use_sh_warmup:
            mask = (sh_bands <= sh_active).astype(jnp.float32)
            gp = gp._replace(sh=gp.sh * mask[None, :, None])
        gnorm = jnp.sqrt(jnp.sum(gp.means * gp.means, axis=0))
        updates, opt_state = tx.update(gp, opt_state, p)
        p = optax.apply_updates(p, updates)
        # Per-view sparsity: only the rendered view's row may move.
        # Without this, adam's decaying first moment emits nonzero
        # updates for every OTHER view (whose gradient this step is
        # zero) — V-1 stale-momentum drift updates per cycle.  Rows
        # != idx keep both their value and their optimizer moments.
        row = (jnp.arange(n_views, dtype=jnp.int32) == idx).astype(
            jnp.float32
        )

        def _active_rows_only(new, old):
            if getattr(new, "ndim", 0) >= 1 and new.shape[0] == n_views:
                m = row.reshape((n_views,) + (1,) * (new.ndim - 1))
                return new * m + old * (1.0 - m)
            return new  # scalars (adam step count)

        new_ex, new_ex_state = {}, {}
        for name in ex:
            u, s = txs[name].update(gex[name], ex_state[name], ex[name])
            u = jax.tree_util.tree_map(
                lambda a: _active_rows_only(a, jnp.zeros_like(a)), u
            )
            s = jax.tree_util.tree_map(_active_rows_only, s, ex_state[name])
            new_ex[name] = optax.apply_updates(ex[name], u)
            new_ex_state[name] = s
        return p, new_ex, opt_state, new_ex_state, loss, cand, gnorm

    if densify_every:
        lo = np.asarray(params.means).min(axis=1)
        hi = np.asarray(params.means).max(axis=1)
        scene_extent = float(np.linalg.norm(hi - lo)) or 1.0

    if opt_state is None:
        opt_state = tx.init(params)
    losses = np.zeros(steps, np.float32)
    sat_warned = False
    gacc = np.zeros(params.means.shape[-1], np.float64)
    gcnt = 0
    dummy = jnp.zeros((), jnp.float32)  # unused when depth is off
    for i in range(start_step, steps):
        f = i % len(cameras_data)
        dtg = dtgts[f] if use_depth else dummy
        sh_active = jnp.int32(
            i // sh_warmup_every if use_sh_warmup else 127
        )
        (params, extras, opt_state, extra_state, loss, cand,
         gnorm) = step(
            params, extras, opt_state, extra_state,
            cameras_data[f], tgts[f], dtg, jnp.int32(f), sh_active,
        )
        losses[i] = float(loss)
        gacc += np.asarray(gnorm, np.float64)
        gcnt += 1
        if not sat_warned and int(cand) > capacity:
            import warnings

            warnings.warn(
                f"fit step {i}: {int(cand)} candidate pairs exceed the "
                f"structure capacity ({capacity}); frames render with a "
                "truncated pair list — raise `capacity`.",
                RuntimeWarning,
            )
            sat_warned = True
        if (
            densify_every
            and i < densify_until
            and (i + 1) % densify_every == 0
        ):
            n0 = params.means.shape[-1]
            params = densify_and_prune(
                params, (gacc / max(1, gcnt)).astype(np.float32),
                scene_extent=scene_extent, seed=i,
                **(densify_args or {}),
            )
            opt_state = tx.init(params)
            gacc = np.zeros(params.means.shape[-1], np.float64)
            gcnt = 0
            if log_every:
                print(
                    f"step {i:5d}  densify: {n0} -> "
                    f"{params.means.shape[-1]} splats",
                    flush=True,
                )
        if (
            checkpoint_every
            and checkpoint_path
            and ((i + 1) % checkpoint_every == 0 or i == steps - 1)
        ):
            save_checkpoint(
                checkpoint_path, params, step=i + 1,
                opt_state=opt_state,
                camera_deltas=extras.get("cam"),
                exposure=extras.get("exp"),
            )
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"step {i:5d}  loss {float(loss):.6f}", flush=True)
    out = [params, losses]
    if optimize_cameras:
        out.append(extras["cam"])
    if optimize_exposure:
        out.append(extras["exp"])
    return tuple(out)


def _npz_path(path) -> str:
    """np.savez appends '.npz' to bare paths; normalize up front so
    save and load always agree on the file name."""
    p = str(path)
    return p if p.endswith(".npz") else p + ".npz"


def save_checkpoint(
    path,
    params: DiffSplats,
    *,
    step: int = 0,
    opt_state=None,
    camera_deltas: Optional[CameraDeltas] = None,
    exposure: Optional[Exposure] = None,
) -> None:
    """Write a training checkpoint (single .npz): the raw DiffSplats
    leaves, the step counter, and optionally the optimizer-state
    leaves, pose corrections and exposure — everything fit() needs for
    an exact resume.
    The reference persists nothing (SURVEY.md §5: checkpoint N/A); this
    exists for the training path, where multi-hour fits are real."""
    arrs = {"step": np.int64(step)}
    for name in params._fields:
        leaf = getattr(params, name)
        if leaf is not None:
            arrs[f"p_{name}"] = np.asarray(leaf)
    if camera_deltas is not None:
        arrs["d_dr"] = np.asarray(camera_deltas.dr)
        arrs["d_dt"] = np.asarray(camera_deltas.dt)
    if exposure is not None:
        arrs["e_gain"] = np.asarray(exposure.gain)
        arrs["e_bias"] = np.asarray(exposure.bias)
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
            arrs[f"o_{i}"] = np.asarray(leaf)
    np.savez(_npz_path(path), **arrs)


def load_checkpoint(path, *, tx=None) -> dict:
    """Read a save_checkpoint .npz.  Returns a dict with ``params``
    (DiffSplats), ``step`` (int), ``camera_deltas`` (CameraDeltas or
    None), ``exposure`` (Exposure or None), and — when the matching
    optax transform is passed as ``tx`` — ``opt_state`` rebuilt from
    the stored leaves (None otherwise, or if the leaf count no longer
    matches)."""
    with np.load(_npz_path(path)) as z:
        fields = {
            name: jnp.asarray(z[f"p_{name}"])
            for name in DiffSplats._fields
            if f"p_{name}" in z
        }
        params = DiffSplats(**fields)
        step = int(z["step"])
        deltas = None
        if "d_dr" in z:
            deltas = CameraDeltas(
                dr=jnp.asarray(z["d_dr"]), dt=jnp.asarray(z["d_dt"])
            )
        exp = None
        if "e_gain" in z:
            exp = Exposure(
                gain=jnp.asarray(z["e_gain"]),
                bias=jnp.asarray(z["e_bias"]),
            )
        opt_state = None
        if tx is not None:
            template = tx.init(params)
            treedef = jax.tree_util.tree_structure(template)
            want = len(jax.tree_util.tree_leaves(template))
            leaves = [
                jnp.asarray(z[f"o_{i}"])
                for i in range(want)
                if f"o_{i}" in z
            ]
            if len(leaves) == want:
                opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return dict(
        params=params, step=step, camera_deltas=deltas,
        exposure=exp, opt_state=opt_state,
    )


def write_fitted_ply(path_or_stream, params: DiffSplats) -> None:
    """Write fitted parameters as a standard raw .ply (the reference's
    storage format, PlyParser.cpp) — DiffSplats already IS the raw
    pre-activation parametrization (log-scales, logit-opacities,
    unnormalized quaternions), so this is a direct field mapping."""
    from .ply import write_gaussian_ply

    q = np.asarray(params.quats)  # [4, N] xyzw -> [N, 4] wxyz
    quats_wxyz = np.stack([q[3], q[0], q[1], q[2]], axis=-1)
    if params.sh is not None:
        sh = np.asarray(params.sh)  # [3, K, N]
        f_dc = sh[:, 0].T
        f_rest = (
            np.transpose(sh[:, 1:], (2, 0, 1)) if sh.shape[1] > 1 else None
        )
    else:
        colors = np.clip(np.asarray(params.colors), 0.0, 1.0)
        f_dc = ((colors - 0.5) / 0.28209479177387814).T
        f_rest = None
    write_gaussian_ply(
        path_or_stream,
        np.asarray(params.means).T,
        np.asarray(params.log_scales).T,
        quats_wxyz,
        np.asarray(params.opacity_logits),
        f_dc,
        f_rest,
    )


def random_init(
    count: int,
    bounds_min,
    bounds_max,
    *,
    seed: int = 0,
    scale: float = 0.1,
    opacity: float = 0.5,
    sh_degree: int = 0,
) -> DiffSplats:
    """Random initialization inside a world AABB (fitting from scratch)."""
    rng = np.random.default_rng(seed)
    lo = np.asarray(bounds_min, np.float32)
    hi = np.asarray(bounds_max, np.float32)
    means = rng.uniform(lo, hi, (count, 3)).astype(np.float32).T
    q = rng.normal(size=(4, count)).astype(np.float32)
    op = np.float32(np.log(opacity) - np.log1p(-opacity))
    sh = None
    colors = rng.uniform(0.2, 0.8, (3, count)).astype(np.float32)
    if sh_degree > 0:
        k = num_sh_coeffs(sh_degree)
        sh = np.zeros((3, k, count), np.float32)
        sh[:, 0] = (colors - 0.5) / 0.28209479177387814
    return DiffSplats(
        means=jnp.asarray(means),
        log_scales=jnp.full((3, count), np.log(scale), jnp.float32),
        quats=jnp.asarray(q),
        opacity_logits=jnp.full((count,), op, jnp.float32),
        colors=jnp.asarray(colors),
        sh=None if sh is None else jnp.asarray(sh),
    )


def _knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance from each point to its ``k`` nearest neighbors
    (exclusive of self).  cKDTree when scipy is present, chunked
    brute-force otherwise."""
    n = points.shape[0]
    if n <= 1:
        return np.ones(n, np.float32)
    k = min(k, n - 1)
    try:
        from scipy.spatial import cKDTree

        d, _ = cKDTree(points).query(points, k=k + 1, workers=-1)
        return d[:, 1:].mean(axis=1).astype(np.float32)
    except ImportError:  # pragma: no cover - scipy is in the image
        out = np.empty(n, np.float32)
        for s in range(0, n, 4096):
            blk = points[s:s + 4096]
            d2 = ((blk[:, None, :] - points[None, :, :]) ** 2).sum(-1)
            part = np.partition(d2, k, axis=1)[:, 1:k + 1]
            out[s:s + 4096] = np.sqrt(np.maximum(part, 0.0)).mean(axis=1)
        return out


def init_from_points(
    points_xyz: np.ndarray,
    points_rgb: np.ndarray,
    *,
    opacity: float = 0.1,
    sh_degree: int = 0,
    max_points: int = 0,
    seed: int = 0,
) -> DiffSplats:
    """SfM point-cloud initialization — the canonical 3DGS recipe: one
    isotropic splat per point, scale = mean distance to the 3 nearest
    neighbors (floored so coincident points stay renderable), opacity
    0.1, color from the point's RGB (as the SH DC term when
    ``sh_degree`` > 0).  ``max_points`` > 0 subsamples uniformly (fit
    memory is O(count)).  The CUDA reference has no training path;
    the feeding formats are colmap.load_dataset's points."""
    xyz = np.asarray(points_xyz, np.float32).reshape(-1, 3)
    rgb = np.clip(np.asarray(points_rgb, np.float32).reshape(-1, 3), 0, 1)
    if xyz.shape[0] == 0:
        raise ValueError("empty point cloud")
    if rgb.shape[0] != xyz.shape[0]:
        raise ValueError(
            f"{xyz.shape[0]} points but {rgb.shape[0]} colors")
    if max_points > 0 and xyz.shape[0] > max_points:
        idx = np.random.default_rng(seed).choice(
            xyz.shape[0], max_points, replace=False)
        idx.sort()
        xyz, rgb = xyz[idx], rgb[idx]
    n = xyz.shape[0]
    dist = np.maximum(_knn_mean_dist(xyz), 1e-4)
    quats = np.zeros((4, n), np.float32)
    quats[3] = 1.0  # identity in this module's (x, y, z, w) row order
    op = float(np.clip(opacity, 1e-4, 1.0 - 1e-4))
    op_logit = np.float32(np.log(op) - np.log1p(-op))
    colors = rgb.T.copy()
    sh = None
    if sh_degree > 0:
        sh = np.zeros((3, num_sh_coeffs(sh_degree), n), np.float32)
        sh[:, 0] = (colors - 0.5) / 0.28209479177387814
    return DiffSplats(
        means=jnp.asarray(xyz.T),
        log_scales=jnp.asarray(
            np.broadcast_to(np.log(dist), (3, n)).copy()),
        quats=jnp.asarray(quats),
        opacity_logits=jnp.full((n,), op_logit, jnp.float32),
        colors=jnp.asarray(colors),
        sh=None if sh is None else jnp.asarray(sh),
    )
