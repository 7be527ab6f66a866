"""Per-splat EWA projection — clip-space position, confidence ellipse, conic.

Stage B of the frame pipeline, the TPU re-design of
evaluateSplatClipDataKernel (/root/reference/src/GaussianRender.cu:203-348).
The CUDA kernel maps one thread per splat; here the whole stage is one
vectorized jnp computation over [N] splats — XLA fuses the quaternion
decode, covariance products, para-perspective Jacobian, closed-form 2x2
eigendecomposition and frustum cull into a single VPU pass.

Math summary (kept numerically faithful — the epsilons, the lambda clamps
and the anti-shrink trace bump are load-bearing for tiny splats):
  - world covariance Sigma = R S S^T R^T with R from the 8-bit-quantized
    quaternion (not re-normalized) and S = diag(scales);
  - para-perspective affine projection: the EWA Jacobian of the perspective
    map linearized at the splat's view-space center, with a *linear*
    (orthographic-style) depth for sort precision;
  - clip 2x2 covariance + trace bump (1/pi)*(2/screen)^2 so distant splats
    cover at least ~a texel;
  - eigenvalues via det/trace closed form -> oriented confidence ellipse
    (extent = sigma_factor * sqrt(lambda)), conic = inverse covariance;
  - branchless frustum cull: out-of-frustum splats get center (-128, -128)
    and zero extent so downstream binning sees zero candidate tiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# The 3x3-sized contractions here are tiny but precision-critical: on TPU
# the default ("fastest") matmul precision routes f32 through bf16 MXU
# passes, costing ~3 decimal digits on clip positions.  Force full f32.
_HIGHEST = jax.lax.Precision.HIGHEST

from ..config import RenderConfig
from ..utils.quantize import decode_quat_xyzw, quat_xyzw_to_rotation_matrix


class SplatClipData(NamedTuple):
    """SoA outputs of the projection stage (GaussianRender.cu:324-327).

    All fields are planar [N] vectors: TPU lane layouts pad a trailing
    dimension to 128, so small-minor-dim arrays like [N, 2] waste memory
    and every column extract forces a relayout.  Planar SoA keeps every
    downstream op a cheap contiguous pass.
    """

    cx: jnp.ndarray      # [N] clip-space center x (or -128 if culled)
    cy: jnp.ndarray      # [N] clip-space center y
    z: jnp.ndarray       # [N] linear clip depth in [-1, 1]
    cos_t: jnp.ndarray   # [N] ellipse principal-axis direction
    sin_t: jnp.ndarray
    e0: jnp.ndarray      # [N] ellipse extents (0 if culled)
    e1: jnp.ndarray
    con_a: jnp.ndarray   # [N] conic (inverse 2x2 covariance)
    con_b: jnp.ndarray
    con_c: jnp.ndarray

    # Stacked views for tests/tools (do not use in the hot path).
    @property
    def clip_xy(self):
        return jnp.stack([self.cx, self.cy], axis=-1)

    @property
    def clip_z(self):
        return self.z

    @property
    def ellipse(self):
        return jnp.stack([self.cos_t, self.sin_t, self.e0, self.e1], axis=-1)

    @property
    def conic(self):
        return jnp.stack([self.con_a, self.con_b, self.con_c], axis=-1)


def project_splats(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats_packed: jnp.ndarray,
    camera: dict,
    config: RenderConfig,
) -> SplatClipData:
    """Project [N] splats into clip space.

    ``camera`` is the CameraData pytree: view [4,4], position [3],
    fov_cotangent [2], depth_scale_bias [2], aspect scalar.
    """
    eps = config.epsilon
    view = camera["view"]
    fov_cot = camera["fov_cotangent"]
    depth_sb = camera["depth_scale_bias"]

    # --- world covariance from quantized rotation + scales (cu:209-224) ---
    q = decode_quat_xyzw(quats_packed, xp=jnp)            # [N, 4], un-normalized
    rot = quat_xyzw_to_rotation_matrix(q, xp=jnp)          # [N, 3, 3]
    # Sigma = R * diag(s^2) * R^T
    rs2 = rot * (scales**2)[:, None, :]                    # R * diag(s^2)
    sigma = jnp.einsum("nik,njk->nij", rs2, rot, precision=_HIGHEST)           # [N, 3, 3]

    # --- view-space center (cu:227) ---
    view_pos = jnp.einsum("ni,ji->nj", means, view[:3, :3], precision=_HIGHEST) + view[:3, 3]        # [N, 3]
    vx, vy, vz = view_pos[:, 0], view_pos[:, 1], view_pos[:, 2]

    # --- para-perspective Jacobian terms (cu:234-259) ---
    z_rcp = 1.0 / vz
    z_rcp_sqr = z_rcp * z_rcp
    scale_x = -fov_cot[0] * z_rcp
    scale_y = -fov_cot[1] * z_rcp
    shear_x = fov_cot[0] * vx * z_rcp_sqr
    shear_y = fov_cot[1] * vy * z_rcp_sqr

    # Rows of (J @ view3x3); only the two rows feeding the 2x2 covariance.
    v3 = view[:3, :3]
    row_x = scale_x[:, None] * v3[0] + shear_x[:, None] * v3[2]  # [N, 3]
    row_y = scale_y[:, None] * v3[1] + shear_y[:, None] * v3[2]

    # cov2d = M Sigma M^T restricted to the x/y rows (cu:262-264).
    s_rx = jnp.einsum("nij,nj->ni", sigma, row_x, precision=_HIGHEST)
    s_ry = jnp.einsum("nij,nj->ni", sigma, row_y, precision=_HIGHEST)
    cov_a = jnp.sum(row_x * s_rx, axis=-1)
    cov_b = jnp.sum(row_y * s_rx, axis=-1)
    cov_c = jnp.sum(row_y * s_ry, axis=-1)

    # Anti-shrink trace bump: (1/pi) * (2/screen)^2 (cu:267-276).
    texel_clip = 2.0 / float(config.screen_size)
    trace_bump = (1.0 / jnp.pi) * texel_clip * texel_clip
    cov_a = cov_a + trace_bump
    cov_c = cov_c + trace_bump

    # --- clip-space center (cu:265) ---
    # The affine projection applied to its own linearization point reduces
    # exactly to the perspective point -cot * v / vz; evaluating that form
    # directly avoids the catastrophic shear*vz + translation cancellation
    # the three-term float32 evaluation suffers.
    clip_x = scale_x * vx
    clip_y = scale_y * vy
    clip_z = depth_sb[0] * vz + depth_sb[1]

    # --- closed-form 2x2 eigendecomposition (cu:279-292) ---
    det = cov_a * cov_c - cov_b * cov_b
    mid = 0.5 * (cov_a + cov_c)
    radius = jnp.sqrt(jnp.maximum(eps, mid * mid - det))
    lambda0 = mid + radius
    lambda1 = jnp.maximum(0.0, mid - radius)

    # Principal eigenvector; guard the degenerate (already-axis-aligned)
    # case where (b, lambda0 - a) vanishes.
    ev_x, ev_y = cov_b, lambda0 - cov_a
    ev_norm = jnp.sqrt(ev_x * ev_x + ev_y * ev_y)
    degenerate = ev_norm < 1e-20
    ev_x = jnp.where(degenerate, 1.0, ev_x)
    ev_y = jnp.where(degenerate, 0.0, ev_y)
    ev_norm = jnp.where(degenerate, 1.0, ev_norm)
    cos_t = ev_x / ev_norm
    sin_t = ev_y / ev_norm

    # Confidence ellipse (cu:295-302).
    sf = config.sigma_factor
    ext0 = jnp.sqrt(lambda0) * sf
    ext1 = jnp.sqrt(lambda1) * sf

    # Conic = inverse 2x2 covariance (cu:305-307).
    inv_det = 1.0 / jnp.maximum(eps, det)
    conic_a = cov_c * inv_det
    conic_b = -cov_b * inv_det
    conic_c = cov_a * inv_det

    # --- branchless frustum cull (cu:314-321) ---
    inside = (
        (clip_x >= -1.0) & (clip_x <= 1.0)
        & (clip_y >= -1.0) & (clip_y <= 1.0)
        & (clip_z >= -1.0) & (clip_z <= 1.0)
    )
    visible = inside & (lambda1 >= 0.0)
    visf = visible.astype(clip_x.dtype)

    return SplatClipData(
        cx=jnp.where(visible, clip_x, -128.0),
        cy=jnp.where(visible, clip_y, -128.0),
        z=clip_z,
        cos_t=cos_t,
        sin_t=sin_t,
        e0=ext0 * visf,
        e1=ext1 * visf,
        con_a=conic_a,
        con_b=conic_b,
        con_c=conic_c,
    )
