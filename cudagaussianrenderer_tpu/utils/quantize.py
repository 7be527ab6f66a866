"""8-bit rotation quantization.

The reference packs each splat's unit quaternion into a single uint32 with
8 bits per component, stored bit-reinterpreted in the .w of the scale float4
(pack: /root/reference/src/PlyParser.cpp:155-165, unpack:
GaussianRender.cu:55-58).  The quantization is a *feature* — it changes the
rendered covariance slightly — so the TPU build reproduces it bit-exactly.

Layout (MSB..LSB): [x:8][y:8][z:8][w:8], each component mapped from
[-1, 1] -> [0, 1] -> round-toward-zero to [0, 255].

Functions accept either numpy or jax.numpy arrays; pass the array module as
``xp``.
"""

from __future__ import annotations

import numpy as np


def encode_quat_xyzw(q_xyzw, xp=np):
    """Pack quaternion components (x, y, z, w in [-1, 1]) into uint32.

    ``q_xyzw``: (..., 4) float array.  Returns (...,) uint32.
    Matches encodeVec4((q + 1) * 0.5): clamp to [0,1], scale by 255,
    truncate (C float->uint cast).
    """
    v = xp.clip((q_xyzw + 1.0) * 0.5, 0.0, 1.0)
    b = (v * 255.0).astype(xp.uint32)  # truncation, like the C cast
    return (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]


def decode_quat_components(packed, xp=np):
    """Unpack uint32 -> 4 separate float32 [N] vectors (x, y, z, w) in
    [-1, 1] — the planar-SoA variant of decode_quat_xyzw, avoiding a
    small-minor-dim stack on TPU."""
    packed = packed.astype(xp.uint32)

    def comp(shift):
        # Same op order as decode_quat_xyzw for bit-identical results.
        return ((packed >> shift) & 0xFF).astype(xp.float32) / 255.0 * 2.0 - 1.0

    return comp(24), comp(16), comp(8), comp(0)


def decode_quat_xyzw(packed, xp=np):
    """Unpack uint32 -> (..., 4) float32 quaternion components in [-1, 1].

    Matches decodeVec4(v) * 2 - 1.  The result is *not* re-normalized,
    matching the reference (GaussianRender.cu:220-221).
    """
    packed = packed.astype(xp.uint32)
    x = ((packed >> 24) & 0xFF).astype(xp.float32)
    y = ((packed >> 16) & 0xFF).astype(xp.float32)
    z = ((packed >> 8) & 0xFF).astype(xp.float32)
    w = (packed & 0xFF).astype(xp.float32)
    q = xp.stack([x, y, z, w], axis=-1) / 255.0
    return q * 2.0 - 1.0


def quat_xyzw_to_rotation_matrix(q_xyzw, xp=np):
    """Rotation matrix from quaternion (x, y, z, w), glm::mat3_cast form.

    Assumes (approximately) unit quaternions; intentionally does NOT divide
    by the norm, matching glm's behavior on the slightly-off-unit decoded
    quaternions.  Returns (..., 3, 3) with rows indexing matrix rows.
    """
    x, y, z, w = (q_xyzw[..., 0], q_xyzw[..., 1], q_xyzw[..., 2], q_xyzw[..., 3])
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    rows = [
        xp.stack([r00, r01, r02], axis=-1),
        xp.stack([r10, r11, r12], axis=-1),
        xp.stack([r20, r21, r22], axis=-1),
    ]
    return xp.stack(rows, axis=-2)
