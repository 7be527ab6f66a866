"""Rotation quantization round-trip (encodeVec4 / decodeVec4 parity)."""

import numpy as np

from cudagaussianrenderer_tpu.utils.quantize import (
    decode_quat_xyzw,
    encode_quat_xyzw,
    quat_xyzw_to_rotation_matrix,
)


def test_encode_known_values():
    # (q+1)*0.5 mapping: q = -1 -> byte 0, q = 1 -> byte 255.
    packed = encode_quat_xyzw(np.array([[-1.0, 1.0, 0.0, 1.0]]))
    assert packed[0] == (0 << 24) | (255 << 16) | (127 << 8) | 255


def test_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(1000, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dec = decode_quat_xyzw(encode_quat_xyzw(q))
    # 8-bit quantization of [-1, 1]: max error 2/255 (truncating encode).
    assert np.max(np.abs(dec - q)) <= 2.0 / 255.0 + 1e-6


def test_rotation_matrix_is_rotation_for_unit_quats():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(100, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r = quat_xyzw_to_rotation_matrix(q)
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (100, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)


def test_identity_quat():
    r = quat_xyzw_to_rotation_matrix(np.array([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-12)
