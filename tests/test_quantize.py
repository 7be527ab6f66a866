"""Rotation quantization round-trip (encodeVec4 / decodeVec4 parity)."""

import numpy as np
import pytest

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


def test_pair_buffers_are_integer_typed():
    """Packed attribute words are arbitrary bit patterns; carrying them in
    f32-typed arrays corrupts them on TPU (subnormal patterns flush to
    +/-0, NaN patterns canonicalize in vector-unit copies — see
    raster.pack_pair_data).  Guard the integer-typed contract end to end:
    the emit kernel output, the sort operands, and the raster streaming
    buffer must stay uint32, and pack_pair_data must pass hazardous
    patterns through bit-exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cudagaussianrenderer_tpu.ops.raster import pack_pair_data

    hazard = np.array(
        [
            0x00000001,  # smallest subnormal pattern
            0x8037EC7A,  # negative subnormal (the original field failure)
            0x7F800001,  # signaling NaN pattern
            0x7FD844EC,  # quiet NaN payload pattern
            0xFF800000,  # -inf pattern
            0x7F7FFFFF,  # largest finite
            0x00000000,
            0xFFFFFFFF,
        ],
        dtype=np.uint32,
    )
    attrs = tuple(jnp.asarray(np.roll(hazard, k)) for k in range(3))
    pd = jax.jit(lambda a, b, c: pack_pair_data((a, b, c), 128))(*attrs)
    assert pd.dtype == jnp.uint32
    got = np.asarray(pd)
    for k in range(3):
        np.testing.assert_array_equal(got[k, : hazard.size], np.roll(hazard, k))


@pytest.mark.slow
def test_emit_output_is_integer_typed():
    import jax
    import jax.numpy as jnp

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import Camera
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
    from cudagaussianrenderer_tpu.ops.projection import project_splats

    scene = random_scene(256, seed=0)
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)

    @jax.jit
    def fn(s, c):
        clip = project_splats(s.means, s.scales, s.quats, c, config)
        return build_tile_pairs(clip, s.colors, s.opacities, config, 4096)

    pairs = fn(scene, cam.camera_data())
    for op in (*pairs.keys, *pairs.attrs):
        assert op.dtype == jnp.uint32, op.dtype


def test_conic_pack_roundtrip_precision():
    """pack_conic_u32/unpack_conic_u32: a and c keep bf16-level relative
    precision across the supported range, and the reconstructed b keeps
    the density error bounded: |dpow_err| <= dpow / 127 for any (dx, dy)
    (the PSD correlation argument in the docstring)."""
    import numpy as np
    import jax
    from cudagaussianrenderer_tpu.ops.geometry import (
        pack_conic_u32,
        unpack_conic_u32,
    )

    rng = np.random.default_rng(0)
    # Conics of random ellipses: eigenvalues lambda in [1e-4, 1e6],
    # random rotation; conic = R diag(1/l0, 1/l1) R^T.
    n = 4096
    l0 = 10.0 ** rng.uniform(-1, 6, n)
    l1 = l0 * 10.0 ** rng.uniform(-3, 0, n)
    th = rng.uniform(0, np.pi, n)
    ct, st = np.cos(th), np.sin(th)
    a = (ct * ct * l0 + st * st * l1).astype(np.float32)
    c = (st * st * l0 + ct * ct * l1).astype(np.float32)
    b = (ct * st * (l0 - l1)).astype(np.float32)

    q = jax.jit(pack_conic_u32)(a, b, c)
    a2, b2, c2 = jax.jit(unpack_conic_u32)(q)
    a2, b2, c2 = np.asarray(a2), np.asarray(b2), np.asarray(c2)

    in_range = (a > 2**-8) & (a < 2**23) & (c > 2**-8) & (c < 2**23)
    rel_a = np.abs(a2[in_range] - a[in_range]) / a[in_range]
    rel_c = np.abs(c2[in_range] - c[in_range]) / c[in_range]
    assert rel_a.max() < 4.0e-3  # bf16: 2^-8 max relative rounding
    assert rel_c.max() < 4.0e-3

    # Density-exponent bound: for any (dx, dy),
    # |db*2*dx*dy| <= drho * (a dx^2 + c dy^2) + bf16 slack.
    drho = np.abs(b2 - b) / np.maximum(np.sqrt(a2 * c2), 1e-30)
    assert drho[in_range].max() <= 1.0 / 127.5 + 5e-3
