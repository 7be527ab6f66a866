"""Spherical harmonics vs an independent associated-Legendre oracle.

The reference's SH code is generated offline by sh_gen.py (sympy); our
basis is hand-derived.  The oracle here re-derives real SH from the
Legendre recurrences (no Condon-Shortley phase, matching the generated
table's all-positive convention) so all three agree only if the math is
right.
"""

import numpy as np
import pytest

from cudagaussianrenderer_tpu.golden import oracle_sh_basis
from cudagaussianrenderer_tpu.ops.sh import evaluate_sh_colors, num_sh_coeffs, sh_basis


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_basis_matches_legendre_oracle(degree):
    rng = np.random.default_rng(42)
    dirs = rng.normal(size=(512, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    got = sh_basis(dirs.astype(np.float32), degree, xp=np)
    want = oracle_sh_basis(dirs, degree)
    assert got.shape == (512, num_sh_coeffs(degree))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sh_basis_matches_reference_generated_form():
    """Spot-check the x^2+y^2 expanded forms the reference's codegen emits
    (GaussianRender.cu:100-149) equal our canonical z forms on unit dirs."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xx, yy = x * x, y * y
    b = sh_basis(d.astype(np.float64), 4, xp=np)
    # degree 2, m=0 band:
    np.testing.assert_allclose(
        b[:, 6], -0.946174696 * xx - 0.946174696 * yy + 0.630783131, atol=1e-6
    )
    # degree 3, m=-1 band:
    np.testing.assert_allclose(
        b[:, 11], 3.6563664 * y * (-0.625 * xx - 0.625 * yy + 0.5), atol=1e-6
    )
    # degree 4, m=0 band:
    np.testing.assert_allclose(
        b[:, 20],
        7.40498828 * xx * yy - 4.23142188 * xx + 3.70249414 * xx * xx
        - 4.23142188 * yy + 3.70249414 * yy * yy + 0.846284375,
        atol=1e-6,
    )


def test_evaluate_sh_colors_clamps_and_degree0():
    rng = np.random.default_rng(3)
    n, k = 64, 25
    means = rng.normal(size=(3, n)).astype(np.float32)   # planar [3, N]
    sh = rng.normal(size=(3, k, n)).astype(np.float32) * 2.0  # planar [3, K, N]
    cam = np.array([0.0, 0.0, 5.0], np.float32)

    colors = np.asarray(evaluate_sh_colors(means, sh, cam, 0))
    # Degree 0: color = clamp(C0 * sh0 + 0.5).
    want = np.clip(0.28209479177387814 * sh[:, 0, :] + 0.5, 0.0, 1.0)
    np.testing.assert_allclose(colors, want, rtol=1e-5, atol=1e-6)

    colors4 = np.asarray(evaluate_sh_colors(means, sh, cam, 4))
    assert colors4.min() >= 0.0 and colors4.max() <= 1.0
    assert not np.allclose(colors4, colors)

    # Planar path agrees with the stacked-basis formulation.
    d = (cam[:, None] - means)
    d = d / np.linalg.norm(d, axis=0, keepdims=True)
    basis = sh_basis(d.T.astype(np.float64), 4, xp=np)  # [N, 25]
    want4 = np.clip(np.einsum("nk,ckn->cn", basis, sh.astype(np.float64)) + 0.5, 0, 1)
    np.testing.assert_allclose(colors4, want4, rtol=1e-4, atol=1e-5)
