"""Gaussian-splat scene model.

The CUDA reference stores the scene as four interleaved float4 device
buffers (position+opacity, scale+packed-rotation, color+opacity, flat SH;
/root/reference/src/Demo.cpp:313-321, PlyParser.cpp:330-335).  On TPU we use
planar SoA ``jnp`` arrays with the splat axis on TPU lanes, and a plain
``[3, K, N]`` spherical-harmonics tensor instead of the block-interleaved
GPU layout (Demo.cpp:160-194), which exists only to coalesce CUDA global
loads.

``GaussianScene`` is a pytree whose static metadata (splat count, SH degree)
ride in the treedef, so jitted functions specialize on them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.quantize import encode_quat_xyzw

# SH DC normalization constant: Y_0^0 = 1 / (2 sqrt(pi))
# (reference: PlyParser.cpp:326).
SH_C0 = 0.28209479177387814


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianScene:
    """A splat scene resident on device (or as numpy, pre-upload).

    Storage is planar SoA with the splat axis LAST ([3, N] rather than
    [N, 3]): TPU lane layouts pad a trailing dimension to 128, so
    xyz-minor arrays would waste 40x memory and force relayouts on every
    component access.

    Attributes
    ----------
    means:      [3, N] float32 world-space centers (rows x, y, z).
    scales:     [3, N] float32 per-axis std-dev (activation exp() already
                applied, PlyParser.cpp:318).
    quats:      [N] uint32 packed (x,y,z,w) rotation, 8 bits/component
                (PlyParser.cpp:330).
    opacities:  [N] float32 in [0, 1] (sigmoid applied, PlyParser.cpp:319).
    colors:     [3, N] float32 baked degree-0 color = f_dc * SH_C0 + 0.5
                (PlyParser.cpp:326-327); used directly when sh is None.
    sh:         [3, K, N] float32 or None.  K = (sh_degree + 1)^2 bands
                including the DC band at k=0 (PlyParser.cpp:245-267).
    sh_degree:  static int, 0..4.
    count:      static int, true splat count (arrays may be padded beyond).
    bounds_min/bounds_max: static 3-tuples, world AABB of the means
                (PlyParser.cpp:289-324).
    """

    means: jax.Array
    scales: jax.Array
    quats: jax.Array
    opacities: jax.Array
    colors: jax.Array
    sh: Optional[jax.Array]

    sh_degree: int = dataclasses.field(metadata=dict(static=True), default=0)
    count: int = dataclasses.field(metadata=dict(static=True), default=0)
    bounds_min: Tuple[float, float, float] = dataclasses.field(
        metadata=dict(static=True), default=(0.0, 0.0, 0.0)
    )
    bounds_max: Tuple[float, float, float] = dataclasses.field(
        metadata=dict(static=True), default=(0.0, 0.0, 0.0)
    )

    @property
    def padded_count(self) -> int:
        return self.means.shape[-1]

    @property
    def sh_coeff_count(self) -> int:
        """Bands per channel, (degree+1)^2."""
        return (self.sh_degree + 1) ** 2

    def pad_to(self, n: int) -> "GaussianScene":
        """Pad arrays to ``n`` splats with inert entries.

        Padding splats have opacity 0 and zero scale, parked at the
        bounds-min corner.  The projection culls opacity-0 splats
        outright (ops.projection), so they emit zero tile pairs and
        cost nothing beyond the per-splat stage math.
        """
        cur = self.padded_count
        if n < cur:
            raise ValueError(f"cannot pad {cur} splats down to {n}")
        if n == cur:
            return self
        pad = n - cur
        park = np.asarray(self.bounds_min, np.float32)

        def pad_last(a, fill):
            fills = jnp.broadcast_to(
                jnp.asarray(fill, a.dtype)[..., None], a.shape[:-1] + (pad,)
            )
            return jnp.concatenate([a, fills], axis=-1)

        return dataclasses.replace(
            self,
            means=pad_last(self.means, park),
            scales=pad_last(self.scales, np.zeros(3, np.float32)),
            quats=pad_last(
                self.quats, np.uint32(encode_quat_xyzw(np.array([0.0, 0, 0, 1.0])))
            ),
            opacities=pad_last(self.opacities, np.float32(0)),
            colors=pad_last(self.colors, np.zeros(3, np.float32)),
            sh=None
            if self.sh is None
            else pad_last(self.sh, np.zeros(self.sh.shape[:-1], np.float32)),
        )

    def pad_to_multiple(self, m: int = 256) -> "GaussianScene":
        n = -(-self.padded_count // m) * m
        return self.pad_to(n)


def scene_from_arrays(
    means: np.ndarray,
    scales: np.ndarray,
    quats_xyzw: np.ndarray,
    opacities: np.ndarray,
    colors: Optional[np.ndarray] = None,
    sh: Optional[np.ndarray] = None,
    sh_degree: int = 0,
) -> GaussianScene:
    """Build a scene from raw (already activated) numpy arrays.

    Inputs use the conventional splat-major shapes — means/scales/colors
    [N, 3], sh [N, K, 3], quats [N, 4] (x, y, z, w) — and are transposed
    to the planar device layout here (host-side, free).  Rotations are
    quantized to the packed uint32 representation exactly as the
    reference importer does (PlyParser.cpp:330).
    """
    n = means.shape[0]
    means = np.asarray(means, np.float32)
    if colors is None:
        colors = np.full((n, 3), 0.5, np.float32)
    packed = encode_quat_xyzw(np.asarray(quats_xyzw, np.float32)).astype(np.uint32)
    bmin = means.min(axis=0) if n else np.zeros(3, np.float32)
    bmax = means.max(axis=0) if n else np.zeros(3, np.float32)
    return GaussianScene(
        means=jnp.asarray(means.T.copy()),
        scales=jnp.asarray(np.asarray(scales, np.float32).T.copy()),
        quats=jnp.asarray(packed),
        opacities=jnp.asarray(opacities, jnp.float32),
        colors=jnp.asarray(np.asarray(colors, np.float32).T.copy()),
        sh=None
        if sh is None
        else jnp.asarray(np.transpose(np.asarray(sh, np.float32), (2, 1, 0)).copy()),
        sh_degree=sh_degree,
        count=n,
        bounds_min=tuple(float(x) for x in bmin),
        bounds_max=tuple(float(x) for x in bmax),
    )


def random_scene(
    count: int,
    *,
    min_scale: float = 0.01,
    max_scale: float = 0.5,
    extent: float = 4.0,
    seed: int = 0,
    sh_degree: int = 0,
) -> GaussianScene:
    """Procedural random scene — the reference's debug fixture
    (generateRandomGaussians, /root/reference/src/Demo.cpp:119-143).

    Uniform positions in a cube of half-size ``extent``, random axis-angle
    rotations, uniform scales in [min_scale, max_scale], uniform RGBA
    colors (alpha doubles as opacity).  Optionally attaches random SH
    coefficients for view-dependent-color testing.
    """
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, (count, 3)).astype(np.float32)

    axis = rng.normal(size=(count, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.0, np.pi, count)
    s, c = np.sin(angle * 0.5), np.cos(angle * 0.5)
    quats = np.concatenate([axis * s[:, None], c[:, None]], axis=1).astype(np.float32)

    scales = rng.uniform(min_scale, max_scale, (count, 3)).astype(np.float32)
    rgba = rng.uniform(0.0, 1.0, (count, 4)).astype(np.float32)

    sh = None
    if sh_degree > 0:
        k = (sh_degree + 1) ** 2
        sh = np.zeros((count, k, 3), np.float32)
        # DC band consistent with the baked color; higher bands small.
        sh[:, 0, :] = (rgba[:, :3] - 0.5) / SH_C0
        sh[:, 1:, :] = rng.normal(scale=0.15, size=(count, k - 1, 3))

    scene = scene_from_arrays(
        means, scales, quats, rgba[:, 3], rgba[:, :3], sh, sh_degree
    )
    bounds = (float(-extent),) * 3, (float(extent),) * 3
    return dataclasses.replace(scene, bounds_min=bounds[0], bounds_max=bounds[1])
