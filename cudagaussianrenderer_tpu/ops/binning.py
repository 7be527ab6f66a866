"""Tile-list construction — stage C of the frame pipeline.

The CUDA reference builds the (tile, splat) pair list with persistent
blocks pulling splat chunks off a global atomic counter, warp-shuffle
scans, shared-memory staging and device-wide atomic appends
(buildTileListKernel, /root/reference/src/GaussianRender.cu:438-802).
None of that maps to TPU.  The TPU-native formulation is a static-shape,
two-phase scan:

  1. per-splat exact candidate counts: the ellipse AABB in tile space
     (same math as cu:526-551) refined to exact per-tile-row x-runs
     (splat_row_packs) — emitting exactly the pair set the reference's
     per-candidate ellipse/rect test (cu:350-436) would keep, WITHOUT
     testing candidates: the dead ~40% of the AABB never enters the
     list.  Then an inclusive prefix sum;
  2. "expansion": every slot j of a fixed-capacity list recovers its
     owning splat's attributes and local tile coordinates from the
     packed per-row runs.  Slots beyond the total candidate count
     become sentinel entries that sort to the end.

The expansion is gather-free — XLA gathers, scatters and searchsorted
execute serially on TPU (~100 ms per million elements measured on v5e).
It runs as the ops.expand Pallas kernel: exact one-hot selection on the
MXU over windowed splat ranges, which replicates every per-splat
attribute across its slot segment bit-exactly.

Overflow behaves like the reference's saturation (cu:700-703,
Demo.cpp:356-366): candidates beyond capacity are dropped for this frame
and the host can double capacity for the next one (see render.Renderer).

Sort keys: tile-major, front-to-back depth minor (getKey, cu:446-454).
Default packs (tile_id << 19) | depth19 into ONE uint32 — TPU sorts 32-bit
keys natively; 2^19 linear-depth levels across [near, far] is ample for
blending order.  ``depth_bits=32`` switches to a two-operand lexicographic
(tile, depth24<<8) sort; note the reference's "full 32 depth bits" carry
at most 24 significant bits anyway, because the key is computed from a
float32 in [0, 1].
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from .geometry import (  # noqa: F401  (re-exported: tests + golden parity)
    CENTER_SCALE,
    _segment_hits_unit_circle,
    _to_ellipse_coords,
    ellipse_rect_overlap,
    pack_center_u32,
    pack_conic_u32,
    pack_rgb_u32,
    pack_rgba_u32,
)
from .projection import SplatClipData

DEPTH_BITS_PACKED = 19
# Plain numpy scalar, NOT jnp: a module-level device-array constant gets
# embedded in every program that references it, and this runtime pays a
# massive per-execution cost for embedded device constants (measured
# +23 ms/frame).  numpy scalars fold into the HLO as literals.
SENTINEL_KEY_U32 = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# Phase 1: per-splat candidate tile rects + counts (cu:526-551)
# ---------------------------------------------------------------------------

class TileRects(NamedTuple):
    x0: jnp.ndarray      # [N] int32 tile-space rect min x (clamped)
    y0: jnp.ndarray      # [N]
    w: jnp.ndarray       # [N] rect width in tiles (>= 0)
    h: jnp.ndarray       # [N] rect height in tiles (>= 0)
    counts: jnp.ndarray  # [N] candidate tiles = max(0, w*h)


def splat_tile_rects(
    clip_data: SplatClipData, config: RenderConfig, row_band=None
) -> TileRects:
    """Per-splat candidate tile rect (cu:526-551).

    ``row_band``, if given, is a (lo, hi) pair of tile-row bounds (static
    ints or traced scalars): rects are clamped to the band so splats
    outside it emit zero candidates and straddling splats emit only their
    in-band tiles — used by tile-row-sharded multi-chip rendering so
    out-of-band pairs never consume per-device capacity or sort work.
    """
    tx, ty = config.tiles_x, config.tiles_y
    d = clip_data
    row_lo, row_hi = (0, ty) if row_band is None else row_band
    # AABB half-extent of the oriented ellipse (getAABBRect, cu:408-436):
    # componentwise |principal| + |minor|.
    hx = jnp.abs(d.cos_t * d.e0) + jnp.abs(d.sin_t * d.e1)
    hy = jnp.abs(d.sin_t * d.e0) + jnp.abs(d.cos_t * d.e1)
    # Clip [-1,1] -> tile coords [0, tiles along the axis].
    sx = 0.5 * tx
    sy = 0.5 * ty
    x0 = jnp.clip(jnp.floor((d.cx - hx + 1.0) * sx).astype(jnp.int32), 0, tx)
    y0 = jnp.clip(jnp.floor((d.cy - hy + 1.0) * sy).astype(jnp.int32), row_lo, row_hi)
    x1 = jnp.clip(jnp.ceil((d.cx + hx + 1.0) * sx).astype(jnp.int32), 0, tx)
    y1 = jnp.clip(jnp.ceil((d.cy + hy + 1.0) * sy).astype(jnp.int32), row_lo, row_hi)
    w = x1 - x0
    h = y1 - y0
    counts = jnp.maximum(0, w * h)
    return TileRects(x0=x0, y0=y0, w=w, h=h, counts=counts)


# ---------------------------------------------------------------------------
# Phase 1b: per-row exact x-ranges (TPU replacement for the per-candidate
# exact test)
# ---------------------------------------------------------------------------
#
# The reference emits every AABB tile and culls with an exact
# ellipse/rect test per candidate (cu:653-679).  On TPU the cull can be
# moved BEFORE emission: for one tile row (a horizontal strip), the tiles
# intersecting the ellipse form one contiguous x-run (the ellipse is
# convex, so ellipse ∩ strip is connected and its x-projection is an
# interval) and EVERY tile in the run intersects — so emitting exactly
# [floor(xlo), ceil(xhi)) per row reproduces the exact test's pair set
# with no per-candidate test at all, and the AABB's ~40% dead candidates
# (measured at the bench workload) never enter the pair list, shrinking
# every capacity-proportional stage (emission, sort, ranges).
#
# Closed form: with the ellipse parametrized p(u,v) = c + R(θ)·(e0·u,
# e1·v), u²+v² ≤ 1, write y - cy = A·u + B·v (A = e0·sinθ, B = e1·cosθ)
# and x - cx = C·u + D·v (C = e0·cosθ, D = -e1·sinθ).  On the chord
# y - cy = k the x-extent is k·M/ry² ± (e0·e1/ry)·√(1 - k²/ry²) with
# M = C·A + D·B = sinθcosθ(e0² - e1²) and ry² = A² + B²; as a function of
# k the upper branch is concave with its maximum rx at k* = M/rx, so the
# strip maximum is the branch evaluated at k* clamped into the strip's
# k-interval (and symmetrically for the minimum).
#
# The ranges round OUTWARD by STRIP_EPS before the tile floor/ceil so
# float rounding can only ADD a boundary-grazing tile (whose density is
# below the ellipse cutoff — invisible), never drop one the exact test
# would keep (validated against the f64 exact test in tests).

STRIP_EPS = 1e-5
# Per-row (dx, width) pairs pack as 6-bit fields, 2 rows per exact-f32
# carrier, 4 carriers = 8 rows; splats with wider rects fall back to
# full-rect emission (rows 12+6·... see ops.expand), taller ones emit
# full-width rows past the eighth.
MAX_PACK_ROWS = 8
MAX_PACK_W = 63


class RowPacks(NamedTuple):
    packs: Tuple[jnp.ndarray, ...]  # 4 x [N] f32: rows 2p/2p+1 (dx,w) 6-bit fields
    counts: jnp.ndarray             # [N] int32 exact candidate counts


def splat_row_packs(
    clip_data: SplatClipData, rects: TileRects, config: RenderConfig
) -> RowPacks:
    """Exact per-tile-row x-ranges for the first MAX_PACK_ROWS rect rows.

    Returns packed (dx, w) pairs relative to the rect origin plus the
    exact per-splat candidate count the ops.expand emit kernel maps slots
    with.  Count layout (must mirror the kernel's decode):
      * w ≤ 63, h ≤ 8:   count = Σ w_r                      (fully exact)
      * w ≤ 63, h > 8:   count = Σ w_r + (h - 8)·w          (rows 8+ full)
      * w > 63:          count = h·w, all w_r = 0           (full rect)
    """
    d = clip_data
    tch = 2.0 * config.tile_size / config.screen_h
    sx = 0.5 * config.tiles_x
    ct, st, e0, e1 = d.cos_t, d.sin_t, d.e0, d.e1
    a_ = e0 * st
    b_ = e1 * ct
    m = ct * st * (e0 * e0 - e1 * e1)
    ry2 = a_ * a_ + b_ * b_
    ry = jnp.sqrt(ry2)
    rx = jnp.sqrt(e0 * e0 * ct * ct + e1 * e1 * st * st)
    kstar = m / jnp.maximum(rx, 1e-30)
    inv_ry2 = 1.0 / jnp.maximum(ry2, 1e-30)
    p_inv_ry = (e0 * e1) / jnp.maximum(ry, 1e-30)
    slope = m * inv_ry2

    x0f = rects.x0.astype(jnp.float32)
    y0f = rects.y0.astype(jnp.float32)
    x1f = x0f + rects.w.astype(jnp.float32)
    hf = rects.h.astype(jnp.float32)
    packable = rects.w <= MAX_PACK_W

    # Pixel-center-aware runs (config.center_sampled_runs): the tile's
    # pixel centers span only [16t, 16t + 15] px on each axis, so the
    # row strip's k-interval ends 1/16 row early and the x-run keeps a
    # tile iff its CENTER span touches the ellipse — tiles grazed only
    # in the trailing pixel-free sliver are never emitted (their
    # contribution is sub-LSB at every pixel; ~6% of pairs at the bench
    # workload).  The rect-overlap semantics remain available for exact
    # reference-parity tests.
    centered = getattr(config, "center_sampled_runs", True)
    y_span = (15.0 / 16.0) * tch if centered else tch

    packs = []
    count_f = jnp.zeros_like(x0f)
    pack = None
    for r in range(MAX_PACK_ROWS):
        ya = (y0f + float(r)) * tch - 1.0
        yb = ya + y_span
        da, db = ya - d.cy, yb - d.cy
        ka = jnp.clip(da, -ry, ry)
        kb = jnp.clip(db, -ry, ry)
        khi = jnp.clip(kstar, ka, kb)
        klo = jnp.clip(-kstar, ka, kb)
        s_hi = p_inv_ry * jnp.sqrt(jnp.maximum(1.0 - khi * khi * inv_ry2, 0.0))
        s_lo = p_inv_ry * jnp.sqrt(jnp.maximum(1.0 - klo * klo * inv_ry2, 0.0))
        xhi = d.cx + khi * slope + s_hi
        xlo = d.cx + klo * slope - s_lo
        # Outward epsilon like the x-ranges: f32 rounding in ry/cy must
        # only ever ADD a grazing row, never drop one the exact test keeps.
        live = (
            (da <= ry + STRIP_EPS)
            & (db >= -(ry + STRIP_EPS))
            & (float(r) < hf)
            & packable
        )
        if centered:
            # Keep tile t iff its center span [t, t + 15/16] (tile
            # units) intersects [xlo, xhi]: first tile ceil(u_lo -
            # 15/16), last tile floor(u_hi) (inclusive; centers start
            # at the tile's low edge exactly).
            xl_t = jnp.clip(
                jnp.ceil((xlo - STRIP_EPS + 1.0) * sx - 15.0 / 16.0),
                x0f, x1f,
            )
            xh_t = jnp.clip(
                jnp.floor((xhi + STRIP_EPS + 1.0) * sx) + 1.0, x0f, x1f
            )
        else:
            xl_t = jnp.clip(jnp.floor((xlo - STRIP_EPS + 1.0) * sx), x0f, x1f)
            xh_t = jnp.clip(jnp.ceil((xhi + STRIP_EPS + 1.0) * sx), x0f, x1f)
        w_r = jnp.where(live, jnp.maximum(xh_t - xl_t, 0.0), 0.0)
        dx_r = jnp.where(w_r > 0, xl_t - x0f, 0.0)
        count_f = count_f + w_r
        if r % 2 == 0:
            pack = (dx_r * 64.0 + w_r) * 4096.0
        else:
            packs.append(pack + dx_r * 64.0 + w_r)
    wf = rects.w.astype(jnp.float32)
    overflow_rows = jnp.where(
        packable, jnp.maximum(hf - float(MAX_PACK_ROWS), 0.0), hf
    )
    count_f = count_f + overflow_rows * wf
    return RowPacks(
        packs=tuple(packs), counts=jnp.maximum(count_f, 0.0).astype(jnp.int32)
    )


# ---------------------------------------------------------------------------
# Sort keys (getKey, cu:446-454)
# ---------------------------------------------------------------------------

def quantize_depth(clip_z: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Clip depth [-1, 1] -> uint32 with ``bits`` significant bits."""
    z01 = jnp.clip((clip_z + 1.0) * 0.5, 0.0, 1.0)
    return (z01 * float(2**bits - 1)).astype(jnp.uint32)


class TilePairs(NamedTuple):
    """Fixed-capacity pair list with sentinel padding.

    ``attrs`` carries the per-pair raster attributes as THREE sort
    operands (each costs ~3 ms/sort at the bench workload), so the sort
    moves them with the keys and the rasterizer needs no post-sort
    gather: the splat center as two 16-bit fixed-point halves (~1/128
    pixel), the conic as a12|c12|rho8 (geometry.pack_conic_u32 — bf16
    precision on the diagonal, <1% bounded density-exponent error from
    the 8-bit correlation), and rgb888|alpha8 (the framebuffer quantizes
    to 8 bits anyway; alpha within half an output LSB after blending).
    """

    keys: Tuple[jnp.ndarray, ...]  # 1 operand (packed) or 2 (lex: tile, depth)
    values: jnp.ndarray            # [C] int32 splat indices (-1 = invalid)
    attrs: Tuple[jnp.ndarray, ...]  # 3 u32 operands: cxcy, conic
                                    # (a12|c12|rho8), rgba (rgb888|alpha8)
    num_candidates: jnp.ndarray    # scalar int32: total exact-range candidates
    num_pairs: jnp.ndarray         # scalar int32: emitted pairs (candidates
                                   # within capacity)


def build_tile_pairs(
    clip_data: SplatClipData,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    config: RenderConfig,
    capacity: int,
    *,
    row_band=None,
    interpret=None,
) -> TilePairs:
    """Phase 2: expansion + key emission, all static-shape.

    Thin wrapper over ops.expand.emit_pairs, which fuses the segment
    expansion, the per-row exact-range slot mapping (splat_row_packs —
    replacing the reference's per-candidate exact test, cu:653-679), and
    the key/attribute packing into one Pallas kernel (the per-slot math
    used to be an XLA post-pass costing ~7 ms of intermediate HBM traffic
    at 6.3M slots).
    """
    from .expand import (
        OUT_CONIC,
        OUT_CXCY,
        OUT_KEY0,
        OUT_KEY1,
        OUT_RGBA,
        OUT_VALUES,
        emit_pairs,
    )

    rects = splat_tile_rects(clip_data, config, row_band=row_band)
    row_packs = splat_row_packs(clip_data, rects, config)

    incl = jnp.cumsum(row_packs.counts)                   # [N] inclusive
    total = incl[-1]

    depth_bits = (
        DEPTH_BITS_PACKED if config.depth_bits == DEPTH_BITS_PACKED else 24
    )
    qdepth = quantize_depth(clip_data.clip_z, depth_bits)

    rgb_u32 = pack_rgb_u32(colors)
    # Tile rect packed into one exact-f32 row: (x0*256 + y0)*256 + w,
    # all components <= 255 (config caps tiles per axis) so the packed
    # value <= 2^24 - 1, exact in f32.
    geom = (
        (rects.x0.astype(jnp.float32) * 256.0 + rects.y0.astype(jnp.float32)) * 256.0
        + rects.w.astype(jnp.float32)
    )
    # Flat columns in ops.expand.R_* order, R_IDX (a plain iota) omitted;
    # the kernel-side interleave pass stacks them (an XLA stack here cost
    # ~1.6 ms of strided sublane writes at 1M splats).
    cols = (
        geom,
        qdepth.astype(jnp.float32),        # < 2^24, exact in f32
        clip_data.cx,
        clip_data.cy,
        clip_data.con_a,
        clip_data.con_b,
        clip_data.con_c,
        rgb_u32.astype(jnp.float32),       # < 2^24, exact in f32
        opacities,
        *row_packs.packs,                  # 4 rows of (dx, w) 6-bit fields
    )

    out = emit_pairs(cols, incl, capacity, config, interpret=interpret)

    values = jax.lax.bitcast_convert_type(out[OUT_VALUES], jnp.int32)
    attrs = (out[OUT_CXCY], out[OUT_CONIC], out[OUT_RGBA])
    if config.depth_bits == DEPTH_BITS_PACKED:
        keys = (out[OUT_KEY0],)
    else:
        keys = (out[OUT_KEY0], out[OUT_KEY1])

    return TilePairs(
        keys=keys,
        values=values,
        attrs=attrs,
        num_candidates=total.astype(jnp.int32),
        num_pairs=jnp.sum(values >= 0).astype(jnp.int32),
    )
