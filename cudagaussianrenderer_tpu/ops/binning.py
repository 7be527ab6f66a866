"""Tile-list construction — stage C of the frame pipeline.

The CUDA reference builds the (tile, splat) pair list with persistent
blocks pulling splat chunks off a global atomic counter, warp-shuffle
scans, shared-memory staging and device-wide atomic appends
(buildTileListKernel, /root/reference/src/GaussianRender.cu:438-802).
None of that maps to TPU.  The TPU-native formulation is a static-shape,
two-phase scan:

  1. per-splat candidate-tile counts from the ellipse AABB in tile space
     (same math as cu:526-551), then an inclusive prefix sum;
  2. "expansion": every slot j of a fixed-capacity list recovers its
     owning splat's attributes, local tile coordinates, and runs the
     *exact* ellipse/rectangle overlap test (same geometry as
     cu:350-436).  Slots whose test fails — and slots beyond the total
     candidate count — become sentinel entries that sort to the end.

The expansion is gather-free — XLA gathers and searchsorted are slow
serial operations on TPU (~10 ms per million scalar lookups measured on
v5e).  Instead it uses a *segmented fill*: per-splat attribute rows are
bitcast to int32, differenced along the splat axis, scatter-added at each
splat's segment offset, and an int32 cumulative sum over the capacity
axis reproduces each attribute across its segment.  Integer telescoping
makes this BIT-EXACT (wrap-around arithmetic cancels exactly), including
zero-count splats whose deltas stack on the next segment's offset.

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

import jax.numpy as jnp

from ..config import RenderConfig
from .projection import SplatClipData

DEPTH_BITS_PACKED = 19
SENTINEL_KEY_U32 = jnp.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# Geometry helpers (exact ellipse/rect overlap, cu:350-436)
# ---------------------------------------------------------------------------

def ellipse_aabb_half(ellipse: jnp.ndarray) -> jnp.ndarray:
    """Half-extent of the AABB of an oriented ellipse (getAABBRect,
    cu:408-436).

    The AABB of {±principal ± minor} is componentwise
    |principal| + |minor| around the center.
    ellipse: [..., 4] = (cos, sin, ext_major, ext_minor).
    Returns [..., 2].
    """
    c, s = ellipse[..., 0], ellipse[..., 1]
    e0, e1 = ellipse[..., 2], ellipse[..., 3]
    hx = jnp.abs(c * e0) + jnp.abs(s * e1)
    hy = jnp.abs(s * e0) + jnp.abs(c * e1)
    return jnp.stack([hx, hy], axis=-1)


def _to_ellipse_coords(center, cos_sin, extent, px, py):
    """Map a clip-space point into the ellipse's unit-circle frame
    (convertToEllipseCoordinates, cu:351-358)."""
    dx = px - center[..., 0]
    dy = py - center[..., 1]
    c, s = cos_sin[..., 0], cos_sin[..., 1]
    lx = (dx * c + dy * s) / extent[..., 0]
    ly = (dy * c - dx * s) / extent[..., 1]
    return lx, ly


def _segment_hits_unit_circle(x0, y0, x1, y1):
    """Segment vs unit circle (intersectsUnitCircle, cu:361-372)."""
    dx, dy = x1 - x0, y1 - y0
    len_sqr = dx * dx + dy * dy
    t = jnp.clip(-(x0 * dx + y0 * dy) / len_sqr, 0.0, 1.0)
    # NaN-safe: clip(NaN) stays NaN, all comparisons below yield False,
    # matching CUDA __saturatef(NaN) == 0 semantics in effect.
    px = x0 + t * dx
    py = y0 + t * dy
    return px * px + py * py < 1.0


def ellipse_rect_overlap(center, cos_sin, extent, rect_min_x, rect_min_y,
                         rect_max_x, rect_max_y):
    """Exact oriented-ellipse / axis-aligned-rect overlap
    (ellipseRectOverlap, cu:375-405): center-in-rect OR rect-center-in-
    ellipse OR any rect edge intersects the unit circle in ellipse frame.
    All arrays broadcast elementwise."""
    cx, cy = center[..., 0], center[..., 1]
    overlaps = (
        (cx > rect_min_x) & (cx < rect_max_x) & (cy > rect_min_y) & (cy < rect_max_y)
    )

    mx = rect_min_x + (rect_max_x - rect_min_x) * 0.5
    my = rect_min_y + (rect_max_y - rect_min_y) * 0.5
    lx, ly = _to_ellipse_coords(center, cos_sin, extent, mx, my)
    overlaps |= lx * lx + ly * ly < 1.0

    p0 = _to_ellipse_coords(center, cos_sin, extent, rect_min_x, rect_min_y)
    p1 = _to_ellipse_coords(center, cos_sin, extent, rect_max_x, rect_min_y)
    p2 = _to_ellipse_coords(center, cos_sin, extent, rect_max_x, rect_max_y)
    p3 = _to_ellipse_coords(center, cos_sin, extent, rect_min_x, rect_max_y)
    overlaps |= _segment_hits_unit_circle(*p0, *p1)
    overlaps |= _segment_hits_unit_circle(*p1, *p2)
    overlaps |= _segment_hits_unit_circle(*p2, *p3)
    overlaps |= _segment_hits_unit_circle(*p3, *p0)
    return overlaps


# ---------------------------------------------------------------------------
# Phase 1: per-splat candidate tile rects + counts (cu:526-551)
# ---------------------------------------------------------------------------

class TileRects(NamedTuple):
    x0: jnp.ndarray      # [N] int32 tile-space rect min x (clamped)
    y0: jnp.ndarray      # [N]
    w: jnp.ndarray       # [N] rect width in tiles (>= 0)
    counts: jnp.ndarray  # [N] candidate tiles = max(0, w*h)


def splat_tile_rects(clip_data: SplatClipData, config: RenderConfig) -> TileRects:
    tps = config.tiles_per_screen
    half = ellipse_aabb_half(clip_data.ellipse)
    rmin = clip_data.clip_xy - half
    rmax = clip_data.clip_xy + half
    # Clip [-1,1] -> tile coords [0, tiles_per_screen].
    fmin = (rmin + 1.0) * 0.5 * tps
    fmax = (rmax + 1.0) * 0.5 * tps
    x0 = jnp.clip(jnp.floor(fmin[:, 0]).astype(jnp.int32), 0, tps)
    y0 = jnp.clip(jnp.floor(fmin[:, 1]).astype(jnp.int32), 0, tps)
    x1 = jnp.clip(jnp.ceil(fmax[:, 0]).astype(jnp.int32), 0, tps)
    y1 = jnp.clip(jnp.ceil(fmax[:, 1]).astype(jnp.int32), 0, tps)
    w = x1 - x0
    h = y1 - y0
    counts = jnp.maximum(0, w * h)
    return TileRects(x0=x0, y0=y0, w=w, counts=counts)


# ---------------------------------------------------------------------------
# Segmented fill (the gather-free expansion primitive)
# ---------------------------------------------------------------------------

def segmented_fill_i32(rows: jnp.ndarray, offsets: jnp.ndarray, capacity: int):
    """Expand per-splat int32 rows [A, N] into per-slot rows [A, C].

    Slot j receives rows[:, i] for the last splat i with offsets[i] <= j.
    Exact by int32 telescoping: cumsum of adjacent differences scattered
    at the segment offsets.  Offsets beyond capacity are dropped, which
    truncates exactly like the reference's capacity abort (cu:700-703).
    """
    deltas = rows - jnp.pad(rows[:, :-1], ((0, 0), (1, 0)))
    buf = jnp.zeros((rows.shape[0], capacity), jnp.int32)
    buf = buf.at[:, offsets].add(deltas, mode="drop")
    return jnp.cumsum(buf, axis=1)


# ---------------------------------------------------------------------------
# Sort keys (getKey, cu:446-454)
# ---------------------------------------------------------------------------

def quantize_depth(clip_z: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Clip depth [-1, 1] -> uint32 with ``bits`` significant bits."""
    z01 = jnp.clip((clip_z + 1.0) * 0.5, 0.0, 1.0)
    return (z01 * float(2**bits - 1)).astype(jnp.uint32)


class TilePairs(NamedTuple):
    """Fixed-capacity pair list with sentinel padding.

    ``attrs`` carries the 9 per-pair raster attributes (cx, cy, conic a/b/c,
    r, g, b, alpha) as [9, C] float32 rows, so the sort can move them with
    the keys and the rasterizer needs no post-sort gather.
    """

    keys: Tuple[jnp.ndarray, ...]  # 1 operand (packed) or 2 (lex: tile, depth)
    values: jnp.ndarray            # [C] int32 splat indices (-1 = invalid)
    attrs: jnp.ndarray             # [9, C] float32
    num_candidates: jnp.ndarray    # scalar int32: total AABB candidates (pre-test)
    num_pairs: jnp.ndarray         # scalar int32: pairs passing the exact test


# segmented-fill row indices
_I_OFFSET, _I_W, _I_X0, _I_Y0, _I_DEPTH = 0, 1, 2, 3, 4
_NUM_I32 = 5
_F_ROWS = 13  # cx, cy, cos, sin, e0, e1, con_a, con_b, con_c, r, g, b, alpha


def build_tile_pairs(
    clip_data: SplatClipData,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    config: RenderConfig,
    capacity: int,
) -> TilePairs:
    """Phase 2: expansion + exact test + key emission, all static-shape."""
    rects = splat_tile_rects(clip_data, config)
    tps = config.tiles_per_screen

    incl = jnp.cumsum(rects.counts)                       # [N] inclusive
    offsets = incl - rects.counts                         # exclusive
    total = incl[-1]

    depth_bits = (
        DEPTH_BITS_PACKED if config.depth_bits == DEPTH_BITS_PACKED else 24
    )
    qdepth = quantize_depth(clip_data.clip_z, depth_bits).astype(jnp.int32)

    int_rows = jnp.stack([offsets, rects.w, rects.x0, rects.y0, qdepth])  # [5, N]
    f32_rows = jnp.stack(
        [
            clip_data.clip_xy[:, 0],
            clip_data.clip_xy[:, 1],
            clip_data.ellipse[:, 0],
            clip_data.ellipse[:, 1],
            clip_data.ellipse[:, 2],
            clip_data.ellipse[:, 3],
            clip_data.conic[:, 0],
            clip_data.conic[:, 1],
            clip_data.conic[:, 2],
            colors[:, 0],
            colors[:, 1],
            colors[:, 2],
            opacities,
        ]
    )  # [13, N]
    # Splat index row lets tests recover provenance; filled alongside.
    n = offsets.shape[0]
    idx_row = jnp.arange(n, dtype=jnp.int32)[None, :]
    rows = jnp.concatenate(
        [int_rows, idx_row, f32_rows.view(jnp.int32)], axis=0
    )  # [5 + 1 + 13, N]

    filled = segmented_fill_i32(rows, offsets, capacity)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    in_range = slots < jnp.minimum(total, capacity)

    offset_s = filled[_I_OFFSET]
    w_s = jnp.maximum(filled[_I_W], 1)
    local = slots - offset_s
    lx = local % w_s
    ly = local // w_s
    gx = filled[_I_X0] + lx
    gy = filled[_I_Y0] + ly
    splat_idx = filled[_NUM_I32]
    f = filled[_NUM_I32 + 1 :].view(jnp.float32)  # [13, C]
    center = jnp.stack([f[0], f[1]], axis=-1)
    cos_sin = jnp.stack([f[2], f[3]], axis=-1)
    extent = jnp.stack([f[4], f[5]], axis=-1)

    # Candidate tile rect in clip space (cu:653-664).
    tile_clip_size = 2.0 * config.tile_size / config.screen_size
    tx = gx.astype(jnp.float32) * tile_clip_size - 1.0
    ty = gy.astype(jnp.float32) * tile_clip_size - 1.0
    hit = ellipse_rect_overlap(
        center, cos_sin, extent, tx, ty, tx + tile_clip_size, ty + tile_clip_size
    )
    valid = in_range & hit

    tile_id = (gy * tps + gx).astype(jnp.uint32)
    q_s = filled[_I_DEPTH].astype(jnp.uint32)
    values = jnp.where(valid, splat_idx, -1)
    attrs = jnp.concatenate([f[0:2], f[6:9], f[9:13]], axis=0)  # [9, C]

    if config.depth_bits == DEPTH_BITS_PACKED:
        key = (tile_id << DEPTH_BITS_PACKED) | q_s
        keys = (jnp.where(valid, key, SENTINEL_KEY_U32),)
    else:
        tile_op = jnp.where(valid, tile_id, jnp.uint32(config.sentinel_tile))
        keys = (tile_op, jnp.where(valid, q_s << jnp.uint32(8), SENTINEL_KEY_U32))

    return TilePairs(
        keys=keys,
        values=values,
        attrs=attrs,
        num_candidates=total.astype(jnp.int32),
        num_pairs=jnp.sum(valid).astype(jnp.int32),
    )
