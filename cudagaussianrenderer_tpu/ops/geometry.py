"""Shared splat geometry + attribute packing helpers.

Exact oriented-ellipse / axis-aligned-rect overlap (the reference's
ellipseRectOverlap, /root/reference/src/GaussianRender.cu:350-436) and the
bit-packing used for sort operands.  Pure jnp — used both by the XLA-side
binning paths and inside Pallas kernels (all ops lower in Mosaic).
"""

from __future__ import annotations

import jax.numpy as jnp


def _to_ellipse_coords(cx, cy, cos_t, sin_t, e0, e1, px, py):
    """Map a clip-space point into the ellipse's unit-circle frame
    (convertToEllipseCoordinates, cu:351-358)."""
    dx = px - cx
    dy = py - cy
    lx = (dx * cos_t + dy * sin_t) / e0
    ly = (dy * cos_t - dx * sin_t) / e1
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


def ellipse_rect_overlap(cx, cy, cos_t, sin_t, e0, e1,
                         rect_min_x, rect_min_y, rect_max_x, rect_max_y):
    """Exact oriented-ellipse / axis-aligned-rect overlap
    (ellipseRectOverlap, cu:375-405): center-in-rect OR rect-center-in-
    ellipse OR any rect edge intersects the unit circle in ellipse frame.
    All arrays broadcast elementwise."""
    overlaps = (
        (cx > rect_min_x) & (cx < rect_max_x) & (cy > rect_min_y) & (cy < rect_max_y)
    )

    ell = (cx, cy, cos_t, sin_t, e0, e1)
    mx = rect_min_x + (rect_max_x - rect_min_x) * 0.5
    my = rect_min_y + (rect_max_y - rect_min_y) * 0.5
    lx, ly = _to_ellipse_coords(*ell, mx, my)
    overlaps |= lx * lx + ly * ly < 1.0

    p0 = _to_ellipse_coords(*ell, rect_min_x, rect_min_y)
    p1 = _to_ellipse_coords(*ell, rect_max_x, rect_min_y)
    p2 = _to_ellipse_coords(*ell, rect_max_x, rect_max_y)
    p3 = _to_ellipse_coords(*ell, rect_min_x, rect_max_y)
    overlaps |= _segment_hits_unit_circle(*p0, *p1)
    overlaps |= _segment_hits_unit_circle(*p1, *p2)
    overlaps |= _segment_hits_unit_circle(*p2, *p3)
    overlaps |= _segment_hits_unit_circle(*p3, *p0)
    return overlaps


# --- sort-operand packing -------------------------------------------------

CENTER_SCALE = 65535.0
ALPHA_SCALE = 65535.0


def pack_rgb_u32(colors: jnp.ndarray) -> jnp.ndarray:
    """[3, N] planar float colors -> uint32 0x00RRGGBB (truncating, like
    the reference's final uchar cast, cu:1007-1010)."""
    c = (jnp.clip(colors, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    return (c[0] << 16) | (c[1] << 8) | c[2]


def pack_center_u32(cx: jnp.ndarray, cy: jnp.ndarray) -> jnp.ndarray:
    """Clip-space center -> (x16 << 16 | y16) fixed point over [-1, 1]."""
    qx = (jnp.clip((cx + 1.0) * 0.5, 0.0, 1.0) * CENTER_SCALE + 0.5).astype(jnp.uint32)
    qy = (jnp.clip((cy + 1.0) * 0.5, 0.0, 1.0) * CENTER_SCALE + 0.5).astype(jnp.uint32)
    return (qx << 16) | qy


def _rnd_bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> round-to-nearest-even bf16 bit pattern in the high half."""
    bits = x.view(jnp.uint32)
    return (bits + 0x7FFF + ((bits >> 16) & 1)) & jnp.uint32(0xFFFF0000)


def pack_bf16_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 -> one u32 of round-to-nearest bf16 halves (a high, b low).

    Used for the conic terms: the density quadratic tolerates ~0.4%
    relative error on these (sub-LSB at the framebuffer), and dropping a
    sort operand is worth more than the bits.
    """
    return _rnd_bf16_bits(a) | (_rnd_bf16_bits(b) >> 16)


def pack_bf16_u16(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """f32 (as round-to-nearest bf16 high half) | 16-bit integer low half."""
    return _rnd_bf16_bits(a) | (q & jnp.uint32(0xFFFF))
