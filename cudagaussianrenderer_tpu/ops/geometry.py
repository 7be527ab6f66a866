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
#
# Every payload operand of the tile-pair sort costs ~3 ms at the bench
# workload (measured on v5e; XLA's merge passes move payloads end to
# end), so raster attributes pack HARD: center as 16+16 fixed point,
# the conic as two 12-bit minifloats plus an 8-bit correlation, color and
# opacity as rgb888|alpha8 — key + 3 payload operands total.  Precision
# notes per field below; everything stays sub-LSB at the 8-bit
# framebuffer except deliberately-bounded conic error (<1% on the
# density exponent).

CENTER_SCALE = 65535.0

# 12-bit positive minifloat = bf16 with the exponent re-biased to cover
# [2^-8, 2^24): value bits (exp5|mant7) = (f32_bits >> 16) - MF12_K.
# Range bounds, from the pipeline's own invariants:
#   top: the anti-shrink trace bump (projection.py:172) floors the clip
#     covariance eigenvalues at (1/pi)(2/S)^2, so conic terms are
#     <= pi (S/2)^2 — 1.3e7 at the 4080 px screen cap (config.py's
#     255-tiles-per-axis rule), inside 2^24.
#   bottom: a camera flown close to a huge splat (3-sigma extent tens
#     of clip units) produces conics below the old 2^-5 floor; clamping
#     up overstates the density exponent.  At the 2^-8 floor the
#     worst-case per-splat density error is 1 - exp(-2^-8 * 8 / 2)
#     = 1.6% at the far screen corner (was 11.7% at 2^-5).
# Precision equals bf16 (7 mantissa bits) — the packing already used
# bf16 halves for the conic before the operand squeeze.
MF12_K = (127 - 8) << 7


def pack_rgb_u32(colors: jnp.ndarray) -> jnp.ndarray:
    """[3, N] planar float colors -> uint32 0x00RRGGBB (truncating, like
    the reference's final uchar cast, cu:1007-1010)."""
    c = (jnp.clip(colors, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    return (c[0] << 16) | (c[1] << 8) | c[2]


def _rnd_bf16_bits16(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> round-to-nearest-even bf16 bit pattern in the LOW half."""
    bits = x.view(jnp.uint32)
    return (bits + 0x7FFF + ((bits >> 16) & 1)) >> 16


def _mf12(x: jnp.ndarray) -> jnp.ndarray:
    """Positive f32 -> 12-bit minifloat bits (round-to-nearest, clamped)."""
    return jnp.clip(
        _rnd_bf16_bits16(x).astype(jnp.int32) - MF12_K, 0, 4095
    ).astype(jnp.uint32)


def _mf12_decode(q: jnp.ndarray) -> jnp.ndarray:
    return ((q + jnp.uint32(MF12_K)) << 16).view(jnp.float32)


def pack_conic_u32(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Conic (a, b, c) -> one u32: a_mf12 | c_mf12 | rho8.

    a and c keep bf16 precision (12-bit re-biased minifloats); the
    off-diagonal b is stored as its correlation rho = b/sqrt(a*c) in
    [-1, 1] quantized to 8 bits (PSD bounds |rho| <= 1).  The density
    error is bounded: |2*drho*sqrt(ac)*dx*dy| <= drho * (a dx^2 + c dy^2)
    <= dpow/127 — under 1% of the exponent everywhere.
    rho is encoded against the DECODED a*c so encode/decode round-trips.
    """
    qa = _mf12(a)
    qc = _mf12(c)
    denom = jnp.sqrt(_mf12_decode(qa) * _mf12_decode(qc))
    rho = b / jnp.maximum(denom, 1e-30)
    # floor(x + 0.5): matches the emit kernel's truncating i32 cast.
    q_rho = jnp.clip(
        jnp.floor((rho + 1.0) * 127.5 + 0.5), 0.0, 255.0
    ).astype(jnp.uint32)
    return (qa << 20) | (qc << 8) | q_rho


def unpack_conic_u32(q: jnp.ndarray):
    """Inverse of pack_conic_u32 -> (a, b, c) f32."""
    a = _mf12_decode(q >> 20)
    c = _mf12_decode((q >> 8) & jnp.uint32(0xFFF))
    rho = (q & jnp.uint32(0xFF)).astype(jnp.float32) * (1.0 / 127.5) - 1.0
    b = rho * jnp.sqrt(a * c)
    return a, b, c


def pack_rgba_u32(rgb_u32: jnp.ndarray, opacity: jnp.ndarray) -> jnp.ndarray:
    """0x00RRGGBB | [0,1] opacity -> 0xRRGGBBAA (alpha round-to-nearest)."""
    alpha8 = (jnp.clip(opacity, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
    return (rgb_u32 << 8) | alpha8


def pack_center_u32(cx: jnp.ndarray, cy: jnp.ndarray) -> jnp.ndarray:
    """Clip-space center -> (x16 << 16 | y16) fixed point over [-1, 1]."""
    qx = (jnp.clip((cx + 1.0) * 0.5, 0.0, 1.0) * CENTER_SCALE + 0.5).astype(jnp.uint32)
    qy = (jnp.clip((cy + 1.0) * 0.5, 0.0, 1.0) * CENTER_SCALE + 0.5).astype(jnp.uint32)
    return (qx << 16) | qy


