"""Tile rasterizer — stage F, the flagship Pallas TPU kernel.

The CUDA reference rasterizes one 16x16 tile per thread block: one thread
per pixel, 32-splat chunks staged through shared memory by the first warp
(uncoalesced gathers — its known bottleneck, reference README.md:105,138),
front-to-back alpha blending with a cooperative early-saturation exit
(rasterizeTilesKernel, /root/reference/src/GaussianRender.cu:908-1034).

TPU re-design:
  * The random splat gather is hoisted OUT of the kernel entirely: after
    sorting, one bulk XLA gather materializes a [C, 16] float32 streaming
    buffer holding (center, conic, rgb, alpha) per sorted pair.  The kernel
    then only ever reads *contiguous* chunks — sequential HBM traffic at
    full bandwidth instead of per-splat random loads.
  * Grid steps own ``tiles_per_cell`` tiles each (amortizing per-step
    overhead); each tile runs a ``while_loop`` over CHUNK-sized batches
    with double-buffered async DMA from the streaming buffer into VMEM.
  * Blending is vectorized over the whole [CHUNK, 256] (splat, pixel)
    block: the front-to-back transmittance recurrence T *= (1 - a) becomes
    an O(log CHUNK) Hillis-Steele cumulative product along the splat axis,
    and the color accumulation sum_k w_k * rgb_k is a [3, CHUNK] x
    [CHUNK, 256] matmul on the MXU.
  * Early exit happens at chunk granularity via the loop condition
    max(T) > eps, exactly like the reference's __syncthreads_count break
    (cu:994-998).

Pixel centers use clip = pixel * (2 / screen) - 1 with no half-texel
offset, matching cu:933-939.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig

# Streaming-buffer column layout.
COL_CX, COL_CY = 0, 1
COL_CON_A, COL_CON_B, COL_CON_C = 2, 3, 4
COL_R, COL_G, COL_B, COL_ALPHA = 5, 6, 7, 8
PAIR_COLS = 16  # padded to a power of two for clean DMA shapes


def gather_pair_data(
    sorted_values: jnp.ndarray,
    clip_xy: jnp.ndarray,
    conic: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    chunk: int,
) -> jnp.ndarray:
    """Build the [C + chunk, PAIR_COLS] streaming buffer.

    One parallel gather replaces the reference's per-chunk uncoalesced
    shared-memory staging (cu:950-963).  The extra ``chunk`` rows of
    zero padding let the kernel's fixed-size DMAs run past the last
    partial chunk safely.
    """
    idx = jnp.maximum(sorted_values, 0)  # sentinels carry -1
    n = sorted_values.shape[0]
    buf = jnp.zeros((n + chunk, PAIR_COLS), jnp.float32)
    cols = jnp.concatenate(
        [
            clip_xy[idx],                      # cx, cy
            conic[idx],                        # a, b, c
            colors[idx],                       # r, g, b
            opacities[idx][:, None],           # alpha
        ],
        axis=1,
    )
    return buf.at[:n, : cols.shape[1]].set(cols)


def _raster_kernel(
    starts_ref,    # SMEM [1, tiles_per_cell] int32
    counts_ref,    # SMEM [1, tiles_per_cell] int32
    pairs_hbm,     # ANY  [C + CHUNK, PAIR_COLS] float32
    out_ref,       # VMEM [4, tiles_per_cell, 256] float32
    state,         # VMEM scratch [4, 256] (rows: r, g, b, transmittance)
    chunk_buf,     # VMEM scratch [2, CHUNK, PAIR_COLS]
    sems,          # DMA semaphores (2,)
    *,
    config: RenderConfig,
):
    tpc = config.tiles_per_cell
    chunk = config.raster_chunk
    tile_size = config.tile_size
    pixels = tile_size * tile_size
    tps = config.tiles_per_screen
    inv_half_screen = 2.0 / float(config.screen_size)
    eps = config.transmittance_eps
    cell = pl.program_id(0)

    # Pixel offsets within a tile, flattened row-major like the reference's
    # threadIdx mapping (cu:934).
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, pixels), 1)
    px_in_tile = (pix % tile_size).astype(jnp.float32)
    py_in_tile = (pix // tile_size).astype(jnp.float32)
    krow = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def make_dma(slot, start, c):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(start + c * chunk, chunk), :],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    for ti in range(tpc):
        tile = cell * tpc + ti
        start = starts_ref[0, ti]
        count = counts_ref[0, ti]
        num_chunks = pl.cdiv(count, chunk)

        tile_x = (tile % tps).astype(jnp.float32)
        tile_y = (tile // tps).astype(jnp.float32)
        pcx = (tile_x * tile_size + px_in_tile) * inv_half_screen - 1.0
        pcy = (tile_y * tile_size + py_in_tile) * inv_half_screen - 1.0

        state[0:3, :] = jnp.zeros((3, pixels), jnp.float32)
        state[3:4, :] = jnp.ones((1, pixels), jnp.float32)

        @pl.when(num_chunks > 0)
        def _():
            make_dma(0, start, 0).start()

        def cond(carry):
            c, t_max = carry
            return (c < num_chunks) & (t_max > eps)

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                make_dma(1 - slot, start, c + 1).start()

            make_dma(slot, start, c).wait()
            data = chunk_buf[slot]  # [CHUNK, PAIR_COLS]

            cx = data[:, COL_CX : COL_CX + 1]
            cy = data[:, COL_CY : COL_CY + 1]
            con_a = data[:, COL_CON_A : COL_CON_A + 1]
            con_b = data[:, COL_CON_B : COL_CON_B + 1]
            con_c = data[:, COL_CON_C : COL_CON_C + 1]
            a_s = data[:, COL_ALPHA : COL_ALPHA + 1]

            dx = pcx - cx  # [CHUNK, pixels]
            dy = pcy - cy
            dpow = con_a * dx * dx + con_c * dy * dy + 2.0 * con_b * dx * dy
            if config.falloff == "gaussian":
                density = jnp.exp(-0.5 * dpow)
            else:
                density = 1.0 - dpow * (1.0 / 7.0)
            in_count = (c * chunk + krow) < count
            alpha = jnp.where(
                in_count, a_s * jnp.clip(density, 0.0, 1.0), 0.0
            )

            # Inclusive cumprod of (1 - alpha) along the splat axis:
            # Hillis-Steele, log2(CHUNK) doubling steps.
            om = 1.0 - alpha
            acc = om
            shift = 1
            while shift < chunk:
                rolled = pltpu.roll(acc, shift, axis=0)
                acc = acc * jnp.where(krow >= shift, rolled, 1.0)
                shift *= 2
            excl = jnp.where(krow >= 1, pltpu.roll(acc, 1, axis=0), 1.0)

            t_in = state[3:4, :]
            weight = t_in * excl * alpha  # [CHUNK, pixels]
            rgb = data[:, COL_R : COL_R + 3]  # [CHUNK, 3]
            contrib = jax.lax.dot_general(
                rgb,
                weight,
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [3, pixels]
            t_out = t_in * acc[chunk - 1 : chunk, :]
            state[0:3, :] = state[0:3, :] + contrib
            state[3:4, :] = t_out
            return c + 1, jnp.max(t_out)

        final_c, _ = jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))

        # Saturation exit leaves the speculative next-chunk DMA in flight;
        # drain it so the semaphore slot is clean for the next tile.
        @pl.when(final_c < num_chunks)
        def _():
            make_dma(jax.lax.rem(final_c, 2), start, final_c).wait()

        out_ref[0:3, ti, :] = state[0:3, :]
        out_ref[3:4, ti, :] = jnp.where(
            count > 0, jnp.ones((1, pixels), jnp.float32), jnp.zeros((1, pixels), jnp.float32)
        )


def rasterize_tiles(
    pair_data: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    config: RenderConfig,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the raster kernel.

    pair_data: [C + chunk, PAIR_COLS] from gather_pair_data.
    starts, counts: [total_tiles] int32 from ops.ranges.
    Returns [4, total_tiles, pixels_per_tile] float32 (r, g, b, coverage).
    """
    t = config.total_tiles
    tpc = config.tiles_per_cell
    pixels = config.pixels_per_tile
    chunk = config.raster_chunk
    num_cells = t // tpc

    starts2 = starts.reshape(num_cells, tpc)
    counts2 = counts.reshape(num_cells, tpc)

    kernel = functools.partial(_raster_kernel, config=config)
    return pl.pallas_call(
        kernel,
        grid=(num_cells,),
        in_specs=[
            pl.BlockSpec((1, tpc), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tpc), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (4, tpc, pixels), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, t, pixels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, pixels), jnp.float32),
            pltpu.VMEM((2, chunk, PAIR_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts2, counts2, pair_data)


def tiles_to_image(tile_rgba: jnp.ndarray, config: RenderConfig) -> jnp.ndarray:
    """[4, T, pixels] tile-major float -> [screen, screen, 4] uint8.

    Quantization matches the reference: truncating *255 cast, alpha 255 on
    covered tiles, untouched tiles stay fully zero (cu:1007-1015 plus the
    frame-start clear at Demo.cpp:399).
    """
    tps = config.tiles_per_screen
    ts = config.tile_size
    img = tile_rgba.reshape(4, tps, tps, ts, ts)
    img = img.transpose(1, 3, 2, 4, 0).reshape(tps * ts, tps * ts, 4)
    rgb = img[..., :3]
    if config.gamma is not None:
        rgb = jnp.power(jnp.clip(rgb, 0.0, 1.0), config.gamma)
    covered = img[..., 3:4]
    rgba = jnp.concatenate([rgb, covered], axis=-1)
    return (jnp.clip(rgba, 0.0, 1.0) * 255.0).astype(jnp.uint8)
