#!/usr/bin/env python
"""Round-3 measurement harness (run on the real TPU).

Questions, at the bench capacity (4.59M pairs, 4 sort operands):
  1. `sort`:  batched-sort cost vs segment size — is the two-phase
     (block-sort -> splitter runs -> concat -> group-sort) plan cheaper
     than the 12.9 ms flat sort?  Phase-1 candidates [nb, seg] plus the
     phase-3 shape [128, 36864].
  2. `dma`:   per-DMA issue cost of scattered VMEM->HBM run copies — the
     linchpin of the partition pass (PERF_NOTES assumed ~0.5 us/DMA from
     analysis, never measured).
  3. `ranges`: the new Pallas tile-edges kernel vs XLA searchsorted on
     real sorted keys.

Method per docs/PERF_NOTES.md: device-side scan of 8 salted reps,
best-of-3, consume one element of EVERY sort output operand.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 8
CAP = 4_587_520


def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        t0 = time.perf_counter()
        np.asarray(fn(jnp.float32(0.0), *args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for it in range(1, 4):
            t0 = time.perf_counter()
            out = fn(jnp.float32(it), *args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / REPS
        print(f"{name:42s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def scanned(body):
    def fn(salt, *args):
        def step(c, s):
            return c + body(s, *args), 0

        c, _ = jax.lax.scan(
            step, jnp.float32(0.0), salt + jnp.arange(REPS, dtype=jnp.float32)
        )
        return c

    return fn


def _baseline():
    return timed(
        "dispatch baseline",
        scanned(lambda s, x: jnp.sum(x) + s),
        jnp.ones((8, 128), jnp.float32),
    )


def sort_experiments():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 31, CAP, dtype=np.uint32))
    pay = [
        jnp.asarray(rng.integers(0, 1 << 32, CAP, dtype=np.uint32))
        for _ in range(3)
    ]
    base = _baseline()

    def net(ms):
        return None if ms is None or base is None else ms - base

    def flat_body(s, k, *ps):
        out = jax.lax.sort(
            (k ^ s.astype(jnp.uint32), *ps), num_keys=1, is_stable=False
        )
        return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

    m = timed("flat unstable 4op @4.59M", scanned(flat_body), key, *pay)
    print(f"{'':42s} net {net(m):9.3f} ms", flush=True)

    # Tighter capacity: what does 4.19M (1.03x headroom) save?
    m = timed(
        "flat unstable 4op @4.19M",
        scanned(flat_body),
        key[: 4_194_304],
        *[p[: 4_194_304] for p in pay],
    )
    print(f"{'':42s} net {net(m):9.3f} ms", flush=True)

    # Batched [nb, seg] — phase-1 / phase-3 candidates.
    for nb, seg in ((1120, 4096), (280, 16384), (70, 65536), (35, 131072), (128, 36864), (256, 18432)):
        total = nb * seg

        def bat_body(s, k, *ps, _nb=nb, _seg=seg):
            ops = tuple(
                o[: _nb * _seg].reshape(_nb, _seg)
                for o in (k ^ s.astype(jnp.uint32), *ps)
            )
            out = jax.lax.sort(ops, num_keys=1, is_stable=False, dimension=1)
            return sum(o[0, 0].astype(jnp.float32) * 1e-9 for o in out)

        if total <= CAP:
            m = timed(f"batched [{nb},{seg}] 4op", scanned(bat_body), key, *pay)
            if m is not None:
                print(f"{'':42s} net {net(m):9.3f} ms", flush=True)


# ---------------------------------------------------------------------------
# Scattered run-copy DMA cost (the partition pass's scatter primitive)
# ---------------------------------------------------------------------------

def _concat_kernel(offs_ref, in_hbm, out_hbm, buf, sem_in, sems_out, *, blk, runs, run_len):
    b = pl.program_id(0)
    load = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(b * blk, blk)], buf, sem_in
    )
    load.start()
    load.wait()

    def out_dma(r):
        off = offs_ref[b * runs + r]
        return pltpu.make_async_copy(
            buf.at[:, pl.ds(r * run_len, run_len)],
            out_hbm.at[:, pl.ds(off, run_len)],
            sems_out.at[jax.lax.rem(r, 8)],
        )

    def body(r, _):
        @pl.when(r >= 8)
        def _():
            out_dma(r - 8).wait()

        out_dma(r).start()
        return 0

    jax.lax.fori_loop(0, runs, body, 0)

    def tail(r, _):
        out_dma(r).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(runs - 8, 0), runs, tail, 0)


def dma_experiments():
    base = _baseline()
    rng = np.random.default_rng(1)
    rows = 4
    data = jnp.asarray(
        rng.integers(0, 1 << 32, (rows, CAP), dtype=np.uint32)
    )

    for blk, runs, align in (
        (16384, 8, 8),
        (16384, 16, 8),
        (16384, 32, 8),
        (16384, 64, 8),
        (16384, 128, 8),
        (16384, 32, 128),
        (65536, 256, 8),
    ):
        run_len = blk // runs
        nb = CAP // blk
        total_dmas = nb * runs
        # Random destination offsets (aligned to `align` lanes), one per
        # (block, run) — worst-case scattered like a real partition.
        offs = rng.integers(0, (CAP - run_len) // align, nb * runs) * align
        offs = jnp.asarray(offs.astype(np.int32))

        kernel = functools.partial(
            _concat_kernel, blk=blk, runs=runs, run_len=run_len
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((rows, blk), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((8,)),
            ],
        )
        run = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, CAP), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=jax.default_backend() != "tpu",
        )

        def body(s, o, d):
            out = run(o, d + s.astype(jnp.uint32))
            return jnp.sum(out[:, :128].astype(jnp.float32)) * 1e-9

        m = timed(
            f"scatter {total_dmas} DMAs x {run_len} lanes (align {align})",
            scanned(body),
            offs,
            data,
        )
        if m is not None and base is not None:
            per = (m - base) * 1e3 / total_dmas
            print(f"{'':42s} net {m - base:7.3f} ms = {per:6.3f} us/DMA", flush=True)


def ranges_experiments():
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.ops.binning import DEPTH_BITS_PACKED
    from cudagaussianrenderer_tpu.ops.ranges import tile_ranges

    config = RenderConfig(screen_size=1024)
    rng = np.random.default_rng(2)
    # Realistic sorted keys: ~4.08M live over 4096 tiles + sentinel tail.
    live = 4_081_636
    tiles = np.sort(rng.integers(0, 4096, live).astype(np.uint32))
    depth = rng.integers(0, 1 << 19, live).astype(np.uint32)
    keys = np.sort((tiles << DEPTH_BITS_PACKED) | depth)
    keys = np.concatenate(
        [keys, np.full(CAP - live, 0xFFFFFFFF, dtype=np.uint32)]
    )
    keys = jnp.asarray(keys)

    base = _baseline()

    # Salt by adding a small constant: preserves sortedness while keeping
    # the body live (a dead salt lets XLA hoist everything out of the
    # scan — see PERF_NOTES measurement traps).
    def pallas_body(s, k):
        st, ct = tile_ranges((k + s.astype(jnp.uint32),), config)
        return jnp.sum(st[:128].astype(jnp.float32)) * (1.0 + s * 1e-9)

    def xla_body(s, k):
        kk = k + s.astype(jnp.uint32)
        t = config.total_tiles
        boundaries = jnp.arange(t + 1, dtype=jnp.uint32) << jnp.uint32(
            DEPTH_BITS_PACKED
        )
        edges = jnp.searchsorted(kk, boundaries, side="left").astype(jnp.int32)
        return jnp.sum(edges[:128].astype(jnp.float32)) * (1.0 + s * 1e-9)

    for name, body in (("ranges pallas", pallas_body), ("ranges XLA searchsorted", xla_body)):
        m = timed(name, scanned(body), keys)
        if m is not None and base is not None:
            print(f"{'':42s} net {m - base:9.3f} ms", flush=True)

    # Correctness spot check on hardware.
    st_p, ct_p = jax.jit(lambda k: tile_ranges((k,), config))(keys)
    boundaries = jnp.arange(config.total_tiles + 1, dtype=jnp.uint32) << jnp.uint32(
        DEPTH_BITS_PACKED
    )
    edges = jnp.searchsorted(keys, boundaries, side="left").astype(jnp.int32)
    ok = bool(
        jnp.all(st_p == edges[:-1]) & jnp.all(ct_p == edges[1:] - edges[:-1])
    )
    print(f"ranges pallas == searchsorted: {ok}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ranges"):
        ranges_experiments()
    if which in ("all", "sort"):
        sort_experiments()
    if which in ("all", "dma"):
        dma_experiments()
