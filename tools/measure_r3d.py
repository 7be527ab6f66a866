#!/usr/bin/env python
"""Round-3 microbenchmarks (run on the real TPU):

1. VPU transcendental cost in fma-equivalents: the raster spends three
   elementwise transcendentals per (pixel, pair); whether fast-math
   bit-trick replacements (Schraudolph-style exp2/log2) can pay depends
   entirely on the native op cost, which this measures.
2. u64 sort: the 4-operand u32 pair sort is the frame's largest stage;
   if XLA moves a u64 operand for less than 2x a u32 one, packing
   (key|cxcy, conic|rgba) into two u64 operands would cut the sort cost.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 16


def timed(name, fn, *args):
    try:
        fn = jax.jit(fn)
        t0 = time.perf_counter()
        np.asarray(fn(jnp.float32(0.0), *args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for it in range(1, 4):
            t0 = time.perf_counter()
            np.asarray(fn(jnp.float32(it), *args))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / REPS
        print(f"{name:46s} {ms:9.4f} ms/rep  (compile {compile_s:5.1f}s)",
              flush=True)
        return ms
    except Exception as e:  # noqa
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
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


def unit_chain(unit, k):
    """Apply `unit` k times, keeping values bounded and data-dependent."""

    def body(s, x):
        y = x + s
        for _ in range(k):
            y = unit(y)
        return jnp.sum(y)

    return body


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 4_194_304
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-8.0, -0.1, size=n).astype(np.float32)
    ).reshape(8192, 512)

    k = 32
    base = timed("empty (dispatch+sum)", scanned(unit_chain(lambda y: y, 0)), x)
    one = timed(f"fma x{k}", scanned(
        unit_chain(lambda y: y * 0.9999 + 1e-6, k)), x)
    fma_ms = None
    if base is not None and one is not None:
        fma_ms = (one - base) / k
        print(f"{'':46s} -> {fma_ms*1e3:7.4f} us per fma pass", flush=True)

    units = {
        # keep outputs in a sane range so nothing over/underflows
        "exp": lambda y: jnp.exp(jnp.minimum(y, 0.0) - 0.125) - 0.5,
        "log": lambda y: jnp.log(jnp.abs(y) + 0.5),
        "exp2": lambda y: jnp.exp2(jnp.minimum(y, 0.0) - 0.125) - 0.5,
        "tanh": lambda y: jnp.tanh(y),
        "rsqrt": lambda y: jax.lax.rsqrt(jnp.abs(y) + 0.5) - 0.75,
        "floor": lambda y: jnp.floor(y * 0.731) * 0.731 - 0.25,
        "f32<->s32 roundtrip": lambda y: (y * 1234.5).astype(jnp.int32)
        .astype(jnp.float32) * (1.0 / 1234.5),
        "bitcast+intadd+bitcast": lambda y: jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(jnp.abs(y) + 0.5, jnp.int32)
            + jnp.int32(1 << 23),
            jnp.float32,
        ) * 0.5,
    }
    for name, unit in units.items():
        ms = timed(f"{name} x{k} (+2 fma each)", scanned(unit_chain(unit, k)), x)
        if ms is not None and base is not None and fma_ms:
            per = (ms - base) / k / fma_ms - 2.0
            print(f"{'':46s} -> ~{per:5.1f} fma-equivalents", flush=True)

    # ---- sort operand experiments --------------------------------------
    m = 4_194_304
    rng = np.random.default_rng(1)
    key32 = jnp.asarray(rng.integers(0, 1 << 31, m, dtype=np.uint32))
    pay = [jnp.asarray(rng.integers(0, 1 << 31, m, dtype=np.uint32))
           for _ in range(3)]

    def sort4(s, kk, p0, p1, p2):
        out = jax.lax.sort(
            (kk ^ s.astype(jnp.uint32), p0, p1, p2),
            num_keys=1, is_stable=False,
        )
        return sum(o[0].astype(jnp.float32) + o[-1].astype(jnp.float32)
                   for o in out)

    timed("sort u32 key + 3x u32 payload", scanned(sort4), key32, *pay)

    def sort2(s, kk, p0):
        out = jax.lax.sort((kk ^ s.astype(jnp.uint32), p0),
                           num_keys=1, is_stable=False)
        return sum(o[0].astype(jnp.float32) + o[-1].astype(jnp.float32)
                   for o in out)

    timed("sort u32 key + 1x u32 payload", scanned(sort2), key32, pay[0])

    if jax.config.jax_enable_x64:
        key64 = (key32.astype(jnp.uint64) << 32) | pay[0].astype(jnp.uint64)
        pay64 = (pay[1].astype(jnp.uint64) << 32) | pay[2].astype(jnp.uint64)

        def sort64(s, kk, p0):
            out = jax.lax.sort((kk ^ s.astype(jnp.uint64), p0),
                               num_keys=1, is_stable=False)
            return sum(o[0].astype(jnp.float32) + o[-1].astype(jnp.float32)
                       for o in out)

        timed("sort u64 key + 1x u64 payload", scanned(sort64), key64, pay64)

        def sort64k(s, kk):
            out = jax.lax.sort((kk ^ s.astype(jnp.uint64),),
                               num_keys=1, is_stable=False)
            return out[0][0].astype(jnp.float32) + out[0][-1].astype(
                jnp.float32)

        timed("sort u64 key only", scanned(sort64k), key64)


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
