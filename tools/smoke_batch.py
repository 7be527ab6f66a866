#!/usr/bin/env python
"""CPU smoke of every tpu_batch.sh step at tiny sizes.

The TPU tunnel has been intermittent all round; when a window opens,
tools/tpu_poll.sh fires tools/tpu_batch.sh unattended.  A Python-level
bug in a measurement tool (bad signature, stale import, shape typo)
would burn the window.  This harness runs each batch entry point on the
CPU backend with shrunken workloads so those bugs surface here instead.
Numbers printed are meaningless (interpret-mode Pallas); only rc and
FAILED lines matter.

    python tools/smoke_batch.py                 # everything (~30 min on 1 core)
    python tools/smoke_batch.py sort extents    # a subset

Subcommands: sort reorder extents emit raster bandsort bench
bench_bands suite1 selfcheck

NB: this host's sitecustomize registers the axon PJRT plugin, so
``JAX_PLATFORMS=cpu`` alone does NOT stop axon backend init (it hangs
when the tunnel is down); ``jax.config.update("jax_platforms", "cpu")``
after import is required as well (same trick as tests/conftest.py).
"""
import importlib.util
import os
import runpy
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SMOKE_N = 20_000
SMOKE_CAPACITY = 131_072  # divisible by 1024*128 (cmd_sort reshapes)


def _load_measure():
    spec = importlib.util.spec_from_file_location(
        "measure", ROOT / "tools" / "measure.py"
    )
    measure = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(measure)
    # Shrink the workload.  bench_scene/cmd_sort/cmd_reorder bind their
    # defaults at def time, so patch via wrappers / explicit args.
    measure.REPS = 1
    measure.BENCH_CAPACITY = SMOKE_CAPACITY
    orig_scene = measure.bench_scene
    measure.bench_scene = lambda n=0, sh_degree=0: orig_scene(SMOKE_N, sh_degree)
    return measure


def _run_path(path, argv):
    sys.argv = argv
    runpy.run_path(str(path), run_name="__main__")


def run(which):
    if which in ("sort", "reorder", "extents", "emit", "raster", "bandsort"):
        measure = _load_measure()
        if which == "sort":
            measure.cmd_sort(SMOKE_CAPACITY)
        elif which == "reorder":
            measure.cmd_reorder(65_536)
        else:
            getattr(measure, f"cmd_{which}")()
    elif which == "bench":
        _run_path(ROOT / "bench.py", ["bench.py", "20000", "4", "--size", "256"])
    elif which == "suite1":
        _run_path(ROOT / "tools" / "bench_suite.py", ["bench_suite.py", "1"])
    elif which == "selfcheck":
        _run_path(ROOT / "tools" / "tpu_selfcheck.py", ["tpu_selfcheck.py"])
    else:
        raise SystemExit(f"unknown smoke target: {which}")
    print(f"SMOKE {which} DONE", flush=True)


if __name__ == "__main__":
    targets = sys.argv[1:] or [
        "sort", "reorder", "extents", "emit", "raster", "bandsort",
        "bench", "suite1", "selfcheck",
    ]
    failures = []
    for t in targets:
        print(f"=== smoke {t} ===", flush=True)
        try:
            run(t)
        except SystemExit as e:  # bench tools sys.exit on their own
            if e.code not in (0, None):
                failures.append(t)
                print(f"SMOKE {t} EXIT {e.code}", flush=True)
        except Exception as e:  # noqa: BLE001
            failures.append(t)
            print(f"SMOKE {t} FAILED: {type(e).__name__}: {e}", flush=True)
    if failures:
        print("smoke failures:", failures)
        sys.exit(1)
    print("smoke all green")
