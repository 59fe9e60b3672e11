"""Reproduce the raw-kernel scaling evidence cited in BASELINE.md.

Runs the extract+tokenize kernel (the build's dominant CPU cost) under plain
``ProcessPoolExecutor`` at 1/8/16/32 workers — no Ray — to show what the
hardware itself scales to.  Usage::

    python tools/kernel_scaling.py [seconds_per_level]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

# see bench.py: numpy MADV_HUGEPAGE + synchronous THP defrag on this VM
# stalls seconds per first-touch allocation; children inherit via fork
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np


def work(args):
    seed, budget_s = args
    sys.path.insert(0, "/root/repo")
    from search_engine_ray.sources.pages import pages_batch
    from search_engine_ray.stages.extract import extract_text_array
    from search_engine_ray.stages.tokenize import split_and_normalize
    batch = pages_batch(np.arange(seed * 1000, seed * 1000 + 1000))
    done = 0
    t0 = time.time()
    while time.time() - t0 < budget_s:
        txt = extract_text_array(batch["html"])
        split_and_normalize(txt)
        done += 1000
    return done


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    sys.path.insert(0, "/root/repo")
    work((0, 1.0))  # warm imports
    results = {}
    for n in (1, 8, 16, 32):
        t0 = time.time()
        with ProcessPoolExecutor(n) as ex:
            total = sum(ex.map(work, [(i, budget) for i in range(n)]))
        wall = time.time() - t0
        results[n] = total / wall
        print(f"{n:2d} procs: {results[n]:8.0f} docs/s aggregate "
              f"(wall {wall:.1f}s)")
    base = results[1]
    for n in (8, 16, 32):
        print(f"efficiency 1→{n}: {results[n] / (base * n):.2f}")


if __name__ == "__main__":
    main()
