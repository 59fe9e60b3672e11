"""Host page-allocator health probe.

This VM's kernel first-touch fault path swings >100× between "phases"
(hypervisor-side, invisible to loadavg AND steal%): measured 0.4–30 GB/s
aggregate across 16 processes minutes apart.  Any fresh-page-hungry
workload (the index build's spill/encode stages) is capped by the current
phase, so a scaling measurement taken in a bad phase measures the host,
not the engine.  BASELINE.md's scaling rows cite this probe.

``first_touch_gbps()`` forks N workers that repeatedly ``mmap`` a fresh
64 MB anonymous region, touch one byte per 4 KiB page, and unmap it —
bypassing BOTH user allocators (whose caching/threshold heuristics made an
earlier malloc-based probe swing 0.4 → 2500 "GB/s" with environment, the
exact trap BASELINE.md's round-3 correction documents) and THP madvise
(kernel default ``madvise`` mode leaves plain anon mmaps on 4 KiB pages).
What remains is the pure kernel fault/zone-lock path the build's
fresh-page-hungry phases contend on.

Usage:  python tools/host_health.py [n_procs=16] [seconds=2]
"""

from __future__ import annotations

import mmap
import multiprocessing as mp
import sys
import time

_REGION = 64 << 20


def _worker(q, seconds: float) -> None:
    t0 = time.time()
    total = 0
    while time.time() - t0 < seconds:
        m = mmap.mmap(-1, _REGION)
        m[::4096] = b"\x01" * (_REGION // 4096)   # one touch per page
        m.close()
        total += _REGION
    q.put(total / (time.time() - t0))


def first_touch_gbps(n_procs: int = 16, seconds: float = 2.0) -> float:
    """Aggregate anon first-touch bandwidth (GB/s) across ``n_procs``.

    Fork, not spawn: the workers only touch fresh mmaps (no allocator or
    interpreter state worth re-importing), and spawn would re-run the
    CALLER's ``__main__`` module in every probe child — wrong for embedded
    use (bench.py's scaling harness calls this between legs)."""
    try:
        ctx = mp.get_context("fork")
    except ValueError:                      # non-POSIX fallback
        ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(q, seconds))
             for _ in range(n_procs)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / 1e9


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    s = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    print(f"{first_touch_gbps(n, s):.1f}")
