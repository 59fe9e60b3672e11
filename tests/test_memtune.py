"""Allocator tuning (state/memtune.py): the glibc mallopt path, the
jemalloc env propagation into Ray workers, and measured page-reuse.

Why this matters at scale: on virtualized hosts the kernel page allocator
is a contended shared resource (zone-lock + lock-holder preemption measured
at 50-300 us per minor fault under 32-way concurrency on this VM); the
engine's per-batch buffer churn must therefore REUSE pages, not re-fault
them (see the measurements in state/memtune.py).
"""

import os
import resource

import numpy as np
import pytest

from search_engine_ray.state import memtune


def test_tune_malloc_applies_and_is_idempotent():
    assert memtune.tune_malloc() is True
    assert memtune.tune_malloc() is True  # cached


def test_set_allocator_env_default_leaves_jemalloc_alone(monkeypatch):
    """Round-4 reversal: jemalloc retention measured 75.6 s vs 19.1 s
    without on the 32-CPU 1.6M-page build (see memtune.py) — the conf is
    now opt-in via SERX_JEMALLOC_RETAIN=1."""
    monkeypatch.delenv("JE_ARROW_MALLOC_CONF", raising=False)
    monkeypatch.delenv("SERX_JEMALLOC_RETAIN", raising=False)
    memtune.set_allocator_env()
    assert "JE_ARROW_MALLOC_CONF" not in os.environ
    assert os.environ["NUMPY_MADVISE_HUGEPAGE"] == "0"


def test_set_allocator_env_jemalloc_retain_opt_in(monkeypatch):
    monkeypatch.delenv("JE_ARROW_MALLOC_CONF", raising=False)
    monkeypatch.setenv("SERX_JEMALLOC_RETAIN", "1")
    memtune.set_allocator_env()
    assert os.environ["JE_ARROW_MALLOC_CONF"] == memtune.ARROW_JEMALLOC_CONF


def test_memtune_disabled_by_env(monkeypatch):
    monkeypatch.setenv("SERX_MEMTUNE", "0")
    monkeypatch.delenv("JE_ARROW_MALLOC_CONF", raising=False)
    memtune.set_allocator_env()
    assert "JE_ARROW_MALLOC_CONF" not in os.environ
    memtune.prewarm_allocators()  # no-op, must not raise


def test_numpy_large_alloc_reuses_pages():
    """After tune_malloc, a freed large numpy block is reused from the arena
    with (near-)zero fresh minor faults."""
    memtune.tune_malloc()
    size = 32 << 20
    a = np.empty(size, dtype=np.uint8)
    a[::4096] = 1
    del a
    r0 = resource.getrusage(resource.RUSAGE_SELF).ru_minflt
    b = np.empty(size, dtype=np.uint8)
    b[::4096] = 1
    faults = resource.getrusage(resource.RUSAGE_SELF).ru_minflt - r0
    del b
    # untuned glibc would re-fault all 8192 pages (mmap/munmap per alloc)
    assert faults < 1024


def test_prewarm_allocators_runs():
    memtune.prewarm_allocators(arrow_mb=8, numpy_mb=8)


def test_ray_workers_inherit_allocator_env(ray_session):
    """conftest calls set_allocator_env() before ray.init, so local-mode
    workers must see the env from process birth (numpy/jemalloc read these
    at library init — setting them later inside a UDF would be too late).
    With retention now opt-in, the default contract is NUMPY_MADVISE_HUGEPAGE
    propagation and NO jemalloc conf."""
    import ray

    @ray.remote
    def probe() -> tuple[str, str]:
        return (os.environ.get("NUMPY_MADVISE_HUGEPAGE", ""),
                os.environ.get("JE_ARROW_MALLOC_CONF", ""))

    hugepage, je = ray.get(probe.remote())
    assert hugepage == "0"
    assert je in ("", memtune.ARROW_JEMALLOC_CONF)


def test_ray_workers_tune_malloc_via_package_import(ray_session):
    import ray

    @ray.remote
    def probe() -> bool:
        import search_engine_ray  # noqa: F401  triggers tune_malloc()
        from search_engine_ray.state.memtune import _tuned
        return _tuned

    assert ray.get(probe.remote()) is True
