import os
import sys

# before any numpy import: numpy's MADV_HUGEPAGE + this VM's synchronous THP
# defrag stalls seconds per first-touch ≥4 MB allocation (see bench.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# allocator page-retention before the Ray session starts (workers inherit
# the jemalloc env var) — see search_engine_ray/state/memtune.py
from search_engine_ray.state.memtune import set_allocator_env  # noqa: E402

set_allocator_env()


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"
