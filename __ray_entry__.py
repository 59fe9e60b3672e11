"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os

# numpy's MADV_HUGEPAGE + this VM's synchronous THP defrag stalls ~7 s per
# first-touch ≥4 MB allocation; harmless elsewhere (see bench.py).  Set
# before numpy loads so at least driver-side kernels are unaffected.
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

# allocator page-retention (glibc mallopt runs at package import; the
# jemalloc env var only helps workers spawned after this point — see
# search_engine_ray/state/memtune.py for the 32-way fault-storm measurements)
from search_engine_ray.state.memtune import set_allocator_env

set_allocator_env()

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted index
    (posting-list segments, checkpointed) and answer the flagship BM25 query
    through the segment actor pool."""
    from search_engine_ray.pipelines.queries import q_bm25_topk
    return q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 and the
    training-data extensions (dedup / similarity / text analysis)."""
    from search_engine_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names as the Ray results).  Keys absent here (minhash_neardup,
    simhash_neardup, embedding_neardup, ivf_topk, media_frame_stats) are
    seeded-LSH / approximate / media pipelines → rows-only check."""
    from search_engine_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
