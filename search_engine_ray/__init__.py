"""search_engine_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference engine (``adamcesco/search-engine``, C++17, single-node pthreads),
re-expressed as Ray Data pipelines over zero-copy Arrow batches:

- ``functions/``  pure, vectorizable scalar functions (tokenize, normalize,
  stem, varint codecs, hashing) — no Ray imports.
- ``stages/``     per-batch transforms used inside ``Dataset.map_batches``
  (tokenize+count, postings encode, dedup, text stats, similarity).
- ``sources/``    dataset constructors (pages corpus synthesis, readers).
- ``pipelines/``  end-to-end pipelines (index build, BM25 query, conformance
  oracle) and the reference-compatible query parser.
- ``state/``      persisted index artifacts: segment layout, manifest,
  checkpoint/resume, corpus statistics.

Nothing in this package calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"

# Runs once per process (driver AND every Ray worker that deserializes one of
# this package's UDFs): raise glibc's mmap/trim thresholds so per-batch
# buffer churn reuses pages instead of re-faulting them — kernel page-fault
# throughput collapses under 32-way concurrency on this class of host (see
# state/memtune.py for the measurements).  No-op when SERX_MEMTUNE=0.
from .state.memtune import tune_malloc as _tune_malloc

_tune_malloc()
del _tune_malloc
