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
