"""Distributed inverted-index build (the reference's ``ParseSources``).

Reference lifecycle (``/root/reference/KaggleFinanceSourceEngine.cpp:33-92``,
traced in SURVEY.md §3.1): parser threads tokenize + pre-count per doc,
an arbitrator hash-routes ``(doc, term, tf)`` triples, filler threads own one
shard each.  Ray Data restatement:

    read_parquet (column-pruned)
      → map_batches(TokenizePostings)        # stateless vectorized tasks
      → [resume filter: drop finished buckets BEFORE the shuffle]
      → groupby("bucket").map_groups(EncodeBucketWriter)   # THE shuffle
      → per-bucket atomic segment write + _DONE marker

plus a second column-pruned pass for the docstore / BM25 norms
(``DocStats``) and a tiny global aggregate for ``docstats.json``.

Scale notes:
- ``n_buckets`` is the partition knob: each bucket's postings are encoded in
  one ``map_groups`` call, so size ``n_buckets`` such that
  (total postings)/n_buckets fits a worker heap (hundreds at web scale; 32
  here).  Buckets ≫ workers keeps the reduce stage load-balanced.
- The tokenize stage emits ONE row per distinct (doc, term) — the map-side
  combine — so the shuffle volume is bounded by Σ per-doc vocabulary, not
  token count.
- ``html``-bearing inputs must drop the binary column before the shuffle
  (we read only the id/text columns — pruned at the read).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.analyze import ENGLISH_STOPWORDS
from ..stages.postings import EncodeBucketWriter
from ..stages.tokenize import DocStats, TokenizePostings
from ..state import checkpoint as ckpt
from ..state.checkpoint import IndexConfig

DatasetFactory = Callable[[], "ray.data.Dataset"]


def _resolve(source: str | DatasetFactory, columns: list[str]) -> "ray.data.Dataset":
    if callable(source):
        ds = source()
        return ds.select_columns([c for c in columns if c in ds.schema().names])
    return ray.data.read_parquet(source, columns=columns)


def build_index(source: str | DatasetFactory, index_dir: str,
                config: IndexConfig | None = None, *,
                keep_cols: Iterable[str] = (),
                batch_size: int = 8192,
                tokenize_concurrency: int | None = None) -> dict:
    """Build (or resume) the index at ``index_dir``. Returns the manifest.

    ``source`` is a parquet path/dir or a zero-arg Dataset factory (the
    factory is called once per pass; passes read disjoint column sets).
    """
    cfg = config or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    stopwords = ENGLISH_STOPWORDS if cfg.stopwords else None

    # ---- pass A: docstore + BM25 globals (skipped entirely on resume) ----
    docstore_path = os.path.join(index_dir, "docstore")
    if not os.path.exists(os.path.join(index_dir, "docstats.json")):
        keep = tuple(keep_cols)
        ds = _resolve(source, [cfg.id_col, cfg.text_col, *keep])
        ds = ds.map_batches(
            DocStats(text_col=cfg.text_col, id_col=cfg.id_col, keep_cols=keep,
                     stopwords=stopwords, stem=cfg.stem),
            batch_format="pyarrow", batch_size=batch_size)
        ds.write_parquet(docstore_path)
        lens = ray.data.read_parquet(docstore_path, columns=["doc_len"])
        ckpt.write_docstats(index_dir, n_docs=lens.count(),
                            total_tokens=lens.sum("doc_len") or 0)

    # ---- pass B: postings shuffle, finished buckets filtered pre-shuffle ----
    pending = ckpt.pending_buckets(index_dir, cfg.n_buckets)
    if pending:
        seg_dir = ckpt.segments_dir(index_dir)
        os.makedirs(seg_dir, exist_ok=True)
        ds = _resolve(source, [cfg.id_col, cfg.text_col])
        postings = ds.map_batches(
            TokenizePostings(text_col=cfg.text_col, id_col=cfg.id_col,
                             stopwords=stopwords, stem=cfg.stem,
                             n_buckets=cfg.n_buckets),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=tokenize_concurrency)
        if len(pending) < cfg.n_buckets:
            want = pa.array(pending, type=pa.int32())
            postings = postings.map_batches(
                lambda t: t.filter(pc.is_in(t["bucket"], value_set=want)),
                batch_format="pyarrow")
        writer = EncodeBucketWriter(seg_dir)

        def encode_bucket(group: pa.Table) -> pa.Table:
            return writer(group)

        metrics_ds = postings.groupby("bucket").map_groups(
            encode_bucket, batch_format="pyarrow")
        metrics_ds.materialize()  # small (≤ n_buckets rows); drives execution

    metrics = ckpt.bucket_metrics(index_dir, cfg.n_buckets)
    ckpt.write_manifest(index_dir, cfg, metrics)
    return ckpt.read_manifest(index_dir)
