"""Distributed inverted-index build (the reference's ``ParseSources``).

Reference lifecycle (``/root/reference/KaggleFinanceSourceEngine.cpp:33-92``,
traced in SURVEY.md §3.1): parser threads tokenize + pre-count per doc,
an arbitrator hash-routes ``(doc, term, tf)`` triples, filler threads own one
shard each.  Ray Data restatement:

    read_parquet (column-pruned)
      → map_batches(TokenizePostings)        # stateless vectorized tasks
      → [resume filter: drop finished partitions BEFORE the shuffle]
      → groupby("part").map_groups(EncodePartitionWriter)   # THE shuffle
      → per-partition atomic segment write + _DONE marker
      → termstats pass: re-read segment (term, df) columns → groupby(term)
        → global df/total_tf table (BM25 global stats for doc-sharded serving)

plus a pass for the docstore / BM25 norms (``DocStats``) and a tiny global
aggregate for ``docstats.json``.

Scale notes:
- the (shard, bucket) grid is the partition knob: each partition's postings
  are encoded in one ``map_groups`` call, so size ``n_doc_shards ×
  n_buckets`` such that (total postings)/n_partitions fits a worker heap;
  partitions ≫ workers keeps the reduce stage load-balanced.
- the tokenize stage emits ONE row per distinct (doc, term) — the map-side
  combine — so the shuffle volume is bounded by Σ per-doc vocabulary, not
  token count.
- the termstats pass reads only the tiny (term, df, total_tf) columns of the
  already-written segments — it never re-touches postings binaries.
- ``html``-bearing inputs must drop the binary column before the shuffle
  (we read only the id/text columns — pruned at the read).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..functions.analyze import ENGLISH_STOPWORDS
from ..stages.postings import EncodePartitionWriter
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
                tokenize_concurrency: int | None = None,
                postings_stage=None,
                postings_columns: list[str] | None = None) -> dict:
    """Build (or resume) the index at ``index_dir``. Returns the manifest.

    ``source`` is a parquet path/dir or a zero-arg Dataset factory (the
    factory is called once per pass; passes read disjoint column sets).
    ``postings_stage`` overrides the per-batch posting-row emitter (e.g.
    ``FieldedPostings`` for the multi-field reference index); it must emit
    a ``part`` column consistent with the config's partition grid, and
    ``postings_columns`` names the input columns it needs.
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

    # ---- pass B: postings shuffle, finished partitions filtered pre-shuffle ----
    pending = ckpt.pending_partitions(index_dir, cfg)
    if pending:
        seg_dir = ckpt.segments_dir(index_dir)
        os.makedirs(seg_dir, exist_ok=True)
        stage = postings_stage or TokenizePostings(
            text_col=cfg.text_col, id_col=cfg.id_col,
            stopwords=stopwords, stem=cfg.stem,
            n_buckets=cfg.n_buckets, n_doc_shards=cfg.n_doc_shards)
        ds = _resolve(source, postings_columns or [cfg.id_col, cfg.text_col])
        postings = ds.map_batches(
            stage, batch_format="pyarrow", batch_size=batch_size,
            concurrency=tokenize_concurrency)
        if len(pending) < cfg.n_partitions:
            want = pa.array(pending, type=pa.int32())
            postings = postings.map_batches(
                lambda t: t.filter(pc.is_in(t["part"], value_set=want)),
                batch_format="pyarrow")
        writer = EncodePartitionWriter(seg_dir, cfg.n_buckets)

        def encode_partition(group: pa.Table) -> pa.Table:
            return writer(group)

        metrics_ds = postings.groupby("part").map_groups(
            encode_partition, batch_format="pyarrow")
        metrics_ds.materialize()  # small (≤ n_partitions rows); drives execution

    # ---- pass C: global term stats (df summed across doc shards) ----
    ts_dir = ckpt.termstats_dir(index_dir)
    if pending or not os.path.exists(ts_dir):
        seg_meta = ray.data.read_parquet(
            ckpt.segments_dir(index_dir),
            columns=["field", "term", "df", "total_tf"])
        stats = (seg_meta.groupby(["field", "term"])
                 .aggregate(Sum("df"), Sum("total_tf"))
                 .rename_columns({"sum(df)": "df", "sum(total_tf)": "total_tf"}))
        tmp_dir = ts_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        stats.write_parquet(tmp_dir)
        shutil.rmtree(ts_dir, ignore_errors=True)
        os.replace(tmp_dir, ts_dir)

    metrics = ckpt.partition_metrics(index_dir, cfg)
    ckpt.write_manifest(index_dir, cfg, metrics)
    return ckpt.read_manifest(index_dir)


# default column mapping for the articles-shaped pages corpus
# (sources/pages.py; reference fields at KaggleFinanceSourceEngine.cpp:213-254)
REFERENCE_TEXT_FIELDS = {"text": "text", "title": "title"}
REFERENCE_METADATA_FIELDS = {"site": "site", "author": "author",
                             "country": "country", "language": "lang",
                             "person": "persons", "location": "locations",
                             "organization": "organizations"}


def build_reference_index(source: str | DatasetFactory, index_dir: str,
                          config: IndexConfig | None = None, *,
                          text_fields: dict[str, str] | None = None,
                          metadata_fields: dict[str, str] | None = None,
                          **kwargs) -> dict:
    """Multi-field index with the reference's full field set: tokenized
    text+title postings plus the 7 metadata set-indexes (SURVEY §1.2)."""
    from ..stages.tokenize import FieldedPostings
    cfg = config or IndexConfig()
    tf = text_fields or REFERENCE_TEXT_FIELDS
    mf = metadata_fields or REFERENCE_METADATA_FIELDS
    stage = FieldedPostings(
        id_col=cfg.id_col, text_fields=tf, metadata_fields=mf,
        stopwords=ENGLISH_STOPWORDS if cfg.stopwords else None,
        stem=cfg.stem, n_buckets=cfg.n_buckets, n_doc_shards=cfg.n_doc_shards)
    cols = [cfg.id_col] + sorted(set(tf.values()) | set(mf.values()))
    return build_index(source, index_dir, cfg, postings_stage=stage,
                       postings_columns=cols, **kwargs)
