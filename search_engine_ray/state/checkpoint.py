"""Index directory layout, manifest, and per-partition checkpoint/resume.

The reference rebuilds its whole in-memory database on every run
(``/root/reference/KaggleFinanceSourceEngine.cpp:118-129`` — ``parse`` wipes
and refills).  The north rule requires the opposite: segment builds stream,
each partition commits atomically (tmp file + rename + ``_DONE`` marker with
metrics), and an interrupted build resumes by skipping finished partitions
BEFORE the shuffle (the pending-partition filter is pushed into the tokenize
stage, so finished partitions' rows never enter the groupby).

Partitioning is two-level (the serving/building split of real engines):

- ``shard``   = doc_id % n_doc_shards — **document shard**, the query-serving
  unit: one stateful searcher actor owns shard(s) and computes complete
  scores for its docs, returning only top-k (bounded fan-in at any scale).
- ``bucket``  = term_hash % n_buckets — **term bucket** within a shard, the
  build/checkpoint unit: one ``map_groups`` call encodes one (shard, bucket)
  partition (the rebuild's ``word % filling_thread_count_``,
  ``KaggleFinanceSourceEngine.cpp:296``).

``part = shard * n_buckets + bucket`` is the single shuffle key.

Layout::

    index_dir/
      manifest.json              # config + per-partition metrics, written last
      docstats.json              # N, avgdl, total_tokens  (BM25 globals)
      docstore/
        shard=K/ *.parquet       # doc_id, doc_len, url/lang passthroughs,
                                 #   partitioned by doc shard (K = doc_id %
                                 #   n_doc_shards) so a searcher actor reads
                                 #   ONLY its own shards — O(corpus/actors)
                                 #   startup, not O(corpus).  (Round-1/2
                                 #   indexes are flat; readers fall back.)
      termstats/ *.parquet       # term, df, total_tf — GLOBAL term stats
                                 #   (aggregated across shards after segments)
      segments/
        shard=000/bucket=00000/
          postings.parquet       # SEGMENT_SCHEMA (stages/postings.py);
                                 #   docIDs in per-shard LOCAL space when the
                                 #   schema metadata says so (DOCID_SPACE_KEY)
          _DONE                  # json metrics; presence = partition committed
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class IndexConfig:
    n_buckets: int = 16
    n_doc_shards: int = 4
    text_col: str = "text"
    id_col: str = "doc_id"
    stopwords: bool = False
    stem: bool = False
    # positional postings: segments additionally store each (term, doc)'s
    # token positions (delta+varint) — enables index-served phrase queries
    positions: bool = False
    fields: tuple[str, ...] = ("text",)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    # head-term skew salting: sample-estimate df, spread terms whose df
    # fraction exceeds ``hot_df_fraction`` over ``salt`` buckets (recorded in
    # hotterms.json + the manifest so resume routes identically)
    salt_hot_terms: bool = True
    hot_df_fraction: float = 0.25
    salt: int = 8
    extra: dict = field(default_factory=dict)

    @property
    def n_partitions(self) -> int:
        return self.n_buckets * self.n_doc_shards


def part_id(shard: int, bucket: int, n_buckets: int) -> int:
    return shard * n_buckets + bucket


def split_part(part: int, n_buckets: int) -> tuple[int, int]:
    return part // n_buckets, part % n_buckets


def segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def termstats_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "termstats")


def shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(segments_dir(index_dir), f"shard={shard:03d}")


def docstore_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "docstore")


def docstore_shard_dir(index_dir: str, shard: int) -> str:
    """Hive-style doc-shard partition of the docstore (unpadded ``shard=K``
    to match ``write_parquet(partition_cols=['shard'])`` output)."""
    return os.path.join(docstore_dir(index_dir), f"shard={shard}")


def partition_dir_in(seg_dir: str, shard: int, bucket: int) -> str:
    """Partition dir addressed from a segments root (writers hold the
    segments dir, not the index dir).  THE single definition of the
    on-disk ``shard=SSS/bucket=BBBBB`` naming: resume's done/pending scans
    (`done_partitions`) walk exactly this format, so every writer must
    route through here — a second hand-rolled copy that drifts (padding,
    separator) would commit segments resume never finds."""
    return os.path.join(seg_dir, f"shard={shard:03d}", f"bucket={bucket:05d}")


def partition_dir(index_dir: str, shard: int, bucket: int) -> str:
    return partition_dir_in(segments_dir(index_dir), shard, bucket)


def tombstones_shard_dir(index_dir: str, shard: int) -> str:
    """Deleted-docID parquet fragments for one doc shard (Lucene-style
    tombstones: deletes are visible at query time immediately; postings,
    docstore and statistics are only rewritten by ``compact_index``)."""
    return os.path.join(index_dir, "tombstones", f"shard={shard}")


def done_partitions(index_dir: str, cfg: IndexConfig) -> list[int]:
    out = []
    for s in range(cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            if os.path.exists(os.path.join(partition_dir(index_dir, s, b), "_DONE")):
                out.append(part_id(s, b, cfg.n_buckets))
    return out


def pending_partitions(index_dir: str, cfg: IndexConfig) -> list[int]:
    done = set(done_partitions(index_dir, cfg))
    return [p for p in range(cfg.n_partitions) if p not in done]


def partition_metrics(index_dir: str, cfg: IndexConfig) -> list[dict]:
    out = []
    for p in done_partitions(index_dir, cfg):
        s, b = split_part(p, cfg.n_buckets)
        with open(os.path.join(partition_dir(index_dir, s, b), "_DONE")) as f:
            out.append(json.load(f))
    return out


def write_docstats(index_dir: str, *, n_docs: int, total_tokens: int) -> dict:
    stats = {"n_docs": int(n_docs),
             "total_tokens": int(total_tokens),
             "avgdl": (total_tokens / n_docs) if n_docs else 0.0}
    _atomic_json(os.path.join(index_dir, "docstats.json"), stats)
    return stats


def read_docstats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "docstats.json")) as f:
        return json.load(f)


def write_manifest(index_dir: str, config: IndexConfig, metrics: list[dict]) -> None:
    _atomic_json(os.path.join(index_dir, "manifest.json"),
                 {"config": asdict(config), "partitions": metrics})


def read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)
