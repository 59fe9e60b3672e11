"""Index directory layout, manifest, and per-partition checkpoint/resume.

The reference rebuilds its whole in-memory database on every run
(``/root/reference/KaggleFinanceSourceEngine.cpp:118-129`` — ``parse`` wipes
and refills).  The north rule requires the opposite: segment builds stream,
each partition commits atomically (tmp file + rename + ``_DONE`` marker with
metrics), and an interrupted build resumes by skipping finished partitions
BEFORE the shuffle (the pending-bucket filter is pushed into the tokenize
stage, so finished buckets' rows never enter the groupby).

Layout::

    index_dir/
      manifest.json            # config + per-bucket metrics, written last
      docstats.json            # N, avgdl, total_tokens  (BM25 globals)
      docstore/ *.parquet      # doc_id, doc_len, url/lang passthroughs
      segments/
        bucket=00000/
          postings.parquet     # SEGMENT_SCHEMA (stages/postings.py)
          _DONE                # json metrics; presence = partition committed
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class IndexConfig:
    n_buckets: int = 32
    text_col: str = "text"
    id_col: str = "doc_id"
    stopwords: bool = False
    stem: bool = False
    fields: tuple[str, ...] = ("text",)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    extra: dict = field(default_factory=dict)


def segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def bucket_dir(index_dir: str, bucket: int) -> str:
    return os.path.join(segments_dir(index_dir), f"bucket={bucket:05d}")


def done_buckets(index_dir: str, n_buckets: int) -> list[int]:
    return [b for b in range(n_buckets)
            if os.path.exists(os.path.join(bucket_dir(index_dir, b), "_DONE"))]


def pending_buckets(index_dir: str, n_buckets: int) -> list[int]:
    done = set(done_buckets(index_dir, n_buckets))
    return [b for b in range(n_buckets) if b not in done]


def bucket_metrics(index_dir: str, n_buckets: int) -> list[dict]:
    out = []
    for b in done_buckets(index_dir, n_buckets):
        with open(os.path.join(bucket_dir(index_dir, b), "_DONE")) as f:
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
                 {"config": asdict(config), "buckets": metrics})


def read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)
