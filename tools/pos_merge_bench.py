"""Positional-index merge throughput (VERDICT r3 item 7).

The plain-segment merge row in BASELINE.md (2 x 800k docs -> 114k docs/s)
never exercised the positional remap path (``stages/postings.py``
``merge_segment_tables`` with per-(term,doc) position streams), which is
correctness-tested but had no perf row.  This harness builds two positional
indexes over disjoint halves of the 1.6M-page scaling corpus, merges them,
and prints one JSON line with build + merge wall times and merge docs/s.

Usage::

    python tools/pos_merge_bench.py [n_docs_total]   # default 1_600_000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from search_engine_ray.state.memtune import set_allocator_env  # noqa: E402

set_allocator_env()

IDX_BASE = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def half_factory(pages_dir: str, half: int):
    """Dataset factory over one half of the corpus's parquet files (urls —
    and therefore docIDs — are disjoint between halves)."""
    import ray
    import ray.data
    from search_engine_ray.stages.extract import ExtractText

    files = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
                   if f.endswith(".parquet"))
    mid = len(files) // 2
    part = files[:mid] if half == 0 else files[mid:]

    def factory():
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_blocks = min(128, max(32, 2 * cpus))
        return (ray.data.read_parquet(part, columns=["url", "html", "lang"],
                                      override_num_blocks=n_blocks)
                .map_batches(ExtractText(), batch_format="pyarrow"))
    return factory


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.merge import merge_indexes
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.sources.pages import synthesize_pages

    pages_dir = synthesize_pages(
        n_docs, os.environ.get("SCALING_PAGES_DIR",
                               f"/tmp/serx_scaling_pages_{n_docs // 1000}k"))
    from search_engine_ray.state.checkpoint import IndexConfig
    cfg = lambda: IndexConfig(n_buckets=16, n_doc_shards=8,  # noqa: E731
                              positions=True, salt_hot_terms=False)
    halves = [os.path.join(IDX_BASE, f"serx_posmerge_{i}") for i in (0, 1)]
    out = os.path.join(IDX_BASE, "serx_posmerge_out")
    for d in (*halves, out):
        shutil.rmtree(d, ignore_errors=True)

    t_build = []
    for i, idx in enumerate(halves):
        t0 = time.time()
        build_index(half_factory(pages_dir, i), idx, cfg(), keep_cols=("url",))
        t_build.append(round(time.time() - t0, 2))

    t0 = time.time()
    merge_indexes(halves, out)
    t_merge = time.time() - t0

    # sanity: the merged positional index answers a phrase query
    qe = QueryEngine(out, num_searchers=4, use_actors=True)
    t0 = time.time()
    hits = qe.phrase_query("market stock", k=10)
    t_q = time.time() - t0
    seg_bytes = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(os.path.join(out, "segments"))
                    for f in fs if f.endswith(".parquet"))
    print(json.dumps({
        "metric": "positional-index merge throughput (2 halves -> 1)",
        "n_docs": n_docs,
        "build_sec_per_half": t_build,
        "merge_sec": round(t_merge, 2),
        "merge_docs_per_sec": round(n_docs / t_merge, 1),
        "merged_segment_mb": round(seg_bytes / 1e6, 1),
        "phrase_query_sec_cold": round(t_q, 2),
        "phrase_hits": len(hits),
    }))
    for d in (*halves, out):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
