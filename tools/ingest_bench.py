"""Incremental-ingest throughput bench (VERDICT r3 item 7's missing half).

Builds a base index over N pages, then ingests a batch of M NEW pages via
``pipelines.maintenance.ingest_documents`` (delta build + k-way merge +
swap) and reports the wall split.  A post-ingest query must hit a doc that
exists only in the delta batch.

Usage::

    python tools/ingest_bench.py [--base-n 1600000] [--delta-n 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
from search_engine_ray.state.memtune import set_allocator_env  # noqa: E402

set_allocator_env()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-n", type=int, default=1_600_000)
    ap.add_argument("--delta-n", type=int, default=100_000)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--idx-base", default="/dev/shm"
                    if os.path.isdir("/dev/shm") else "/tmp")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.sources.pages import synthesize_pages
    from search_engine_ray.stages.extract import ExtractText
    from search_engine_ray.state.checkpoint import IndexConfig

    base_pages = synthesize_pages(
        args.base_n, f"/tmp/serx_ingest_base_{args.base_n}")
    # the delta corpus must be DISJOINT urls: synthesize with an offset dir
    # then re-key urls in the factory
    delta_pages = synthesize_pages(
        args.delta_n, f"/tmp/serx_ingest_delta_{args.delta_n}")

    def factory_for(pages_dir, url_suffix=""):
        import ray.data

        def factory():
            ds = ray.data.read_parquet(pages_dir,
                                       columns=["url", "html", "lang"])
            if url_suffix:
                import pyarrow.compute as pc

                def rekey(b):
                    return b.set_column(
                        b.column_names.index("url"), "url",
                        pc.binary_join_element_wise(
                            b["url"], url_suffix, ""))
                ds = ds.map_batches(rekey, batch_format="pyarrow")
            return ds.map_batches(ExtractText(), batch_format="pyarrow")
        factory.cache_tag = pages_dir + url_suffix
        return factory

    idx = os.path.join(args.idx_base, "serx_ingest_idx")
    shutil.rmtree(idx, ignore_errors=True)
    for leftover in (idx + ".ingest", idx + ".pre-ingest"):
        shutil.rmtree(leftover, ignore_errors=True)

    t0 = time.time()
    build_index(factory_for(base_pages), idx,
                IndexConfig(n_buckets=16, n_doc_shards=8),
                keep_cols=("url",))
    t_base = time.time() - t0

    t0 = time.time()
    stats = ingest_documents(idx, factory_for(delta_pages, "?ingest=1"),
                             workdir=os.path.join(args.idx_base,
                                                  "serx_ingest_work"))
    t_ingest = time.time() - t0

    qe = QueryEngine(idx, num_searchers=4, use_actors=True)
    t0 = time.time()
    hits = qe.query("market stock price", k=10)
    t_q = time.time() - t0
    # the docstring's contract: a post-ingest query must surface delta docs.
    # Every delta doc is a score-tied content twin of a base doc (same
    # generator, re-keyed url), so the top-10 can legitimately be all base
    # docs — widen to k=40 and require at least one hit whose docstore url
    # carries the '?ingest=1' suffix, failing loudly if the merge silently
    # dropped every delta posting.
    from search_engine_ray.cli import docstore_lookup
    wide = qe.query("market stock price", k=40)
    delta_hits = 0
    for doc_id, _score in wide:
        row = docstore_lookup(idx, doc_id)
        if row and "?ingest=1" in str(row.get("url", "")):
            delta_hits += 1
    if delta_hits == 0:
        raise SystemExit(
            f"ingest verification failed: none of the {len(wide)} widened "
            f"top-k hits is a delta doc (url suffix '?ingest=1') — the "
            f"merged index is not serving delta postings")
    import pyarrow.parquet as pq
    n_docs = sum(
        pq.read_metadata(f).num_rows
        for root, _, fs in os.walk(os.path.join(idx, "docstore"))
        for f in (os.path.join(root, x) for x in fs)
        if f.endswith(".parquet"))
    print(json.dumps({
        "metric": "incremental ingest (delta build + k-way merge + swap)",
        "base_n": args.base_n, "delta_n": args.delta_n,
        "base_build_sec": round(t_base, 2),
        "ingest_sec": round(t_ingest, 2),
        "ingest_docs_per_sec_delta": round(args.delta_n / t_ingest, 1),
        "merged_docs_per_sec": round((args.base_n + args.delta_n)
                                     / t_ingest, 1),
        "post_ingest_docstore_docs": n_docs,
        "first_query_sec": round(t_q, 2), "query_hits": len(hits),
        "delta_hits_in_top40": delta_hits,
        "ingest_stats": {k: v for k, v in (stats or {}).items()
                         if isinstance(v, (int, float, str))},
        "num_cpus": args.num_cpus}))
    ray.shutdown()


if __name__ == "__main__":
    main()
