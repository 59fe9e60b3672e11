"""Multi-NODE smoke: build + query on a simulated Ray cluster.

The sandbox cannot run real multi-machine Ray, but ``ray.cluster_utils
.Cluster`` (Ray's own public multi-node test harness) starts SEPARATE
raylets with SEPARATE plasma object stores on one box — scheduling,
block placement, and object transfer then cross real node boundaries,
which ``ray.init(address="local")`` never exercises.  This drives the
engine's multi-node shuffle shape end-to-end:

1. start a head + N-1 worker nodes (distinct object stores);
2. ``build_index(...)`` with the default ``exchange="auto"`` — asserts it
   resolves to ``"groupby"`` on this >1-node topology (the idiomatic
   Dataset sort shuffle; the fs exchange assumes node-shared scratch:
   NVMe-backed NFS or per-node spill + network fetch — README notes);
3. assert tokenize/shuffle tasks actually LANDED on >1 node (from the
   per-task node ids recorded by a probe stage);
4. query through the actor pool and compare BM25 top-k against the
   in-process oracle — rank- and score-identical.

Usage::

    python tools/multinode_smoke.py [--nodes 4] [--cpus-per-node 4] \
        [--source /root/testdata/sf0.01/documents.parquet]

Prints one JSON line; exit 0 iff every check passed.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--cpus-per-node", type=int, default=4)
    ap.add_argument("--source",
                    default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--index", default="/tmp/multinode_idx")
    args = ap.parse_args()

    # RAY_ADDRESS=local (preset in this sandbox) would override the
    # cluster address — the whole point is NOT to run local mode
    os.environ.pop("RAY_ADDRESS", None)

    import ray
    from ray.cluster_utils import Cluster

    node_mb = 512 * 1024 * 1024
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": args.cpus_per_node,
                        "object_store_memory": node_mb,
                        "include_dashboard": False})
    for _ in range(args.nodes - 1):
        cluster.add_node(num_cpus=args.cpus_per_node,
                         object_store_memory=node_mb)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    try:
        alive = [n for n in ray.nodes() if n["Alive"]]
        assert len(alive) == args.nodes, (len(alive), args.nodes)

        from search_engine_ray.pipelines.build import build_index
        from search_engine_ray.pipelines.oracle import build_oracle
        from search_engine_ray.pipelines.query import QueryEngine
        from search_engine_ray.state.checkpoint import IndexConfig

        shutil.rmtree(args.index, ignore_errors=True)

        # probe which nodes execute tokenize-side tasks: the stage wrapper
        # appends the worker's node id to a tiny marker file set.  (The
        # engine itself needs no change — this rides on postings_stage
        # being an arbitrary callable.)
        probe_dir = "/tmp/multinode_probe"
        shutil.rmtree(probe_dir, ignore_errors=True)
        os.makedirs(probe_dir, exist_ok=True)

        from search_engine_ray.stages.tokenize import TokenizePostings

        class ProbedTokenize(TokenizePostings):
            def __call__(self, batch):
                nid = ray.get_runtime_context().get_node_id()
                open(os.path.join(probe_dir, nid), "w").close()
                return super().__call__(batch)

        cfg = IndexConfig(n_buckets=8, n_doc_shards=2)
        stage = ProbedTokenize(
            text_col=cfg.text_col, id_col=cfg.id_col,
            stopwords=None, stem=cfg.stem, n_buckets=cfg.n_buckets,
            n_doc_shards=cfg.n_doc_shards)

        # a zero-arg factory instead of the path: many small blocks so the
        # head node's local dispatch queue overflows and tasks spill to the
        # other raylets (the point of the smoke is CROSS-node execution;
        # a 4-CPU head chews through a handful of short tasks before the
        # scheduler ever ships one remote)
        def factory():
            return ray.data.read_parquet(
                args.source, columns=[cfg.id_col, cfg.text_col],
                override_num_blocks=args.nodes * args.cpus_per_node * 4)

        # the default exchange="auto" must resolve to groupby here — this
        # IS the >1-alive-node topology the resolver exists for
        from search_engine_ray.stages.join import resolve_exchange
        resolved = resolve_exchange("auto")
        assert resolved == "groupby", resolved

        # small batch_size keeps the tokenize task count well above one
        # node's CPUs (the default 8192 coalesces a 50k-doc corpus into ~6
        # short tasks, which the head's local dispatch queue absorbs before
        # spillback ever ships one remote)
        t0 = time.perf_counter()
        build_index(factory, args.index, cfg,
                    postings_stage=stage,
                    postings_columns=[cfg.id_col, cfg.text_col],
                    batch_size=1024)
        build_s = time.perf_counter() - t0
        nodes_used = len(os.listdir(probe_dir))

        qe = QueryEngine(args.index, num_searchers=args.nodes,
                         use_actors=True)
        import pyarrow.parquet as pq
        t = pq.read_table(args.source, columns=["doc_id", "text"])
        orc = build_oracle(list(zip(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist())))
        checked = 0
        for q in ("scan merge window", "sort key value", "fast line part"):
            got, want = qe.query(q, k=10), orc.bm25(q, k=10)
            assert [d for d, _ in got] == [d for d, _ in want], (q, got, want)
            assert all(abs(a[1] - b[1]) < 1e-9
                       for a, b in zip(got, want)), q
            checked += 1

        # searcher actors should spread across nodes (SPREAD-by-default
        # actor scheduling): count distinct nodes hosting live actors.
        # The state API needs the dashboard HTTP server, absent in this
        # sandbox (no aiohttp) — report null rather than fail the smoke.
        try:
            from ray.util.state import list_actors
            anodes = {a.node_id for a in list_actors()
                      if a.state == "ALIVE" and a.node_id}
            actor_nodes = len(anodes)
        except Exception:
            actor_nodes = None

        print(json.dumps({
            "metric": "multi-node smoke (ray.cluster_utils.Cluster)",
            "nodes": args.nodes,
            "cpus_per_node": args.cpus_per_node,
            "alive_nodes": len(alive),
            "build_sec": round(build_s, 2),
            "exchange": "groupby",
            "tokenize_nodes_used": nodes_used,
            "actor_nodes_used": actor_nodes,
            "queries_rank_score_identical": checked,
            "ok": bool(nodes_used > 1 and checked == 3),
        }))
        return 0 if nodes_used > 1 and checked == 3 else 1
    finally:
        ray.shutdown()
        cluster.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
