"""Multi-NODE build-throughput measurement (VERDICT r4 item 4).

``tools/multinode_smoke.py`` proved correctness across separate raylets /
object stores; this tool puts a NUMBER on the cross-store shuffle cost —
the closest this single-box sandbox gets to the north rule's true
N-vs-4N-node cluster shape.  Each leg runs in a fresh subprocess: a
``ray.cluster_utils.Cluster`` with the requested topology, SAME total
CPUs and SAME total object-store bytes (split across nodes), building the
same synthetic pages corpus with ``exchange="groupby"`` (the multi-node
object-store shuffle path; the fs exchange assumes node-shared scratch).

Efficiency = t(1 node) / t(k nodes) at equal total resources: 1.0 means
splitting one box into k object stores costs nothing; below 1.0 is the
object-transfer + cross-store shuffle overhead a real cluster pays (and
buys back with per-node memory channels / NICs this VM cannot grant).

Per-node task counts come from a probe stage appended to the extract
pipeline (one byte per batch per node file).

Usage::

    python tools/multinode_bench.py [--pairs 1x8,4x2;1x16,4x4]
        [--n-pages 400000] [--store-mb 4096] [--trials 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
from search_engine_ray.state.memtune import set_allocator_env  # noqa: E402

set_allocator_env()

PROBE_DIR = "/tmp/serx_mn_probe"


def leg(nodes: int, cpus: int, n_pages: int, pages_dir: str,
        store_mb: int) -> None:
    os.environ.pop("RAY_ADDRESS", None)   # local mode would defeat the point
    import ray
    from ray.cluster_utils import Cluster

    per_node = (store_mb << 20) // nodes
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": cpus, "object_store_memory": per_node,
                        "include_dashboard": False})
    for _ in range(nodes - 1):
        cluster.add_node(num_cpus=cpus, object_store_memory=per_node)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    try:
        alive = [n for n in ray.nodes() if n["Alive"]]
        assert len(alive) == nodes, (len(alive), nodes)

        from search_engine_ray.pipelines.build import build_index
        from search_engine_ray.stages.extract import ExtractText
        from search_engine_ray.state.checkpoint import IndexConfig

        shutil.rmtree(PROBE_DIR, ignore_errors=True)
        os.makedirs(PROBE_DIR, exist_ok=True)

        def probe(batch):
            nid = ray.get_runtime_context().get_node_id()
            with open(os.path.join(PROBE_DIR, nid), "a") as f:
                f.write("1")
            return batch

        def factory():
            return (ray.data.read_parquet(
                pages_dir, columns=["url", "html", "lang"],
                override_num_blocks=nodes * cpus * 4)
                .map_batches(ExtractText(), batch_format="pyarrow")
                .map_batches(probe, batch_format="pyarrow"))

        idx = "/dev/shm/serx_mn_idx" if os.path.isdir("/dev/shm") \
            else "/tmp/serx_mn_idx"
        shutil.rmtree(idx, ignore_errors=True)
        fg = _fault_gbps()
        s0 = _cpu_sample()
        t0 = time.perf_counter()
        build_index(factory, idx,
                    IndexConfig(n_buckets=16, n_doc_shards=8),
                    keep_cols=("url",), exchange="groupby")
        dt = time.perf_counter() - t0
        tasks = {nid[:8]: os.path.getsize(os.path.join(PROBE_DIR, nid))
                 for nid in os.listdir(PROBE_DIR)}
        shutil.rmtree(idx, ignore_errors=True)
        print(json.dumps({
            "nodes": nodes, "cpus_per_node": cpus, "sec": round(dt, 2),
            "docs_per_sec": round(n_pages / dt, 1),
            "nodes_used": len(tasks), "tasks_per_node": tasks,
            "steal_pct": round(_steal(s0, _cpu_sample()), 2),
            "fault_gbps": fg}))
    finally:
        ray.shutdown()
        cluster.shutdown()


def _cpu_sample():
    p = open("/proc/stat").readline().split()[1:]
    t = [int(x) for x in p]
    return (t[7] if len(t) > 7 else 0), sum(t)


def _steal(a, b) -> float:
    dt = b[1] - a[1]
    return 100.0 * (b[0] - a[0]) / dt if dt > 0 else 0.0


def _fault_gbps() -> float:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from host_health import first_touch_gbps
    return round(first_touch_gbps(8, 1.0), 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="1x8,4x2;1x16,4x4",
                    help="semicolon-separated equal-CPU pairs of NxC topos")
    ap.add_argument("--n-pages", type=int, default=400_000)
    ap.add_argument("--store-mb", type=int, default=4096,
                    help="TOTAL object-store MB, split across nodes")
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--leg", nargs=2, type=int, metavar=("NODES", "CPUS"))
    args = ap.parse_args()

    from search_engine_ray.sources.pages import synthesize_pages
    pages_dir = synthesize_pages(
        args.n_pages, f"/tmp/serx_mn_pages_{args.n_pages}")

    if args.leg:
        leg(args.leg[0], args.leg[1], args.n_pages, pages_dir,
            args.store_mb)
        return 0

    # warm the page cache so the first topology doesn't pay the cold read
    for name in sorted(os.listdir(pages_dir)):
        with open(os.path.join(pages_dir, name), "rb") as f:
            while f.read(1 << 22):
                pass

    out = {"metric": "multi-node build throughput at equal total resources"
                     " (cluster_utils, separate raylets + object stores,"
                     " exchange=groupby)",
           "n_pages": args.n_pages, "store_mb_total": args.store_mb,
           "pairs": []}
    for pair in args.pairs.split(";"):
        topos = pair.split(",")
        if len(topos) != 2 or topos[0] == topos[1]:
            sys.stderr.write(
                f"--pairs entry {pair!r} must name exactly two distinct "
                f"NxC topologies (e.g. 1x8,4x2)\n")
            return 2
        legs = {}
        for topo in topos:
            nodes, cpus = (int(x) for x in topo.split("x"))
            best = None
            for _ in range(args.trials):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--leg", str(nodes), str(cpus),
                     "--n-pages", str(args.n_pages),
                     "--store-mb", str(args.store_mb)],
                    capture_output=True, text=True, timeout=1800)
                lines = [l for l in proc.stdout.strip().splitlines()
                         if l.startswith("{")]
                if not lines:
                    sys.stderr.write(f"leg {topo} failed:\n" + "\n".join(
                        proc.stderr.strip().splitlines()[-12:]) + "\n")
                    raise RuntimeError(f"leg {topo} produced no result")
                res = json.loads(lines[-1])
                if best is None or res["sec"] < best["sec"]:
                    best = res
            legs[topo] = best
        (t1, tk) = (legs[p]["sec"] for p in pair.split(","))
        entry = {"legs": legs,
                 "efficiency_multi_vs_single": round(t1 / tk, 3)}
        out["pairs"].append(entry)
        print(json.dumps(entry), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
