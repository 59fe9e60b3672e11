"""Checkpoint/resume under a hard kill (SURVEY §5 item 5): SIGKILL a build
mid-commit, rerun, assert finished partitions are not recomputed and the
final index equals an uninterrupted build."""

import os
import shutil
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

from search_engine_ray.state import checkpoint as ckpt
from search_engine_ray.state.checkpoint import IndexConfig

CFG = dict(n_buckets=16, n_doc_shards=4)   # 64 partitions → slow enough

CHILD = """
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.state.checkpoint import IndexConfig
build_index(sys.argv[1], sys.argv[2], IndexConfig(n_buckets=16, n_doc_shards=4))
ray.shutdown()
"""


@pytest.mark.slow
def test_kill_mid_build_then_resume(ray_session, tmp_path):
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.pages import synthesize_pages, pages_batch
    import numpy as np
    import pyarrow as pa

    src = str(tmp_path / "docs.parquet")
    t = pages_batch(np.arange(3000))
    t = (t.select(["text", "lang"])
         .append_column("doc_id", pa.array(range(3000), type=pa.int64())))
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")

    child = subprocess.Popen([sys.executable, "-c", CHILD, src, idx],
                             cwd="/root/repo", stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL,
                             start_new_session=True)
    cfg = IndexConfig(**CFG)
    deadline = time.time() + 180
    killed = False
    try:
        while time.time() < deadline:
            done = ckpt.done_partitions(idx, cfg) if os.path.exists(idx) else []
            if 1 <= len(done) < cfg.n_partitions:
                os.killpg(child.pid, signal.SIGKILL)
                killed = True
                break
            if child.poll() is not None:
                break
            time.sleep(0.05)
    finally:
        if child.poll() is None and not killed:
            os.killpg(child.pid, signal.SIGKILL)
        child.wait()
        time.sleep(1.0)

    done_before = ckpt.done_partitions(idx, cfg)
    if not killed or not done_before or len(done_before) == cfg.n_partitions:
        pytest.skip("kill landed outside the commit window; nothing to resume")

    mtimes = {}
    for p in done_before:
        s, b = ckpt.split_part(p, cfg.n_buckets)
        path = os.path.join(ckpt.partition_dir(idx, s, b), "postings.parquet")
        mtimes[path] = os.path.getmtime(path)

    man = build_index(src, idx, IndexConfig(**CFG))
    assert len(man["partitions"]) == cfg.n_partitions
    for path, mt in mtimes.items():
        assert os.path.getmtime(path) == mt, f"recomputed finished {path}"

    idx2 = str(tmp_path / "fresh")
    build_index(src, idx2, IndexConfig(**CFG))
    for s in range(cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            t1 = pq.read_table(os.path.join(ckpt.partition_dir(idx, s, b),
                                            "postings.parquet"))
            t2 = pq.read_table(os.path.join(ckpt.partition_dir(idx2, s, b),
                                            "postings.parquet"))
            assert t1.equals(t2), (s, b)
    assert ckpt.read_docstats(idx) == ckpt.read_docstats(idx2)


def test_groupby_exchange_resume_skips_finished_partitions(ray_session,
                                                           tmp_path):
    """Deterministic resume on the ``exchange="groupby"`` path (the
    multi-node shuffle shape): un-commit a subset of partitions from a
    finished build, rebuild, and assert untouched partitions are not
    recomputed (mtime-identical) while the resumed index equals a fresh
    uninterrupted groupby build."""
    from search_engine_ray.pipelines.build import build_index

    src = "/root/testdata/sf0.001/documents.parquet"
    grid = dict(n_buckets=8, n_doc_shards=2)          # 16 partitions
    cfg = IndexConfig(**grid)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(**grid), exchange="groupby")
    assert not ckpt.pending_partitions(idx, cfg)

    victims = [0, 3, 7, 9, 14]
    for p in victims:
        s, b = ckpt.split_part(p, cfg.n_buckets)
        shutil.rmtree(ckpt.partition_dir(idx, s, b))
    assert sorted(ckpt.pending_partitions(idx, cfg)) == victims

    survivor_mtimes = {}
    for p in range(cfg.n_partitions):
        if p in victims:
            continue
        s, b = ckpt.split_part(p, cfg.n_buckets)
        path = os.path.join(ckpt.partition_dir(idx, s, b), "postings.parquet")
        survivor_mtimes[path] = os.path.getmtime(path)

    man = build_index(src, idx, IndexConfig(**grid), exchange="groupby")
    assert len(man["partitions"]) == cfg.n_partitions
    assert not ckpt.pending_partitions(idx, cfg)
    for path, mt in survivor_mtimes.items():
        assert os.path.getmtime(path) == mt, f"recomputed finished {path}"

    idx2 = str(tmp_path / "fresh")
    build_index(src, idx2, IndexConfig(**grid), exchange="groupby")
    for s in range(cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            t1 = pq.read_table(os.path.join(ckpt.partition_dir(idx, s, b),
                                            "postings.parquet"))
            t2 = pq.read_table(os.path.join(ckpt.partition_dir(idx2, s, b),
                                            "postings.parquet"))
            assert t1.equals(t2), (s, b)
    assert ckpt.read_docstats(idx) == ckpt.read_docstats(idx2)
