"""End-to-end: distributed build + BM25 query ≡ single-process oracle,
plus checkpoint/resume semantics (SURVEY.md §5 items 2 and 5)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from search_engine_ray.pipelines.oracle import build_oracle
from search_engine_ray.state import checkpoint as ckpt
from search_engine_ray.state.checkpoint import IndexConfig

QUERIES = ["table row merge", "spark", "window agg sort", "customer filter",
           "dup", "the a big", "nosuchterm", "hash hash join",
           "it's O'Brien", "naïve café table"]

CFG = dict(n_buckets=8, n_doc_shards=3)


@pytest.fixture(scope="module")
def built_index(ray_session, sf_small, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path_factory.mktemp("idx") / "sf_small")
    man = build_index(os.path.join(sf_small, "documents.parquet"), idx,
                      IndexConfig(**CFG), keep_cols=("lang",))
    return idx, man


@pytest.fixture(scope="module")
def oracle(sf_small):
    t = pq.read_table(os.path.join(sf_small, "documents.parquet"),
                      columns=["doc_id", "text"])
    return build_oracle(list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))


def test_manifest_complete(built_index):
    idx, man = built_index
    cfg = IndexConfig(**CFG)
    assert len(man["partitions"]) == cfg.n_partitions
    assert ckpt.pending_partitions(idx, cfg) == []


def test_docstats_match_oracle(built_index, oracle):
    idx, _ = built_index
    stats = ckpt.read_docstats(idx)
    assert stats["n_docs"] == oracle.n_docs
    assert stats["avgdl"] == pytest.approx(oracle.avgdl)


def test_global_df_match_oracle(built_index, oracle):
    from search_engine_ray.pipelines.query import SegmentSearcher
    idx, _ = built_index
    s = SegmentSearcher(idx, list(range(CFG["n_doc_shards"])))
    assert s.vocabulary("text") == set(oracle.postings)
    for term in oracle.postings:
        assert s.df_of([term])[term] == oracle.df(term), term


def test_doc_sharding_is_disjoint_and_complete(built_index, oracle):
    from search_engine_ray.pipelines.query import SegmentSearcher
    from search_engine_ray.functions.varint import delta_decode
    idx, _ = built_index
    seen: set[int] = set()
    total = 0
    for shard in range(CFG["n_doc_shards"]):
        s = SegmentSearcher(idx, [shard])
        shard_docs: set[int] = set()
        for term in s.vocabulary("text"):
            for slot in s._slots_of("text", term):
                local, _tf, _dl = s._decode_slot(slot)
                shard_docs.update(s._docs[local].tolist())
        assert not (seen & shard_docs)
        seen |= shard_docs
        total += len(shard_docs)
    assert seen == set(oracle.doc_len) - \
        {d for d, l in oracle.doc_len.items() if l == 0}


@pytest.mark.parametrize("use_actors", [False, True])
def test_bm25_rank_and_score_identical(built_index, oracle, use_actors,
                                       ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=use_actors)
    for q in QUERIES:
        got = qe.query(q, k=10)
        want = oracle.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q


@pytest.mark.parametrize("use_actors", [False, True])
def test_query_many_matches_single(built_index, oracle, use_actors,
                                   ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=use_actors)
    batch = qe.query_many(QUERIES, k=10)
    for q, got in zip(QUERIES, batch):
        assert got == qe.query(q, k=10), q
        want = oracle.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_query_many_replicas_match_single_group(built_index, ray_session):
    """Replica-parallel batching (the throughput scaling shape) returns
    byte-identical results to the one-group path, including empty-token
    queries interleaved mid-batch."""
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe1 = QueryEngine(idx, num_searchers=2, use_actors=True)
    qe3 = QueryEngine(idx, num_searchers=2, use_actors=True,
                      num_replicas=3)
    batch = list(QUERIES) + ["", "...", "zzzznoterm"] + list(QUERIES)
    assert qe3.query_many(batch, k=10) == qe1.query_many(batch, k=10)


BOOL_QUERIES = ["table row -merge", "window agg -nosuchterm", "spark -spark",
                "-table", "hash join -dup -spark", "nosuchterm -table",
                "table -the"]


@pytest.mark.parametrize("use_actors", [False, True])
def test_boolean_query_matches_oracle(built_index, oracle, use_actors,
                                      ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=use_actors)
    for q in BOOL_QUERIES:
        got = qe.boolean_query(q, k=10)
        want = oracle.bm25_boolean(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q
    # negation actually removes docs vs the plain OR query
    assert qe.boolean_query("spark -spark", k=10) == []
    plain = {d for d, _ in qe.query("table row", k=10**6)}
    negd = {d for d, _ in qe.boolean_query("table row -merge", k=10**6)}
    merged = {d for d, _ in qe.query("merge", k=10**6)}
    assert negd and not (negd & merged) and negd < plain


@pytest.mark.parametrize("use_actors", [False, True])
def test_maxscore_pruned_search_matches_exhaustive(built_index, oracle,
                                                   use_actors, ray_session):
    """MaxScore dynamic pruning returns the exact top-k of exhaustive
    evaluation (scores approx-equal: accumulation order differs)."""
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=use_actors)
    for q in QUERIES + ["the scan sort merge window agg value key line big"]:
        got = qe.query(q, k=10, prune=True)
        want = oracle.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q


def test_groupby_exchange_builds_identical_index(ray_session, sf_small,
                                                 built_index, tmp_path):
    """The object-store groupby exchange and the filesystem exchange commit
    byte-identical partitions."""
    import pyarrow.parquet as _pq
    from search_engine_ray.pipelines.build import build_index
    idx_fs, _ = built_index
    idx_gb = str(tmp_path / "gb")
    cfg = IndexConfig(**CFG)
    build_index(os.path.join(sf_small, "documents.parquet"), idx_gb, cfg,
                keep_cols=("lang",), exchange="groupby")
    for s in range(cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            t1 = _pq.read_table(os.path.join(ckpt.partition_dir(idx_fs, s, b),
                                             "postings.parquet"))
            t2 = _pq.read_table(os.path.join(ckpt.partition_dir(idx_gb, s, b),
                                             "postings.parquet"))
            assert t1.equals(t2), (s, b)
    assert ckpt.read_docstats(idx_fs) == ckpt.read_docstats(idx_gb)


def test_salted_head_terms_spread_and_score_identically(ray_session, sf_small,
                                                        oracle, tmp_path):
    """Head-term salting (SURVEY §7.5 item 2): hot terms spread over several
    buckets within a shard; searchers merge the runs, so ranking is
    unchanged; salted terms are recorded in the manifest."""
    import glob as _glob
    import pyarrow.parquet as _pq
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import QueryEngine
    idx = str(tmp_path / "salted")
    src = os.path.join(sf_small, "documents.parquet")
    man = build_index(src, idx, IndexConfig(
        n_buckets=8, n_doc_shards=2, hot_df_fraction=0.10, salt=4))
    salted = man["config"]["extra"]["salted_terms"]
    assert salted, "31-word corpus must have head terms above 10% df"

    # a salted term's postings live in >1 bucket of a shard
    buckets_of = {}
    for path in _glob.glob(os.path.join(idx, "segments", "shard=000",
                                        "bucket=*", "postings.parquet")):
        for t in _pq.read_table(path, columns=["term"])["term"].to_pylist():
            buckets_of.setdefault(t, set()).add(path)
    assert any(len(buckets_of.get(t, set())) > 1 for t in salted)

    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    for q in ["the fast sort", "table row merge", salted[0]]:
        got = qe.query(q, k=10)
        want = oracle.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_empty_and_single_doc_corpora(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as _pq
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import QueryEngine
    cfg = IndexConfig(n_buckets=4, n_doc_shards=2)

    empty_src = str(tmp_path / "empty.parquet")
    _pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64()),
                              "text": pa.array([], type=pa.string())}),
                    empty_src)
    idx = str(tmp_path / "empty_idx")
    man = build_index(empty_src, idx, cfg)
    assert len(man["partitions"]) == cfg.n_partitions
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    assert qe.query("anything", 5) == []
    assert qe.query("anything", 5, prune=True) == []

    one_src = str(tmp_path / "one.parquet")
    _pq.write_table(pa.table({"doc_id": pa.array([7], type=pa.int64()),
                              "text": pa.array(["hello world hello"])}),
                    one_src)
    idx1 = str(tmp_path / "one_idx")
    build_index(one_src, idx1, cfg)
    qe1 = QueryEngine(idx1, num_searchers=2, use_actors=False)
    (doc, score), = qe1.query("hello", 5)
    assert doc == 7 and score > 0


def test_resume_skips_finished_partitions(ray_session, sf_small, tmp_path):
    from search_engine_ray.pipelines.build import build_index
    cfg = IndexConfig(**CFG)
    idx = str(tmp_path / "resume")
    src = os.path.join(sf_small, "documents.parquet")
    build_index(src, idx, cfg)

    # wreck shard 0 (all its buckets): delete markers + files
    wrecked = [ckpt.part_id(0, b, cfg.n_buckets) for b in range(cfg.n_buckets)]
    shutil.rmtree(ckpt.shard_dir(idx, 0))
    survivors = {}
    for s in range(1, cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            p = os.path.join(ckpt.partition_dir(idx, s, b), "postings.parquet")
            survivors[p] = os.path.getmtime(p)
    assert ckpt.pending_partitions(idx, cfg) == wrecked

    man = build_index(src, idx, cfg)
    assert len(man["partitions"]) == cfg.n_partitions
    # finished partitions were NOT recomputed
    for p, mtime in survivors.items():
        assert os.path.getmtime(p) == mtime

    # and the resumed index equals a fresh build
    idx2 = str(tmp_path / "fresh")
    build_index(src, idx2, cfg)
    for s in range(cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            t1 = pq.read_table(os.path.join(ckpt.partition_dir(idx, s, b),
                                            "postings.parquet"))
            t2 = pq.read_table(os.path.join(ckpt.partition_dir(idx2, s, b),
                                            "postings.parquet"))
            assert t1.equals(t2)


@pytest.mark.parametrize("use_actors", [False, True])
def test_explain_contributions_sum_to_scores(built_index, use_actors,
                                             ray_session):
    """Per doc, explain()'s term contributions sum exactly to the served
    BM25 score; df/idf are global; empty queries explain to empty."""
    import numpy as np
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=use_actors)
    for q in QUERIES:
        want = dict(qe.query(q, k=10))
        ex = qe.explain(q, k=10).to_pandas()
        if not want:
            assert len(ex) == 0
            continue
        sums = ex.groupby("doc_id")["contribution"].sum()
        assert set(sums.index) == set(want)
        for d, s in want.items():
            assert sums[d] == pytest.approx(s, abs=1e-9), (q, d)
    assert len(qe.explain("", k=10)) == 0
    assert len(qe.explain("zzznoterm", k=10)) == 0


@pytest.mark.parametrize("k", [1, 3, 25, 500])
def test_blockmax_pruning_exact_at_all_k(built_index, oracle, k,
                                         ray_session):
    """Block-max pruning stays exact under tight and loose thresholds
    (k=1 maximizes pruning pressure; k=500 disables it)."""
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    for q in QUERIES + ["the scan sort merge window agg value key line big"]:
        got = qe.query(q, k=k, prune=True)
        want = oracle.bm25(q, k=k)
        assert [d for d, _ in got] == [d for d, _ in want], (q, k)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, k)


def test_groupby_exchange_empty_corpus_and_custom_id_col(ray_session,
                                                         tmp_path):
    # two groupby-exchange holes the fs path handled but groupby didn't:
    # (a) empty corpus — Ray write_parquet of a zero-row dataset creates no
    #     output dir, so the docstore publish used to FileNotFoundError;
    # (b) custom id_col — tokenize stages always EMIT 'doc_id', so
    #     selecting docstore columns by cfg.id_col crashed mid-build
    import pyarrow as pa
    import pyarrow.parquet as _pq
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import QueryEngine

    cfg = IndexConfig(n_buckets=4, n_doc_shards=2)
    empty_src = str(tmp_path / "empty.parquet")
    _pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64()),
                              "text": pa.array([], type=pa.string())}),
                    empty_src)
    idx = str(tmp_path / "empty_gb_idx")
    man = build_index(empty_src, idx, cfg, exchange="groupby")
    assert len(man["partitions"]) == cfg.n_partitions
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    assert qe.query("anything", 5) == []

    src = str(tmp_path / "custom_id.parquet")
    _pq.write_table(pa.table({"page_id": pa.array([3, 9], type=pa.int64()),
                              "body": pa.array(["alpha beta alpha",
                                                "beta gamma"])}), src)
    for exchange in ("groupby", "fs"):
        idx2 = str(tmp_path / f"custom_id_idx_{exchange}")
        build_index(src, idx2,
                    IndexConfig(n_buckets=4, n_doc_shards=2,
                                text_col="body", id_col="page_id"),
                    exchange=exchange)
        qe2 = QueryEngine(idx2, num_searchers=2, use_actors=False)
        (doc, score), = qe2.query("alpha", 5)
        assert doc == 3 and score > 0


def test_stage1_resume_tag_covers_analyzer_config():
    # resuming stage-1 fragments under a changed analyzer config must
    # invalidate the marker — every tokenization-affecting field has to
    # reach the tag
    from search_engine_ray.pipelines.build import _stage1_tag
    base = IndexConfig()
    variants = [
        IndexConfig(n_buckets=32),
        IndexConfig(n_doc_shards=8),
        IndexConfig(text_col="title"),
        IndexConfig(id_col="page_id"),
        IndexConfig(stopwords=True),
        IndexConfig(stem=True),
        IndexConfig(positions=True),
        IndexConfig(fields=("text", "title")),
        IndexConfig(salt_hot_terms=False),
        IndexConfig(hot_df_fraction=0.5),
        IndexConfig(salt=4),
    ]
    tags = [_stage1_tag(c) for c in [base, *variants]]
    assert len(set(tags)) == len(tags), tags
