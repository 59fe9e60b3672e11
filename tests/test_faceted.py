"""Faceted BM25 (metadata set-index filters) vs brute-force oracle."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.functions.analyze import tokenize
from search_engine_ray.pipelines.query import QueryEngine, bm25_idf, top_k

SF = "/root/testdata/sf0.001"
QUERY = "scan merge window fast"


@pytest.fixture(scope="module")
def fielded_index(ray_session, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.stages.tokenize import FieldedPostings
    from search_engine_ray.state.checkpoint import IndexConfig
    idx = str(tmp_path_factory.mktemp("facet") / "idx")
    cfg = IndexConfig(n_buckets=8, n_doc_shards=4)
    stage = FieldedPostings(
        text_fields={"text": "text"},
        metadata_fields={"language": "lang", "source": "source"},
        n_buckets=cfg.n_buckets, n_doc_shards=cfg.n_doc_shards)
    build_index(f"{SF}/documents.parquet", idx, cfg, postings_stage=stage,
                postings_columns=["doc_id", "text", "lang", "source"])
    return idx


def _brute(filters):
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang", "source"])
    docs = t.to_pylist()
    toks = {r["doc_id"]: tokenize(r["text"] or "") for r in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    qterms = sorted(set(tokenize(QUERY)))
    df = {q: sum(1 for v in toks.values() if q in v) for q in qterms}
    keep = {r["doc_id"] for r in docs
            if all(r[{"language": "lang"}.get(f, f)] == v
                   for f, v in filters)}
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for q in qterms:
            tf = v.count(q)
            if tf and df[q]:
                s += bm25_idf(n, df[q]) * tf * 2.2 / \
                    (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
        if s > 0 and d in keep:
            scores[d] = s
    ids = np.array(sorted(scores), dtype=np.int64)
    sc = np.array([scores[d] for d in ids])
    return top_k(ids, sc, 10)


@pytest.mark.parametrize("filters", [
    [("language", "de")],
    [("language", "en"), ("source", "src1")],
    [("source", "src3")],
    [("language", "xx")],          # no such facet value → empty
])
def test_faceted_vs_bruteforce(fielded_index, filters):
    qe = QueryEngine(fielded_index, num_searchers=3, use_actors=False)
    got = qe.query_filtered(QUERY, filters, k=10)
    wids, wsc = _brute(filters)
    assert [d for d, _ in got] == list(wids)
    np.testing.assert_allclose([s for _, s in got], wsc, rtol=1e-12)


def _brute_collapsed(group_col, k=10):
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", group_col])
    docs = t.to_pylist()
    toks = {r["doc_id"]: tokenize(r["text"] or "") for r in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    qterms = sorted(set(tokenize(QUERY)))
    df = {q: sum(1 for v in toks.values() if q in v) for q in qterms}
    best = {}
    for r in docs:
        d, g = r["doc_id"], r[group_col]
        s = 0.0
        for q in qterms:
            tf = toks[d].count(q)
            if tf and df[q]:
                s += bm25_idf(n, df[q]) * tf * 2.2 / \
                    (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks[d]) / avgdl))
        if s > 0 and (g not in best or (-s, d) < (-best[g][1], best[g][0])):
            best[g] = (d, s)
    return sorted(((g, d, s) for g, (d, s) in best.items()),
                  key=lambda x: (-x[2], x[1]))[:k]


@pytest.mark.parametrize("use_actors", [False, True])
def test_collapsed_topk_vs_bruteforce(fielded_index, use_actors, ray_session):
    qe = QueryEngine(fielded_index, num_searchers=3, use_actors=use_actors)
    got = qe.collapsed_query(QUERY, "source", k=10)
    want = _brute_collapsed("source")
    assert [(g, d) for g, d, _ in got] == [(g, d) for g, d, _ in want]
    np.testing.assert_allclose([s for _, _, s in got],
                               [s for _, _, s in want], rtol=1e-12)
    # every source appears at most once
    assert len({g for g, _, _ in got}) == len(got)
    # unknown group field and no-hit query degrade to empty
    assert qe.collapsed_query(QUERY, "nosuchfield", k=10) == []
    assert qe.collapsed_query("nosuchterm", "source", k=10) == []


def test_unfiltered_bm25_identical_on_fielded_index(fielded_index):
    """The fielded index must serve plain BM25 exactly like a text-only
    index (same stats, metadata postings ignored)."""
    qe = QueryEngine(fielded_index, num_searchers=2, use_actors=False)
    got = qe.query(QUERY, k=10)
    wids, wsc = _brute([])
    assert [d for d, _ in got] == list(wids)
    np.testing.assert_allclose([s for _, s in got], wsc, rtol=1e-12)


def test_empty_filter_list_is_unfiltered_query(fielded_index):
    # vacuous AND: all facets deselected must degrade to plain search,
    # not return zero hits from an empty intersection
    qe = QueryEngine(fielded_index, num_searchers=3, use_actors=False)
    got = qe.query_filtered(QUERY, [], k=10)
    assert got == qe.query(QUERY, k=10)
    assert len(got) > 0


def test_suggest_merges_df_across_searchers(fielded_index):
    # candidate ranking must use the engine-level df max-merge: each
    # searcher's df table only covers terms its own shards contain, so a
    # single searcher cannot rank the unioned candidate set
    qe = QueryEngine(fielded_index, num_searchers=3, use_actors=False)
    got = dict(qe.suggest("s", k=50))
    # brute-force: every indexed term starting with 's' and its global df
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter
    dfc = Counter()
    for txt in t["text"].to_pylist():
        dfc.update(set(tokenize(txt or "")))
    want = {w: c for w, c in dfc.items() if w.startswith("s")}
    top = dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
    assert got == top
