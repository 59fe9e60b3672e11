"""Golden conformance on the reference's own 6-document sample corpus
(FIXTURES.md §2): read the Kaggle JSON files, build the multi-field index,
and reproduce the README's worked queries
(``/root/reference/README.md:30-49``) against the reference oracle."""

import os

import pytest

from search_engine_ray.functions.analyze import clean_metadata, normalize_token
from search_engine_ray.functions.queryparse import TEXT_CATEGORIES, parse_query
from search_engine_ray.pipelines.oracle import ReferenceOracle
from search_engine_ray.state.checkpoint import IndexConfig

SAMPLES = "/root/reference/sample_kaggle_finance_data"

README_QUERIES = [
    "values: german income",
    'people: "eaton vance"',
    "values: german income | title: funds euro",
]


@pytest.fixture(scope="module")
def golden(ray_session, tmp_path_factory):
    from search_engine_ray.sources.kaggle_json import read_kaggle_articles
    from search_engine_ray.pipelines.build import build_reference_index
    root = tmp_path_factory.mktemp("golden")
    articles = read_kaggle_articles(SAMPLES)
    rows = articles.take_all()
    assert len(rows) == 6
    src = str(root / "articles.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq
    from search_engine_ray.sources.kaggle_json import ARTICLES_SCHEMA
    pq.write_table(pa.Table.from_pylist(rows, schema=ARTICLES_SCHEMA), src)

    idx = str(root / "idx")
    build_reference_index(src, idx, IndexConfig(n_buckets=4, n_doc_shards=2))

    orc = ReferenceOracle()
    for r in rows:
        orc.add(r["doc_id"], text=r["text"], title=r["title"], site=r["site"],
                author=r["author"], country=r["country"], language=r["lang"],
                persons=r["persons"], locations=r["locations"],
                organizations=r["organizations"])
    return idx, orc, rows


def test_parse_extracts_reference_fields(golden):
    _idx, _orc, rows = golden
    by_uuid = {r["uuid"]: r for r in rows}
    assert len(by_uuid) == 6
    r = next(iter(rows))
    assert r["text"] and r["title"] and r["site"]
    assert r["lang"] == "english"
    # entity lists present somewhere in the corpus
    assert any(r["persons"] or r["organizations"] or r["locations"]
               for r in rows)


def test_readme_queries_match_reference_oracle(golden, ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    idx, orc, _rows = golden
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    for q in README_QUERIES:
        got = qe.reference_query(q, k=10)
        probes = []
        for p in parse_query(q):
            term = (normalize_token(p.term) if p.category in TEXT_CATEGORIES
                    else clean_metadata(p.term))
            if term is not None:
                probes.append((p.field, term))
        want = orc.handle_query(probes, k=10)
        assert got == want, q
        assert got, f"README query {q!r} must match sample docs"


def test_cli_source_routing(ray_session):
    from search_engine_ray.cli import _source_for
    src = _source_for(SAMPLES)
    assert callable(src) and src.cache_tag == SAMPLES
    assert src().count() == 6
    assert _source_for("/root/testdata/sf0.001/documents.parquet") == \
        "/root/testdata/sf0.001/documents.parquet"
    assert _source_for("/root/testdata/sf0.001") == "/root/testdata/sf0.001"


def test_bm25_over_golden_corpus(golden, ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.pipelines.oracle import build_oracle
    idx, _orc, rows = golden
    bm25 = build_oracle([(r["doc_id"], r["text"]) for r in rows])
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    for q in ["german income", "eaton vance funds", "market"]:
        got = qe.query(q, k=6)
        want = bm25.bm25(q, k=6)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
