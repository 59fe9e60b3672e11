"""Reference-compat layer: M7 query parser, fielded index, O1 ranking."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.functions.queryparse import (Probe, QueryParseError,
                                                    parse_query)
from search_engine_ray.pipelines.oracle import ReferenceOracle
from search_engine_ray.sources.pages import pages_batch
from search_engine_ray.stages.tokenize import FieldedPostings, clean_metadata_array
from search_engine_ray.state.checkpoint import IndexConfig


class TestParser:
    def test_basic_groups(self):
        ps = parse_query("values: german income | title: funds euro")
        assert [(p.field, p.term) for p in ps] == [
            ("text", "german"), ("text", "income"),
            ("title", "funds"), ("title", "euro")]

    def test_quoted_phrase_metadata(self):
        ps = parse_query('people: "eaton vance"')
        assert ps == [Probe(category="people", field="person",
                            term="eaton vance", is_phrase=True)]

    def test_comma_separation(self):
        ps = parse_query("sites: reuters.com,bbc.co.uk")
        assert [p.term for p in ps] == ["reuters.com", "bbc.co.uk"]

    def test_phrase_under_values_is_split_in_fixed_mode(self):
        ps = parse_query('values: "german income"')
        assert [p.term for p in ps] == ["german", "income"]

    def test_phrase_under_values_kept_dead_in_strict_mode(self):
        ps = parse_query('values: "german income"', strict_compat=True)
        # label-as-term quirk + the dead phrase probe
        assert [p.term for p in ps] == ["values:", "german income"]

    def test_short_terms_skipped(self):
        assert [p.term for p in parse_query("values: a an the")] == ["the"]
        # strict: length check happens BEFORE quote stripping, so "a" (3
        # chars with quotes) survives as a term
        ps = parse_query('values: a "a"', strict_compat=True)
        assert [p.term for p in ps] == ["values:", "a"]

    def test_mismatched_quotes(self):
        with pytest.raises(QueryParseError):
            parse_query('people: "eaton vance')
        # strict mode: ONLY the offending term is skipped (reference prints
        # "term was skipped" and continues, SearchEngine.h:121-127); the
        # label-as-term quirk keeps "people:" and "vance" is still probed
        ps = parse_query('people: "eaton vance', strict_compat=True)
        assert [p.term for p in ps] == ["people:", "vance"]

    def test_unknown_category(self):
        with pytest.raises(QueryParseError):
            parse_query("bogus: term")
        assert parse_query("bogus: term", strict_compat=True) == []


class TestFieldedPostings:
    def _batch(self):
        return pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["alpha beta alpha", "beta gamma"]),
            "title": pa.array(["alpha news", "gamma story"]),
            "site": pa.array(["reuters.com", "Zürich-news"]),
            "persons": pa.array([["John Smith", "john smith", "Ana"], []]),
        })

    def test_text_and_title_fields(self):
        st = FieldedPostings(text_fields={"text": "text", "title": "title"},
                             n_buckets=4, n_doc_shards=2)
        out = st(self._batch()).to_pylist()
        got = {(r["field"], r["term"], r["doc_id"]): (r["tf"], r["doc_len"])
               for r in out}
        assert got[("text", "alpha", 1)] == (2, 3)
        assert got[("title", "alpha", 1)] == (1, 2)
        assert got[("text", "gamma", 2)] == (1, 2)

    def test_metadata_set_semantics_and_empty_string_quirk(self):
        st = FieldedPostings(text_fields={},
                             metadata_fields={"site": "site",
                                              "person": "persons"},
                             n_buckets=4, n_doc_shards=2)
        out = st(self._batch()).to_pylist()
        got = {(r["field"], r["term"], r["doc_id"]): r["tf"] for r in out}
        # non-ASCII site value aggregates under the EMPTY STRING key
        assert ("site", "", 2) in got
        assert got[("site", "reuters.com", 1)] == 1
        # "John Smith"/"john smith" collapse to one set entry, tf stays 1
        assert got[("person", "john smith", 1)] == 1
        assert ("person", "ana", 1) in got
        assert all(tf == 1 for (f, _t, _d), tf in got.items() if f != "text")

    def test_clean_metadata_array(self):
        out = clean_metadata_array(
            pa.array(["O'Brien", "Zürich", "New York", None]))
        assert out.to_pylist() == ["obrien", "", "new york", ""]


@pytest.fixture(scope="module")
def articles_index(ray_session, tmp_path_factory):
    """300-doc synthetic articles corpus → fielded index + oracle."""
    from search_engine_ray.pipelines.build import build_reference_index
    root = tmp_path_factory.mktemp("refidx")
    src = str(root / "articles.parquet")
    t = pages_batch(np.arange(300))
    t = t.append_column("doc_id", pa.array(range(300), type=pa.int64()))
    pq.write_table(t, src)
    idx = str(root / "index")
    build_reference_index(src, idx, IndexConfig(n_buckets=8, n_doc_shards=3))

    orc = ReferenceOracle()
    for r in t.to_pylist():
        orc.add(r["doc_id"], text=r["text"], title=r["title"],
                site=r["site"], author=r["author"], country=r["country"],
                language=r["lang"], persons=r["persons"],
                locations=r["locations"], organizations=r["organizations"])
    return idx, orc, t


REF_QUERIES = [
    "values: german income",
    "values: market the bank | title: funds euro",
    "sites: site000.example | values: growth",
    "langs: english | values: income market",
    "countries: us | authors: author 001",
    'people: "person 001" | values: rate',
    "orgs: org 001 inc",
    "locations: zürich | values: bank",   # non-ASCII probe → "" key
    "values: nosuchwordatall",
]


@pytest.mark.parametrize("use_actors", [False, True])
def test_reference_ranking_matches_oracle(articles_index, use_actors,
                                          ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.functions.queryparse import parse_query, TEXT_CATEGORIES
    from search_engine_ray.functions.analyze import clean_metadata, normalize_token
    idx, orc, _t = articles_index
    qe = QueryEngine(idx, num_searchers=2, use_actors=use_actors)
    for q in REF_QUERIES:
        got = qe.reference_query(q, k=10)
        probes = []
        for p in parse_query(q):
            term = (normalize_token(p.term) if p.category in TEXT_CATEGORIES
                    else clean_metadata(p.term))
            if term is not None:
                probes.append((p.field, term))
        want = orc.handle_query(probes, k=10)
        assert got == want, q


def test_bm25_still_works_on_fielded_index(articles_index, ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.pipelines.oracle import build_oracle
    idx, _orc, t = articles_index
    bm25_orc = build_oracle([(r["doc_id"], r["text"]) for r in t.to_pylist()])
    qe = QueryEngine(idx, num_searchers=3, use_actors=False)
    for q in ["market bank rate", "german income", "w00003"]:
        got = qe.query(q, k=10)
        want = bm25_orc.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
