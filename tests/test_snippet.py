"""Query-biased snippet extraction (`functions/snippet.py`): pure-function
properties, a golden pin, and the QueryEngine integration over real
testdata."""

import re

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.analyze import tokenize
from search_engine_ray.functions.snippet import (best_window, make_snippet,
                                                 tokenize_with_offsets)

SF = "/root/testdata/sf0.001"


def test_offsets_agree_with_analyzer():
    text = "The Fast, SCAN-window!  merge: sort(agg) 'key' value\nline"
    toks = tokenize_with_offsets(text)
    # same kept-term stream as the index analyzer
    assert [t for _, _, t in toks if t is not None] == tokenize(text)
    # offsets really address the raw text
    for c0, c1, _ in toks:
        assert 0 <= c0 < c1 <= len(text)
        assert re.match(r"\S", text[c0])


def test_best_window_picks_most_distinct():
    #            0    1    2    3    4    5    6    7
    terms = ["a", "x", "b", "x", "x", "a", "b", "c"]
    lo, hi = best_window(terms, frozenset({"a", "b", "c"}), window=3)
    assert (lo, hi) == (5, 7)          # a b c — 3 distinct beats any 2
    assert best_window(terms, frozenset({"zzz"}), window=3) is None


def test_best_window_tie_breaks_earliest():
    terms = ["q", "pad", "q", "pad", "q"]
    lo, hi = best_window(terms, frozenset({"q"}), window=3)
    assert (lo, hi) == (0, 2)          # equal distinct+total → earliest


def test_make_snippet_golden():
    text = ("alpha beta gamma delta scan merge window fast epsilon zeta "
            "eta theta iota kappa")
    snip = make_snippet(text, ["scan", "merge", "window", "fast"], window=6)
    assert snip == "…delta **scan** **merge** **window** **fast** epsilon…"
    assert make_snippet(text, ["nothere"]) is None
    assert make_snippet("", ["scan"]) is None


def test_window_clamps_to_one():
    snip = make_snippet("alpha scan beta", ["scan"], window=0)
    assert snip == "…**scan**…"


def test_make_snippet_marks_only_query_terms():
    text = "scan the line then scan the key again and scan once more"
    snip = make_snippet(text, ["scan"], window=5)
    for m in re.finditer(r"\*\*(\w+)\*\*", snip):
        assert m.group(1) == "scan"
    assert "**scan**" in snip


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.sampled_from("ab x,.\n"), max_size=120),
       st.integers(min_value=1, max_value=8))
def test_snippet_properties(text, window):
    snip = make_snippet(text, ["ab", "x"], window=window)
    kept = set(tokenize(text))
    if not ({"ab", "x"} & kept):
        assert snip is None
        return
    assert snip is not None
    # marks balance and at least one hit is highlighted
    assert snip.count("**") % 2 == 0 and "**" in snip
    # the de-marked snippet (ellipses stripped) is a substring of the text
    assert snip.replace("**", "").strip("…") in text


def test_engine_snippets_match_ranking(ray_session, tmp_path):
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import QueryEngine, fetch_texts
    from search_engine_ray.state.checkpoint import IndexConfig

    src = f"{SF}/documents.parquet"
    idx = str(tmp_path / "snip_idx")
    build_index(src, idx, IndexConfig(n_buckets=8))
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    q = "scan merge window"
    hits = qe.query(q, k=5)
    texts = fetch_texts(src, [d for d, _ in hits])
    res = qe.query_with_snippets(q, texts, k=5)
    assert [(d, s) for d, s, _ in res] == hits
    for _, _, snip in res:
        assert snip is not None and "**" in snip
        # every highlighted token analyzes to a query term
        qterms = set(tokenize(q))
        for m in re.finditer(r"\*\*([^*]+)\*\*", snip):
            assert tokenize(m.group(1))[0] in qterms


def test_kept_token_window_spans_rejected_tokens():
    # window width is measured in KEPT tokens: analyzer-rejected tokens
    # (non-ASCII) occupy no width, matching the snippet_windows SQL oracle
    text = "aaa é é é scan é é merge bbb"
    assert make_snippet(text, ["scan", "merge"], window=2) \
        == "…**scan** é é **merge**…"


def test_doc_snippets_matches_raw_render(ray_session):
    """The SQL-verified kept-token rendering (`doc_snippets`) and the
    serving tier's raw-text rendering (`make_snippet`) select and center
    the SAME window: de-marking + re-analyzing the raw excerpt yields
    exactly the de-marked kept-token excerpt."""
    from search_engine_ray.pipelines.queries import (FLAGSHIP_QUERY,
                                                     SNIPPET_WINDOW,
                                                     q_doc_snippets)
    from search_engine_ray.pipelines.query import fetch_texts

    tbl = q_doc_snippets(SF)
    assert tbl.num_rows > 0
    texts = fetch_texts(f"{SF}/documents.parquet",
                        tbl["doc_id"].to_pylist())
    qterms = tokenize(FLAGSHIP_QUERY)
    for doc_id, rendered in zip(tbl["doc_id"].to_pylist(),
                                tbl["snippet"].to_pylist()):
        raw = make_snippet(texts[doc_id], qterms, window=SNIPPET_WINDOW)
        assert raw is not None
        kept_from_raw = tokenize(raw.replace("**", "").strip("…"))
        assert kept_from_raw == [t.replace("**", "")
                                 for t in rendered.split(" ")]
        # every mark the raw render makes, the kept render makes too
        assert raw.count("**") == rendered.count("**")
