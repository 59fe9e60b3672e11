"""Property tests for the reference query grammar parser."""

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.queryparse import (CATEGORY_FIELD, Probe,
                                                    QueryParseError,
                                                    parse_query)

_categories = st.sampled_from(sorted(CATEGORY_FIELD))
_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-",
                min_size=3, max_size=12)


@given(st.lists(st.tuples(_categories, st.lists(_word, min_size=1,
                                                max_size=4)),
                min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_roundtrip_structured_queries(groups):
    raw = " | ".join(f"{cat}: {' '.join(words)}" for cat, words in groups)
    probes = parse_query(raw)
    want = [Probe(category=cat, field=CATEGORY_FIELD[cat], term=w)
            for cat, words in groups for w in words]
    assert probes == want


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_strict_mode_never_raises(raw):
    # the reference parser silently skips malformed groups; strict_compat
    # must accept arbitrary input without raising
    probes = parse_query(raw, strict_compat=True)
    for p in probes:
        assert p.field in set(CATEGORY_FIELD.values())


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_fixed_mode_raises_only_parse_errors(raw):
    try:
        probes = parse_query(raw)
    except QueryParseError:
        return
    for p in probes:
        assert p.term
        assert p.category in CATEGORY_FIELD
