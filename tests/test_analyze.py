"""Pure-function semantics tests: tokenizer, normalizers, stemmer, codecs."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.analyze import (
    clean_metadata,
    clean_value_reference_hash,
    fnv1a64,
    normalize_token,
    porter_stem,
    tokenize,
)
from search_engine_ray.functions.varint import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


class TestTokenize:
    def test_reference_delimiters(self):
        # '-', "'", '<', '>', '&' are NOT delimiters (reference .cpp:212)
        assert tokenize("a-b c's d<e>f g&h") == ["a-b", "cs", "d<e>f", "g&h"]

    def test_delimiter_set(self):
        assert tokenize("w1,w2.w3?w4!w5;w6:w7\"w8/w9(w10)w11") == [
            "w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8", "w9", "w10", "w11"]
        assert tokenize("a \t\v\n\r b") == ["a", "b"]

    def test_non_ascii_token_rejected_entirely(self):
        # any non-ASCII byte kills the whole token (reference .cpp:142-144)
        assert tokenize("naïve café plain") == ["plain"]

    def test_apostrophe_strip_and_lower(self):
        assert tokenize("It's O'Brien's") == ["its", "obriens"]

    def test_apostrophe_only_token_dropped(self):
        assert tokenize("'' a") == ["a"]

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize("   ,,, ") == []

    def test_stopwords(self):
        sw = frozenset({"the", "a"})
        assert tokenize("the quick a fox", stopwords=sw) == ["quick", "fox"]

    def test_stemming(self):
        assert tokenize("running runs easily", stem=True) == ["run", "run", "easili"]


class TestNormalizers:
    def test_normalize_token(self):
        assert normalize_token("Hello") == "hello"
        assert normalize_token("Ol'é") is None          # non-ASCII rejected
        assert normalize_token("''") is None            # empty after strip
        assert normalize_token("") is None

    def test_clean_metadata_empty_string_quirk(self):
        # non-ASCII metadata maps to "" and is still inserted (.cpp:162-164)
        assert clean_metadata("Zürich") == ""
        assert clean_metadata("New York") == "new york"
        assert clean_metadata("O'Brien") == "obrien"

    def test_reference_hash_trailing_nul_quirk(self):
        # stripped apostrophes pad the hashed buffer with NULs (.cpp:140-152)
        assert clean_value_reference_hash("abc") == fnv1a64(b"abc")
        assert clean_value_reference_hash("ab'c") == fnv1a64(b"abc\x00")
        assert clean_value_reference_hash("''a") == fnv1a64(b"a\x00\x00")
        assert clean_value_reference_hash("ü") is None


class TestPorterStemmer:
    # canonical examples from Porter (1980)
    CASES = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
        "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        # electriciti/electrical: the paper's step-3 examples stop at
        # "electric", but the full algorithm's step 4 strips "ic" (m>1),
        # matching canonical Porter implementations.
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    }

    def test_canonical_cases(self):
        for word, want in self.CASES.items():
            assert porter_stem(word) == want, word

    def test_short_words_untouched(self):
        assert porter_stem("is") == "is"
        assert porter_stem("be") == "be"


class TestVarint:
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(arr)), arr)

    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_delta_roundtrip(self, vals):
        arr = np.sort(np.array(vals, dtype=np.uint64))
        assert np.array_equal(delta_decode(delta_encode(arr)), arr)

    def test_edge_values(self):
        arr = np.array([0, 1, 127, 128, 16383, 16384, 2**56, 2**64 - 1],
                       dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(arr)), arr)

    def test_compression_wins_on_small_deltas(self):
        ids = np.arange(10_000, dtype=np.uint64) * 3 + 5
        assert len(delta_encode(ids)) < ids.nbytes / 4

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    max_size=100))
    @settings(max_examples=200, deadline=None)
    def test_bytes_match_per_value_leb128(self, vals):
        # pins the all-under-128 fast path byte-equal to the generic path:
        # encoded bytes and per-value sizes must equal a scalar LEB128
        def leb(v):
            out = bytearray()
            while True:
                b, v = v & 0x7F, v >> 7
                out.append(b | (0x80 if v else 0))
                if not v:
                    return bytes(out)
        from search_engine_ray.functions.varint import (
            varint_encode_with_sizes)
        arr = np.array(vals, dtype=np.uint64)
        packed, sizes = varint_encode_with_sizes(arr)
        want = b"".join(leb(int(v)) for v in vals)
        assert packed == want
        assert sizes.tolist() == [len(leb(int(v))) for v in vals]

    def test_concatenated_streams_decode_in_one_pass(self):
        # the searcher decodes a whole segment's posting lists as ONE
        # concatenated stream (values are self-delimiting) — the mostly-
        # 1-byte fast path and the per-length generic path must both hold
        rng = np.random.default_rng(5)
        streams = [rng.integers(0, 100, 50).astype(np.uint64),       # 1-byte
                   rng.integers(0, 2**62, 50).astype(np.uint64),     # wide
                   np.array([2**63, 1, 127, 128], dtype=np.uint64)]
        blob = b"".join(varint_encode(s) for s in streams)
        got = varint_decode(blob)
        assert np.array_equal(got, np.concatenate(streams))


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenize_terms_are_normalized(text):
    for t in tokenize(text):
        assert t == t.lower()
        assert "'" not in t
        assert all(ord(c) < 128 for c in t)
        assert t != ""
