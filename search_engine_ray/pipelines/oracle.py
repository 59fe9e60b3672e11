"""Single-process conformance oracle (tests only — no Ray).

A direct, obviously-correct reimplementation of the engine's semantics used
to verify the distributed pipelines: tokenization identical to the reference
tokenizer (``/root/reference/KaggleFinanceSourceEngine.cpp:212,252-267``),
postings as plain dicts (the reference's
``unordered_map<term, unordered_map<docid, tf>>``, ``SourceEngine.h:23``),
and textbook BM25 with the deterministic (-score, doc_id) tie-break.
SURVEY.md §5 item 1: the oracle is the bridge between reference semantics
and the north-rule BM25 engine.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field

from ..functions.analyze import ENGLISH_STOPWORDS, tokenize


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]] = field(default_factory=lambda: defaultdict(dict))
    doc_len: dict[int, int] = field(default_factory=dict)
    stopwords: frozenset[str] | None = None
    stem: bool = False

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return (sum(self.doc_len.values()) / self.n_docs) if self.doc_len else 1.0

    def add(self, doc_id: int, text: str) -> None:
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        self.doc_len[doc_id] = len(terms)
        for term, tf in Counter(terms).items():
            self.postings[term][doc_id] = tf

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def bm25(self, query: str, k: int = 10, *, k1: float = 1.2,
             b: float = 0.75) -> list[tuple[int, float]]:
        terms = tokenize(query, stopwords=self.stopwords, stem=self.stem)
        return self._score_terms(terms, k, k1=k1, b=b)

    def _score_terms(self, terms, k: int, *, k1: float = 1.2,
                     b: float = 0.75) -> list[tuple[int, float]]:
        scores: dict[int, float] = defaultdict(float)
        n, avgdl = self.n_docs, self.avgdl
        for term in sorted(set(terms)):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = math.log((n - len(plist) + 0.5) / (len(plist) + 0.5) + 1.0)
            for doc_id in sorted(plist):
                tf = plist[doc_id]
                dl = self.doc_len[doc_id]
                scores[doc_id] += (idf * tf * (k1 + 1.0)
                                   / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def bm25_boolean(self, query: str, k: int = 10, *, k1: float = 1.2,
                     b: float = 0.75) -> list[tuple[int, float]]:
        """Boolean twin of ``QueryEngine.boolean_query``: whitespace tokens
        prefixed ``-`` are negated; a doc qualifies iff it has EVERY must
        term and NO negated term; score = summed BM25 of the must terms."""
        must: list[str] = []
        must_not: list[str] = []
        for raw_tok in query.split():
            neg = raw_tok.startswith("-")
            toks = tokenize(raw_tok[1:] if neg else raw_tok,
                            stopwords=self.stopwords, stem=self.stem)
            (must_not if neg else must).extend(toks)
        if not must:
            return []
        ranked = self._score_terms(must, k=len(self.doc_len) or 1, k1=k1, b=b)
        must_sets = [set(self.postings.get(t, {})) for t in set(must)]
        neg_docs = set().union(*(set(self.postings.get(t, {}))
                                 for t in must_not)) if must_not else set()
        keep = set.intersection(*must_sets) - neg_docs if must_sets else set()
        return [(d, s) for d, s in ranked if d in keep][:k]

    def bm25_prefix(self, query: str, k: int = 10, *, k1: float = 1.2,
                    b: float = 0.75) -> list[tuple[int, float]]:
        """Wildcard BM25 twin of ``QueryEngine.prefix_query``: trailing-*
        tokens expand to every vocabulary term with that prefix; each
        expanded term scores with its own df/idf."""
        terms: set[str] = set()
        for raw_tok in query.split():
            if raw_tok.endswith("*") and len(raw_tok) > 1:
                frag = tokenize(raw_tok[:-1])
                if frag:
                    terms.update(t for t in self.postings
                                 if t.startswith(frag[0]))
            else:
                terms.update(tokenize(raw_tok, stopwords=self.stopwords,
                                      stem=self.stem))
        return self._score_terms(sorted(terms), k, k1=k1, b=b) \
            if terms else []


def build_oracle(rows: list[tuple[int, str]], *, stopwords: bool = False,
                 stem: bool = False) -> OracleIndex:
    idx = OracleIndex(stopwords=ENGLISH_STOPWORDS if stopwords else None,
                      stem=stem)
    for doc_id, text in rows:
        idx.add(doc_id, text)
    return idx


class ReferenceOracle:
    """Single-process reimplementation of the reference's full multi-field
    index + ``HandleQuery`` ranking (``/root/reference/SearchEngine.h:
    103-381``, ``KaggleFinanceSourceEngine.cpp:213-254``): tokenized
    text/title tf indexes, 7 metadata set-indexes with the CleanMetaData
    empty-string quirk, OR-union accumulators and the 9-level comparator
    with deterministic ascending-docID tie-break."""

    TEXT = ("text", "title")
    METADATA = ("site", "author", "country", "language",
                "person", "location", "organization")

    def __init__(self):
        self.index: dict[str, dict[str, dict[int, int]]] = \
            {f: defaultdict(dict) for f in self.TEXT + self.METADATA}

    def add(self, doc_id: int, *, text: str = "", title: str = "",
            site: str = "", author: str = "", country: str = "",
            language: str = "", persons: list[str] = (),
            locations: list[str] = (), organizations: list[str] = ()) -> None:
        from ..functions.analyze import clean_metadata
        for field, value in (("text", text), ("title", title)):
            for term, tf in Counter(tokenize(value)).items():
                self.index[field][term][doc_id] = tf
        meta_values = {"site": [site], "author": [author],
                       "country": [country], "language": [language],
                       "person": list(persons), "location": list(locations),
                       "organization": list(organizations)}
        for field, values in meta_values.items():
            for v in values:
                self.index[field][clean_metadata(v)][doc_id] = 1

    def appraise(self, probes: list[tuple[str, str]]
                 ) -> dict[int, tuple]:
        """Per-doc 9-level comparator key (ascending sort = reference rank
        order, ``SearchEngine.h:347-380``).  Exposed so conformance tests
        can group tie-classes: the reference's ``std::sort`` leaves equal
        keys in unspecified relative order."""
        acc: dict[int, dict] = {}
        cols = ("text_wc", "title_wc", "person_count", "org_count",
                "author_count", "site_flag", "language_flag",
                "location_flag", "country_flag")
        for field, term in sorted(set(probes)):
            plist = self.index.get(field, {}).get(term)
            if not plist:
                continue
            for doc_id, tf in plist.items():
                a = acc.setdefault(doc_id, {c: 0 for c in cols})
                if field == "text":
                    a["text_wc"] += tf
                elif field == "title":
                    a["title_wc"] += tf
                elif field == "person":
                    a["person_count"] += 1
                elif field == "organization":
                    a["org_count"] += 1
                elif field == "author":
                    a["author_count"] += 1
                else:
                    a[f"{'language' if field == 'language' else field}_flag"] = 1
        return {d: (-a["language_flag"], -a["site_flag"], -a["country_flag"],
                    -a["location_flag"], -a["title_wc"], -a["org_count"],
                    -a["person_count"], -a["author_count"], -a["text_wc"])
                for d, a in acc.items()}

    def handle_query(self, probes: list[tuple[str, str]],
                     k: int = 10) -> list[int]:
        keys = self.appraise(probes)
        ranked = sorted(keys.items(), key=lambda kv: (kv[1], kv[0]))
        return [d for d, _ in ranked[:k]]
