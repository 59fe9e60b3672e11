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


def build_oracle(rows: list[tuple[int, str]], *, stopwords: bool = False,
                 stem: bool = False) -> OracleIndex:
    idx = OracleIndex(stopwords=ENGLISH_STOPWORDS if stopwords else None,
                      stem=stem)
    for doc_id, text in rows:
        idx.add(doc_id, text)
    return idx
