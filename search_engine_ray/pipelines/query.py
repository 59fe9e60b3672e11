"""BM25 top-k query serving over the segment index.

Reference analogue: ``SearchEngine::HandleQuery``
(``/root/reference/SearchEngine.h:103-381``) probes the in-heap index maps
and ranks by raw tf sums.  Here (north rule) the index lives in Parquet
segments partitioned by term-hash bucket; query serving is a **stateful actor
pool**: each ``SegmentSearcher`` pins its buckets' term dictionary + packed
postings in memory once (``__init__``), queries fan out only to the actors
whose buckets own the probed terms (fixing the reference inefficiency of
scanning every shard per probe, ``SearchEngine.h:137-141``), and per-actor
partial scores merge on the driver with a deterministic
(-score, doc_id) tie-break — the reference's unstable tie order
(``SearchEngine.h:342-381``) made deterministic, per SURVEY.md §2.6 O1.

Scoring: textbook BM25 (k1=1.2, b=0.75), ``idf = ln((N-df+0.5)/(df+0.5)+1)``,
float64, query terms processed in sorted order so score sums are
deterministic under any partitioning.  Query semantics are pure OR-union,
matching the reference (SURVEY.md §2.7 — no conjunctive evaluation).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

import ray

from ..functions.analyze import ENGLISH_STOPWORDS, tokenize
from ..functions.analyze import fnv1a64
from ..functions.varint import delta_decode, varint_decode
from ..state import checkpoint as ckpt


def bm25_idf(n_docs: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


class SegmentSearcher:
    """Holds the postings of a set of buckets in memory; answers term probes.

    Plain class — wrapped in ``ray.remote`` by :class:`QueryEngine` for the
    actor-pool deployment, instantiable directly for in-process tests.
    """

    def __init__(self, index_dir: str, buckets: list[int],
                 field: str = "text"):
        stats = ckpt.read_docstats(index_dir)
        man = ckpt.read_manifest(index_dir)
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"] or 1.0
        self.k1 = man["config"]["bm25_k1"]
        self.b = man["config"]["bm25_b"]
        self.terms: dict[str, int] = {}
        ids_col, tfs_col, dls_col, df_col = [], [], [], []
        for b in buckets:
            path = os.path.join(ckpt.bucket_dir(index_dir, b), "postings.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path)
            t = t.filter(np.asarray(
                [f == field for f in t["field"].to_pylist()], dtype=bool)) \
                if "field" in t.column_names else t
            base = len(ids_col)
            for i, term in enumerate(t["term"].to_pylist()):
                self.terms[term] = base + i
            ids_col.extend(t["doc_ids"].to_pylist())
            tfs_col.extend(t["tfs"].to_pylist())
            dls_col.extend(t["doc_lens"].to_pylist())
            df_col.extend(t["df"].to_pylist())
        self._ids = ids_col
        self._tfs = tfs_col
        self._dls = dls_col
        self._df = np.asarray(df_col, dtype=np.int64)

    def search(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """OR-union BM25 partials for this actor's terms →
        (doc_ids int64, partial_scores float64), doc_ids unique ascending."""
        parts_ids, parts_scores = [], []
        for term in sorted(set(terms)):
            slot = self.terms.get(term)
            if slot is None:
                continue
            doc_ids = delta_decode(self._ids[slot]).astype(np.int64)
            tf = varint_decode(self._tfs[slot]).astype(np.float64)
            dl = varint_decode(self._dls[slot]).astype(np.float64)
            idf = bm25_idf(self.n_docs, float(self._df[slot]))
            denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            parts_ids.append(doc_ids)
            parts_scores.append(idf * tf * (self.k1 + 1.0) / denom)
        if not parts_ids:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        return merge_partials(np.concatenate(parts_ids),
                              np.concatenate(parts_scores))

    def df_of(self, terms: list[str]) -> dict[str, int]:
        return {t: int(self._df[self.terms[t]]) for t in terms if t in self.terms}


def merge_partials(doc_ids: np.ndarray,
                   scores: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group-sum (doc_id → Σ score); deterministic given input order."""
    uniq, inv = np.unique(doc_ids, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(summed, inv, scores)
    return uniq, summed


def top_k(doc_ids: np.ndarray, scores: np.ndarray,
          k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (-score, doc_id) — deterministic tie-break (SURVEY §2.6 O1)."""
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


class QueryEngine:
    """Driver-side facade: query parsing, term→bucket routing, partial merge.

    ``use_actors=True`` deploys ``num_searchers`` Ray actors, each owning a
    contiguous slice of buckets (state loaded once, reused across queries);
    ``use_actors=False`` runs the same code in-process (tests, tiny corpora).
    """

    def __init__(self, index_dir: str, *, num_searchers: int = 4,
                 use_actors: bool = True):
        self.index_dir = index_dir
        man = ckpt.read_manifest(index_dir)
        self.cfg = man["config"]
        self.n_buckets = self.cfg["n_buckets"]
        self.stopwords = ENGLISH_STOPWORDS if self.cfg["stopwords"] else None
        self.stem = self.cfg["stem"]
        self.use_actors = use_actors
        num_searchers = min(num_searchers, self.n_buckets)
        slices = [list(range(self.n_buckets))[i::num_searchers]
                  for i in range(num_searchers)]
        self.owner = {}
        for s, bs in enumerate(slices):
            for b in bs:
                self.owner[b] = s
        if use_actors:
            remote = ray.remote(SegmentSearcher)
            self.searchers = [remote.remote(index_dir, bs) for bs in slices]
        else:
            self.searchers = [SegmentSearcher(index_dir, bs) for bs in slices]

    def _route(self, terms: list[str]) -> dict[int, list[str]]:
        by_searcher: dict[int, list[str]] = defaultdict(list)
        for t in sorted(set(terms)):
            b = fnv1a64(t.encode("utf-8")) % self.n_buckets
            by_searcher[self.owner[b]].append(t)
        return by_searcher

    def query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return []
        routed = sorted(self._route(terms).items())
        if self.use_actors:
            partials = ray.get([self.searchers[s].search.remote(ts)
                                for s, ts in routed])
        else:
            partials = [self.searchers[s].search(ts) for s, ts in routed]
        ids = np.concatenate([p[0] for p in partials]) if partials else np.zeros(0, np.int64)
        sc = np.concatenate([p[1] for p in partials]) if partials else np.zeros(0)
        if ids.size == 0:
            return []
        ids, sc = merge_partials(ids, sc)
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]
