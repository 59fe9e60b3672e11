"""Benchmark-contamination detection: word n-gram overlap between a corpus
and a (small) benchmark/eval set.

The decontamination step every LLM training pipeline runs before training
(n-gram collision of training docs against eval benchmarks — the published
recipes use 8- to 13-gram word overlap).  Scale shape:

- the BENCHMARK side is small by definition (eval sets are MBs, not TBs):
  its distinct n-grams are collected once and broadcast via ``ray.put`` —
  the classic small-side-broadcast idiom, never a shuffle;
- the CORPUS side streams: one ``map_batches`` pass computes each doc's
  n-grams fully vectorized (shifted takes of the flattened token stream +
  ``binary_join_element_wise``) and probes the broadcast set with
  ``pc.is_in`` — no corpus row is ever shuffled or collected.

At 100 TB the corpus pass is embarrassingly parallel; the only growth
concern is the benchmark gram set itself (|bench tokens| grams ≈ a few
million strings for a large eval suite — comfortably a broadcast object).
For benchmark suites beyond object-store size, swap the string set for
64-bit gram hashes (same pipeline shape, ~8 B/gram); the string form is
kept here because it makes the DuckDB oracle exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .tokenize import split_and_normalize


def ngram_strings(row_idx: np.ndarray, terms: pa.Array, n: int
                  ) -> tuple[np.ndarray, pa.Array]:
    """Space-joined word n-grams of an ordered token stream.

    ``(row_idx, terms)`` is ``split_and_normalize`` output (tokens in
    document order, ``row_idx[i]`` = producing batch row).  Returns
    ``(gram_row_idx, grams)`` — one row per n-gram window that stays inside
    a single document.  Fully vectorized: n shifted ``take``s +
    one ``binary_join_element_wise``.
    """
    m = len(terms)
    if m < n:
        return (np.empty(0, dtype=np.int64),
                pa.array([], type=pa.string()))
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    # a window starting at j is valid iff rows j and j+n-1 belong to the
    # same document (row_idx is non-decreasing)
    starts = np.nonzero(row_idx[: m - n + 1] == row_idx[n - 1:])[0]
    if starts.size == 0:
        return (np.empty(0, dtype=np.int64),
                pa.array([], type=pa.string()))
    parts = [terms.take(pa.array(starts + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return row_idx[starts], grams


class BenchmarkGrams:
    """``map_batches`` callable: benchmark-set rows → their DISTINCT n-grams
    (one ``g`` column; per-batch distinct — global distinct happens in the
    tiny driver-side union, bounded by benchmark size)."""

    def __init__(self, *, n: int, text_col: str = "text"):
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, terms = split_and_normalize(batch[self.text_col])
        _, grams = ngram_strings(row_idx, terms, self.n)
        return pa.table({"g": pc.unique(grams)})


class ContaminationScore:
    """``map_batches`` callable over corpus docs → per-doc contamination
    counts ``(doc_id, n_grams, n_contaminated)``.

    ``gram_set_ref`` is a ``ray.put`` ObjectRef of the sorted benchmark
    gram array — fetched once per worker from the local object store
    (lazy ``_load``, the same broadcast pattern as
    ``webtext.DropBoilerplate``).  Docs with fewer than ``n`` tokens emit
    no row (they have no n-gram to collide on), matching the SQL oracle.
    """

    def __init__(self, gram_set_ref, *, n: int, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.gram_set_ref = gram_set_ref
        self.n = n
        self.text_col = text_col
        self.id_col = id_col
        self._gram_set: pa.Array | None = None

    def _load(self) -> pa.Array:
        if self._gram_set is None:
            obj = self.gram_set_ref
            self._gram_set = ray.get(obj) if isinstance(
                obj, ray.ObjectRef) else obj
        return self._gram_set

    def __call__(self, batch: pa.Table) -> pa.Table:
        gram_set = self._load()
        row_idx, terms = split_and_normalize(batch[self.text_col])
        gram_rows, grams = ngram_strings(row_idx, terms, self.n)
        n_rows = batch.num_rows
        totals = np.bincount(gram_rows, minlength=n_rows).astype(np.int64)
        if len(gram_set) and len(grams):
            hit = pc.is_in(grams, value_set=gram_set) \
                .to_numpy(zero_copy_only=False)
            hits = np.bincount(gram_rows, weights=hit,
                               minlength=n_rows).astype(np.int64)
        else:
            hits = np.zeros(n_rows, dtype=np.int64)
        keep = totals > 0
        ids = batch[self.id_col].cast(pa.int64())
        return pa.table({
            "doc_id": ids.filter(pa.array(keep)),
            "n_grams": pa.array(totals[keep], type=pa.int64()),
            "n_contaminated": pa.array(hits[keep], type=pa.int64()),
        })


def collect_benchmark_grams(bench_ds: "ray.data.Dataset", *, n: int,
                            text_col: str = "text") -> pa.Array:
    """Distinct n-grams of a (small) benchmark dataset as one sorted Arrow
    string array, ready for ``ray.put``.  The ``take_all`` here is bounded
    by the benchmark set's size — the small side of the broadcast join."""
    parts = (bench_ds
             .map_batches(BenchmarkGrams(n=n, text_col=text_col),
                          batch_format="pyarrow")
             .take_all())
    if not parts:
        return pa.array([], type=pa.string())
    grams = pa.concat_arrays(
        [pa.array([r["g"] for r in parts], type=pa.string())])
    return pc.unique(grams).sort()
