"""Text-analysis batch stages: quality stats, language-ID, fingerprints.

Training-data-pipeline operators layered on the same tokenizer the index
build uses (``stages/tokenize.py``; delimiters per the reference tokenizer,
``/root/reference/KaggleFinanceSourceEngine.cpp:212``).  All stages are
``map_batches`` callables over zero-copy Arrow batches; per-token work is
vectorized (numpy reductions keyed by batch row index) — no Python loop over
rows or tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv1a64_array
from .tokenize import split_and_normalize


class QualityStats:
    """documents batch → per-doc quality scoring columns.

    Emits ``(doc_id, n_tokens, mean_token_len, digit_ratio)``:
    token count and mean normalized-token length from the engine tokenizer,
    digit ratio over the raw text bytes.  Docs with zero tokens are dropped
    (keeps parity with token-derived SQL oracles).
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = batch[self.text_col]
        row_idx, terms = split_and_normalize(texts)
        n_tokens = np.bincount(row_idx, minlength=n).astype(np.int64)
        tok_lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        len_sum = np.bincount(row_idx, weights=tok_lens, minlength=n)
        text_len = pc.utf8_length(pc.fill_null(texts, "")).to_numpy(
            zero_copy_only=False).astype(np.float64)
        digits = pc.utf8_length(
            pc.replace_substring_regex(pc.fill_null(texts, ""), "[^0-9]", "")
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = n_tokens > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_len = np.where(keep, len_sum / np.maximum(n_tokens, 1), 0.0)
            digit_ratio = np.where(text_len > 0, digits / np.maximum(text_len, 1), 0.0)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tokens[keep], type=pa.int64()),
            "mean_token_len": pa.array(np.round(mean_len[keep], 6)),
            "digit_ratio": pa.array(np.round(digit_ratio[keep], 6)),
        })


# PII / blocklist scrub patterns: (count_column, RE2 pattern, replacement).
# Applied SEQUENTIALLY in this order; counts are taken on the ORIGINAL text.
# Both Arrow (`pc.*_substring_regex`) and DuckDB use RE2, so the SQL oracle
# reuses these literals verbatim.  The term blocklist row stands in for
# secret/API-key scrub lists; email/IP/long-digit-run are the classic
# web-corpus PII patterns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("n_email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("n_longnum", r"\b\d{6,}\b", "<NUM>"),
    ("n_blockterm", r"\b(?:key|hash|secret)\b", "<TERM>"),
]


class PIIScrub:
    """documents batch → per-doc PII/blocklist match counts + redacted text.

    One vectorized RE2 count per pattern on the raw text, then the
    replacements applied in sequence — all `pyarrow.compute` kernels, no
    Python row loop.  Emitting the redacted text itself (rather than a
    digest) lets the SQL oracle value-check the full rewrite.
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "")
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "doc_id": batch[self.id_col].cast(pa.int64())}
        clean = texts
        for name, pat, repl in PII_PATTERNS:
            cols[name] = pc.count_substring_regex(texts, pat).cast(pa.int64())
            clean = pc.replace_substring_regex(clean, pat, repl)
        cols["clean_text"] = clean
        return pa.table(cols)


class RepetitionStats:
    """Gopher-style repetition scoring (Rae et al. 2021, public method):
    per-doc whitespace-token count, distinct-token count, duplicate-token
    fraction and top-token fraction.

    Vectorized: tokens FNV-hashed, one ``np.lexsort`` over
    ``(row, token_hash)`` per batch, run-length reductions for distinct and
    top counts.  Distinctness is judged on 64-bit token hashes — a same-doc
    collision (birthday bound ~n_tokens²/2⁶⁵ per doc) would overcount
    duplication by one; negligible for real documents.
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = pc.fill_null(batch[self.text_col], "")
        lst = pc.split_pattern_regex(texts, r"\s+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = row_idx[nonempty]
        n_tokens = np.bincount(row_idx, minlength=n).astype(np.int64)
        n_unique = np.zeros(n, dtype=np.int64)
        top = np.zeros(n, dtype=np.int64)
        if row_idx.size:
            h = fnv1a64_array(flat.filter(pa.array(nonempty)))
            order = np.lexsort((h, row_idx))
            ri, hs = row_idx[order], h[order]
            new_run = np.r_[True, (ri[1:] != ri[:-1]) | (hs[1:] != hs[:-1])]
            starts = np.flatnonzero(new_run)
            n_unique = np.bincount(ri[starts], minlength=n).astype(np.int64)
            run_len = np.diff(np.r_[starts, ri.size])
            np.maximum.at(top, ri[starts], run_len)
        with np.errstate(divide="ignore", invalid="ignore"):
            nt = n_tokens.astype(np.float64)
            dup = np.where(n_tokens > 0, (nt - n_unique) * 1.0 / nt, 0.0)
            topf = np.where(n_tokens > 0, top * 1.0 / nt, 0.0)
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_unique": pa.array(n_unique, type=pa.int64()),
            "dup_frac": pa.array(np.round(dup, 6)),
            "top_frac": pa.array(np.round(topf, 6)),
        })


# Small per-language stopword marker sets for the n-gram-free heuristic
# language identifier (public-domain stopword lists).
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for was with as his on be "
                    "at by had this have from or one not are but all".split()),
    "es": frozenset("el la de que y en los del se las por un para con una su "
                    "al es lo como mas pero sus le ya o este".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf fur ist "
                    "im dem nicht ein eine als auch es an werden".split()),
    "fr": frozenset("le de la et les des en un du une que est pour qui dans "
                    "par plus pas au sur ne se ce il sont".split()),
}


class LangId:
    """Heuristic language identification: per-doc marker-stopword hit ratio
    per language, argmax wins; below ``min_ratio`` → ``"unknown"``.

    Deterministic and vectorized: one ``is_in`` membership pass per language
    over the batch's tokens, summed per row with ``np.bincount``.
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id",
                 min_ratio: float = 0.05):
        self.text_col = text_col
        self.id_col = id_col
        self.min_ratio = min_ratio
        self.langs = sorted(_LANG_MARKERS)
        self.value_sets = {m: pa.array(sorted(_LANG_MARKERS[m]))
                           for m in self.langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        row_idx, terms = split_and_normalize(batch[self.text_col])
        n_tokens = np.bincount(row_idx, minlength=n).astype(np.float64)
        scores = np.zeros((len(self.langs), n), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            hit = pc.is_in(terms, value_set=self.value_sets[lang]).to_numpy(
                zero_copy_only=False)
            scores[i] = np.bincount(row_idx, weights=hit, minlength=n)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratios = scores / np.maximum(n_tokens, 1.0)
        best = np.argmax(ratios, axis=0)
        best_ratio = ratios[best, np.arange(n)]
        lang_arr = np.asarray(self.langs, dtype=object)[best]
        lang_arr[best_ratio < self.min_ratio] = "unknown"
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "pred_lang": pa.array(lang_arr.tolist(), type=pa.string()),
            "marker_ratio": pa.array(np.round(best_ratio, 6)),
        })


class Fingerprint:
    """Order-sensitive 64-bit document fingerprint.

    Per doc: FNV-hash each normalized token, rotate hash *i* left by
    ``i mod 61`` bits (position mixing), XOR-reduce.  Same token multiset in
    a different order → different fingerprint; fully vectorized via
    ``np.bitwise_xor.reduceat`` over the batch's token stream.
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        row_idx, terms = split_and_normalize(batch[self.text_col])
        out = np.zeros(n, dtype=np.uint64)
        if len(terms):
            h = fnv1a64_array(terms)
            # position within the doc: global position minus run start
            starts_of_row = np.zeros(n, dtype=np.int64)
            counts = np.bincount(row_idx, minlength=n)
            np.cumsum(counts[:-1], out=starts_of_row[1:])
            pos = (np.arange(len(h)) - starts_of_row[row_idx]) % 61
            pos = pos.astype(np.uint64)
            # rotl; (64-pos)&63 avoids the undefined shift-by-64 at pos==0
            mixed = (h << pos) | (h >> ((np.uint64(64) - pos) & np.uint64(63)))
            boundaries = np.flatnonzero(np.r_[True, np.diff(row_idx) != 0])
            reduced = np.bitwise_xor.reduceat(mixed, boundaries)
            out[row_idx[boundaries]] = reduced
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "fingerprint": pa.array(out.astype(np.int64) & 0x7FFFFFFFFFFFFFFF,
                                    type=pa.int64()),
            "n_tokens": pa.array(np.bincount(row_idx, minlength=n),
                                 type=pa.int64()),
        })


def classifier_weights(n_buckets: int = 4096) -> np.ndarray:
    """Deterministic stand-in for a trained linear model's weight vector:
    raw int64 weights ``w_raw[b] = (b * 2654435761) % 8191``, centered to
    [-1, 1] at score time via ``(w_raw - 4095) / 4095``.  A real deployment
    would ``ray.put()`` weights produced by a training job; the engine-side
    contract is only "broadcast the vector once, score batches against it"."""
    b = np.arange(n_buckets, dtype=np.int64)
    return (b * 2654435761) % 8191


class HashedLinearClassifier:
    """documents batch → ``(doc_id, clf_score, clf_label)``: fastText-style
    linear-model inference over hashing-trick bag-of-tokens features.

    Deploy as an ACTOR POOL (pass the class to ``map_batches``) with the
    weight vector shipped as a ``ray.ObjectRef`` (``ray.put(
    classifier_weights())``): every actor materializes the same plasma copy
    once in ``__init__`` — never re-shipped per batch, zero-copy for numpy.

    Scoring is integer-exact so a SQL oracle can reproduce it bit-for-bit:
    ``z = Σ_token_occurrences w_raw[fnv1a64(token) % D]`` is an
    order-independent integer sum; the only float ops are one division and
    one sigmoid.  ``score = sigmoid((z - 4095·n) / (4095·n))`` for n tokens
    (the mean centered weight), ``label = z > 4095·n`` — the integer form
    of ``score > 0.5``, immune to float-boundary ambiguity.  Tokenization
    is the engine analyzer (``split_and_normalize``), same as the index.
    """

    def __init__(self, weights=None, *, text_col: str = "text",
                 id_col: str = "doc_id"):
        if weights is None:
            w = classifier_weights()
        elif isinstance(weights, np.ndarray):
            w = weights
        else:  # ray.ObjectRef — the broadcast path
            import ray
            w = ray.get(weights)
        self.w = np.ascontiguousarray(w, dtype=np.int64)
        self.d = np.uint64(len(self.w))
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        row_idx, terms = split_and_normalize(batch[self.text_col])
        cnt = np.bincount(row_idx, minlength=n).astype(np.int64)
        z = np.zeros(n, dtype=np.int64)
        if len(terms):
            bucket = (fnv1a64_array(terms) % self.d).astype(np.int64)
            # float64 bincount is exact here: |Σ| < 8191 · n_tokens « 2^53
            z = np.bincount(row_idx, weights=self.w[bucket],
                            minlength=n).astype(np.int64)
        center = 4095 * cnt
        x = np.where(cnt > 0,
                     (z - center) / np.maximum(4095.0 * cnt, 1.0), 0.0)
        score = 1.0 / (1.0 + np.exp(-x))
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "clf_score": pa.array(np.round(score, 6), type=pa.float64()),
            "clf_label": pa.array(z > center, type=pa.bool_()),
        })


class DocChunker:
    """documents batch → fixed-size OVERLAPPING token windows
    ``(doc_id, chunk_id, n_tokens, start_pos, end_pos)`` — the LLM
    training-data "context window" prep step.  Chunk ``k`` covers token
    positions ``[k·stride, k·stride + size)``; ``stride < size`` overlaps
    neighbours.  ``size ≤ 2·stride`` keeps every token in ≤ 2 chunks, so
    the expansion is a bounded 2-row union (the hopping-window trick) —
    vectorized and doc-local, no shuffle at any corpus size.
    """

    def __init__(self, *, size: int = 64, stride: int = 48,
                 text_col: str = "text", id_col: str = "doc_id"):
        if not (0 < stride <= size <= 2 * stride):
            raise ValueError("need 0 < stride <= size <= 2*stride")
        self.size, self.stride = size, stride
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "chunk_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "start_pos": pa.array([], type=pa.int64()),
            "end_pos": pa.array([], type=pa.int64()),
        })
        n = batch.num_rows
        row_idx, _terms = split_and_normalize(batch[self.text_col])
        if not row_idx.size:
            return empty
        counts = np.bincount(row_idx, minlength=n)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos = np.arange(row_idx.size, dtype=np.int64) - starts[row_idx]
        kmax = pos // self.stride              # every token's last chunk
        kprev = kmax - 1                       # ...and maybe the one before
        in_prev = (kprev >= 0) & (pos < kprev * self.stride + self.size)
        rows2 = np.concatenate([row_idx, row_idx[in_prev]])
        ks = np.concatenate([kmax, kprev[in_prev]])
        ps = np.concatenate([pos, pos[in_prev]])
        key = rows2 * (1 << 32) + ks           # chunk ids < 2^32 by far
        order = np.argsort(key, kind="stable")
        key, ps = key[order], ps[order]
        b = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[key[b] // (1 << 32)], type=pa.int64()),
            "chunk_id": pa.array(key[b] % (1 << 32), type=pa.int64()),
            "n_tokens": pa.array(np.diff(np.append(b, key.size)),
                                 type=pa.int64()),
            "start_pos": pa.array(np.minimum.reduceat(ps, b),
                                  type=pa.int64()),
            "end_pos": pa.array(np.maximum.reduceat(ps, b),
                                type=pa.int64()),
        })
