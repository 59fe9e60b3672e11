"""BPE tokenizer training + application over the corpus.

The scale split follows the standard practice (Sennrich et al. 2016;
GPT-2's tokenizer was trained the same way): the CORPUS-SCALE work is the
word-frequency count — a map-side-combined tokenize + one ``groupby(word)``
shuffle of the (vocab-sized, not corpus-sized) unique-word table — while
merge learning itself runs on that frequency table, which is inherently
sequential over merges and small (Heaps' law; a ``max_words`` frequency
cutoff caps it explicitly, exactly as production BPE trainers do).

Application (``BPETokenize``) is an actor-pool ``map_batches`` stage: the
learned merge ranks are broadcast once (``ray.put`` → ctor arg), each actor
encodes the UNIQUE words of a batch and memoizes word → token-count in a
per-actor dict — the working set is vocabulary-sized, so the Python encode
loop amortizes to ~zero across batches while the per-doc accounting stays
fully vectorized (bincount over batch row index).

Training is deterministic: exact integer pair counts, ties broken by the
lexicographically smallest pair — so the ``bpe_token_counts`` query is
golden-pinnable (iterative merge learning is not SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import split_and_normalize

# marks the end of a word so merges never cross word boundaries and a
# word-final token is distinct from the same chars mid-word (Sennrich-style)
END = "</w>"


def train_bpe(word_counts: list[tuple[str, int]], n_merges: int
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) frequency table.

    Classic algorithm: every word starts as its character sequence plus the
    ``END`` marker; each round merges the adjacent symbol pair with the
    highest summed count (ties → lexicographically smallest pair), stopping
    early when no pair repeats.  Pure driver-side function over the
    vocab-sized table — the distributed part of BPE training is producing
    ``word_counts`` (see ``word_frequency_table``).
    """
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], int(c)) for w, c in word_counts if w]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for syms, _cnt in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the present pair
    with the LOWEST rank (training order) until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class WordCountPartials:
    """documents batch → map-side-combined ``(word, n)`` partials: the only
    rows that ever reach the shuffle are the batch's UNIQUE words."""

    def __init__(self, *, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _row_idx, terms = split_and_normalize(batch[self.text_col])
        if not len(terms):
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        agg = (pa.table({"word": terms})
               .group_by("word").aggregate([([], "count_all")]))
        return pa.table({"word": agg["word"],
                         "n": agg["count_all"].cast(pa.int64())})


def word_frequency_table(ds, *, max_words: int = 100_000
                         ) -> list[tuple[str, int]]:
    """Corpus → top-``max_words`` (word, count) rows, count desc / word asc.

    One map-side combine + one ``groupby(word)`` sum + one sort-limit on
    the aggregated (vocab-sized) table; the frequency cutoff is the
    standard BPE-trainer bound on driver memory.
    """
    from ray.data.aggregate import Sum
    agg = (ds.map_batches(WordCountPartials(), batch_format="pyarrow")
           .groupby("word").aggregate(Sum("n"))
           .rename_columns({"sum(n)": "n"}))
    top = agg.sort(["n", "word"], descending=[True, False]).limit(max_words)
    t = top.to_arrow_refs()
    import ray
    tables = [x for x in ray.get(t) if x.num_rows]
    if not tables:
        return []
    cat = pa.concat_tables(tables)
    return list(zip(cat["word"].to_pylist(),
                    cat["n"].to_pylist()))


class BPETokenize:
    """documents batch → ``(doc_id, n_tokens, n_bpe_tokens)``.

    ``merges`` may be the learned list, or a ``ray.ObjectRef`` to it
    (``ray.put`` once on the driver — the broadcast path).  Per batch the
    encode loop runs only over words not yet in the per-actor memo dict;
    everything per-doc is vectorized.
    """

    def __init__(self, merges, *, text_col: str = "text",
                 id_col: str = "doc_id"):
        if not isinstance(merges, list):
            import ray
            merges = ray.get(merges)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        row_idx, terms = split_and_normalize(batch[self.text_col])
        n_tok = np.bincount(row_idx, minlength=n).astype(np.int64)
        n_bpe = np.zeros(n, dtype=np.int64)
        if len(terms):
            uniq = pc.unique(terms)
            for w in uniq.to_pylist():
                if w not in self._memo:
                    self._memo[w] = len(encode_word(w, self.ranks))
            lens = pa.array([self._memo[w] for w in uniq.to_pylist()],
                            type=pa.int64())
            # map each token occurrence to its word's BPE length via the
            # dictionary indices, then reduce per doc
            code = pc.index_in(terms, value_set=uniq).to_numpy(
                zero_copy_only=False)
            per_tok = lens.to_numpy(zero_copy_only=False)[code]
            n_bpe = np.bincount(row_idx, weights=per_tok,
                                minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
        })
