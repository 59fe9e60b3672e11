"""BPE trainer + tokenizer stage: classic-example parity, reconstruction,
determinism, and batching invariance."""

import numpy as np
import pyarrow as pa

from search_engine_ray.stages.bpe import (BPETokenize, END, encode_word,
                                          train_bpe, word_frequency_table)


def test_classic_sennrich_example():
    # the canonical low/lower/newest/widest corpus: 'es' then 'est' merge
    # first (count 9), before any 'lo' pair (count 7)
    m = train_bpe([("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
                  4)
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t")
    assert ("l", "o") in m


def test_encode_reconstructs_word():
    words = [("hello", 4), ("help", 3), ("yelp", 2), ("hell", 5)]
    merges = train_bpe(words, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["hello", "help", "unseen", "h", ""]:
        if not w:
            continue
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END


def test_training_deterministic_under_input_order():
    words = [(f"w{i}x{i % 3}", (i * 7) % 11 + 1) for i in range(30)]
    m1 = train_bpe(words, 15)
    m2 = train_bpe(list(reversed(words)), 15)
    assert m1 == m2


def test_merge_count_threshold_stops():
    # all words unique chars, every pair count 1 → no merge at all
    assert train_bpe([("abc", 1), ("def", 1)], 10) == []


def test_stage_batching_invariance_and_counts():
    texts = ["the merger merged merging merges",
             "scan scans scanned scanning", "", "zzz",
             "the the the merger"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    wc = [("merger", 3), ("merged", 2), ("merging", 2), ("merges", 2),
          ("scan", 5), ("scans", 2), ("the", 9), ("zzz", 1)]
    merges = train_bpe(wc, 30)
    c = BPETokenize(merges)
    whole = c(t).to_pandas()
    ranks = {p: i for i, p in enumerate(merges)}
    from search_engine_ray.functions.analyze import tokenize
    for i, txt in enumerate(texts):
        toks = tokenize(txt)
        want = sum(len(encode_word(w, ranks)) for w in toks)
        assert whole.n_tokens[i] == len(toks)
        assert whole.n_bpe_tokens[i] == want, (i, txt)
    import pandas as pd
    parts = pd.concat([BPETokenize(merges)(t.slice(o, 2)).to_pandas()
                       for o in range(0, len(texts), 2)],
                      ignore_index=True)
    pd.testing.assert_frame_equal(whole, parts)


def test_word_frequency_table_top_k(ray_session):
    import ray.data
    texts = ["alpha beta beta", "beta gamma", "alpha beta"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()), "text": texts}))
    wc = word_frequency_table(ds, max_words=2)
    assert wc == [("beta", 4), ("alpha", 2)]
