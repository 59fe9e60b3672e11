"""Benchmark-contamination detection: unit n-gram windows + a planted
end-to-end case vs a brute-force Python oracle."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.analyze import tokenize
from search_engine_ray.stages.contamination import ngram_strings
from search_engine_ray.stages.tokenize import split_and_normalize


def test_ngram_windows_respect_doc_boundaries():
    texts = pa.array(["a b c d", "e f", "g h i"])
    row_idx, terms = split_and_normalize(texts)
    rows, grams = ngram_strings(row_idx, terms, 3)
    assert grams.to_pylist() == ["a b c", "b c d", "g h i"]
    assert rows.tolist() == [0, 0, 2]
    # n longer than any doc → empty
    rows2, grams2 = ngram_strings(row_idx, terms, 5)
    assert len(grams2) == 0 and rows2.size == 0


def _brute_grams(text: str, n: int) -> list[str]:
    toks = tokenize(text)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_contamination_planted(ray_session, tmp_path):
    import ray
    from search_engine_ray.stages.contamination import (
        ContaminationScore, collect_benchmark_grams)
    bench_text = "the quick brown fox jumps over the lazy dog"
    docs = pa.table({
        "doc_id": pa.array([0, 97, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            bench_text,                                  # benchmark
            "pack my box with five dozen jugs",          # benchmark
            "a quick brown fox jumps over fences daily", # shares one 5-gram
            "completely unrelated words here only",      # clean
            "the quick brown fox jumps over the moon",   # shares several
        ]),
    })
    bench = ray.data.from_arrow(docs).filter(
        lambda r: r["doc_id"] % 97 == 0)
    gram_ref = ray.put(collect_benchmark_grams(bench, n=5))
    corpus = ray.data.from_arrow(docs).filter(
        lambda r: r["doc_id"] % 97 != 0)
    out = (corpus.map_batches(ContaminationScore(gram_ref, n=5),
                              batch_format="pyarrow")
           .to_pandas().set_index("doc_id").sort_index())

    bench_set = set(_brute_grams(bench_text, 5)) | set(
        _brute_grams("pack my box with five dozen jugs", 5))
    for doc_id, text in [(1, docs["text"][2].as_py()),
                         (2, docs["text"][3].as_py()),
                         (3, docs["text"][4].as_py())]:
        grams = _brute_grams(text, 5)
        assert out.loc[doc_id, "n_grams"] == len(grams)
        assert out.loc[doc_id, "n_contaminated"] == sum(
            g in bench_set for g in grams)
    assert out.loc[1, "n_contaminated"] == 1
    assert out.loc[2, "n_contaminated"] == 0
    assert out.loc[3, "n_contaminated"] >= 3


def test_contamination_query_vs_brute(ray_session):
    """Full catalog entry at sf0.001 vs a brute-force Python oracle."""
    import pyarrow.parquet as pq
    from search_engine_ray.pipelines.queries import q_contamination
    sf = "/root/testdata/sf0.001"
    got = (q_contamination(sf).to_pandas()
           .set_index("doc_id").sort_index())
    t = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    bench = set()
    for did, text in rows:
        if did % 97 == 0:
            bench.update(_brute_grams(text, 5))
    n_checked = 0
    for did, text in rows:
        if did % 97 == 0:
            continue
        grams = _brute_grams(text, 5)
        if not grams:
            assert did not in got.index
            continue
        assert got.loc[did, "n_grams"] == len(grams)
        assert got.loc[did, "n_contaminated"] == sum(
            g in bench for g in grams)
        n_checked += 1
    assert n_checked == len(got)
