"""End-to-end curation pipeline vs a brute-force pandas composition."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute(min_tokens=60, max_digit_ratio=0.05, ngram=5, bench_mod=97):
    from search_engine_ray.functions.analyze import tokenize
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pylist()
    corpus = [r for r in t if r["doc_id"] % bench_mod != 0]
    bench = [r for r in t if r["doc_id"] % bench_mod == 0]

    def grams(text):
        toks = tokenize(text)
        return {" ".join(toks[i:i + ngram])
                for i in range(len(toks) - ngram + 1)}

    bench_grams = set().union(*(grams(r["text"]) for r in bench)) \
        if bench else set()

    def quality_ok(text):
        toks = tokenize(text)
        if len(toks) < min_tokens:
            return False
        digits = sum(c.isdigit() for c in text)
        return digits / max(len(text), 1) <= max_digit_ratio

    survivors = [r for r in corpus if quality_ok(r["text"])]
    keeper: dict[str, int] = {}
    for r in survivors:
        keeper[r["text"]] = min(keeper.get(r["text"], 1 << 62), r["doc_id"])
    deduped = [r for r in survivors if keeper[r["text"]] == r["doc_id"]]
    return sorted(r["doc_id"] for r in deduped
                  if not (grams(r["text"]) & bench_grams))


def test_curate_matches_brute_force(ray_session, tmp_path):
    from search_engine_ray.pipelines.curate import curate_corpus
    out = str(tmp_path / "curated")
    ds = curate_corpus(SF, out)
    got = sorted(r["doc_id"] for r in ds.select_columns(["doc_id"])
                 .take_all())
    want = _brute()
    assert got == want and len(want) > 50
    # partitioned layout on disk
    import glob
    assert glob.glob(os.path.join(out, "source=*"))
    # texts survive byte-identical
    src = {r["doc_id"]: r["text"] for r in pq.read_table(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text"]).to_pylist()}
    for r in ds.select_columns(["doc_id", "text"]).take_all()[:20]:
        assert r["text"] == src[r["doc_id"]]


def test_curate_source_cap(ray_session):
    from search_engine_ray.pipelines.curate import curate_corpus
    cap = 3
    uncapped = _brute()
    rows = curate_corpus(SF, source_cap=cap) \
        .select_columns(["doc_id", "source"]).take_all()
    # the cap keeps the LOWEST-docID docs per source among the FINAL
    # (quality+dedup+decontamination) survivors — derive that from the
    # uncapped brute-force result
    src_of = {r["doc_id"]: r["source"] for r in pq.read_table(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "source"]).to_pylist()}
    want: dict[str, list[int]] = {}
    for d in uncapped:                      # already sorted ascending
        want.setdefault(src_of[d], [])
        if len(want[src_of[d]]) < cap:
            want[src_of[d]].append(d)
    got: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        got.setdefault(r["source"], []).append(r["doc_id"])
    assert got == want
    assert all(len(v) <= cap for v in got.values())
    assert sum(len(v) for v in got.values()) < len(uncapped)


def test_short_docs_survive_decontamination(ray_session, tmp_path):
    # a doc shorter than the n-gram window cannot contain a benchmark
    # n-gram; ContaminationScore emits no row for it, and the old
    # keep-the-scored-clean filter silently dropped it
    import pyarrow as pa
    from search_engine_ray.pipelines.curate import curate_corpus
    src_dir = tmp_path / "mini"
    src_dir.mkdir()
    long_text = " ".join(f"tok{i}" for i in range(40))
    short_text = "alpha beta gamma delta"            # 4 tokens < ngram=13
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 97 * 3], type=pa.int64()),
        "text": pa.array([long_text, short_text, long_text + " bench"]),
        "source": pa.array(["s1", "s1", "s2"]),
        "lang": pa.array(["en", "en", "en"]),
    }), str(src_dir / "documents.parquet"))
    ds = curate_corpus(str(src_dir), None, min_tokens=2,
                       max_digit_ratio=1.0, ngram=13)
    kept = sorted(r["doc_id"] for r in ds.select_columns(["doc_id"])
                  .take_all())
    assert 2 in kept, "short doc must survive decontamination"


def test_curate_rerun_does_not_duplicate(ray_session, tmp_path):
    # write step stages + publishes atomically: re-running into the same
    # out_dir must replace, never append next to the first run's files
    from search_engine_ray.pipelines.curate import curate_corpus
    out = str(tmp_path / "curated")
    n1 = curate_corpus(SF, out).count()
    n2 = curate_corpus(SF, out).count()
    assert n1 == n2 and n1 > 0
