"""Multi-index k-way merge: postings-level and index-level (SURVEY §7 north
rule: 'multi-segment merge uses a k-way merge of sorted posting lists with
docID remapping')."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.stages.postings import (decode_posting,
                                               decode_segment_to_rows,
                                               encode_postings_table,
                                               merge_segment_tables)


def _seg(rows):
    """rows: (term, doc_id, tf, doc_len)"""
    return encode_postings_table(pa.table({
        "term": [r[0] for r in rows],
        "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "tf": pa.array([r[2] for r in rows], type=pa.int32()),
        "doc_len": pa.array([r[3] for r in rows], type=pa.int32()),
    }))


class TestSegmentMerge:
    def test_decode_roundtrip(self):
        seg = _seg([("a", 5, 2, 10), ("a", 9, 1, 7), ("b", 5, 3, 10)])
        rows = decode_segment_to_rows(seg)
        got = sorted(zip(rows["term"].to_pylist(), rows["doc_id"].to_pylist(),
                         rows["tf"].to_pylist()))
        assert got == [("a", 5, 2), ("a", 9, 1), ("b", 5, 3)]

    def test_interleaved_doc_ids_merge_sorted(self):
        s1 = _seg([("a", 1, 1, 5), ("a", 5, 2, 6), ("a", 9, 1, 7)])
        s2 = _seg([("a", 2, 4, 8), ("a", 6, 1, 9)])
        merged = merge_segment_tables([s1, s2])
        assert merged.num_rows == 1
        ids, tfs = decode_posting(merged.to_pylist()[0])
        assert list(ids) == [1, 2, 5, 6, 9]
        assert list(tfs) == [1, 4, 2, 1, 1]
        assert merged["df"][0].as_py() == 5

    def test_last_input_wins_on_recrawl(self):
        s1 = _seg([("a", 5, 2, 10), ("b", 5, 7, 10)])
        s2 = _seg([("a", 5, 9, 12)])          # doc 5 re-crawled
        merged = merge_segment_tables([s1, s2])
        by_term = {r["term"]: r for r in merged.to_pylist()}
        ids, tfs = decode_posting(by_term["a"])
        assert list(ids) == [5] and list(tfs) == [9]   # s2 wins
        ids, tfs = decode_posting(by_term["b"])
        assert list(tfs) == [7]                        # untouched field

    def test_doc_id_remapping(self):
        s1 = _seg([("a", 0, 1, 5), ("a", 1, 1, 5)])
        s2 = _seg([("a", 0, 2, 6), ("a", 1, 2, 6)])
        merged = merge_segment_tables([s1, s2], doc_id_offsets=[0, 100])
        ids, tfs = decode_posting(merged.to_pylist()[0])
        assert list(ids) == [0, 1, 100, 101]
        assert list(tfs) == [1, 1, 2, 2]

    def test_empty_inputs(self):
        assert merge_segment_tables([]).num_rows == 0
        s1 = _seg([("a", 1, 1, 5)])
        assert merge_segment_tables([s1]).equals(s1)


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    """Two delta builds over disjoint halves of sf0.001 documents."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.state.checkpoint import IndexConfig
    root = tmp_path_factory.mktemp("merge")
    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src, columns=["doc_id", "text"])
    half = t.num_rows // 2
    p1, p2 = str(root / "half1.parquet"), str(root / "half2.parquet")
    pq.write_table(t.slice(0, half), p1)
    pq.write_table(t.slice(half), p2)
    # salting off: each delta build samples its own hot set, which is legal
    # (searchers merge a term's runs across buckets) but would break the
    # byte-identity comparison against the monolithic build below
    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=False)
    i1, i2 = str(root / "idx1"), str(root / "idx2")
    build_index(p1, i1, cfg)
    build_index(p2, i2, cfg)
    full = str(root / "idx_full")
    build_index(src, full, cfg)
    return i1, i2, full, str(root / "merged"), t


def test_merged_index_equals_full_build(two_indexes, ray_session):
    from search_engine_ray.pipelines.merge import merge_indexes
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.pipelines.oracle import build_oracle
    from search_engine_ray.state import checkpoint as ckpt
    i1, i2, full, out, t = two_indexes
    man = merge_indexes([i1, i2], out)
    assert len(man["partitions"]) == 8

    # postings byte-identical to the from-scratch full build
    cfg = ckpt.IndexConfig(n_buckets=4, n_doc_shards=2)
    for s in range(2):
        for b in range(4):
            pm = pq.read_table(os.path.join(ckpt.partition_dir(out, s, b),
                                            "postings.parquet"))
            pf = pq.read_table(os.path.join(ckpt.partition_dir(full, s, b),
                                            "postings.parquet"))
            assert pm.equals(pf), (s, b)

    assert ckpt.read_docstats(out) == ckpt.read_docstats(full)

    # query rank/score identity on the merged index
    orc = build_oracle(list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))
    qe = QueryEngine(out, num_searchers=2, use_actors=False)
    for q in ["table row merge", "spark dup", "the a window"]:
        got = qe.query(q, k=10)
        want = orc.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_ingest_updates_in_place_with_recrawl(ray_session, tmp_path):
    """ingest_documents = delta build + merge + swap: new docs become
    searchable, a re-crawled doc_id serves its NEW text, and the index
    directory path is unchanged (scratch dirs cleaned up)."""
    import numpy as np
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.oracle import build_oracle
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src, columns=["doc_id", "text"])
    half = t.num_rows // 2
    base_t, new_t = t.slice(0, half), t.slice(half)
    # re-crawl: doc 0 reappears in the delta with replaced text
    recrawl = pa.table({
        "doc_id": pa.array([t["doc_id"][0].as_py()], type=pa.int64()),
        "text": pa.array(["zebra quokka zebra recrawl text"])})
    delta_t = pa.concat_tables([new_t, recrawl])
    p_base = str(tmp_path / "base.parquet")
    p_delta = str(tmp_path / "delta.parquet")
    pq.write_table(base_t, p_base)
    pq.write_table(delta_t, p_delta)

    idx = str(tmp_path / "idx")
    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=False)
    build_index(p_base, idx, cfg)
    ingest_documents(idx, p_delta)
    assert not os.path.exists(idx + ".ingest")
    assert not os.path.exists(idx + ".pre-ingest")

    # oracle over the post-ingest corpus (delta wins on doc 0)
    docs = {d: x for d, x in zip(t["doc_id"].to_pylist(),
                                 t["text"].to_pylist())}
    docs[t["doc_id"][0].as_py()] = "zebra quokka zebra recrawl text"
    orc = build_oracle(list(docs.items()))
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    for q in ["table row merge", "zebra quokka", "the a window"]:
        got = qe.query(q, k=10)
        want = orc.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_ingest_carries_tombstones_and_recrawl_revives(ray_session,
                                                       tmp_path):
    """Merging must not resurrect searchable-deleted docs: a tombstoned doc
    stays dead through ingest, unless the delta re-crawls it (revive with
    the NEW text)."""
    import numpy as np
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import (delete_docs,
                                                         ingest_documents)
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src, columns=["doc_id", "text"])
    half = t.num_rows // 2
    ids = t["doc_id"].to_pylist()
    dead_forever, dead_revived = ids[0], ids[1]
    p_base = str(tmp_path / "base.parquet")
    pq.write_table(t.slice(0, half), p_base)
    delta = pa.concat_tables([
        t.slice(half),
        pa.table({"doc_id": pa.array([dead_revived], type=pa.int64()),
                  "text": pa.array(["zebra quokka revived text"])})])
    p_delta = str(tmp_path / "delta.parquet")
    pq.write_table(delta, p_delta)

    idx = str(tmp_path / "idx")
    build_index(p_base, idx,
                IndexConfig(n_buckets=4, n_doc_shards=2,
                            salt_hot_terms=False))
    delete_docs(idx, [dead_forever, dead_revived])
    qe0 = QueryEngine(idx, num_searchers=2, use_actors=False)
    hits0 = {d for d, _ in qe0.query("table row merge window", k=500)}
    assert dead_forever not in hits0 and dead_revived not in hits0

    ingest_documents(idx, p_delta)
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    hits = {d for d, _ in qe.query("table row merge window", k=500)}
    assert dead_forever not in hits
    revived = {d for d, _ in qe.query("zebra quokka", k=10)}
    assert dead_revived in revived


def test_ingest_inherits_docstore_display_columns(ray_session, tmp_path):
    """With keep_cols unspecified, ingest derives the delta's docstore
    extras from the live index (merged docstore schema stays uniform)."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.state import checkpoint as ckpt
    from search_engine_ray.state.checkpoint import IndexConfig

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    urls = pa.array([f"https://ex.com/{d}" for d in
                     t["doc_id"].to_pylist()])
    t = t.append_column("url", urls)
    half = t.num_rows // 2
    p_base, p_delta = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(t.slice(0, half), p_base)
    pq.write_table(t.slice(half), p_delta)
    idx = str(tmp_path / "idx")
    build_index(p_base, idx, IndexConfig(n_buckets=4, n_doc_shards=2,
                                         salt_hot_terms=False),
                keep_cols=("url",))
    ingest_documents(idx, p_delta)
    store = pq.read_table(ckpt.docstore_dir(idx))
    assert "url" in store.column_names
    assert store.num_rows == t.num_rows
    assert store["url"].null_count == 0


def test_full_lifecycle_compact_after_ingest_equals_fresh_build(
        ray_session, tmp_path):
    """build → delete → ingest (re-crawl + new docs) → compact produces an
    index whose postings and stats are byte-identical to a fresh build
    over the surviving corpus."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import (compact_index,
                                                         delete_docs,
                                                         ingest_documents)
    from search_engine_ray.state import checkpoint as ckpt
    from search_engine_ray.state.checkpoint import IndexConfig

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    half = t.num_rows // 2
    dead, recrawled = ids[2], ids[3]
    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=False)

    p_base = str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, half), p_base)
    delta = pa.concat_tables([
        t.slice(half),
        pa.table({"doc_id": pa.array([recrawled], type=pa.int64()),
                  "text": pa.array(["replacement text body"])})])
    p_delta = str(tmp_path / "d.parquet")
    pq.write_table(delta, p_delta)

    idx = str(tmp_path / "idx")
    build_index(p_base, idx, cfg)
    delete_docs(idx, [dead])
    ingest_documents(idx, p_delta)
    compacted = str(tmp_path / "compacted")
    compact_index(idx, compacted)

    docs = {d: x for d, x in zip(ids, t["text"].to_pylist())}
    docs[recrawled] = "replacement text body"
    del docs[dead]
    p_surv = str(tmp_path / "surv.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs.keys()), type=pa.int64()),
        "text": pa.array(list(docs.values()))}), p_surv)
    fresh = str(tmp_path / "fresh")
    build_index(p_surv, fresh, cfg)

    assert ckpt.read_docstats(compacted) == ckpt.read_docstats(fresh)
    for s in range(2):
        for b in range(4):
            pm = pq.read_table(os.path.join(
                ckpt.partition_dir(compacted, s, b), "postings.parquet"))
            pf = pq.read_table(os.path.join(
                ckpt.partition_dir(fresh, s, b), "postings.parquet"))
            assert pm.equals(pf), (s, b)


def test_ingest_preserves_positions_for_phrases(ray_session, tmp_path):
    """Ingesting into a positional index keeps phrase serving exact (the
    delta inherits positions=True from the live config)."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    base = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "beta alpha gamma"])})
    delta = pa.table({
        "doc_id": pa.array([3], type=pa.int64()),
        "text": pa.array(["gamma alpha beta epsilon"])})
    p_b, p_d = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(base, p_b)
    pq.write_table(delta, p_d)
    idx = str(tmp_path / "idx")
    build_index(p_b, idx, IndexConfig(n_buckets=4, n_doc_shards=2,
                                      positions=True,
                                      salt_hot_terms=False))
    ingest_documents(idx, p_d)
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    hits = [d for d, _ in qe.phrase_query("alpha beta", k=10)]
    assert sorted(hits) == [1, 3]


def test_ingest_fielded_index_rebuilds_fielded_delta(ray_session, tmp_path):
    """Ingesting into a FIELDED (reference) index must build the delta
    with the same fielded stage (mappings recorded in the manifest) — a
    faceted query spanning both halves returns exactly the brute-force
    filter set."""
    from search_engine_ray.functions.analyze import tokenize
    from search_engine_ray.pipelines.build import build_reference_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "lang", "source"])
    half = t.num_rows // 2
    p_base, p_delta = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(t.slice(0, half), p_base)
    pq.write_table(t.slice(half), p_delta)
    idx = str(tmp_path / "idx")
    build_reference_index(
        p_base, idx,
        IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=False),
        text_fields={"text": "text"},
        metadata_fields={"language": "lang", "source": "source"})
    ingest_documents(idx, p_delta)

    lang0 = t["lang"][0].as_py()
    query = "scan merge window fast"
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    hits = {d for d, _ in
            qe.query_filtered(query, [("language", lang0)], k=10_000)}
    qterms = set(tokenize(query))
    want = {r["doc_id"] for r in t.to_pylist()
            if r["lang"] == lang0 and qterms & set(tokenize(r["text"]))}
    assert hits == want and len(want) > 0


def test_ingest_with_salting_matches_oracle(ray_session, tmp_path):
    """Base and delta each sample their OWN hot-term set (different salting
    layouts); merged serving must still be rank/score-identical to the
    oracle — searchers merge a term's runs across buckets by design."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.oracle import build_oracle
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src, columns=["doc_id", "text"])
    half = t.num_rows // 2
    p_base, p_delta = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(t.slice(0, half), p_base)
    pq.write_table(t.slice(half), p_delta)
    idx = str(tmp_path / "idx")
    # aggressive salting so head terms REALLY spread (tiny corpus)
    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=True,
                      hot_df_fraction=0.05, salt=4)
    build_index(p_base, idx, cfg)
    ingest_documents(idx, p_delta)

    orc = build_oracle(list(zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())))
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    for q in ["table row merge", "the a window", "scan fast value"]:
        got = qe.query(q, k=10)
        want = orc.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_ingest_heals_crash_in_swap_window(ray_session, tmp_path):
    """A crash between the two swap renames leaves only <idx>.pre-ingest;
    the next ingest restores it and completes normally."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    half = t.num_rows // 2
    p_base, p_delta = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(t.slice(0, half), p_base)
    pq.write_table(t.slice(half), p_delta)
    idx = str(tmp_path / "idx")
    build_index(p_base, idx, IndexConfig(n_buckets=4, n_doc_shards=2,
                                         salt_hot_terms=False))
    os.rename(idx, idx + ".pre-ingest")       # simulate the crash window
    ingest_documents(idx, p_delta)
    assert os.path.isdir(idx)
    assert not os.path.exists(idx + ".pre-ingest")
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    assert len(qe.query("table row", k=10)) == 10


def test_federated_equals_merged_index(two_indexes, ray_session):
    """Query-time federation over the two delta indexes is rank/score-
    identical to the physically merged index (and to the full-build
    oracle) — summed df, pooled avgdl, two-round protocol."""
    from search_engine_ray.pipelines.merge import merge_indexes
    from search_engine_ray.pipelines.query import (FederatedEngine,
                                                   QueryEngine)
    i1, i2, full, out, t = two_indexes
    merge_indexes([i1, i2], out)   # module fixture may already have run it
    fed = FederatedEngine([i1, i2], num_searchers=2, use_actors=False)
    qm = QueryEngine(out, num_searchers=2, use_actors=False)
    for q in ["table row merge", "spark dup", "the a window",
              "nosuchterm", ""]:
        got = fed.query(q, k=10)
        want = qm.query(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q


def test_ingest_discards_stale_scratch_of_other_source(ray_session,
                                                       tmp_path):
    """A crashed ingest's scratch (fully _DONE delta of batch A) must NOT
    be resumed by a later ingest of batch B — the _SOURCE marker guards
    the base dir (build_index's stage-1 tag covers config, not source)."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.maintenance import ingest_documents
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig

    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=False)
    p_base = str(tmp_path / "base.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["base alpha text", "base beta text"])}), p_base)
    idx = str(tmp_path / "idx")
    build_index(p_base, idx, cfg)

    # simulate a crashed ingest of batch A: its delta is fully built in
    # the scratch base (marker recorded for A)
    import json as _json
    p_a = str(tmp_path / "batch_a.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([10], type=pa.int64()),
        "text": pa.array(["stale aardvark document"])}), p_a)
    base = idx + ".ingest"
    os.makedirs(base, exist_ok=True)
    build_index(p_a, os.path.join(base, "delta"), cfg)
    with open(os.path.join(base, "_SOURCE.json"), "w") as f:
        _json.dump({"source": p_a, "mtime": os.path.getmtime(p_a)}, f)

    # now ingest batch B — the stale A delta must be discarded
    p_b = str(tmp_path / "batch_b.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([20], type=pa.int64()),
        "text": pa.array(["fresh bumblebee document"])}), p_b)
    ingest_documents(idx, p_b)

    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    assert [d for d, _ in qe.query("bumblebee", 5)] == [20]
    assert qe.query("aardvark", 5) == []      # batch A never merged


def test_merge_with_legacy_flat_docstore_input(ray_session, tmp_path):
    """merge_indexes must handle an input whose docstore is the legacy
    FLAT (non-shard-partitioned) layout: precedence drops and tombstone
    carry-forward derive per-shard ids from the flat file."""
    import shutil
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.merge import merge_indexes
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state import checkpoint as ckpt
    from search_engine_ray.state.checkpoint import IndexConfig

    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, salt_hot_terms=False)
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["old crocodile text", "old dingo text",
                          "shared elephant text"])}), p1)
    pq.write_table(pa.table({
        "doc_id": pa.array([3, 4], type=pa.int64()),
        "text": pa.array(["new elephant recrawled", "new flamingo text"])}),
        p2)
    idx1, idx2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(p1, idx1, cfg)
    build_index(p2, idx2, cfg)

    # downgrade idx1's docstore to the legacy flat layout: one parquet
    # file, no shard=K subdirs (load_shard_dict then returns None), and
    # re-encode its segments in GLOBAL docid space via a fresh build
    # without a docstore dictionary — simplest faithful approximation:
    # flatten the docstore files only; segments stay local-space and
    # decode through... so instead rebuild idx1 the way round-1/2 did is
    # not possible — flatten AND drop the shard dirs, then verify merge
    # still computes drops/tombstones (segments keep decoding via the
    # in-dict=None global path only if their metadata says global, so
    # keep this test focused on the docstore-shape crash).
    from search_engine_ray.stages.postings import (decode_segment_to_rows,
                                                   encode_postings_table,
                                                   load_shard_dict)
    store = ckpt.docstore_dir(idx1)
    dicts = {s: load_shard_dict(store, s) for s in range(cfg.n_doc_shards)}
    # 1. segments back to GLOBAL docid space (what round-1/2 indexes wrote)
    for s in range(cfg.n_doc_shards):
        for b in range(cfg.n_buckets):
            f = os.path.join(ckpt.partition_dir(idx1, s, b),
                             "postings.parquet")
            if not os.path.exists(f):
                continue
            rows = decode_segment_to_rows(pq.read_table(f), dicts[s])
            pq.write_table(encode_postings_table(rows), f)
    # 2. docstore to ONE flat parquet, no shard=K subdirs
    flat = pq.read_table(store)
    if "shard" in flat.column_names:
        flat = flat.drop_columns(["shard"])
    shutil.rmtree(store)
    os.makedirs(store)
    pq.write_table(flat, os.path.join(store, "docstore.parquet"))
    out = str(tmp_path / "merged")
    try:
        merge_indexes([idx1, idx2], out)
    except TypeError as e:
        raise AssertionError(f"legacy flat docstore crashed merge: {e}")
    qe = QueryEngine(out, num_searchers=2, use_actors=False)
    assert [d for d, _ in qe.query("flamingo", 5)] == [4]
    assert [d for d, _ in qe.query("recrawled", 5)] == [3]
