"""Training-data operator stages: dedup, similarity, text stats."""

import numpy as np
import pyarrow as pa

from search_engine_ray.stages.dedup import (MinHashLSH, SimHash,
                                            candidate_pairs_from_group,
                                            exact_jaccard, hamming64,
                                            shingle_hashes)
from search_engine_ray.stages.similarity import (CosineScorer, HyperplaneLSH,
                                                 merge_topk)
from search_engine_ray.stages.textstats import Fingerprint, LangId, QualityStats
from search_engine_ray.functions.hashing import fnv1a64_array
from search_engine_ray.stages.tokenize import split_and_normalize


def _doc_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


class TestMinHash:
    def test_identical_docs_same_signature(self):
        t = _doc_table(["alpha beta gamma delta epsilon zeta"] * 2 +
                       ["totally different words entirely here now"])
        ids, sig = MinHashLSH().signatures(t)
        assert np.array_equal(sig[0], sig[1])
        assert not np.array_equal(sig[0], sig[2])

    def test_similar_docs_high_estimated_jaccard(self):
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base + " extra"
        ids, sig = MinHashLSH(num_perm=128, bands=32).signatures(_doc_table([base, near]))
        est = (sig[0] == sig[1]).mean()
        pairs = np.array([[0, 1]])
        true = exact_jaccard({0: base, 1: near}, pairs)[0]
        assert abs(est - true) < 0.25

    def test_lsh_rows_shape(self):
        mh = MinHashLSH(num_perm=64, bands=16)
        out = mh(_doc_table(["one two three four", "five six seven eight"]))
        assert out.num_rows == 2 * 16
        assert out.column_names == ["band", "bucket", "doc_id"]

    def test_candidate_pairs(self):
        g = pa.table({"band": [0, 0, 0], "bucket": [1, 1, 1],
                      "doc_id": pa.array([30, 10, 20], type=pa.int64())})
        p = candidate_pairs_from_group(g)
        assert sorted(zip(p["doc_a"].to_pylist(), p["doc_b"].to_pylist())) == \
            [(10, 20), (10, 30), (20, 30)]

    def test_shingles_respect_doc_boundaries(self):
        texts = ["a b c d", "c d a b"]
        row_idx, terms = split_and_normalize(pa.array(texts))
        th = fnv1a64_array(terms)
        rows, hashes = shingle_hashes(row_idx, th, 2, k=3)
        # doc0 windows: abc,bcd ; doc1: cda,dab — no cross-doc window equality
        assert rows.tolist() == [0, 0, 1, 1]
        assert len(set(hashes.tolist())) == 4


class TestSimHash:
    def test_identical_same_hash_and_chunks(self):
        t = _doc_table(["hello world foo bar"] * 2)
        out = SimHash()(t)
        assert out["simhash"][0].as_py() == out["simhash"][1].as_py()

    def test_hamming(self):
        a = np.array([0b1011, 0], dtype=np.int64)
        b = np.array([0b0010, 7], dtype=np.int64)
        assert hamming64(a, b).tolist() == [2, 3]

    def test_near_docs_low_hamming(self):
        words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lam mu nu xi omicron pi rho sigma tau upsilon").split()
        a = " ".join(words * 3)
        b = " ".join(words * 3) + " extra"
        c = " ".join(f"z{w}q" for w in words)
        out = SimHash()(_doc_table([a, b, c]))
        sh = np.asarray(out["simhash"].to_pylist(), dtype=np.int64)
        assert hamming64(sh[:1], sh[1:2])[0] <= 6
        assert hamming64(sh[:1], sh[2:3])[0] > 10


class TestBlockPairScorer:
    """Blocked exact cosine self-join vs a brute-force oracle, forced onto
    the multi-block path (tiny parquet row groups → cross-block pairs)."""

    def _write_corpus(self, tmp_path, n=120, dim=6, seed=3):
        import pyarrow.parquet as pq
        rng = np.random.RandomState(seed)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        # plant near-duplicates across what will be different blocks
        vecs[97] = vecs[2] + 0.01 * rng.standard_normal(dim).astype(np.float32)
        vecs[55] = vecs[110] + 0.01 * rng.standard_normal(dim).astype(np.float32)
        ids = rng.permutation(n).astype(np.int64)  # ids unordered across blocks
        path = str(tmp_path / "emb.parquet")
        pq.write_table(pa.table({"vec_id": ids,
                                 "embedding": list(vecs)}),
                       path, row_group_size=16)
        return path, ids, vecs.astype(np.float64)

    def test_matches_bruteforce_across_blocks(self, tmp_path):
        from search_engine_ray.stages.similarity import (BlockPairScorer,
                                                         plan_row_group_blocks)
        path, ids, vecs = self._write_corpus(tmp_path)
        blocks = plan_row_group_blocks(path, target_rows=32)
        assert len(blocks) > 2                      # multi-block path engaged
        tau = 0.6
        scorer = BlockPairScorer(blocks, threshold=tau)
        parts = [scorer(pa.table({"i": pa.array([i], type=pa.int64()),
                                  "j": pa.array([j], type=pa.int64())}))
                 for i in range(len(blocks)) for j in range(i, len(blocks))]
        got = pa.concat_tables(parts)
        got_pairs = {(a, b): s for a, b, s in
                     zip(got["vec_a"].to_pylist(), got["vec_b"].to_pylist(),
                         got["cos_sim"].to_pylist())}
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vn @ vn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        want = {}
        for r, c in zip(iu, ju):
            if sims[r, c] >= tau:
                a, b = sorted((int(ids[r]), int(ids[c])))
                want[(a, b)] = sims[r, c]
        assert set(got_pairs) == set(want) and len(want) >= 2
        for k in want:
            assert abs(got_pairs[k] - want[k]) < 1e-12

    def test_empty_result_and_footer_only_planning(self, tmp_path):
        from search_engine_ray.stages.similarity import (BlockPairScorer,
                                                         plan_row_group_blocks)
        path, ids, _ = self._write_corpus(tmp_path)
        blocks = plan_row_group_blocks(path, target_rows=32)
        assert sum(len(b["row_groups"]) for b in blocks) == 120 // 16 + 1
        scorer = BlockPairScorer(blocks, threshold=1.1)  # nothing qualifies
        out = scorer(pa.table({"i": pa.array([0, 0], type=pa.int64()),
                               "j": pa.array([0, 1], type=pa.int64())}))
        assert out.num_rows == 0
        assert out.schema.names == ["vec_a", "vec_b", "cos_sim"]


class TestSimilarity:
    def test_cosine_topk_exact(self):
        rng = np.random.RandomState(0)
        vecs = rng.standard_normal((50, 8))
        tbl = pa.table({"vec_id": pa.array(range(50), type=pa.int64()),
                        "embedding": pa.array([list(map(float, v)) for v in vecs])})
        scorer = CosineScorer(vecs[:2], k=5)
        merged = merge_topk(scorer(tbl), 5)
        # brute-force reference
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for q in range(2):
            sims = vn @ vn[q]
            want = np.lexsort((np.arange(50), -sims))[:5]
            got = merged.filter(pa.compute.equal(merged["query_idx"], q))
            assert got["vec_id"].to_pylist() == want.tolist()
            assert got["vec_id"].to_pylist()[0] == q  # self is nearest

    def test_partial_topk_merge_across_batches(self):
        rng = np.random.RandomState(1)
        vecs = rng.standard_normal((100, 4))
        scorer = CosineScorer(vecs[:1], k=10)
        t1 = pa.table({"vec_id": pa.array(range(50), type=pa.int64()),
                       "embedding": pa.array([list(map(float, v)) for v in vecs[:50]])})
        t2 = pa.table({"vec_id": pa.array(range(50, 100), type=pa.int64()),
                       "embedding": pa.array([list(map(float, v)) for v in vecs[50:]])})
        merged = merge_topk(pa.concat_tables([scorer(t1), scorer(t2)]), 10)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        want = np.lexsort((np.arange(100), -(vn @ vn[0])))[:10]
        assert merged["vec_id"].to_pylist() == want.tolist()

    def test_hyperplane_lsh_buckets_near_vectors_together(self):
        rng = np.random.RandomState(2)
        v = rng.standard_normal((1, 16))
        near = v + rng.standard_normal((1, 16)) * 1e-3
        far = -v
        tbl = pa.table({"vec_id": pa.array([0, 1, 2], type=pa.int64()),
                        "embedding": pa.array([list(map(float, x[0]))
                                               for x in (v, near, far)])})
        out = HyperplaneLSH(dim=16)(tbl)
        df = out.to_pandas()
        for t in range(4):
            sub = df[df.table_id == t].set_index("vec_id")["bucket"]
            assert sub[0] == sub[1]
            assert sub[0] != sub[2]


class TestTextStats:
    def test_quality_stats(self):
        t = _doc_table(["one two three 42", ""])
        out = QualityStats()(t)
        assert out.num_rows == 1  # empty doc dropped
        r = out.to_pylist()[0]
        assert r["n_tokens"] == 4
        assert abs(r["mean_token_len"] - (3 + 3 + 5 + 2) / 4) < 1e-9
        assert abs(r["digit_ratio"] - 2 / 16) < 1e-9

    def test_lang_id(self):
        t = _doc_table(["the cat and the dog are in the house with all of them",
                        "el perro y el gato en la casa de los padres con una",
                        "zzz qqq www"])
        out = LangId()(t).to_pylist()
        assert out[0]["pred_lang"] == "en"
        assert out[1]["pred_lang"] == "es"
        assert out[2]["pred_lang"] == "unknown"

    def test_fingerprint_order_sensitive(self):
        t = _doc_table(["alpha beta gamma", "gamma beta alpha", "alpha beta gamma"])
        out = Fingerprint()(t)["fingerprint"].to_pylist()
        assert out[0] == out[2]
        assert out[0] != out[1]

    def test_fingerprint_batching_independent(self):
        texts = [f"w{i} common words here w{i+1}" for i in range(20)]
        whole = Fingerprint()(_doc_table(texts))["fingerprint"].to_pylist()
        parts = []
        for i in range(0, 20, 7):
            parts += Fingerprint()(_doc_table(texts[i:i+7],
                                              ids=list(range(i, min(i+7, 20)))))[
                "fingerprint"].to_pylist()
        assert whole == parts


def test_quantize_embeddings_bounds_and_zero_vector():
    import numpy as np
    import pyarrow as pa
    from search_engine_ray.stages.similarity import QuantizeEmbeddings
    rng = np.random.default_rng(7)
    vecs = [rng.normal(size=16).astype(np.float32) * 0.3,
            np.zeros(16, dtype=np.float32),
            (rng.normal(size=16) * 50).astype(np.float32)]
    t = pa.table({"vec_id": pa.array([1, 2, 3], type=pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    out = QuantizeEmbeddings()(t).to_pandas()
    # zero vector → zero everything
    z = out[out.vec_id == 2].iloc[0]
    assert z.scale == 0 and z.q_sum == 0 and z.q_l1 == 0 and z.max_err == 0
    for vid, v in [(1, vecs[0]), (3, vecs[2])]:
        r = out[out.vec_id == vid].iloc[0]
        v64 = v.astype(np.float64)
        mx = np.abs(v64).max()
        q = np.floor(v64 * 127.0 / mx + 0.5)
        assert np.abs(q).max() <= 127          # fits int8, no -128
        assert r.q_sum == q.sum() and r.q_l1 == np.abs(q).sum()
        # reconstruction error is bounded by half a quantization step
        assert r.max_err <= mx / 254 + 1e-6


class TestSemanticDedup:
    def test_greedy_keeps_lowest_id_of_each_dup_set(self):
        from search_engine_ray.stages.similarity import greedy_semantic_keep
        a = np.array([1.0, 0.0, 0.0])
        b = np.array([0.0, 1.0, 0.0])
        # rows in ascending-id order: a, a (dup), b, a-again (dup), b (dup)
        vecs = np.stack([a, a, b, a, b])
        keep = greedy_semantic_keep(vecs, threshold=0.9)
        assert keep.tolist() == [True, False, True, False, False]

    def test_greedy_below_threshold_all_kept(self):
        from search_engine_ray.stages.similarity import greedy_semantic_keep
        rng = np.random.default_rng(0)
        v = rng.normal(size=(8, 16))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        assert greedy_semantic_keep(v, threshold=1.01).all()

    def test_greedy_transitive_chain_keeps_first_only(self):
        from search_engine_ray.stages.similarity import greedy_semantic_keep
        # c0·c1 ≈ c1·c2 ≈ cos(25°) > τ, but c0·c2 ≈ cos(50°) < τ: greedy
        # drops c1 against c0, then KEEPS c2 (only kept rows are compared)
        th = np.deg2rad([0.0, 25.0, 50.0])
        vecs = np.stack([np.cos(th), np.sin(th)], axis=1)
        keep = greedy_semantic_keep(vecs, threshold=np.cos(np.deg2rad(30)))
        assert keep.tolist() == [True, False, True]


    def test_cell_cap_enforced(self, ray_session):
        # a cell bigger than max_cell_floats must raise with the n_cells
        # remedy instead of OOMing the map_groups worker
        import pytest
        from search_engine_ray.pipelines.queries import q_semantic_dedup
        with pytest.raises(Exception, match="max_cell_floats"):
            q_semantic_dedup("/root/testdata/sf0.001",
                             max_cell_floats=8).materialize()


class TestSpanDedup:
    def test_duplicated_span_found_across_docs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from search_engine_ray.pipelines.queries import q_span_dedup
        shared = "one two three four five six seven eight"
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([f"prefix {shared} tail-a",
                              f"other start {shared} tail-b",
                              "no overlap here at all in this document x"],
                             type=pa.string())})
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_span_dedup(str(tmp_path)).to_pandas()
        # every 8-token window fully inside the shared run dups across
        # docs 1 and 2; doc 3 contributes nothing
        assert (out["df"] == 2).all() and len(out) >= 1
        assert (out["n_occ"] == 2 * out["df"] / 2).all()

    def test_no_dup_spans_empty(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from search_engine_ray.pipelines.queries import q_span_dedup
        t = pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["a b c d e f g h", "p q r s t u v w"],
                             type=pa.string())})
        pq.write_table(t, tmp_path / "documents.parquet")
        assert q_span_dedup(str(tmp_path)).count() == 0


class TestNgramJaccardPairs:
    def _corpus(self, tmp_path):
        import pyarrow.parquet as pq
        base = ("key agg row scan slow fast table value part hash "
                "merge batch line sort window group")
        near = base.replace("slow fast", "slow quick")   # 2 shingle edits
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array([base, base, near,
                              "entirely different words in this one doc"],
                             type=pa.string())})
        pq.write_table(t, tmp_path / "documents.parquet")
        return str(tmp_path)

    def test_exact_pairs_and_jaccard_values(self, ray_session, tmp_path):
        from search_engine_ray.pipelines.queries import q_ngram_jaccard_pairs
        sf = self._corpus(tmp_path)
        out = q_ngram_jaccard_pairs(sf, threshold=0.5).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (1, 2) in pairs                      # exact dup: jaccard 1.0
        dup = out[(out["doc_a"] == 1) & (out["doc_b"] == 2)].iloc[0]
        assert dup["jaccard"] == 1.0 and dup["inter"] == dup["n_a"] == dup["n_b"]
        assert (1, 3) in pairs and (2, 3) in pairs  # near dup
        near = out[(out["doc_a"] == 1) & (out["doc_b"] == 3)].iloc[0]
        assert 0.5 <= near["jaccard"] < 1.0
        assert not any(4 in p for p in pairs)

    def test_loose_max_df_equals_exact(self, ray_session, tmp_path):
        from search_engine_ray.pipelines.queries import q_ngram_jaccard_pairs
        sf = self._corpus(tmp_path)
        exact = q_ngram_jaccard_pairs(sf, threshold=0.5).to_pandas()
        capped = q_ngram_jaccard_pairs(sf, threshold=0.5,
                                       max_df=10**6).to_pandas()
        assert exact.equals(capped)

    def test_tight_max_df_lower_bounds(self, ray_session, tmp_path):
        from search_engine_ray.pipelines.queries import q_ngram_jaccard_pairs
        sf = self._corpus(tmp_path)
        # every shingle of docs 1/2 has df>=2; max_df=1 kills all pairing
        assert q_ngram_jaccard_pairs(sf, threshold=0.0,
                                     max_df=1).count() == 0
        # df<=2 drops only the grams shared by all of 1,2,3: surviving
        # jaccards are lower bounds of the exact ones, never higher
        exact = q_ngram_jaccard_pairs(sf, threshold=0.0).to_pandas()
        lb = q_ngram_jaccard_pairs(sf, threshold=0.0, max_df=2).to_pandas()
        ex = {(a, b): j for a, b, j in
              zip(exact["doc_a"], exact["doc_b"], exact["jaccard"])}
        for a, b, j in zip(lb["doc_a"], lb["doc_b"], lb["jaccard"]):
            assert j <= ex[(a, b)] + 1e-12


def test_shingle_mults_any_k():
    # k > 5 used to IndexError (the multiplier table had 5 constants);
    # first five stay pinned so existing shingle hashes are unchanged
    import numpy as np
    from search_engine_ray.stages.dedup import _shingle_mults, shingle_hashes
    m5 = _shingle_mults(5)
    assert m5[0] == np.uint64(0x9E3779B97F4A7C15)
    m13 = _shingle_mults(13)
    assert (m13[:5] == m5).all()
    assert len(set(m13.tolist())) == 13          # distinct
    assert all(int(x) % 2 == 1 for x in m13)     # odd
    row_idx = np.zeros(20, dtype=np.int64)
    th = (np.arange(20, dtype=np.uint64) + 1) * np.uint64(2654435761)
    rows, hashes = shingle_hashes(row_idx, th, 1, k=8)
    assert rows.size == 20 - 8 + 1


def test_cosine_scorer_tie_break_batch_invariant():
    # identical vectors: which ids survive the per-batch partial top-k must
    # follow the documented (-sim, vec_id) order, not argpartition's
    # array-position accidents — and must not depend on block splits
    import numpy as np
    import pyarrow as pa
    from search_engine_ray.stages.similarity import CosineScorer, merge_topk
    q = np.ones((1, 4))
    vec = [1.0, 1.0, 1.0, 1.0]
    ids = [10, 3, 7, 1, 5]
    scorer = CosineScorer(q, k=2)
    whole = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([vec] * 5)})
    got_whole = merge_topk(scorer(whole), 2)["vec_id"].to_pylist()
    parts = [scorer(whole.slice(0, 3)), scorer(whole.slice(3, 2))]
    got_split = merge_topk(pa.concat_tables(parts), 2)["vec_id"].to_pylist()
    assert got_whole == got_split == [1, 3]
