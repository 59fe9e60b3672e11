"""Bloom filter: no-false-negative guarantee, merge invariance, FP-rate
sanity, and the bloom incremental-dedup pipeline vs the exact variant."""

import numpy as np
import pyarrow as pa

from search_engine_ray.stages.bloom import Bloom, combine_bloom_rows


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.RandomState(11)
    present = rng.randint(-2**62, 2**62, size=5000).astype(np.int64)
    absent = rng.randint(-2**62, 2**62, size=5000).astype(np.int64)
    absent = absent[~np.isin(absent, present)]
    b = Bloom(m_bits=1 << 17, k=6).add(present)
    assert b.contains(present).all()          # NEVER a false negative
    fp = b.contains(absent).mean()
    # theoretical fp ≈ (1 - e^{-kn/m})^k ≈ 0.0086 at n=5000, m=131072, k=6
    assert fp < 0.03


def test_bloom_merge_order_invariance():
    rng = np.random.RandomState(12)
    h = rng.randint(-2**62, 2**62, size=9000).astype(np.int64)
    whole = Bloom(m_bits=1 << 14, k=4).add(h)
    parts = np.array_split(h, 5)

    def build(order):
        out = Bloom(m_bits=1 << 14, k=4)
        for i in order:
            out.merge(Bloom(m_bits=1 << 14, k=4).add(parts[i]))
        return out

    a, b = build(range(5)), build(reversed(range(5)))
    assert np.array_equal(a.bits, b.bits)
    assert np.array_equal(a.bits, whole.bits)


def test_combine_bloom_rows_matches_direct():
    rng = np.random.RandomState(13)
    h = rng.randint(-2**62, 2**62, size=4000).astype(np.int64)
    rows = []
    for chunk in np.array_split(h, 7):
        rows.append(Bloom(m_bits=1 << 14, k=4).add(chunk).bits.tobytes())
    t = pa.table({"g": pa.array([0] * 7, type=pa.int32()),
                  "bloom_bits": pa.array(rows, type=pa.binary())})
    out = combine_bloom_rows(t, m_bits=1 << 14)
    acc = np.frombuffer(out["bloom_bits"][0].as_py(), dtype=np.uint64)
    assert np.array_equal(acc, Bloom(m_bits=1 << 14, k=4).add(h).bits)


def test_bloom_incremental_matches_exact(ray_session):
    from search_engine_ray.pipelines.queries import (
        q_dedup_incremental, q_dedup_incremental_bloom)
    sf = "/root/testdata/sf0.001"
    exact = (q_dedup_incremental(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    got = (q_dedup_incremental_bloom(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(exact)


def test_bloom_incremental_tiny_filter_still_exact(ray_session):
    """An undersized filter (high FP rate) must still give the EXACT
    answer — false positives only route more groups through the exact
    verify, never drop a new document."""
    from search_engine_ray.pipelines.queries import (
        q_dedup_incremental, q_dedup_incremental_bloom)
    sf = "/root/testdata/sf0.001"
    exact = (q_dedup_incremental(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    got = (q_dedup_incremental_bloom(sf, m_bits=256, k=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(exact)


def test_bloom_incremental_true_dups_dropped(ray_session, tmp_path):
    """Fixture with REAL corpus∩new duplicate texts: the distributed
    confirm path (candidate bloom → corpus pair scan → exact (h1,h2)
    joins) must drop exactly the true dups and keep the near-miss whose
    h1 bloom-collides but whose text is new."""
    import pyarrow.parquet as pq
    from search_engine_ray.pipelines.queries import (
        q_dedup_incremental, q_dedup_incremental_bloom)
    texts = {
        0: "shared alpha text",        # corpus
        2: "corpus only beta",         # corpus
        4: "another corpus gamma",     # corpus
        1: "shared alpha text",        # new, TRUE dup of 0 → dropped
        3: "genuinely new delta",      # new, unique → kept
        5: "shared alpha text",        # new, dup of 0 (and of 1) → dropped
        7: "genuinely new delta",      # new, within-batch copy of 3
        9: "corpus only beta",         # new, TRUE dup of 2 → dropped
    }
    t = pa.table({"doc_id": pa.array(list(texts), type=pa.int64()),
                  "text": pa.array(list(texts.values()), type=pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    sf = str(tmp_path)
    exact = (q_dedup_incremental(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    # undersized filter (every group bloom-positive) exercises the scan +
    # join confirm path hard
    got = (q_dedup_incremental_bloom(sf, m_bits=64, k=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(exact)
    assert got["doc_id"].tolist() == [3]
    assert got["n_batch_copies"].tolist() == [2]
