"""Golden snapshots for the rows-only driver queries.

The driver's oracle check can't verify values for non-SQL-expressible
pipelines (seeded LSH candidate generation, approximate ANN, media); these
snapshots pin their EXACT outputs on the deterministic sf0.001 corpus so a
behavior change can't land silently.  If a change is intentional, update
the digests (printed on failure).
"""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"

# sha256 of the canonicalized result table (sorted columns, sorted rows,
# repr-stable formatting) — computed on the sf0.001 testdata
GOLDEN = {
    "minhash_neardup":
        "61b92dc10187a18842eb81eafef679d773d63d07d25ab3e4dbc32f3139c12042",
    # minhash pairs → connected components → min-docID survivor per cluster
    "minhash_dedup_keep":
        "e07130fabccefd56eb364d18dd24c3f6270f6982d326ca202cac72beec5bdba6",
    "simhash_neardup":
        "6312a4dbcf618ff8fa4f98a08b20190f771de80da19626d3558e3135cf0835de",
    "embedding_neardup":
        "eb51064db0bd677bf7d561ba36b085b2ae9b20551bb5ff2a3ae6f6f0479cccb6",
    "fingerprints":
        "b9ee54c511000a97bd4f7cf44bfa4c2ede984df877c2853f6b7c313e92978684",
    "lang_id_counts":
        "8f802d8c7038a132e4347e1ad3616d5456ad881c03fe78aeb79bdbb357dbb245",
    # seeded (seed=42) sample-trained k-means → deterministic probe results
    "ivf_topk":
        "9f99b273a906abb1e1b2a1fcd5e024e1ee8423b802fa7c8c3c1e6f06e1a7fd61",
    # Philox-seeded pages → deterministic boilerplate df counts + rebuild
    # (re-pinned when the v2 corpus gained constant-anchor footer outlinks:
    # n_paras/n_dropped grew per page, clean_hash stayed identical)
    "boilerplate_removal":
        "ec2b7b6fb3769063f4dcb6d5e19adea50a28c5f9f2e1b4f6e5f1487ee3eb7b59",
    # Philox-seeded outlinks → deterministic host graph; the pagerank
    # kernel itself is SQL-oracle-checked via nation_trade_pagerank
    "host_pagerank":
        "09d62af097aaee7e07b37d56d6701b2f8000861389f30fec949373edcec9e183",
    # Philox-seeded pages corpus → deterministic URL parse + host aggregate
    "url_host_stats":
        "9ada3e9eddabc15361e1f8d3dc6a2f3aa91e4f79fdb33e56d0535d05912746fd",
    # synthesized fake media payloads are Philox-seeded → deterministic
    "media_frame_stats":
        "441d8dbe72de432a8e638be5661d3c432a4fc3e39693fe7399ac3fdbca7e52fb",
    # REAL containers end-to-end (seeded AVI → PNG frames → decode stats)
    "media_real_stats":
        "3c294ae2f217060c7d450008c2332dc9befc0e8712a4907a9b2398f5b3a7ca33",
    # fixed block/batch sizing → deterministic partial digests + an
    # order-independent merge (stages/sketch.py merge_all)
    "event_value_quantiles_tdigest":
        "2966d73c0644bdc0f3988c4ceb9b5597ee860879a7d0e89236f28c76348900eb",
    # HLL registers are a pointwise max → batching-invariant
    "event_user_reach_hll":
        "1cc01782fe40e84debdcaf1459d4376ed1e96a22012cb928e72f1532a6880851",
    # deterministic batching + one order-independent final compaction
    "top_terms_sketch":
        "a7b6f7b275c46e5c6ab2d997da82f0fd966bd2bdddc61a99675af8d3ad13cc19",
    # integer counter sums → exactly batching/merge-order invariant
    "term_freq_cm":
        "89b7e2dbfc38d6264e0c710da48dc765e6918a002c8b1fe3fe0d85ddca66beeb",
    # exact word counts + lexicographic merge tie-break → deterministic
    "bpe_token_counts":
        "b945124231646120c71190c4496989082881fdd5ec6077ef7ddbc77b5da53ed7",
    # seeded (seed=42) sampled k-means cells + greedy keep-lowest-id →
    # deterministic regardless of batching (dedup sorts inside the cell).
    # The catalog's `semantic_dedup` now uses deterministic first-k
    # centroids and is SQL-oracle-checked (SQL_SEMANTIC_DEDUP); this pin
    # covers the k-means-TRAINED production path (centroids="train").
    "semantic_dedup_kmeans":
        "b4fda3df83662bb91e712fbeaf5864ae95fd808ecfab90c05e28a6eaad6cc740",
    # doc_snippets graduated to a real SQL oracle (round 4): the excerpt is
    # rendered over the kept-token stream, which DuckDB rebuilds verbatim
    # (_sql_doc_snippets); raw-text render parity is pinned in
    # tests/test_snippet.py::test_doc_snippets_matches_raw_render
}


def canonical_digest(result) -> str:
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = pd.DataFrame(result)
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(body.encode()).hexdigest()


def _overrides():
    """Pinned variants that aren't catalog entries under the same name."""
    from search_engine_ray.pipelines.queries import q_semantic_dedup
    return {"semantic_dedup_kmeans":
            lambda sf: q_semantic_dedup(sf, centroids="train")}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_rows_only_query_snapshot(name, ray_session):
    from search_engine_ray.pipelines.queries import QUERIES
    fn = _overrides().get(name) or QUERIES[name]
    got = canonical_digest(fn(SF))
    assert got == GOLDEN[name], (
        f"{name} snapshot changed: {got} (update GOLDEN if intentional)")
