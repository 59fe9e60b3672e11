"""Spot-check of the driver contract: Ray queries vs DuckDB oracles at
sf0.001 (the full-catalog sweep lives in tools/check_contract.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings", "events", "lineitem", "customer",
          "orders", "supplier", "nation", "region", "part"]
KEYS = ["term_df", "dedup_exact", "bm25_scores", "cosine_scores",
        "lineitem_pricing", "doc_keywords", "unigram_nll",
        "embedding_pairs_exact", "term_suggest", "hybrid_rrf",
        "classifier_scores", "bm25f_topk", "mlt_topk", "prf_topk",
        "bigram_lm", "user_retention", "term_pmi",
        "order_revenue_topk", "regional_trade_volume",
        "user_running_stats", "span_dedup", "user_type_pivot",
        "lineitem_rollup", "orders_monthly", "lineitem_corr_stats",
        "lineitem_cube", "user_mode_type", "user_moving_avg",
        "source_temperature_mix", "order_ntile", "customer_order_profile",
        "event_value_median", "source_lang_profile", "span_dedup_cut",
        "bm25_explain", "decontaminated_corpus", "event_type_transitions",
        "promo_revenue_share", "source_capped_sample", "snippet_windows",
        "ngram_jaccard_pairs", "doc_snippets"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6) + 0.0
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("key", KEYS)
def test_query_matches_oracle(key, duck, ray_session):
    import __ray_entry__ as entrymod
    fn = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    res = fn(SF)
    import ray
    import ray.data
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        tables = [t for t in (ray.get(r) for r in res.to_arrow_refs())
                  if t.num_rows]
        got = pa.concat_tables(tables, promote_options="default").to_pandas()
    elif isinstance(res, pa.Table):
        got = res.to_pandas()
    else:
        got = res
    want = duck.execute(sql).fetchdf()
    got, want = _canon(got), _canon(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-6, rtol=0)


@pytest.mark.parametrize("n", [601, 600, 7])
def test_median_exact_on_pathological_distributions(n, ray_session,
                                                    tmp_path, monkeypatch):
    """Histogram-narrowing median stays exact when 60% of the mass sits at
    one point (the candidate bin never shrinks) and on tiny odd/even n —
    forced through the recursion path with toy bins/caps."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from search_engine_ray.pipelines import queries as Q
    rng = np.random.default_rng(n)
    vals = np.concatenate([np.full(int(n * 0.6), 5.0),
                           rng.uniform(-10, 30, n - int(n * 0.6))])
    rng.shuffle(vals)
    pq.write_table(pa.table({"value": vals}),
                   str(tmp_path / "events.parquet"))
    monkeypatch.setattr(Q, "_MEDIAN_BINS", 16)
    monkeypatch.setattr(Q, "_MEDIAN_MAX_CANDIDATES", 8)
    got = Q.q_event_value_median(str(tmp_path))
    assert got["n_values"][0].as_py() == n
    want = round(float(np.median(vals)), 6)
    assert got["median_value"][0].as_py() == pytest.approx(want, abs=1e-6)
