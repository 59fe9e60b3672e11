"""t-digest quantile sketch: accuracy bounds, merge invariance, pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.stages.sketch import TDigest


def test_quantile_accuracy_uniform():
    rng = np.random.RandomState(0)
    v = rng.uniform(0, 1000, size=200_000)
    d = TDigest.of(v)
    for q in [0.01, 0.1, 0.5, 0.9, 0.95, 0.99]:
        exact = np.quantile(v, q)
        est = float(d.quantile(q)[0])
        # rank error: position of the estimate within the sorted data
        rank = np.searchsorted(np.sort(v), est) / v.size
        assert abs(rank - q) < 0.01, (q, exact, est)


def test_quantile_accuracy_skewed():
    rng = np.random.RandomState(1)
    v = np.exp(rng.standard_normal(100_000) * 3)    # heavy lognormal tail
    d = TDigest.of(v)
    for q in [0.5, 0.95, 0.99]:
        est = float(d.quantile(q)[0])
        rank = np.searchsorted(np.sort(v), est) / v.size
        assert abs(rank - q) < 0.01, (q, est)


def test_bounded_centroids_and_minmax():
    rng = np.random.RandomState(2)
    d = TDigest(delta=128)
    for _ in range(50):
        d.add(rng.standard_normal(10_000))
    assert d.means.size <= 128        # memory bound independent of count
    assert d.count == 500_000
    q = d.quantile([0.0, 1.0])
    assert q[0] >= d.vmin and q[1] <= d.vmax


def test_merge_order_independent():
    rng = np.random.RandomState(3)
    parts = [TDigest.of(rng.uniform(i, i + 10, 5000)) for i in range(8)]
    a = TDigest.merge_all(parts)
    b = TDigest.merge_all(parts[::-1])
    assert np.array_equal(a.means, b.means)
    assert np.array_equal(a.weights, b.weights)


def test_merge_matches_single_pass_accuracy():
    rng = np.random.RandomState(4)
    chunks = [rng.uniform(0, 100, 20_000) for _ in range(10)]
    allv = np.concatenate(chunks)
    merged = TDigest.merge_all([TDigest.of(c) for c in chunks])
    for q in [0.5, 0.95, 0.99]:
        est = float(merged.quantile(q)[0])
        rank = np.searchsorted(np.sort(allv), est) / allv.size
        assert abs(rank - q) < 0.015, (q, est)


def test_serialization_roundtrip():
    d = TDigest.of(np.arange(1000.0))
    m, w = d.to_lists()
    d2 = TDigest.from_lists(m, w)
    assert np.array_equal(d.means, d2.means)
    assert np.array_equal(d.weights, d2.weights)
    assert (d2.vmin, d2.vmax) == (0.0, 999.0)


def test_empty_and_nan():
    d = TDigest()
    assert np.isnan(d.quantile(0.5)[0])
    d.add(np.array([np.nan, np.nan]))
    assert np.isnan(d.quantile(0.5)[0])
    d.add(np.array([5.0, np.nan]))
    assert float(d.quantile(0.5)[0]) == 5.0


def test_pipeline_close_to_exact(ray_session):
    """Driver query: t-digest per-type quantile estimates land within a
    small RANK error of the true quantile (the sketch's actual guarantee;
    absolute error at p99 of a ~200-value group is not meaningful)."""
    import pyarrow.parquet as pq
    from search_engine_ray.pipelines.queries import (
        q_event_value_quantiles, q_event_value_quantiles_tdigest)
    sf = "/root/testdata/sf0.001"
    exact = q_event_value_quantiles(sf).to_pandas() \
        .set_index("event_type").sort_index()
    approx = q_event_value_quantiles_tdigest(sf).to_pandas() \
        .set_index("event_type").sort_index()
    assert list(exact.index) == list(approx.index)
    t = pq.read_table(sf + "/events.parquet",
                      columns=["event_type", "value"])
    et = t["event_type"].to_numpy(zero_copy_only=False)
    vals = t["value"].to_numpy(zero_copy_only=False)
    for typ in exact.index:
        v = np.sort(vals[et == typ])
        for col, q in [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]:
            rank = np.searchsorted(v, approx.loc[typ, col]) / v.size
            assert abs(rank - q) <= 0.03, (typ, col, rank)


def test_exact_quantiles_group_cap_enforced(ray_session):
    from search_engine_ray.pipelines.queries import q_event_value_quantiles
    with pytest.raises(Exception, match="max_group_rows"):
        q_event_value_quantiles("/root/testdata/sf0.001",
                                max_group_rows=1).to_pandas()


# ---- HyperLogLog ----

def test_hll_accuracy():
    from search_engine_ray.stages.sketch import HyperLogLog
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 2**62, size=100_000).astype(np.uint64)
    n_true = np.unique(vals).size
    est = HyperLogLog(p=12).add_hashes(vals).estimate()
    assert abs(est - n_true) / n_true < 0.05


def test_hll_batching_invariant():
    """Registers are a pointwise max — ANY chunking yields the same
    state (this is why the pipeline output is deterministic)."""
    from search_engine_ray.stages.sketch import HyperLogLog
    rng = np.random.RandomState(6)
    vals = rng.randint(0, 2**62, size=50_000).astype(np.uint64)
    one = HyperLogLog().add_hashes(vals)
    parts = HyperLogLog()
    for chunk in np.array_split(vals, 17):
        parts.merge(HyperLogLog().add_hashes(chunk))
    assert np.array_equal(one.registers, parts.registers)


def test_hll_small_range_linear_counting():
    from search_engine_ray.stages.sketch import HyperLogLog
    vals = np.arange(200, dtype=np.uint64)
    est = HyperLogLog().add_hashes(vals).estimate()
    assert abs(est - 200) <= 6       # linear-counting regime: near exact


def test_hll_pipeline_close_to_exact(ray_session):
    from search_engine_ray.pipelines.queries import (
        q_event_user_reach, q_event_user_reach_hll)
    sf = "/root/testdata/sf0.001"
    exact = q_event_user_reach(sf).to_pandas() \
        .set_index("event_type").sort_index()["n_users"]
    approx = q_event_user_reach_hll(sf).to_pandas() \
        .set_index("event_type").sort_index()["approx_users"]
    assert list(exact.index) == list(approx.index)
    assert ((exact - approx).abs() / exact).max() < 0.05


# ---- Misra-Gries ----

def test_mg_heavy_hitters_guaranteed():
    from search_engine_ray.stages.sketch import MisraGries
    rng = np.random.RandomState(7)
    # zipf-ish: item i appears ~ 10000/i times
    items = np.concatenate([np.full(10_000 // (i + 1), i)
                            for i in range(500)])
    rng.shuffle(items)
    mg = MisraGries(capacity=64)
    for chunk in np.array_split(items, 23):
        mg.add(chunk)
    top, counts = mg.top_k(5)
    true = {i: 10_000 // (i + 1) for i in range(5)}
    assert set(top) == set(true)                 # heavy head always kept
    for it, c in zip(top, counts):
        assert c <= true[int(it)]                # lower bound
        assert true[int(it)] - c <= mg.n // 64   # within error budget


def test_mg_merge_order_independent():
    from search_engine_ray.stages.sketch import MisraGries
    rng = np.random.RandomState(8)
    parts = []
    for _ in range(6):
        p = MisraGries(capacity=32)
        p.add(rng.zipf(1.5, size=5000).astype(np.int64))
        parts.append(p)
    a = MisraGries.merge_all(parts, 32)
    b = MisraGries.merge_all(parts[::-1], 32)
    assert np.array_equal(a.items, b.items)
    assert np.array_equal(a.counts, b.counts)


def test_mg_pipeline_matches_exact_head(ray_session):
    """On the zipf-headed synthetic corpus the MG top-10 must equal the
    exact top-10 (head counts ≫ n/capacity error)."""
    from search_engine_ray.pipelines.queries import (
        q_top_terms, q_top_terms_sketch)
    sf = "/root/testdata/sf0.001"
    exact = q_top_terms(sf, 10).to_pandas()
    approx = q_top_terms_sketch(sf).to_pandas()
    assert list(approx["item"]) == list(exact["term"])
    assert (approx["est_count"] <= exact["total_tf"]).all()
    assert ((exact["total_tf"] - approx["est_count"])
            <= approx["err_bound"]).all()


def test_cm_bounds_and_merge_invariance():
    from search_engine_ray.stages.sketch import CountMin
    from search_engine_ray.functions.hashing import fnv1a64_array
    import pyarrow as pa
    rng = np.random.RandomState(9)
    items = rng.zipf(1.3, size=40_000).astype(np.int64) % 5000
    strs = pa.array([f"t{i}" for i in items])
    h = fnv1a64_array(strs)
    whole = CountMin(width=1024, depth=4).add(h, np.ones(len(items)))
    # split into 7 partials in two different orders → identical tables
    parts = np.array_split(np.arange(len(items)), 7)
    def build(order):
        cms = [CountMin(1024, 4).add(h[ix], np.ones(ix.size)) for ix in
               [parts[i] for i in order]]
        out = cms[0]
        for c in cms[1:]:
            out.merge(c)
        return out
    a, b = build(range(7)), build(reversed(range(7)))
    assert np.array_equal(a.table, b.table) and a.n == b.n
    assert np.array_equal(a.table, whole.table)
    # bounds: est >= truth, overestimate within e*n/width (w.h.p.)
    import collections
    true = collections.Counter(items)
    probe = pa.array([f"t{i}" for i in sorted(true)])
    est = whole.estimate(fnv1a64_array(probe))
    tr = np.array([true[i] for i in sorted(true)])
    assert (est >= tr).all()
    assert (est - tr <= np.e * len(items) / 1024 * 3).all()


def test_cm_pipeline_upper_bounds_exact(ray_session):
    from search_engine_ray.pipelines.queries import q_term_df, q_term_freq_cm
    sf = "/root/testdata/sf0.001"
    exact = q_term_df(sf).to_pandas().set_index("term")["total_tf"]
    got = q_term_freq_cm(sf).to_pandas()
    for _, r in got.iterrows():
        t = exact.get(r["term"], 0)
        assert r["est_count"] >= t
        assert r["est_count"] - t <= np.e * r["n_total"] / 2048 * 3
