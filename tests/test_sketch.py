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
