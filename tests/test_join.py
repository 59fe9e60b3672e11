"""Distributed hash join + broadcast dim lookup (stages/join.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_hash_join_inner_matches_arrow(ray_session):
    from search_engine_ray.stages.join import hash_join
    rng = np.random.default_rng(3)
    left = pa.table({"k": rng.integers(0, 50, 200),
                     "lv": np.arange(200, dtype=np.int64)})
    right = pa.table({"rk": np.arange(0, 60, 2, dtype=np.int64),
                      "rv": np.arange(30, dtype=np.int64) * 10})
    got = hash_join(_ds(left), _ds(right), left_key="k", right_key="rk",
                    n_buckets=8).to_pandas().sort_values(
        ["k", "lv"]).reset_index(drop=True)
    want = left.join(right, keys="k", right_keys="rk",
                     join_type="inner").to_pandas().sort_values(
        ["k", "lv"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got[["k", "lv", "rv"]].values ==
            want[["k", "lv", "rv"]].values).all()


def test_hash_join_string_keys(ray_session):
    from search_engine_ray.stages.join import hash_join
    left = pa.table({"name": ["a", "b", "c", "a"],
                     "x": [1, 2, 3, 4]})
    right = pa.table({"name": ["a", "c", "z"], "y": [10, 30, 99]})
    got = hash_join(_ds(left, 2), _ds(right, 2), left_key="name",
                    right_key="name", n_buckets=4).to_pandas() \
        .sort_values(["name", "x"]).reset_index(drop=True)
    assert list(got["name"]) == ["a", "a", "c"]
    assert list(got["y"]) == [10, 10, 30]


def test_hash_join_rejects_column_collision(ray_session):
    from search_engine_ray.stages.join import hash_join
    left = _ds(pa.table({"k": [1], "v": [1]}))
    right = _ds(pa.table({"k2": [1], "v": [2]}))
    with pytest.raises(ValueError, match="collision"):
        hash_join(left, right, left_key="k", right_key="k2")


def test_broadcast_lookup_with_misses(ray_session):
    from search_engine_ray.stages.join import broadcast_lookup
    facts = _ds(pa.table({"nk": pa.array([2, 0, 7, 1], type=pa.int32()),
                          "v": [1.0, 2.0, 3.0, 4.0]}), 2)
    dim = pa.table({"nk": pa.array([0, 1, 2], type=pa.int32()),
                    "name": ["zero", "one", "two"]})
    out = broadcast_lookup(facts, dim, key="nk", dim_key="nk") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert list(out["name"]) == ["two", "zero", None, "one"]


def test_broadcast_lookup_empty_dim(ray_session):
    from search_engine_ray.stages.join import broadcast_lookup
    facts = _ds(pa.table({"nk": pa.array([2, 0], type=pa.int32()),
                          "v": [1.0, 2.0]}), 1)
    dim = pa.table({"nk": pa.array([], type=pa.int32()),
                    "name": pa.array([], type=pa.string())})
    out = broadcast_lookup(facts, dim, key="nk", dim_key="nk").to_pandas()
    assert len(out) == 2
    assert out["name"].isna().all()
    assert out["name"].dtype == object          # typed-null string column


def test_broadcast_lookup_null_probe_keys(ray_session):
    from search_engine_ray.stages.join import broadcast_lookup
    facts = _ds(pa.table({"nk": pa.array([2, None, 0], type=pa.int32()),
                          "v": [1.0, 2.0, 3.0]}), 1)
    dim = pa.table({"nk": pa.array([0, 2], type=pa.int32()),
                    "name": ["zero", "two"]})
    out = broadcast_lookup(facts, dim, key="nk", dim_key="nk") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert list(out["name"]) == ["two", None, "zero"]


@pytest.mark.parametrize("jt", ["left semi", "left anti"])
def test_hash_join_semi_anti_matches_arrow(ray_session, jt):
    from search_engine_ray.stages.join import hash_join
    rng = np.random.default_rng(7)
    left = pa.table({"k": rng.integers(0, 40, 150),
                     "lv": np.arange(150, dtype=np.int64)})
    # duplicate matches on the right must not multiply semi-join rows
    right = pa.table({"rk": np.repeat(np.arange(0, 40, 3, dtype=np.int64), 2)})
    got = hash_join(_ds(left), _ds(right), left_key="k", right_key="rk",
                    n_buckets=8, join_type=jt).to_pandas().sort_values(
        ["k", "lv"]).reset_index(drop=True)
    want = left.join(right, keys="k", right_keys="rk",
                     join_type=jt).to_pandas().sort_values(
        ["k", "lv"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got[["k", "lv"]].values == want[["k", "lv"]].values).all()
    match = set(right["rk"].to_pylist())
    if jt == "left semi":
        assert got["k"].isin(match).all()
    else:
        assert ~got["k"].isin(match).any()


@pytest.mark.parametrize("join_type", ["inner", "left outer", "left semi",
                                       "left anti"])
def test_fs_and_groupby_exchanges_agree(ray_session, join_type):
    from search_engine_ray.stages.join import hash_join
    rng = np.random.default_rng(7)
    left = pa.table({"k": rng.integers(0, 40, 300),
                     "lv": np.arange(300, dtype=np.int64)})
    right = pa.table({"rk": np.arange(0, 80, 3, dtype=np.int64),
                      "rv": np.arange(27, dtype=np.int64) * 7})

    def run(exchange):
        df = hash_join(_ds(left), _ds(right), left_key="k", right_key="rk",
                       n_buckets=8, join_type=join_type,
                       exchange=exchange).to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    fs, gb = run("fs"), run("groupby")
    assert list(fs.columns) == list(gb.columns)
    assert len(fs) == len(gb) > 0
    assert fs.equals(gb)


def test_fs_join_string_keys_and_empty_side(ray_session):
    from search_engine_ray.stages.join import hash_join
    left = pa.table({"k": pa.array(["a", "b", "c", "a", None]),
                     "lv": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    right = pa.table({"rk": pa.array(["a", "c", "x"]),
                      "rv": pa.array([10, 30, 99], type=pa.int64())})
    got = hash_join(_ds(left, 2), _ds(right, 2), left_key="k",
                    right_key="rk", n_buckets=4,
                    exchange="fs").to_pandas()
    got = got.sort_values(["lv"]).reset_index(drop=True)
    assert got["lv"].tolist() == [1, 3, 4]        # null key never matches
    assert got["rv"].tolist() == [10, 30, 10]
    # empty probe side: result is empty but schema intact (no repartition —
    # Ray loses an empty dataset's schema through an all-to-all)
    import ray.data
    empty = pa.table({"k": pa.array([], pa.string()),
                      "lv": pa.array([], pa.int64())})
    out = hash_join(ray.data.from_arrow(empty), _ds(right, 2), left_key="k",
                    right_key="rk", n_buckets=4, exchange="fs")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "lv", "rv"}


@pytest.mark.parametrize("exchange", ["fs", "groupby"])
def test_hot_key_salting_identical_results(ray_session, exchange):
    from search_engine_ray.stages.join import hash_join
    rng = np.random.default_rng(11)
    # 90% of probe rows share one hot key; dim has several rows per key
    k = np.where(rng.random(2000) < 0.9, 7,
                 rng.integers(0, 40, 2000)).astype(np.int64)
    left = pa.table({"k": k, "lv": np.arange(2000, dtype=np.int64)})
    right = pa.table({"rk": np.repeat(np.arange(40, dtype=np.int64), 2),
                      "rv": np.arange(80, dtype=np.int64)})

    def run(**kw):
        df = hash_join(_ds(left, 4), _ds(right, 2), left_key="k",
                       right_key="rk", n_buckets=8, exchange=exchange,
                       **kw).to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    plain = run()
    salted = run(hot_keys=[7], salt=4)
    assert len(plain) == len(salted) > 2000   # hot key fans out ×2 dim rows
    assert plain.equals(salted)


def test_hot_key_salting_string_keys(ray_session):
    from search_engine_ray.stages.join import hash_join
    left = pa.table({"k": pa.array(["hot"] * 50 + ["a", "b", "c"]),
                     "lv": pa.array(range(53), type=pa.int64())})
    right = pa.table({"rk": pa.array(["hot", "a", "z"]),
                      "rv": pa.array([1, 2, 3], type=pa.int64())})
    plain = hash_join(_ds(left, 2), _ds(right, 1), left_key="k",
                      right_key="rk", n_buckets=4).to_pandas()
    salted = hash_join(_ds(left, 2), _ds(right, 1), left_key="k",
                       right_key="rk", n_buckets=4, hot_keys=["hot"],
                       salt=3).to_pandas()
    key = lambda d: d.sort_values(list(d.columns)).reset_index(drop=True)
    assert key(plain).equals(key(salted))
    assert len(salted) == 51


def test_per_key_head_k_matches_bruteforce(ray_session):
    # the shared keeper-set combiner (q_source_capped_sample + curate's
    # domain cap): global lowest-k per key must survive the map-side
    # combine regardless of how rows split across blocks
    import pandas as pd
    from search_engine_ray.stages.join import per_key_head_k
    rng = np.random.default_rng(11)
    keys = rng.choice(["a", "b", "mega", "d"], size=300,
                      p=[0.1, 0.1, 0.7, 0.1])
    ids = rng.permutation(300).astype(np.int64)
    t = pa.table({"source": keys, "doc_id": ids})
    got = per_key_head_k(_ds(t, 7), key="source", order_col="doc_id",
                         k=5).to_pandas()
    want = (t.to_pandas().sort_values("doc_id").groupby("source")
            .head(5)[["doc_id"]])
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_per_key_head_k_fewer_rows_than_k(ray_session):
    from search_engine_ray.stages.join import per_key_head_k
    t = pa.table({"source": pa.array(["x", "y"]),
                  "doc_id": pa.array([2, 1], type=pa.int64())})
    got = per_key_head_k(_ds(t, 2), key="source", order_col="doc_id",
                         k=10).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2]


def test_resolve_exchange(ray_session, monkeypatch):
    # auto = correct-by-default on both topologies; explicit passes through
    import ray as _ray
    from search_engine_ray.stages.join import resolve_exchange
    assert resolve_exchange("fs") == "fs"
    assert resolve_exchange("groupby") == "groupby"
    # this test session is single-node local mode
    assert resolve_exchange("auto") == "fs"
    monkeypatch.setattr(_ray, "nodes", lambda: [
        {"Alive": True}, {"Alive": True}, {"Alive": False}])
    assert resolve_exchange("auto") == "groupby"
    monkeypatch.setattr(_ray, "nodes",
                        lambda: (_ for _ in ()).throw(RuntimeError()))
    assert resolve_exchange("auto") == "fs"   # no cluster view -> safe local


def test_resolve_exchange_before_ray_init():
    # 'auto' must not silently guess 'fs' just because the caller hasn't
    # init'd Ray yet: it performs the same auto-init the first Dataset
    # execution would, then reads the real topology (subprocess — the
    # pytest session already holds a Ray instance)
    import subprocess
    import sys
    code = (
        "import sys, warnings; sys.path.insert(0, '/root/repo')\n"
        "import ray\n"
        "from search_engine_ray.stages.join import resolve_exchange\n"
        "assert not ray.is_initialized()\n"
        "warnings.simplefilter('error')\n"
        "assert resolve_exchange('auto') == 'fs'\n"
        "assert ray.is_initialized()\n"
        "ray.shutdown()\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120,
                       env={**__import__('os').environ,
                            "RAY_DISABLE_IMPORT_WARNING": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
