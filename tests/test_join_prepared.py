"""PreparedJoinSide (round 5): the reusable spilled side for iterative
joins, plus the _map_key_groups bucket-dispatch wrapper and pagerank's
exchange-mode matrix."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _edges(n=500, nodes=40, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "src": rng.integers(0, nodes, n),
        "dst": rng.integers(0, nodes, n),
        "w": rng.random(n) + 0.1})


class TestPreparedJoinSide:
    def test_matches_hash_join_across_rounds(self, ray_session):
        from search_engine_ray.stages.join import PreparedJoinSide, hash_join
        et = _edges()
        edges = ray.data.from_arrow(et).materialize()
        with PreparedJoinSide(edges, key="src", n_buckets=8) as prep:
            for rnd in range(3):           # three rounds, fresh right side
                coef = pa.table({
                    "node": np.arange(40),
                    "coef": np.linspace(0.1, 2.0, 40) + rnd})
                right = ray.data.from_arrow(coef)
                got = prep.join(right, right_key="node").to_pandas()
                want = hash_join(edges, ray.data.from_arrow(coef),
                                 left_key="src", right_key="node",
                                 n_buckets=8).to_pandas()
                cols = sorted(got.columns)
                got = got[cols].sort_values(cols, ignore_index=True)
                want = want[cols].sort_values(cols, ignore_index=True)
                assert got.equals(want), f"round {rnd} diverged"

    def test_previous_round_spill_deleted(self, ray_session):
        import os

        from search_engine_ray.stages.join import PreparedJoinSide
        edges = ray.data.from_arrow(_edges()).materialize()
        prep = PreparedJoinSide(edges, key="src", n_buckets=4)
        try:
            right = ray.data.from_arrow(
                pa.table({"node": np.arange(40),
                          "coef": np.ones(40)}))
            prep.join(right, right_key="node").materialize()
            assert os.path.isdir(
                os.path.join(prep.scratch, "side1_r001"))
            prep.join(ray.data.from_arrow(
                pa.table({"node": np.arange(40), "coef": np.ones(40)})),
                right_key="node").materialize()
            assert not os.path.isdir(
                os.path.join(prep.scratch, "side1_r001"))
            assert os.path.isdir(
                os.path.join(prep.scratch, "side1_r002"))
        finally:
            prep.close()
        import os.path
        assert not os.path.isdir(prep.scratch)

    def test_column_collision_rejected(self, ray_session):
        from search_engine_ray.stages.join import PreparedJoinSide
        edges = ray.data.from_arrow(_edges()).materialize()
        with PreparedJoinSide(edges, key="src", n_buckets=4) as prep:
            bad = ray.data.from_arrow(
                pa.table({"node": np.arange(4), "w": np.ones(4)}))
            with pytest.raises(ValueError, match="collision"):
                prep.join(bad, right_key="node")


class TestMapKeyGroups:
    @pytest.mark.parametrize("key_type", ["int", "str"])
    def test_matches_plain_map_groups(self, ray_session, key_type):
        from search_engine_ray.pipelines.queries import _map_key_groups
        rng = np.random.default_rng(11)
        n = 2000
        keys = rng.integers(0, 137, n)
        if key_type == "str":
            key_arr = pa.array([f"u{k:03d}" for k in keys])
        else:
            key_arr = pa.array(keys, type=pa.int64())
        t = pa.table({"k": key_arr,
                      "v": rng.random(n),
                      "ts": rng.integers(0, 10_000, n)})

        def per_group(g: pa.Table) -> pa.Table:
            # order-sensitive per-key computation (sorted diff sum)
            v = np.sort(g["v"].to_numpy(zero_copy_only=False))
            return pa.table({
                "k": g["k"].slice(0, 1),
                "n": pa.array([g.num_rows], type=pa.int64()),
                "dsum": pa.array([float(np.diff(v).sum())
                                  if v.size > 1 else 0.0])})

        ds = ray.data.from_arrow(t)
        got = _map_key_groups(ds, "k", per_group).to_pandas()
        want = (ray.data.from_arrow(t).groupby("k")
                .map_groups(per_group, batch_format="pyarrow").to_pandas())
        got = got.sort_values("k", ignore_index=True)
        want = want.sort_values("k", ignore_index=True)
        assert got["n"].tolist() == want["n"].tolist()
        assert np.allclose(got["dsum"], want["dsum"])
        assert got["k"].tolist() == want["k"].tolist()

    def test_single_key_and_empty_outputs(self, ray_session):
        from search_engine_ray.pipelines.queries import _map_key_groups
        t = pa.table({"k": pa.array([7, 7, 7], type=pa.int64()),
                      "v": pa.array([1.0, 2.0, 3.0])})

        def drop_all(g: pa.Table) -> pa.Table:
            return g.slice(0, 0)

        out = _map_key_groups(ray.data.from_arrow(t), "k",
                              drop_all).to_pandas()
        assert len(out) == 0


class TestPagerankExchangeMatrix:
    def test_groupby_exchange_matches_fs(self, ray_session, monkeypatch):
        """The multi-node path (groupby join + dedicated dangling
        aggregate pass — no shared-scratch side-channel) must produce the
        same ranks as the single-node fs path."""
        from search_engine_ray.stages.graph import pagerank
        edges = ray.data.from_arrow(_edges(300, 25, seed=9))
        fs = pagerank(edges, weight="w", iters=3, n_buckets=4)
        monkeypatch.setenv("SERX_JOIN_EXCHANGE", "groupby")
        gb = pagerank(edges, weight="w", iters=3, n_buckets=4)
        assert fs["node"].to_pylist() == gb["node"].to_pylist()
        assert np.allclose(fs["rank"].to_numpy(), gb["rank"].to_numpy(),
                           rtol=1e-12)


class TestConnectedComponentsDataset:
    def test_dataset_input_and_output_match_table_path(self, ray_session):
        from search_engine_ray.stages.graph import connected_components
        rng = np.random.default_rng(5)
        a = np.concatenate([np.arange(0, 12), rng.integers(100, 200, 80)])
        b = np.concatenate([np.arange(1, 13), rng.integers(100, 200, 80)])
        pairs = pa.table({"doc_a": a.astype(np.int64),
                          "doc_b": b.astype(np.int64)})
        want = connected_components(pairs).to_pandas()
        ds = ray.data.from_arrow(pairs)
        got = connected_components(ds).to_pandas()
        got_ds = (connected_components(ds, as_dataset=True).to_pandas()
                  .sort_values("node", ignore_index=True))
        assert want.equals(got)
        assert want.equals(got_ds)

    def test_empty_dataset_input(self, ray_session):
        from search_engine_ray.stages.graph import connected_components
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64())})
        out = connected_components(ray.data.from_arrow(empty))
        assert out.num_rows == 0
        out_ds = connected_components(ray.data.from_arrow(empty),
                                      as_dataset=True)
        assert out_ds.count() == 0


class TestPagerankBroadcastParity:
    def test_broadcast_matches_partitioned(self, ray_session):
        """pagerank_broadcast (the documented small-graph latency path)
        must agree with the partitioned default to float tolerance."""
        from search_engine_ray.stages.graph import (pagerank,
                                                    pagerank_broadcast)
        edges = ray.data.from_arrow(_edges(400, 30, seed=13))
        part = pagerank(edges, weight="w", iters=4, n_buckets=4)
        bc = pagerank_broadcast(edges, weight="w", iters=4)
        assert part["node"].to_pylist() == bc["node"].to_pylist()
        assert np.allclose(part["rank"].to_numpy(),
                           bc["rank"].to_numpy(), rtol=1e-12)


class TestMapKeyGroupsNullKeys:
    def test_null_keys_form_their_own_group(self, ray_session):
        """groupby gives null keys their own group; the bucket-dispatch
        wrapper must not merge them into an adjacent key's group."""
        from search_engine_ray.pipelines.queries import _map_key_groups
        t = pa.table({
            "k": pa.array([1, 1, 2, None, None], type=pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})

        def summarize(g: pa.Table) -> pa.Table:
            return pa.table({
                "k": g["k"].slice(0, 1),
                "n": pa.array([g.num_rows], type=pa.int64()),
                "vsum": pa.array(
                    [float(np.nansum(
                        g["v"].to_numpy(zero_copy_only=False)))])})

        got = (_map_key_groups(ray.data.from_arrow(t), "k", summarize)
               .to_pandas().sort_values("k", ignore_index=True))
        want = (ray.data.from_arrow(t).groupby("k")
                .map_groups(summarize, batch_format="pyarrow")
                .to_pandas().sort_values("k", ignore_index=True))
        assert got["n"].tolist() == want["n"].tolist(), (got, want)
        assert np.allclose(got["vsum"], want["vsum"])
