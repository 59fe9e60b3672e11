"""Sort-clustered parquet layout: row-group statistics actually prune."""

import os

import pyarrow.parquet as pq
import pytest


def test_cluster_parquet_enables_rowgroup_pruning(ray_session, tmp_path):
    from search_engine_ray.pipelines.layout import (cluster_parquet,
                                                    fragments_overlapping)
    src = "/root/testdata/sf0.01/orders.parquet"
    out = str(tmp_path / "clustered")
    cluster_parquet(src, out, "o_totalprice", row_group_size=1024)

    # same rows, same totals
    t_in = pq.read_table(src, columns=["o_orderkey", "o_totalprice"])
    t_out = pq.read_table(out, columns=["o_orderkey", "o_totalprice"])
    assert t_out.num_rows == t_in.num_rows
    assert sorted(t_out["o_orderkey"].to_pylist()) == \
        sorted(t_in["o_orderkey"].to_pylist())

    import numpy as np
    prices = np.sort(t_in["o_totalprice"].to_numpy(zero_copy_only=False))
    lo, hi = prices[int(0.48 * prices.size)], prices[int(0.52 * prices.size)]

    touched, total = fragments_overlapping(out, "o_totalprice", lo, hi)
    assert total >= 10
    # a 4%-of-rows predicate touches a small fraction of clustered groups
    assert touched / total <= 0.25, (touched, total)
    # the unclustered source: every populated row group overlaps the middle
    t_src, n_src = fragments_overlapping(src, "o_totalprice", lo, hi)
    assert t_src == n_src
