"""Distributed connected components — near-dup pairs → dedup clusters.

The near-dup pipelines (minhash / simhash / embedding LSH) emit verified
PAIRS; production dedup needs CLUSTERS (a transitively-closed component per
duplicate group) so exactly one representative per group survives.  This is
the standard label-propagation formulation (Kang et al., "PEGASUS: mining
peta-scale graphs", 2009 — public algorithm):

- labels start as each node's own id;
- each round every node takes the min label over itself and its neighbors
  (one bucketed hash join edges⋈labels + one groupby-min — both
  co-partitioned by the same key hash, so rounds don't reshuffle key
  space);
- converges in O(component diameter) rounds — near-dup graphs are
  bucket-local cliques/stars, so diameter is tiny (the iteration cap is a
  backstop, not the expected path).

Each round materializes only the LABEL table (2×int64 per node of the PAIR
graph — nodes that appear in at least one near-dup pair, not the corpus)
and the constant edge table; both stream through the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _min_label_round(edges: "ray.data.Dataset", labels: "ray.data.Dataset",
                     n_buckets: int) -> "ray.data.Dataset":
    """One propagation round: neighbor labels via edges⋈labels on ``src``,
    then min(own, incoming) per node."""
    from ray.data.aggregate import Min

    from .join import hash_join
    msgs = (hash_join(edges, labels, left_key="src", right_key="node",
                      n_buckets=n_buckets)
            .select_columns(["dst", "label"])
            .rename_columns({"dst": "node"}))
    return (labels.union(msgs)
            .groupby("node").aggregate(Min("label"))
            .rename_columns({"min(label)": "label"}))


def connected_components(pairs: pa.Table, *, max_iters: int = 25,
                         n_buckets: int = 16) -> pa.Table:
    """``(doc_a, doc_b)`` pair table → ``(node, component)`` with
    ``component = min node id`` of each connected component, computed by
    distributed min-label propagation (see module docstring).  Returns a
    driver-side table ordered by node — the label table is one row per
    node OF THE PAIR GRAPH, the bounded artifact every caller needs
    anyway."""
    if pairs.num_rows == 0:
        return pa.table({"node": pa.array([], type=pa.int64()),
                         "component": pa.array([], type=pa.int64())})
    a = pairs["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    # symmetrize once; constant across rounds
    edges = ray.data.from_arrow(pa.table({
        "src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}))
    nodes = np.unique(np.concatenate([a, b]))
    labels = ray.data.from_arrow(pa.table({"node": nodes, "label": nodes}))

    prev_sum = int(nodes.sum())
    for _ in range(max_iters):
        labels = _min_label_round(edges, labels, n_buckets).materialize()
        # labels only ever decrease → an unchanged SUM means a fixpoint
        # (one tiny aggregate per round, no full comparison join)
        cur_sum = int(labels.sum("label"))
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(component diameter exceeds the cap; raise max_iters)")

    out = pa.Table.from_pandas(
        labels.to_pandas(), preserve_index=False)  # bounded: pair-graph nodes
    out = out.rename_columns(["node", "component"])
    return out.sort_by("node")
