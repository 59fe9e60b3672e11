"""Storage-layout optimization: sort-clustered parquet for pruned reads.

At 100 TB the cheapest query is the one that never leaves storage: parquet
readers (pyarrow, DuckDB, Ray's ``read_parquet`` filter pushdown) skip whole
row groups whose min/max statistics exclude the predicate — but only if the
writer CLUSTERED the data so each key range lands in few row groups.
``cluster_parquet`` pays one distributed sort (the same all-to-all cost as
any ``ds.sort``) to buy that locality for every subsequent read;
``fragments_overlapping`` measures the result (the pruning a
statistics-aware reader would do), so the benefit is testable instead of
asserted.
"""

from __future__ import annotations

import os

import pyarrow.dataset as pads

import ray.data


def cluster_parquet(input_path: str, out_dir: str, key: str, *,
                    rows_per_file: int | None = None,
                    row_group_size: int = 16_384) -> None:
    """Rewrite ``input_path`` sorted by ``key`` into ``out_dir``.

    One distributed sort; each output file covers a contiguous key range
    (Ray writes one file per sorted block), and ``row_group_size`` bounds
    the pruning granularity within a file.  Resumable at the directory
    level (rerun overwrites); for a 100 TB table, run per partition (e.g.
    per date) so a failed rerun is one partition, not the table.
    """
    ds = ray.data.read_parquet(input_path)
    out = ds.sort(key)
    kwargs = {"row_group_size": row_group_size}
    if rows_per_file:
        kwargs["num_rows_per_file"] = rows_per_file
    out.write_parquet(out_dir, **kwargs)


def fragments_overlapping(path: str, key: str, lo, hi) -> tuple[int, int]:
    """(row groups whose [min, max] statistics overlap [lo, hi], total row
    groups) — the exact skip decision a statistics-aware reader makes."""
    dataset = pads.dataset(path, format="parquet")
    touched = total = 0
    for frag in dataset.get_fragments():
        frag.ensure_complete_metadata()
        for i in range(frag.metadata.num_row_groups):
            total += 1
            col_idx = frag.physical_schema.get_field_index(key)
            stats = frag.metadata.row_group(i).column(col_idx).statistics
            if stats is None or not stats.has_min_max:
                touched += 1
                continue
            if not (stats.max < lo or stats.min > hi):
                touched += 1
    return touched, total
