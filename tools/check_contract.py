"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir, converts
the result to pandas, and — when an ``oracle_sql()`` entry exists — runs the
SQL in DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (rows sorted by all columns, columns
sorted by name).  Usage::

    python tools/check_contract.py [sf_dir] [--json out.json] [query ...]

``--json`` writes a per-query machine-readable record (status, rows,
timings) — committed per round as ``SWEEP_r{N}.json`` so the full-catalog
result on final code is inspectable beyond the driver's 50-query sample.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, ray.data.Dataset):
        import ray
        tables = [ray.get(r) for r in obj.to_arrow_refs()]
        tables = [t for t in tables if t.num_rows] or tables
        return pa.concat_tables(tables, promote_options="default").to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6) + 0.0
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.stderr.write(
                "usage: check_contract.py [sf_dir] [--json OUT] [query ...]\n")
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    sys.path.insert(0, "/root/repo")
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("SERX_SWEEP_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    # 2 threads: the oracle runs on a verify thread OVERLAPPED with the
    # next query's Ray execution — an unbounded DuckDB would contend for
    # all 8 Ray CPUs and skew the recorded per-query ray_s timings
    con = duckdb.connect(config={"threads": 2})
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # spawn the worker pool + per-worker imports BEFORE the first timed
    # query (one-time session cost; otherwise the first catalog entry
    # absorbs ~3-4 s of warmup and reads as a slow query)
    def _warm(batch):
        import search_engine_ray.stages.tokenize  # noqa: F401
        return batch
    import ray.data as _rd
    _rd.range(16, override_num_blocks=16).map_batches(
        _warm, batch_size=1, batch_format="pyarrow").materialize()

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    records: dict[str, dict] = {}
    t_sweep = time.time()

    def fail(name: str, msg: str) -> None:
        nonlocal failures
        print(f"FAIL {name}: {msg}")
        failures += 1
        records[name] = {"status": "FAIL", "detail": msg[:400]}

    # The DuckDB oracle + compare run on a single verify THREAD (sole owner
    # of `con`) so the next query's Ray execution overlaps them — the sweep
    # previously serialized ~25 s of driver-side SQL behind idle Ray
    # workers (VERDICT r4 item 6).
    from concurrent.futures import ThreadPoolExecutor

    def verify(name: str, got, dt: float) -> None:
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            records[name] = {"status": "rows_only", "rows": len(got),
                             "ray_s": round(dt, 2)}
            return
        t1 = time.time()
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            fail(name, f"oracle SQL raised {type(e).__name__}: {e}")
            return
        dt_sql = time.time() - t1
        if list(got.columns) != list(want.columns):
            fail(name,
                 f"columns {list(got.columns)} != {list(want.columns)}")
            return
        if len(got) != len(want):
            fail(name, f"rows {len(got)} != {len(want)}")
            return
        if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            # the driver's value hash is dtype-sensitive (int64 vs float64
            # HUGEINT artifacts showed as hash mismatches in round 1)
            fail(name, f"dtypes {list(map(str, got.dtypes))} != "
                       f"{list(map(str, want.dtypes))}")
            return
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, atol=1e-6,
                                          rtol=0)
        except AssertionError as e:
            fail(name, f"values differ: {str(e)[:400]}")
            return
        print(f"ok   {name}: MATCH ({len(got)} rows, ray {dt:.1f}s, "
              f"sql {dt_sql:.1f}s)")
        records[name] = {"status": "MATCH", "rows": len(got),
                         "ray_s": round(dt, 2), "sql_s": round(dt_sql, 2)}

    pool = ThreadPoolExecutor(max_workers=1)
    pending = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            fail(name, f"query raised {type(e).__name__}: {e}")
            continue
        pending.append(pool.submit(verify, name, got, time.time() - t0))
    for fut in pending:
        fut.result()
    pool.shutdown()
    n_run = len([n for n in qs if not only or n in only])
    wall = time.time() - t_sweep
    print(f"\n{failures} failures; {n_run} queries swept in "
          f"{wall:.1f}s total")
    if json_out:
        import json as _json
        payload = {"sf_dir": sf_dir, "n_queries": n_run,
                   "failures": failures, "wall_s": round(wall, 1),
                   "queries": records}
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
