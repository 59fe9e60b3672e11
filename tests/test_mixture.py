"""Source-mixture resampling: brute-force parity + parallelism-invariance
(same rows at any batch size — the reproducibility the op exists for)."""

import numpy as np
import pyarrow as pa


def _brute(rows):
    from search_engine_ray.pipelines.queries import (
        MIXTURE_DEFAULT_PCT, MIXTURE_PCT, SAMPLE_MULT)
    out = []
    for did, src in rows:
        pct = MIXTURE_PCT.get(src, MIXTURE_DEFAULT_PCT)
        reps = pct // 100
        h = (did * SAMPLE_MULT) % (1 << 32)
        if h < (pct % 100) * (1 << 32) // 100:
            reps += 1
        out.extend((did, src, e) for e in range(reps))
    return sorted(out)


def test_source_mixture_brute_and_invariance(ray_session):
    import pyarrow.parquet as pq
    from search_engine_ray.pipelines.queries import q_source_mixture
    sf = "/root/testdata/sf0.001"
    got = (q_source_mixture(sf).to_pandas()
           .sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    t = pq.read_table(sf + "/documents.parquet",
                      columns=["doc_id", "source"])
    want = _brute(list(zip(t["doc_id"].to_pylist(),
                           t["source"].to_pylist())))
    assert list(map(tuple, got[["doc_id", "source", "epoch"]]
                    .itertuples(index=False))) == want

    # epoch ramp is contiguous 0..reps-1 per doc
    per_doc = got.groupby("doc_id")["epoch"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["max"] + 1 == per_doc["count"]).all()
