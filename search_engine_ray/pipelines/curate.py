"""End-to-end training-data curation: one composed, streaming pipeline.

``curate_corpus`` chains the catalog's individually-oracle-checked pieces
in the order a real data-curation run applies them:

1. **quality gate** — length + digit-ratio thresholds (``QualityStats``
   semantics), applied batch-locally with the text kept;
2. **exact dedup** — keeper = min docID per distinct text AMONG the quality
   survivors (the 16-byte content-hash shuffle; text never enters the
   exchange), realized as keeper-ID selection + a bucketed LEFT SEMI
   ``hash_join`` back onto the survivor stream;
3. **decontamination** — drop docs sharing any word n-gram with the
   benchmark set (bench grams collected once, ``ray.put`` broadcast);
4. **per-source cap** (optional ``source_cap=K``) — the C4/Dolma "≤K pages
   per domain" step, applied LAST so the cap counts final docs: skinny
   ``(doc_id, source)`` rank shuffle + bucketed left-semi keeper join
   (same shape as ``queries.q_source_capped_sample``);
5. **write** — parquet partitioned by ``source``, staged to ``.tmp`` and
   published atomically (a re-run after a crash can never append
   duplicate rows next to a partial first attempt).

Every stage is a streaming ``map_batches`` / bucketed exchange — no
driver-side doc sets, no whole-corpus materialization.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.contamination import (ContaminationScore,
                                    collect_benchmark_grams)
from ..stages.join import hash_join, per_key_head_k
from ..stages.textstats import QualityStats


def curate_corpus(sf_dir: str, out_dir: str | None = None, *,
                  min_tokens: int = 60, max_digit_ratio: float = 0.05,
                  ngram: int = 5, bench_mod: int = 97,
                  n_buckets: int = 32,
                  source_cap: int | None = None) -> "ray.data.Dataset":
    """documents.parquet → curated corpus Dataset (and parquet when
    ``out_dir`` is given).  Columns: doc_id, text, lang, source."""
    from .queries import _content_hash_stage, _mod_filter
    import functools

    path = os.path.join(sf_dir, "documents.parquet")

    def read():
        return ray.data.read_parquet(
            path, columns=["doc_id", "text", "lang", "source"])

    # benchmark docs are held out of the corpus entirely
    corpus = read().map_batches(
        functools.partial(_mod_filter, mod=bench_mod, keep_equal=False),
        batch_format="pyarrow")
    bench = read().map_batches(
        functools.partial(_mod_filter, mod=bench_mod, keep_equal=True),
        batch_format="pyarrow")
    gram_ref = ray.put(collect_benchmark_grams(bench, n=ngram))

    quality = QualityStats()

    def quality_gate(t: pa.Table) -> pa.Table:
        stats = quality(t)     # (doc_id, n_tokens, ..., digit_ratio)
        ok = stats.filter(pc.and_(
            pc.greater_equal(stats["n_tokens"], min_tokens),
            pc.less_equal(stats["digit_ratio"], max_digit_ratio)))
        keep_ids = ok["doc_id"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, keep_ids)))

    # the survivor stream feeds BOTH the keeper aggregation and the
    # semi-join left side — pin it once (same rule as the source_cap fork
    # below) instead of re-reading + re-tokenizing the corpus twice
    survivors = corpus.map_batches(quality_gate,
                                   batch_format="pyarrow").materialize()

    # keeper per distinct text among SURVIVORS: 16-byte hash shuffle only
    keepers = (survivors
               .map_batches(_content_hash_stage, batch_format="pyarrow")
               .groupby(["h1", "h2"])
               .aggregate(ray.data.aggregate.Min("doc_id"))
               .map_batches(lambda t: pa.table(
                   {"doc_id": t["min(doc_id)"]}), batch_format="pyarrow"))
    deduped = hash_join(survivors, keepers, left_key="doc_id",
                        right_key="doc_id", n_buckets=n_buckets,
                        join_type="left semi")

    scorer = ContaminationScore(gram_ref, n=ngram)

    def decontaminate(t: pa.Table) -> pa.Table:
        sc = scorer(t)
        # ContaminationScore emits NO row for a doc shorter than the
        # n-gram window — such docs cannot contain a benchmark n-gram and
        # must be KEPT, so drop by the contaminated set rather than
        # keeping the scored-clean set (which silently removed them)
        bad = sc.filter(pc.greater(sc["n_contaminated"], 0))
        bad_ids = bad["doc_id"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, bad_ids)))

    curated = deduped.map_batches(decontaminate, batch_format="pyarrow")

    if source_cap is not None:
        # domain-cap last, so the cap counts FINAL docs (C4/Dolma order).
        # The curated stream feeds both the rank pass and the semi-join —
        # pin it once instead of re-executing the whole upstream twice.
        curated = curated.materialize()
        pairs = curated.select_columns(["doc_id", "source"])
        cap_keepers = per_key_head_k(pairs, key="source",
                                     order_col="doc_id", k=source_cap)
        curated = hash_join(curated, cap_keepers, left_key="doc_id",
                            right_key="doc_id", n_buckets=n_buckets,
                            join_type="left semi")

    if out_dir is not None:
        # stage + atomic publish: write_parquet into an existing dir
        # APPENDS fresh uuid-named files, so a re-run after a partial
        # failure would silently duplicate every already-written row
        import shutil
        tmp = out_dir.rstrip("/") + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        curated.write_parquet(tmp, partition_cols=["source"])
        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(tmp, out_dir)
        return ray.data.read_parquet(out_dir)
    return curated
