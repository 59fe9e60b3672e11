"""Distributed inverted-index build (the reference's ``ParseSources``).

Reference lifecycle (``/root/reference/KaggleFinanceSourceEngine.cpp:33-92``,
traced in SURVEY.md §3.1): parser threads tokenize + pre-count per doc,
an arbitrator hash-routes ``(doc, term, tf)`` triples, filler threads own one
shard each.  Ray Data restatement:

    read_parquet (column-pruned)
      → map_batches(TokenizePostings)        # stateless vectorized tasks
      → [resume filter: drop finished partitions BEFORE the shuffle]
      → groupby("part").map_groups(EncodePartitionWriter)   # THE shuffle
      → per-partition atomic segment write + _DONE marker
      → termstats pass: re-read segment (term, df) columns → groupby(term)
        → global df/total_tf table (BM25 global stats for doc-sharded serving)

plus a pass for the docstore / BM25 norms (``DocStats``) and a tiny global
aggregate for ``docstats.json``.

Scale notes:
- the (shard, bucket) grid is the partition knob: each partition's postings
  are encoded in one ``map_groups`` call, so size ``n_doc_shards ×
  n_buckets`` such that (total postings)/n_partitions fits a worker heap;
  partitions ≫ workers keeps the reduce stage load-balanced.
- the tokenize stage emits ONE row per distinct (doc, term) — the map-side
  combine — so the shuffle volume is bounded by Σ per-doc vocabulary, not
  token count.
- the termstats pass reads only the tiny (term, df, total_tf) columns of the
  already-written segments — it never re-touches postings binaries.
- ``html``-bearing inputs must drop the binary column before the shuffle
  (we read only the id/text columns — pruned at the read).
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager
from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Sum

from ..functions.analyze import ENGLISH_STOPWORDS
from ..stages.postings import EncodePartitionWriter
from ..stages.tokenize import DocStats, TokenizePostings
from ..state import checkpoint as ckpt
from ..state.checkpoint import IndexConfig

DatasetFactory = Callable[[], "ray.data.Dataset"]


def _phase_timer():
    """Opt-in phase timing (SERX_BUILD_TIMING=1): prints per-phase wall time
    to stderr — the measurement loop behind the scaling-efficiency work."""
    import sys
    import time as _time
    if not os.environ.get("SERX_BUILD_TIMING"):
        return lambda name: None
    state = {"t": _time.time()}

    def mark(name: str) -> None:
        now = _time.time()
        print(f"[build-timing] {name}: {now - state['t']:.2f}s",
              file=sys.stderr, flush=True)
        state["t"] = now
    return mark


@contextmanager
def _full_width_execution(*datasets):
    """Run one Dataset execution with Ray Data's per-op resource reservation
    disabled, restoring the previous setting after.

    The build's executions are map-dominated: a fused read→tokenize→spill map
    followed by a trivial metric fold (stage 1), or a flat encode map over
    partition stubs (stage 2).  The streaming executor's reservation policy
    (``op_resource_reservation_ratio`` = 0.5) holds back half the CPU slots
    as a shared pool split across ALL ops, so the one op doing real work is
    capped below cluster width — measured map-task caps of 1/2, 5/8 and
    24/32 CPUs, i.e. the 4N leg of a scaling pair gets proportionally MORE
    of its CPUs than the N leg, distorting the ratio both ways.  That policy
    exists to keep expensive downstream ops from starving in deep pipelines —
    the build has no such op, so width is strictly better here.

    Every Dataset snapshots ``DataContext.get_current().copy()`` at CREATION
    (``read_api.read_datasource``), so flipping the global context after the
    dataset exists does nothing — the executor reads the plan's captured
    copy.  Callers therefore pass the dataset(s) about to execute and the
    flag is flipped on each captured context (plus the global one, covering
    datasets created inside the block).  Scoped + restored, so query
    pipelines created BEFORE or AFTER this window keep the default policy —
    but a Dataset another thread creates DURING the window snapshots the
    flipped global context for its lifetime (unavoidable with a global
    DataContext; build-concurrent dataset construction in one driver is the
    one case that loses reservation).  ``SERX_FULL_WIDTH=0`` opts out
    entirely."""
    ctxs = [ray.data.DataContext.get_current()]
    for ds in datasets:
        c = getattr(ds, "context", None)
        if c is not None and all(c is not seen for seen in ctxs):
            ctxs.append(c)
    if (not hasattr(ctxs[0], "op_resource_reservation_enabled")
            or os.environ.get("SERX_FULL_WIDTH", "1") == "0"):
        yield
        return
    prev = [c.op_resource_reservation_enabled for c in ctxs]
    for c in ctxs:
        c.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        for c, p in zip(ctxs, prev):
            c.op_resource_reservation_enabled = p


def _auto_num_blocks() -> int:
    """Read-block count for the build passes.

    Ray's sort-based shuffle couples SortReduce task count to input block
    count; hundreds of small blocks turn the 64-partition groupby into an
    N²-object exchange (measured 8× slower at 208 blocks vs 32 on the bench
    corpus).  Target ≈ one block per CPU for the single-node harness; on a
    real cluster blocks are sized by target_max_block_size instead and the
    push-based shuffle path handles large block counts.
    """
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 16
    # measured optimum on the bench harness: ~2 blocks/CPU, floor 32 (map
    # parallelism + straggler slack), cap 128 (sort-shuffle object count).
    # SERX_BLOCKS_PER_CPU overrides the multiplier (wave-quantization
    # experiments: more, smaller blocks shrink the last-wave straggler tail
    # at full width but multiply exchange fragment counts) — only then does
    # the cap stretch to 4 blocks/CPU; the default path keeps the hard 128.
    try:
        per_cpu = int(os.environ.get("SERX_BLOCKS_PER_CPU", "2"))
        cap = max(128, 4 * cpus) if "SERX_BLOCKS_PER_CPU" in os.environ \
            else 128
    except ValueError:
        per_cpu, cap = 2, 128
    return min(cap, max(32, per_cpu * cpus))


def _resolve(source: str | DatasetFactory, columns: list[str],
             num_blocks: int | None = None) -> "ray.data.Dataset":
    if callable(source):
        ds = source()
        return ds.select_columns([c for c in columns if c in ds.schema().names])
    return ray.data.read_parquet(source, columns=columns,
                                 override_num_blocks=num_blocks or _auto_num_blocks())


def write_termstats(index_dir: str) -> None:
    """Aggregate per-partition (field, term, df, total_tf) into the GLOBAL
    termstats table (BM25 df across doc shards); atomic directory swap."""
    ts_dir = ckpt.termstats_dir(index_dir)
    seg_meta = ray.data.read_parquet(
        ckpt.segments_dir(index_dir),
        columns=["field", "term", "df", "total_tf"])
    stats = (seg_meta.groupby(["field", "term"])
             .aggregate(Sum("df"), Sum("total_tf"))
             .rename_columns({"sum(df)": "df", "sum(total_tf)": "total_tf"}))
    tmp_dir = ts_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    stats.write_parquet(tmp_dir)
    shutil.rmtree(ts_dir, ignore_errors=True)
    os.replace(tmp_dir, ts_dir)


def _hot_terms(source, index_dir: str, cfg: IndexConfig,
               stopwords) -> frozenset[str] | None:
    """Sample-estimate head terms for salting (SURVEY §7.5 item 2).

    The hot set is persisted to ``hotterms.json`` on first build and reloaded
    on resume — partition routing must be identical across runs — and
    surfaced in the manifest (no silent salting).
    """
    import json as _json
    from ..functions.analyze import tokenize as _tokenize
    path = os.path.join(index_dir, "hotterms.json")
    if os.path.exists(path):
        with open(path) as f:
            return frozenset(_json.load(f)["hot_terms"]) or None
    # cross-build cache: the sample depends only on (source, analyzer
    # config); repeated fresh builds over the same corpus (benchmarks,
    # delta experiments) skip the sampling job entirely
    cache_key = None
    src_tag = source if isinstance(source, str) \
        else getattr(source, "cache_tag", None)
    if src_tag:
        from ..functions.analyze import fnv1a64
        try:
            mtime = os.path.getmtime(src_tag) if os.path.exists(src_tag) else 0
            tag = f"{src_tag}|{mtime}|{cfg.hot_df_fraction}" \
                  f"|{cfg.stopwords}|{cfg.stem}" \
                  f"|{cfg.text_col}|{cfg.id_col}"
            cache_key = f"/tmp/serx_hotterms_{fnv1a64(tag.encode()):016x}.json"
            if os.path.exists(cache_key):
                with open(cache_key) as f:
                    payload = _json.load(f)
                with open(path + ".tmp", "w") as f:
                    _json.dump(payload, f)
                os.replace(path + ".tmp", path)
                return frozenset(payload["hot_terms"]) or None
        except OSError:
            cache_key = None
    sample = _resolve(source, [cfg.id_col, cfg.text_col]).limit(2000).take_all()
    from collections import Counter
    dfc: Counter = Counter()
    for r in sample:
        dfc.update(set(_tokenize(r[cfg.text_col] or "", stopwords=stopwords,
                                 stem=cfg.stem)))
    n = max(len(sample), 1)
    hot = sorted(t for t, c in dfc.items() if c / n >= cfg.hot_df_fraction)
    payload = {"sampled_docs": n, "hot_df_fraction": cfg.hot_df_fraction,
               "hot_terms": hot}
    with open(path + ".tmp", "w") as f:
        _json.dump(payload, f)
    os.replace(path + ".tmp", path)
    if cache_key:
        with open(cache_key + ".tmp", "w") as f:
            _json.dump(payload, f)
        os.replace(cache_key + ".tmp", cache_key)
    return frozenset(hot) or None


def _scratch_dir(index_dir: str) -> str:
    """Exchange-scratch location for the fs external shuffle.

    Fragments are INTERMEDIATE data (re-creatable from the source), so they
    belong on the fastest node-local storage available — NVMe scratch on a
    real cluster, ``/dev/shm`` on this single-node harness (measured 1.1 GB/s
    vs 83 MB/s for the VM's ext4 root disk; the durable index output still
    goes to ``index_dir``).  Override with ``SERX_SCRATCH_DIR=<dir>`` or
    ``SERX_SCRATCH_DIR=none`` to keep scratch inside ``index_dir``
    (shared-filesystem deployments).  The location is deterministic per
    ``index_dir`` so an interrupted build resumes against the same scratch.

    NOTE: the fs exchange (scratch included) assumes every worker sees the
    same filesystem — it is the SINGLE-NODE build path; multi-node clusters
    use ``exchange="groupby"`` (each node's object store) per the
    ``build_index`` docstring.
    """
    env = os.environ.get("SERX_SCRATCH_DIR", "").strip()
    if env.lower() == "none":
        return os.path.join(index_dir, "_exchange")
    if env:
        base = env
    elif os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        base = "/dev/shm/serx_exchange"
    else:
        return os.path.join(index_dir, "_exchange")
    from ..functions.analyze import fnv1a64
    # scratch is keyed by (index path, per-build nonce): the nonce lives
    # INSIDE index_dir, so `rm -rf index_dir` + rebuild can never resume a
    # previous build's stale stage-1 marker/fragments from shared scratch
    token_path = os.path.join(index_dir, "_build_token")
    try:
        with open(token_path) as f:
            token = f.read().strip()
    except OSError:
        import uuid
        token = uuid.uuid4().hex
        os.makedirs(index_dir, exist_ok=True)
        tmp = f"{token_path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(token)
        try:
            os.link(tmp, token_path)   # atomic: first writer wins
        except FileExistsError:
            with open(token_path) as f:
                token = f.read().strip()
        finally:
            os.unlink(tmp)
    tag = fnv1a64(f"{os.path.abspath(index_dir)}\x00{token}".encode("utf-8"))
    d = os.path.join(base, f"{tag:016x}")
    # OWNER marker: the dirname is a one-way hash, so without this a scratch
    # dir orphaned by `rm -rf index_dir` (or a killed benchmark) could never
    # be traced back and garbage-collected — see cleanup_orphan_scratch()
    try:
        os.makedirs(d, exist_ok=True)
        owner = os.path.join(d, "OWNER.json")
        if not os.path.exists(owner):
            import json as _json
            with open(owner + f".{os.getpid()}.tmp", "w") as f:
                _json.dump({"index_dir": os.path.abspath(index_dir),
                            "token": token}, f)
            os.replace(owner + f".{os.getpid()}.tmp", owner)
    except OSError:
        pass
    return d


def cleanup_orphan_scratch(base: str | None = None, *,
                           min_age_s: float = 3600.0) -> list[str]:
    """Garbage-collect exchange-scratch dirs whose owning index is gone.

    An interrupted build's scratch is KEPT on purpose (resume reuses it),
    but when the index dir itself is later deleted — a temp benchmark
    index, an aborted experiment — the scratch orphans on the shared
    scratch device with no owner to clean it.  This janitor removes any
    scratch dir whose ``OWNER.json`` points at a no-longer-existing index
    dir or a stale build token, provided nothing has touched it for
    ``min_age_s`` (never races a live build).  Dirs without a marker
    (pre-marker builds) are removed on the same age rule.  Returns the
    removed paths; CLI: ``scratch-gc``."""
    import json as _json
    import time as _time
    explicit_base = base is not None
    if base is None:
        env = os.environ.get("SERX_SCRATCH_DIR", "").strip()
        if env and env.lower() != "none":
            base = env
        elif os.path.isdir("/dev/shm"):
            base = "/dev/shm/serx_exchange"
        # else: no exchange root on this host — the join sweep below still
        # runs (joins fall back to $TMPDIR/serx_join on such hosts)
    removed = []
    now = _time.time()
    for name in os.listdir(base) if base and os.path.isdir(base) else []:
        d = os.path.join(base, name)
        # Only this project's exchange dirs are eligible: a 16-hex fnv tag
        # (_scratch_dir's naming).  Without the filter, SERX_SCRATCH_DIR
        # pointed at a shared directory (/tmp, a team scratch mount) would
        # let the markerless age rule rmtree sibling data this project
        # never wrote.
        if not (os.path.isdir(d) and len(name) == 16
                and all(c in "0123456789abcdef" for c in name)):
            continue
        try:
            newest = max((os.path.getmtime(os.path.join(dp, f))
                          for dp, _, fs in os.walk(d) for f in fs),
                         default=os.path.getmtime(d))
        except OSError:
            continue
        if now - newest < min_age_s:
            continue                      # possibly live — leave it
        orphan = True
        try:
            with open(os.path.join(d, "OWNER.json")) as f:
                meta = _json.load(f)
            tok_path = os.path.join(meta["index_dir"], "_build_token")
            with open(tok_path) as f:
                orphan = f.read().strip() != meta.get("token")
        except (OSError, ValueError, KeyError):
            pass                          # unreadable owner → age rule wins
        if orphan:
            shutil.rmtree(d, ignore_errors=True)
            removed.append(d)
    # join scratch (stages/join._join_scratch) is per-run and cleaned by a
    # try/finally — only a hard kill orphans it, and it is NEVER resumed, so
    # the pure age rule applies.  The sweep root is resolved by the SAME
    # logic joins use to pick it (env override → env base itself; else
    # /dev/shm/serx_join; else $TMPDIR/serx_join) so the janitor never
    # rmtree's a sibling directory this project didn't write, and the
    # tempfile fallback is actually collected.  Only 32-hex uuid4 names
    # (the _join_scratch nonce format) are eligible.  A caller that passed
    # an EXPLICIT base scoped the sweep to that directory — reaching out to
    # the machine-global join root from such a call could delete another
    # process's live join scratch (the caller's min_age_s choice only
    # reflects its own dir), so the join sweep runs only when the base is
    # the default (global invocation) or the explicit base IS the join
    # root itself.
    from ..stages.join import join_scratch_base
    join_base = join_scratch_base()
    if explicit_base and os.path.realpath(base) != os.path.realpath(join_base):
        join_base = None
    if join_base and os.path.isdir(join_base):
        for name in os.listdir(join_base):
            d = os.path.join(join_base, name)
            if not (os.path.isdir(d) and len(name) == 32
                    and all(c in "0123456789abcdef" for c in name)):
                continue
            try:
                newest = max((os.path.getmtime(os.path.join(dp, f))
                              for dp, _, fs in os.walk(d) for f in fs),
                             default=os.path.getmtime(d))
            except OSError:
                continue
            if now - newest >= min_age_s:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
    return removed


class _TokenizeAndSpill:
    """Fuses the tokenize stage with the filesystem-exchange map side so the
    posting stream never enters the object store.

    The returned metric row carries per-task component CPU milliseconds
    (``t_tok_ms`` / ``t_spill_ms``): summed across tasks they attribute the
    stage-1 wall between compute and exchange I/O WITHIN one run — the only
    attribution robust to this host's minute-scale memory-phase swings
    (BASELINE.md), which make cross-run A/Bs of ~2× effects unreadable."""

    def __init__(self, stage, spiller):
        self.stage = stage
        self.spiller = spiller

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        from time import perf_counter
        t0 = perf_counter()
        tok = self.stage(batch)
        t1 = perf_counter()
        metrics = self.spiller(tok)
        t2 = perf_counter()
        return metrics.append_column(
            "t_tok_ms", pa.array([int((t1 - t0) * 1000)], type=pa.int64())
        ).append_column(
            "t_spill_ms", pa.array([int((t2 - t1) * 1000)], type=pa.int64()))


def _stage1_tag(cfg: IndexConfig) -> str:
    """Validity tag for the stage-1 resume marker.  The spilled fragments
    bake in EVERY tokenization-affecting choice, not just the partition
    grid: resuming them under a changed analyzer config (stem flipped,
    different text/id column, positions toggled, salting params) would
    silently encode stale fragments into an index whose manifest claims
    the new config — so all of it goes into the tag."""
    return (f"{cfg.n_buckets}x{cfg.n_doc_shards}"
            f"-{cfg.text_col}/{cfg.id_col}/{','.join(cfg.fields)}"
            f"-sw{int(cfg.stopwords)}st{int(cfg.stem)}"
            f"pos{int(cfg.positions)}"
            f"-salt{int(cfg.salt_hot_terms)}:{cfg.hot_df_fraction}"
            f":{cfg.salt}")


def _exchange_fs(ds, index_dir: str, cfg: IndexConfig, stage, batch_size,
                 concurrency, pending, need_docstore) -> None:
    """Filesystem external shuffle (see ``build_index`` docstring)."""
    import json as _json
    from ..stages.postings import FragmentEncoder, FragmentSpiller
    mark = _phase_timer()
    tmp_base = _scratch_dir(index_dir)
    frag_dir = os.path.join(tmp_base, "postings")
    doc_tmp = os.path.join(tmp_base, "docstore")
    marker = os.path.join(tmp_base, "_STAGE1_DONE")
    cfg_tag = _stage1_tag(cfg)
    for attempt in (0, 1):
        stage1_stats: dict | None = None
        if os.path.exists(marker):
            with open(marker) as f:
                try:
                    payload = _json.load(f)
                except ValueError:
                    payload = {}
            if payload.get("tag") == cfg_tag:
                stage1_stats = payload
        if stage1_stats is None:
            shutil.rmtree(tmp_base, ignore_errors=True)
            os.makedirs(frag_dir, exist_ok=True)
            # stages that support it emit dict-encoded terms: the spiller
            # then compacts per-slice dictionaries (int32 ops) instead of
            # re-hashing term strings per partition slice.  Flip the flag
            # on a COPY — a caller-supplied stage object must keep its
            # documented plain-string default for any later direct /
            # groupby-exchange use.
            if getattr(stage, "dict_terms", None) is False:
                import copy
                stage = copy.copy(stage)
                stage.dict_terms = True
            spiller = FragmentSpiller(frag_dir, doc_tmp, cfg.n_doc_shards)
            # batch = whole block: one fragment per (task, partition) keeps
            # the reduce side's file count at blocks × partitions minimum.
            # The consuming aggregate folds the docstats (n_docs, Σ doc_len)
            # out of the spillers' metric rows — no docstore re-read pass.
            sum_cols = ["n_docs", "total_tokens"]
            if os.environ.get("SERX_BUILD_TIMING"):
                sum_cols += ["t_tok_ms", "t_spill_ms"]
            with _full_width_execution(ds):
                sums = ds.map_batches(_TokenizeAndSpill(stage, spiller),
                                      batch_format="pyarrow",
                                      batch_size=None,
                                      concurrency=concurrency) \
                    .sum(sum_cols) or {}
            stage1_stats = {
                "tag": cfg_tag,
                "n_docs": int(sums.get("sum(n_docs)") or 0),
                "total_tokens": int(sums.get("sum(total_tokens)") or 0)}
            if os.environ.get("SERX_BUILD_TIMING"):
                import sys as _sys
                print(f"[build-timing] stage1 component CPU: "
                      f"tok={int(sums.get('sum(t_tok_ms)') or 0) / 1000:.1f}s "
                      f"spill={int(sums.get('sum(t_spill_ms)') or 0) / 1000:.1f}s",
                      file=_sys.stderr, flush=True)
            with open(marker, "w") as f:
                _json.dump(stage1_stats, f)
            mark("stage1 tokenize+spill")
        if not need_docstore:
            break
        docstore = os.path.join(index_dir, "docstore")
        dst_tmp = docstore + ".tmp"
        if os.path.exists(doc_tmp):
            # stage to the index device, PUBLISH atomically, only then
            # delete the source — every kill point leaves either doc_tmp
            # intact (re-stage) or the published docstore (done); no
            # partial state survives.  Same-device staging is an atomic
            # rename (free); cross-device (shm scratch → disk index) copies
            shutil.rmtree(dst_tmp, ignore_errors=True)
            try:
                os.rename(doc_tmp, dst_tmp)
            except OSError:
                shutil.copytree(doc_tmp, dst_tmp)
            # killed spill attempts can leave private ".tmp-*" staging
            # files beside the published fragments; parquet readers ignore
            # dot-prefixed files, but the durable docstore shouldn't carry
            # them
            for dp, _, fs in os.walk(dst_tmp):
                for f in fs:
                    if f.startswith(".tmp-"):
                        try:
                            os.unlink(os.path.join(dp, f))
                        except OSError:
                            pass
            shutil.rmtree(docstore, ignore_errors=True)
            os.replace(dst_tmp, docstore)
            shutil.rmtree(doc_tmp, ignore_errors=True)
            break
        if os.path.exists(dst_tmp):
            # killed between staging completion and publish.  dst_tmp is
            # always COMPLETE here: a rename is atomic, and a partial
            # copytree implies doc_tmp still exists (handled above).  It is
            # also always the NEWEST data — every staging attempt rmtree's
            # any older dst_tmp first — so it must win over a docstore a
            # previous run may have published (checked dst_tmp FIRST for
            # exactly that reason).
            shutil.rmtree(docstore, ignore_errors=True)
            os.replace(dst_tmp, docstore)
            break
        if os.path.exists(docstore):
            break   # published by an earlier (interrupted) run
        if stage1_stats.get("n_docs", 0) == 0:
            # empty corpus: stage 1 spilled no doc rows at all
            os.makedirs(docstore, exist_ok=True)
            pq.write_table(
                pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "doc_len": pa.array([], type=pa.int32())}),
                os.path.join(docstore, "empty.parquet"))
            break
        # marker claims docs but no docstore anywhere: stale/corrupt
        # scratch — invalidate stage 1 and redo it once
        if attempt == 0:
            shutil.rmtree(tmp_base, ignore_errors=True)
            continue
        raise RuntimeError(
            f"stage-1 marker in {tmp_base} claims "
            f"{stage1_stats['n_docs']} docs but no docstore exists in "
            f"scratch or {index_dir} even after a rebuild — inspect "
            f"scratch storage")
    if need_docstore:
        if "n_docs" in stage1_stats:
            # docstats folded out of the stage-1 metric rows — the build no
            # longer re-reads the docstore it just wrote
            ckpt.write_docstats(index_dir, n_docs=stage1_stats["n_docs"],
                                total_tokens=stage1_stats["total_tokens"])
    if pending:
        os.makedirs(ckpt.segments_dir(index_dir), exist_ok=True)
        # one BLOCK per partition: map_batches parallelism is per-block, so
        # a single-block parts table would encode all partitions serially
        # (override_num_blocks splits at the source — no repartition stage)
        parts = ray.data.from_items(
            [{"part": int(p)} for p in pending],
            override_num_blocks=len(pending))
        # docstore published above → encode in LOCAL docID space against the
        # shard dictionaries (postings shrink ~4×, searcher load decode is a
        # cumsum instead of a global searchsorted)
        enc = FragmentEncoder(frag_dir, ckpt.segments_dir(index_dir),
                              cfg.n_buckets,
                              docstore_dir=os.path.join(index_dir, "docstore"))
        with _full_width_execution(parts):
            parts.map_batches(enc, batch_format="pyarrow",
                              batch_size=1).materialize()
        mark("stage2 encode+commit")
    # all partitions committed → exchange fragments are garbage
    if not ckpt.pending_partitions(index_dir, cfg):
        shutil.rmtree(tmp_base, ignore_errors=True)
        mark("exchange cleanup")


def _exchange_groupby(ds, index_dir: str, cfg: IndexConfig, stage, batch_size,
                      concurrency, pending, need_docstore, keep,
                      docstore_path) -> None:
    """Idiomatic ``groupby('part')`` sort-shuffle exchange, materializing the
    tokenized stream once in the object store (spills under pressure)."""
    with _full_width_execution(ds):
        tokenized = ds.map_batches(
            stage, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency).materialize()
    if need_docstore:
        # tmp + swap (mirrors the fs path): a build killed mid-docstore-write
        # and resumed must not leave BOTH runs' uniquely-named parquet files
        # in docstore/ (that would double n_docs/avgdl and corrupt BM25).
        # Partitioned by doc shard (``shard=K/``) so each searcher actor —
        # and the local-docID encoder below — reads only its own shard.
        # the tokenize stages always emit the id column under the literal
        # name "doc_id" whatever cfg.id_col names the INPUT column — and
        # the query side (pipelines/query.py) reads docstores by that name
        doc_cols = ["doc_id", "doc_len", *keep]
        doc_tmp = docstore_path + ".tmp"
        shutil.rmtree(doc_tmp, ignore_errors=True)

        def add_shard(t: pa.Table, _n=cfg.n_doc_shards) -> pa.Table:
            import numpy as np
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "shard", pa.array((ids % _n).astype(np.int32)))

        tokenized.filter(expr="part == -1").select_columns(doc_cols) \
            .map_batches(add_shard, batch_format="pyarrow") \
            .write_parquet(doc_tmp, partition_cols=["shard"])
        if not os.path.isdir(doc_tmp):
            # empty corpus: Ray's write_parquet of a zero-row dataset
            # creates no output dir at all — publish an explicitly-empty
            # docstore (mirrors the fs path's empty-corpus branch)
            os.makedirs(doc_tmp, exist_ok=True)
            pq.write_table(
                pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "doc_len": pa.array([], type=pa.int32())}),
                os.path.join(doc_tmp, "empty.parquet"))
        shutil.rmtree(docstore_path, ignore_errors=True)
        os.replace(doc_tmp, docstore_path)
    if pending:
        seg_dir = ckpt.segments_dir(index_dir)
        os.makedirs(seg_dir, exist_ok=True)
        postings = tokenized.drop_columns(list(keep)) if keep else tokenized
        if len(pending) < cfg.n_partitions:
            want = pa.array(pending, type=pa.int32())
            postings = postings.map_batches(
                lambda t: t.filter(pc.is_in(t["part"], value_set=want)),
                batch_format="pyarrow")
        else:
            postings = postings.filter(expr="part >= 0")
        # docstore committed above → local-docID encoding (as in the fs path)
        writer = EncodePartitionWriter(seg_dir, cfg.n_buckets,
                                       docstore_dir=docstore_path)

        def encode_partition(group: pa.Table) -> pa.Table:
            return writer(group)

        with _full_width_execution(postings):
            postings.groupby("part").map_groups(
                encode_partition, batch_format="pyarrow").materialize()
        # groupby produces no group (and thus no _DONE) for partitions with
        # zero posting rows — commit those as empty segments so the manifest
        # completes and resume doesn't rebuild from scratch
        from ..stages.postings import commit_empty_partition
        still = set(ckpt.pending_partitions(index_dir, cfg)) & set(pending)
        for p in sorted(still):
            commit_empty_partition(seg_dir, p, cfg.n_buckets,
                                   docstore_dir=docstore_path)


def build_index(source: str | DatasetFactory, index_dir: str,
                config: IndexConfig | None = None, *,
                keep_cols: Iterable[str] = (),
                batch_size: int = 8192,
                tokenize_concurrency: int | None = None,
                postings_stage=None,
                postings_columns: list[str] | None = None,
                exchange: str = "auto") -> dict:
    """Build (or resume) the index at ``index_dir``. Returns the manifest.

    ``source`` is a parquet path/dir or a zero-arg Dataset factory (the
    factory is called once per pass; passes read disjoint column sets).
    ``postings_stage`` overrides the per-batch posting-row emitter (e.g.
    ``FieldedPostings`` for the multi-field reference index); it must emit
    a ``part`` column consistent with the config's partition grid, and
    ``postings_columns`` names the input columns it needs.

    ``exchange`` selects the partition exchange:

    - ``"auto"`` (default): ``"fs"`` on a single node, ``"groupby"`` when
      the cluster has >1 alive node (``stages.join.resolve_exchange``) —
      correct-by-default on both topologies.
    - ``"fs"``: external shuffle through the filesystem —
      tokenize tasks spill per-partition fragments (parallel, page-cache
      backed), one encode task per partition reads+commits them.  On a
      single node this bypasses the plasma store, the serializing resource
      of the sort shuffle (measured: raw tokenize scales 14k→419k docs/s
      from 1→32 procs while the plasma-routed build plateaus at 8).  On a
      cluster it requires node-shared scratch (`SERX_SCRATCH_DIR` on NFS
      or fast shared NVMe).
    - ``"groupby"``: idiomatic ``groupby('part').map_groups`` sort shuffle —
      the right shape on a multi-node cluster where each node contributes
      its own object store.
    """
    cfg = config or IndexConfig()
    from ..stages.join import resolve_exchange
    exchange = resolve_exchange(exchange)
    mark = _phase_timer()
    os.makedirs(index_dir, exist_ok=True)
    stopwords = ENGLISH_STOPWORDS if cfg.stopwords else None
    keep = tuple(keep_cols)

    docstore_path = os.path.join(index_dir, "docstore")
    need_docstore = not os.path.exists(os.path.join(index_dir, "docstats.json"))
    pending = ckpt.pending_partitions(index_dir, cfg)

    # ---- single tokenize pass: posting rows (part >= 0) + docstore rows
    # (part == -1) flow through ONE read+extract+tokenize.
    if pending or need_docstore:
        hot_terms = _hot_terms(source, index_dir, cfg, stopwords) \
            if (cfg.salt_hot_terms and postings_stage is None) else None
        mark("hot-term sampling")
        stage = postings_stage or TokenizePostings(
            text_col=cfg.text_col, id_col=cfg.id_col,
            stopwords=stopwords, stem=cfg.stem,
            n_buckets=cfg.n_buckets, n_doc_shards=cfg.n_doc_shards,
            hot_terms=hot_terms, salt=cfg.salt,
            emit_positions=cfg.positions)
        if postings_stage is not None:
            # flip build-mode flags on a COPY — a caller-supplied stage
            # object must keep its documented defaults for any later
            # direct map_batches use (same copy-on-write the fs exchange
            # applies for dict_terms)
            import copy
            stage = copy.copy(stage)
        stage.emit_doc_rows = True
        stage.keep_cols = keep
        cols = postings_columns or [cfg.id_col, cfg.text_col]
        ds = _resolve(source, sorted(set(cols) | set(keep)))

        if exchange == "fs":
            _exchange_fs(ds, index_dir, cfg, stage, batch_size,
                         tokenize_concurrency, pending, need_docstore)
        else:
            _exchange_groupby(ds, index_dir, cfg, stage, batch_size,
                              tokenize_concurrency, pending, need_docstore,
                              keep, docstore_path)

    # Global term stats are NOT materialized here: searchers aggregate df
    # from the segments' pruned (field, term, df) columns at load time.
    # ``write_termstats(index_dir)`` materializes the dedicated artifact when
    # the vocabulary is too large for load-time aggregation (merge_indexes
    # always writes it).

    if need_docstore and not os.path.exists(
            os.path.join(index_dir, "docstats.json")):
        # fallback only (groupby exchange / legacy resume states): the fs
        # exchange writes docstats from its stage-1 metric sums
        lens = ray.data.read_parquet(docstore_path, columns=["doc_len"])
        ckpt.write_docstats(index_dir, n_docs=lens.count(),
                            total_tokens=lens.sum("doc_len") or 0)
        mark("docstats pass")

    hot_path = os.path.join(index_dir, "hotterms.json")
    if os.path.exists(hot_path):
        import json as _json
        with open(hot_path) as f:
            cfg.extra["salted_terms"] = _json.load(f)["hot_terms"]
    metrics = ckpt.partition_metrics(index_dir, cfg)
    ckpt.write_manifest(index_dir, cfg, metrics)
    mark("manifest")
    return ckpt.read_manifest(index_dir)


# default column mapping for the articles-shaped pages corpus
# (sources/pages.py; reference fields at KaggleFinanceSourceEngine.cpp:213-254)
REFERENCE_TEXT_FIELDS = {"text": "text", "title": "title"}
REFERENCE_METADATA_FIELDS = {"site": "site", "author": "author",
                             "country": "country", "language": "lang",
                             "person": "persons", "location": "locations",
                             "organization": "organizations"}


def build_reference_index(source: str | DatasetFactory, index_dir: str,
                          config: IndexConfig | None = None, *,
                          text_fields: dict[str, str] | None = None,
                          metadata_fields: dict[str, str] | None = None,
                          **kwargs) -> dict:
    """Multi-field index with the reference's full field set: tokenized
    text+title postings plus the 7 metadata set-indexes (SURVEY §1.2)."""
    from dataclasses import replace as _dcreplace

    from ..stages.tokenize import FieldedPostings
    cfg = config or IndexConfig()
    tf = text_fields or cfg.extra.get("text_fields") or REFERENCE_TEXT_FIELDS
    mf = (metadata_fields or cfg.extra.get("metadata_fields")
          or REFERENCE_METADATA_FIELDS)
    # record the field mappings in the manifest so maintenance flows
    # (ingest_documents' delta builds) can reconstruct the fielded stage
    cfg = _dcreplace(cfg, fields=tuple(sorted(set(tf) | set(mf))),
                     extra={**cfg.extra, "text_fields": dict(tf),
                            "metadata_fields": dict(mf)})
    stage = FieldedPostings(
        id_col=cfg.id_col, text_fields=tf, metadata_fields=mf,
        stopwords=ENGLISH_STOPWORDS if cfg.stopwords else None,
        stem=cfg.stem, n_buckets=cfg.n_buckets, n_doc_shards=cfg.n_doc_shards)
    cols = [cfg.id_col] + sorted(set(tf.values()) | set(mf.values()))
    if "keep_cols" not in kwargs:
        # docstore carries the display header fields (reference
        # DisplaySource prints title/country/site, SearchEngine.h:68)
        kwargs["keep_cols"] = tuple(
            c for c in ("title", "site", "url") if c in cols)
    return build_index(source, index_dir, cfg, postings_stage=stage,
                       postings_columns=cols, **kwargs)
