"""Command-line surface mirroring the reference's ``main`` driver
(``/root/reference/main.cpp:12-58``): build (``ParseSources``), one-shot
query (``--search``), database dump (``--print-database``), interactive REPL
(``--ui`` with ``query`` / ``see N`` / ``parse`` / ``exit``), plus the
north-rule additions (merge, pruned BM25, reference-grammar queries).

This module owns the Ray session (guarded init) — the library never calls
``ray.init``.  Usable as a ``ray job submit -- python -m
search_engine_ray.cli build ...`` entrypoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None = None) -> None:
    # allocator page-retention env before workers spawn (see state/memtune.py)
    from search_engine_ray.state.memtune import set_allocator_env

    set_allocator_env()
    import ray
    if not ray.is_initialized():
        # under `ray job submit` the job runtime exports RAY_ADDRESS to the
        # cluster's address — honor it so the same CLI drives a multi-node
        # cluster; default stays a private local session
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "logging_level": "ERROR"}
        if address == "local":
            kwargs["include_dashboard"] = False
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def docstore_lookup(index_dir: str, doc_id: int) -> dict | None:
    """Point-get against the docstore dimension table (reference
    ``DisplaySource`` re-opens the source file by path,
    ``KaggleFinanceSourceEngine.cpp:99-116``; here the docstore carries the
    stored metadata)."""
    import json as _json
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from .state import checkpoint as ckpt
    # shard-partitioned docstore: read only the owning shard's partition
    store = os.path.join(index_dir, "docstore")
    try:
        with open(os.path.join(index_dir, "manifest.json")) as f:
            n_shards = _json.load(f)["config"]["n_doc_shards"]
        sdir = ckpt.docstore_shard_dir(index_dir, doc_id % n_shards)
        if os.path.isdir(sdir):
            store = sdir
    except (OSError, KeyError, ValueError):
        pass
    ds = pq.read_table(store)
    hit = ds.filter(pc.equal(ds["doc_id"], doc_id))
    return hit.to_pylist()[0] if hit.num_rows else None


def _source_for(path: str):
    """Parquet path/dir → used as-is; a directory of ``*.json`` article
    files (the reference's native corpus layout, e.g. its
    sample_kaggle_finance_data) → a Dataset factory through the Kaggle
    reader."""
    import glob as _glob
    if os.path.isdir(path) and not _glob.glob(os.path.join(path, "*.parquet")) \
            and _glob.glob(os.path.join(path, "**", "*.json"), recursive=True):
        from .sources.kaggle_json import read_kaggle_articles

        def factory():
            return read_kaggle_articles(path)
        factory.cache_tag = path
        return factory
    return path


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.build import build_index, build_reference_index
    from .state.checkpoint import IndexConfig
    cfg = IndexConfig(n_buckets=args.buckets, n_doc_shards=args.shards,
                      text_col=args.text_col, id_col=args.id_col,
                      stopwords=args.stopwords, stem=args.stem)
    builder = build_reference_index if args.fielded else build_index
    kwargs = {"exchange": args.exchange}
    if args.keep_cols:
        kwargs["keep_cols"] = tuple(args.keep_cols.split(","))
    man = builder(_source_for(args.source), args.index, cfg, **kwargs)
    done = len(man["partitions"])
    print(f"built {args.index}: {done}/{cfg.n_partitions} partitions committed")
    return 0 if done == cfg.n_partitions else 1


def cmd_query(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.query import QueryEngine
    qe = QueryEngine(args.index, num_searchers=args.searchers)
    if args.reference:
        for rank, doc_id in enumerate(qe.reference_query(args.query, k=args.k)):
            print(f"{rank:2d}  doc={doc_id}")
    elif _is_quoted_phrase(args.query):
        # "double-quoted input" = exact-phrase search (positional index)
        for rank, (doc_id, score) in enumerate(
                qe.phrase_query(args.query[1:-1], k=args.k)):
            print(f"{rank:2d}  doc={doc_id}  bm25={score:.6f}")
    elif _has_wildcard(args.query):
        # trailing-* tokens = prefix expansion over the term dictionary
        for rank, (doc_id, score) in enumerate(
                qe.prefix_query(args.query, k=args.k)):
            print(f"{rank:2d}  doc={doc_id}  bm25={score:.6f}")
    elif _has_fuzzy(args.query):
        # trailing-~ tokens = Levenshtein-1 expansion (Lucene fuzzy)
        for rank, (doc_id, score) in enumerate(
                qe.fuzzy_query(args.query, k=args.k)):
            print(f"{rank:2d}  doc={doc_id}  bm25={score:.6f}")
    elif _has_negation(args.query):
        # '-token' = boolean negation; remaining tokens are ANDed musts
        for rank, (doc_id, score) in enumerate(
                qe.boolean_query(args.query, k=args.k)):
            print(f"{rank:2d}  doc={doc_id}  bm25={score:.6f}")
    else:
        for rank, (doc_id, score) in enumerate(
                qe.query(args.query, k=args.k, prune=args.prune)):
            print(f"{rank:2d}  doc={doc_id}  bm25={score:.6f}")
    return 0


def _is_quoted_phrase(text: str) -> bool:
    t = text.strip()
    return len(t) >= 2 and t[0] == '"' and t[-1] == '"'


def _has_wildcard(text: str) -> bool:
    return any(tok.endswith("*") and len(tok) > 1 for tok in text.split())


def _has_negation(text: str) -> bool:
    return any(tok.startswith("-") and len(tok) > 1 for tok in text.split())


def _has_fuzzy(text: str) -> bool:
    return any(tok.endswith("~") and len(tok) > 1 for tok in text.split())


def cmd_print_database(args) -> int:
    """S4: console dump of the inverted index (``main.cpp:35-45``)."""
    import numpy as np
    import pyarrow.parquet as pq
    from .stages.postings import (decode_posting, load_shard_dict,
                                  segment_docid_space)
    from .state import checkpoint as ckpt
    man = ckpt.read_manifest(args.index)
    cfg = man["config"]
    docstore_dir = os.path.join(args.index, "docstore")
    shown = 0
    for s in range(cfg["n_doc_shards"]):
        for b in range(cfg["n_buckets"]):
            path = os.path.join(ckpt.partition_dir(args.index, s, b),
                                "postings.parquet")
            if not os.path.exists(path):
                continue
            seg = pq.read_table(path)
            # local-docID segments store shard-dictionary POSITIONS, not
            # docIDs — remap through the shard's docstore dictionary so the
            # dump prints the same global (signed int64) ids `show`/`see`
            # accept; raw uint64 decode would print unsigned-wrapped values
            # for negative content hashes
            dd = (load_shard_dict(docstore_dir, s)
                  if segment_docid_space(seg) == "local" else None)
            for row in seg.to_pylist():
                ids, tfs = decode_posting(row)
                ids = (dd[ids.astype(np.int64)] if dd is not None
                       else ids.view(np.int64))
                postings = ", ".join(f"{d}:{t}" for d, t in
                                     zip(ids[:8], tfs[:8]))
                more = "" if len(ids) <= 8 else f", …(+{len(ids) - 8})"
                print(f"[shard {s} bucket {b}] {row['field']}:{row['term']} "
                      f"df={row['df']} -> {{{postings}{more}}}")
                shown += 1
                if args.limit and shown >= args.limit:
                    return 0
    return 0


def cmd_show(args) -> int:
    """S5: display one document's stored record by docID."""
    row = docstore_lookup(args.index, args.doc_id)
    if row is None:
        print(f"doc {args.doc_id}: not found", file=sys.stderr)
        return 1
    print(json.dumps(row, default=str, indent=1))
    return 0


def cmd_delete(args) -> int:
    from .pipelines.maintenance import delete_docs
    n = delete_docs(args.index, args.doc_ids)
    print(f"tombstoned {n} docs in {args.index} "
          "(visible on next searcher start; run compact to reclaim)")
    return 0


def cmd_compact(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.maintenance import compact_index
    man = compact_index(args.index, args.into)
    print(f"compacted {args.index} -> {args.into} "
          f"({len(man['partitions'])} partitions)")
    return 0


def cmd_scratch_gc(args) -> int:
    """Ray-free janitor for orphaned fs-exchange scratch (see
    ``build.cleanup_orphan_scratch``)."""
    from .pipelines.build import cleanup_orphan_scratch
    removed = cleanup_orphan_scratch(args.base or None,
                                     min_age_s=args.min_age)
    for d in removed:
        print(f"removed {d}")
    print(f"{len(removed)} orphaned scratch dir(s) removed")
    return 0


def cmd_stats(args) -> int:
    """Index introspection without starting Ray: manifest config,
    per-partition byte/posting totals, docstats, tombstone counts."""
    import glob as _glob
    from .state import checkpoint as ckpt
    man = ckpt.read_manifest(args.index)
    cfg = man["config"]
    parts = man.get("partitions", [])
    seg_bytes = sum(p.get("bytes", 0) for p in parts)
    n_terms = sum(p.get("n_terms", 0) for p in parts)
    n_post = sum(p.get("n_postings", 0) for p in parts)
    ds = ckpt.read_docstats(args.index)
    tombs = 0
    for d in _glob.glob(os.path.join(args.index, "tombstones", "shard=*",
                                     "del-*.parquet")):
        import pyarrow.parquet as pq
        tombs += pq.read_metadata(d).num_rows
    print(json.dumps({
        "config": cfg,
        "partitions": len(parts),
        "segment_bytes": seg_bytes,
        "terms_with_postings": n_terms,
        "postings": n_post,
        "docstats": ds,
        "tombstoned_docs_recorded": tombs,
        "positions": bool(cfg.get("positions")),
        "fielded": bool(cfg.get("extra", {}).get("text_fields")),
    }, indent=1, default=str))
    return 0


def cmd_curate(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.curate import curate_corpus
    ds = curate_corpus(args.sf_dir, args.out,
                       min_tokens=args.min_tokens,
                       max_digit_ratio=args.max_digit_ratio,
                       source_cap=args.source_cap)
    print(f"curated corpus: {ds.count()} docs -> {args.out}")
    return 0


def cmd_explain(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.query import QueryEngine
    qe = QueryEngine(args.index, num_searchers=args.searchers)
    tbl = qe.explain(args.query, k=args.k)
    print(f"{'doc_id':>20} {'term':<16} {'tf':>4} {'dl':>5} {'df':>7} "
          f"{'idf':>8} {'contribution':>12}")
    for r in tbl.to_pylist():
        print(f"{r['doc_id']:>20} {r['term']:<16} {r['tf']:>4} "
              f"{r['doc_len']:>5} {r['df']:>7} {r['idf']:>8.4f} "
              f"{r['contribution']:>12.6f}")
    return 0


def cmd_ingest(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.maintenance import ingest_documents
    keep = tuple(args.keep_cols.split(",")) if args.keep_cols else None
    man = ingest_documents(args.index, _source_for(args.source),
                           keep_cols=keep, exchange=args.exchange)
    print(f"ingested {args.source} into {args.index} "
          f"({len(man['partitions'])} partitions)")
    return 0


def cmd_merge(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.merge import merge_indexes
    man = merge_indexes(args.inputs, args.into)
    print(f"merged {len(args.inputs)} indexes -> {args.into} "
          f"({len(man['partitions'])} partitions)")
    return 0


def cmd_ui(args) -> int:
    """Reference REPL (``SearchEngine.h:44-100``): ``query …`` ranks and
    shows the top 10 (O2), ``see N`` displays result N's stored record,
    ``parse PATH`` rebuilds the index, ``exit`` quits."""
    _ensure_ray(args.num_cpus)
    from .pipelines.query import QueryEngine
    qe = QueryEngine(args.index, num_searchers=args.searchers)
    last: list[int] = []
    last_query = ""
    print("commands: query <text> | explain <text> | see <n> | snip <n> | "
          "parse <source> | exit")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        cmd, _, rest = line.partition(" ")
        if cmd == "exit":
            break
        if cmd == "query":
            if _is_quoted_phrase(rest):
                results = qe.phrase_query(rest.strip()[1:-1], k=10)
            elif _has_wildcard(rest):
                results = qe.prefix_query(rest, k=10)
            elif _has_fuzzy(rest):
                results = qe.fuzzy_query(rest, k=10)
            elif _has_negation(rest):
                results = qe.boolean_query(rest, k=10)
            else:
                results = qe.query(rest, k=10)
            last = [d for d, _ in results]
            last_query = rest
            for rank, (doc_id, score) in enumerate(results):
                row = docstore_lookup(args.index, doc_id) or {}
                label = row.get("url", row.get("lang", ""))
                print(f"{rank:2d}  doc={doc_id}  bm25={score:.4f}  {label}")
        elif cmd == "explain":
            tbl = qe.explain(rest, k=10)
            for r in tbl.to_pylist():
                print(f"doc={r['doc_id']}  {r['term']:<14} tf={r['tf']:<3} "
                      f"df={r['df']:<6} idf={r['idf']:.4f} "
                      f"contrib={r['contribution']:.6f}")
        elif cmd == "see":
            try:
                doc = last[int(rest)]
            except (ValueError, IndexError):
                print("usage: see <rank from last query>")
                continue
            print(json.dumps(docstore_lookup(args.index, doc), default=str,
                             indent=1))
        elif cmd == "snip":
            # query-biased highlighted excerpt (functions/snippet.py) —
            # needs the doc text: the corpus via --corpus, or a docstore
            # that kept a text column (keep_cols=("text",...))
            try:
                doc = last[int(rest)]
            except (ValueError, IndexError):
                print("usage: snip <rank from last query>")
                continue
            if getattr(args, "corpus", None):
                from .pipelines.query import fetch_texts
                texts = fetch_texts(args.corpus, [doc])
            else:
                row = docstore_lookup(args.index, doc) or {}
                texts = {doc: row["text"]} if "text" in row else {}
            # render directly from the fetched text — `last` may have come
            # from a phrase/wildcard/fuzzy/boolean branch whose raw query
            # string a plain re-query wouldn't reproduce, so the doc could
            # be absent from a fresh top-10 even though its text is here
            doc_text = texts.get(doc)
            if doc_text is None:
                print("(no text available: pass --corpus or build with "
                      "keep_cols=('text',))")
            else:
                from .functions.analyze import tokenize
                from .functions.snippet import make_snippet
                terms = tokenize(last_query, stopwords=qe.stopwords,
                                 stem=qe.stem)
                snip = make_snippet(doc_text, terms, stem=qe.stem)
                print(snip if snip is not None
                      else "(no query term occurs in this document's text)")
        elif cmd == "parse":
            from .pipelines.build import build_index
            from .state import checkpoint as ckpt
            import shutil
            # reference semantics: parse wipes and rebuilds
            # (KaggleFinanceSourceEngine.cpp:118-129)
            shutil.rmtree(args.index, ignore_errors=True)
            cfgd = {k: v for k, v in (qe.cfg or {}).items()
                    if k in ("n_buckets", "n_doc_shards")}
            build_index(rest, args.index, ckpt.IndexConfig(**cfgd))
            qe = QueryEngine(args.index, num_searchers=args.searchers)
            print(f"rebuilt {args.index} from {rest}")
        else:
            print("commands: query <text> | see <n> | parse <source> | exit")
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="search_engine_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--buckets", type=int, default=16)
    b.add_argument("--shards", type=int, default=4)
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--keep-cols", default="")
    b.add_argument("--stopwords", action="store_true")
    b.add_argument("--stem", action="store_true")
    b.add_argument("--fielded", action="store_true",
                   help="multi-field reference index (title+metadata)")
    b.add_argument("--exchange", choices=["auto", "fs", "groupby"],
                   default="auto",
                   help="shuffle strategy: auto = fs on a single node, "
                        "groupby on a multi-node cluster; fs = filesystem "
                        "external shuffle (single node / shared fs), "
                        "groupby = Ray object-store sort shuffle")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="one-shot query (reference --search)")
    q.add_argument("--index", required=True)
    q.add_argument("query")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--searchers", type=int, default=4)
    q.add_argument("--prune", action="store_true")
    q.add_argument("--reference", action="store_true",
                   help="category grammar + 9-level reference ranking")
    q.set_defaults(fn=cmd_query)

    d = sub.add_parser("print-database", help="dump the inverted index (S4)")
    d.add_argument("--index", required=True)
    d.add_argument("--limit", type=int, default=50)
    d.set_defaults(fn=cmd_print_database)

    s = sub.add_parser("show", help="display one stored doc (S5)")
    s.add_argument("--index", required=True)
    s.add_argument("--doc-id", type=int, required=True)
    s.set_defaults(fn=cmd_show)

    de = sub.add_parser("delete", help="tombstone docs (searchable deletes)")
    de.add_argument("--index", required=True)
    de.add_argument("doc_ids", nargs="+", type=int)
    de.set_defaults(fn=cmd_delete)

    co = sub.add_parser("compact",
                        help="rewrite the index without tombstoned docs")
    co.add_argument("--index", required=True)
    co.add_argument("--into", required=True)
    co.set_defaults(fn=cmd_compact)

    st = sub.add_parser("stats", help="index layout + size + doc stats")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    gc = sub.add_parser("scratch-gc",
                        help="remove orphaned fs-exchange scratch dirs")
    gc.add_argument("--base", default=None,
                    help="scratch base (default: SERX_SCRATCH_DIR or "
                         "/dev/shm/serx_exchange)")
    gc.add_argument("--min-age", type=float, default=3600.0,
                    help="only touch dirs idle for at least this many secs")
    gc.set_defaults(fn=cmd_scratch_gc)

    cu = sub.add_parser("curate",
                        help="quality gate + exact dedup + decontamination"
                             " -> partitioned parquet")
    cu.add_argument("--sf-dir", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--min-tokens", type=int, default=60)
    cu.add_argument("--max-digit-ratio", type=float, default=0.05)
    cu.add_argument("--source-cap", type=int, default=None,
                    help="keep at most K docs per source (domain cap)")
    cu.set_defaults(fn=cmd_curate)

    ex = sub.add_parser("explain",
                        help="per-term BM25 breakdown for a query's top-k")
    ex.add_argument("--index", required=True)
    ex.add_argument("query")
    ex.add_argument("-k", type=int, default=10)
    ex.add_argument("--searchers", type=int, default=4)
    ex.set_defaults(fn=cmd_explain)

    ing = sub.add_parser("ingest",
                         help="incremental ingestion: delta build + merge "
                              "+ in-place swap (re-crawls update)")
    ing.add_argument("--index", required=True)
    ing.add_argument("--source", required=True)
    ing.add_argument("--keep-cols", default="")
    ing.add_argument("--exchange", choices=["fs", "groupby"], default="fs")
    ing.set_defaults(fn=cmd_ingest)

    m = sub.add_parser("merge", help="k-way merge of indexes")
    m.add_argument("--into", required=True)
    m.add_argument("inputs", nargs="+")
    m.set_defaults(fn=cmd_merge)

    u = sub.add_parser("ui", help="interactive REPL (reference --ui)")
    u.add_argument("--index", required=True)
    u.add_argument("--searchers", type=int, default=4)
    u.add_argument("--corpus", default=None,
                   help="corpus parquet for `snip <n>` text fetches")
    u.set_defaults(fn=cmd_ui)
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
