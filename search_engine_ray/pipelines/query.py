"""BM25 top-k query serving over the doc-sharded segment index.

Reference analogue: ``SearchEngine::HandleQuery``
(``/root/reference/SearchEngine.h:103-381``) probes the in-heap index maps
and ranks by raw tf sums.  Here (north rule) the index lives in Parquet
segments on a (doc-shard × term-bucket) grid; query serving is a **stateful
actor pool of document-shard searchers**: each :class:`SegmentSearcher` pins
its shards' term dictionary + packed postings in memory once (``__init__``),
every query fans out to all shard actors, each computes COMPLETE BM25 scores
for its disjoint document set (global df/avgdl from the build's termstats
pass) and returns only its local top-k, and the driver merges ``k × actors``
rows — bounded fan-in at any corpus size, unlike term-partitioned serving
whose per-query merge grows with df.  (This also fixes the reference
inefficiency of scanning every value_index shard per probe,
``SearchEngine.h:137-141``.)

Scoring: textbook BM25 (k1=1.2, b=0.75), ``idf = ln((N-df+0.5)/(df+0.5)+1)``,
float64.  Each doc lives in exactly one shard, so its score is assembled in
one actor from a deterministic sorted-term order → rank/score-identical to
the single-process oracle under any partitioning, with the deterministic
(-score, doc_id) tie-break (the reference's unstable tie order,
``SearchEngine.h:342-381``, made deterministic per SURVEY.md §2.6 O1).
Query semantics are pure OR-union, matching the reference (SURVEY §2.7).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..functions.analyze import ENGLISH_STOPWORDS, tokenize
from ..stages.postings import decode_segment_streams, segment_docid_space
from ..state import checkpoint as ckpt


def bm25_idf(n_docs: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def sparse_union(ids_parts: list[np.ndarray], sc_parts: list[np.ndarray]
                 ) -> tuple[np.ndarray, np.ndarray]:
    """OR-union of per-term (local ids, scores) parts → (ascending unique
    ids, per-doc summed scores).  O(Σdf · log Σdf) in the POSTINGS touched,
    independent of the searcher's corpus size — the query path must never
    cost O(n_docs): at 10^12-doc scale a per-query dense accumulator is a
    multi-GB allocation plus full scans per term.  The stable sort keeps
    each doc's contributions in part (term) order, so the left-to-right
    ``reduceat`` sums are bit-identical to sequential dense accumulation."""
    cat = np.concatenate(ids_parts)
    if cat.size == 0:
        return cat.astype(np.int64), np.zeros(0, dtype=np.float64)
    sc = np.concatenate(sc_parts)
    order = np.argsort(cat, kind="stable")
    cid, csc = cat[order], sc[order]
    starts = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
    return cid[starts].astype(np.int64), np.add.reduceat(csc, starts)


def edit_distance_le1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance ≤ 1 test (SQL ``levenshtein(a,b) <= 1``
    parity: a transposition counts 2, so 'ab'→'ba' is NOT within 1)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


class SegmentSearcher:
    """Holds the postings of a set of DOC SHARDS in memory; answers queries
    with complete per-doc scores for its shards' documents.

    Plain class — wrapped in ``ray.remote`` by :class:`QueryEngine` for the
    actor-pool deployment, instantiable directly for in-process tests.
    """

    def __init__(self, index_dir: str, shards: list[int],
                 field: str = "text"):
        from ..functions.hashing import fnv1a64_array
        from ..functions.hashing import _ALT_OFFSET, _ALT_PRIME
        # canonical order: slot numbering (and therefore the decoded-
        # postings cache, keyed on the sorted set) must not depend on the
        # caller's shard ordering
        shards = sorted(set(shards))
        stats = ckpt.read_docstats(index_dir)
        man = ckpt.read_manifest(index_dir)
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"] or 1.0
        self.k1 = man["config"]["bm25_k1"]
        self.b = man["config"]["bm25_b"]
        self.field = field  # BM25-scored text field

        # ---- docstore: shard-partitioned layout (round 3) reads ONLY the
        # owned shards' rows — O(corpus / n_searchers) per actor; flat
        # (round-1/2) docstores fall back to the full-read + modulo filter.
        # The per-shard SORTED UNIQUE docID array is the shard's local-docID
        # dictionary, shared with the build-time encoder.
        n_shards_total = man["config"]["n_doc_shards"]
        shard_dicts: dict[int, np.ndarray] = {}
        shard_lens: dict[int, np.ndarray] = {}
        store_root = ckpt.docstore_dir(index_dir)
        partitioned = any(
            os.path.isdir(ckpt.docstore_shard_dir(index_dir, s))
            for s in range(n_shards_total))
        flat_ids = flat_lens = None
        if not partitioned and shards:
            # legacy flat docstore: ONE full read, filtered per owned shard
            # below (reading it inside the loop would multiply startup I/O
            # by the owned-shard count)
            store = pq.read_table(store_root, columns=["doc_id", "doc_len"])
            flat_ids = store["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            flat_lens = store["doc_len"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        for s in shards:
            if partitioned:
                sdir = ckpt.docstore_shard_dir(index_dir, s)
                if os.path.isdir(sdir):
                    t = pq.read_table(sdir, columns=["doc_id", "doc_len"])
                    ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                    lens = t["doc_len"].to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                else:
                    ids = np.zeros(0, dtype=np.int64)
                    lens = np.zeros(0, dtype=np.int64)
            else:
                mask = (flat_ids % n_shards_total) == s
                ids, lens = flat_ids[mask], flat_lens[mask]
            order = np.argsort(ids, kind="stable")
            ids, lens = ids[order], lens[order]
            first = np.ones(ids.size, dtype=bool)
            first[1:] = ids[1:] != ids[:-1]
            shard_dicts[s] = ids[first]
            shard_lens[s] = lens[first]
        cat_ids = (np.concatenate([shard_dicts[s] for s in shards])
                   if shards else np.zeros(0, dtype=np.int64))
        cat_lens = (np.concatenate([shard_lens[s] for s in shards])
                    if shards else np.zeros(0, dtype=np.int64))
        order = np.argsort(cat_ids, kind="stable")
        self._docs = cat_ids[order]
        # BM25 doc-length norms, aligned with the local docID dictionary
        self._doc_len = cat_lens[order].astype(np.float64)
        # tombstones (pipelines/maintenance.delete_docs): deleted docs are
        # masked out of every decode path; statistics stay pre-delete until
        # compaction (the searchable-deletes convention)
        from ..pipelines.maintenance import load_tombstones
        dead_global = (np.concatenate([load_tombstones(index_dir, s)
                                       for s in shards]) if shards
                       else np.zeros(0, dtype=np.int64))
        self._alive = np.ones(self._docs.size, dtype=bool)
        if dead_global.size:
            pos = np.searchsorted(self._docs, dead_global)
            ok = pos < self._docs.size
            ok[ok] = self._docs[pos[ok]] == dead_global[ok]
            self._alive[pos[ok]] = False
        self._n_dead = int((~self._alive).sum())
        pos = self._doc_len[self._doc_len > 0]
        self._dl_min = float(pos.min()) if pos.size else 1.0
        # per-shard local id → searcher-dense index (shards are disjoint
        # modulo classes, so every dictionary entry is present exactly once)
        shard_map = {s: np.searchsorted(self._docs, shard_dicts[s])
                     .astype(np.int64) for s in shards}

        # ---- Arrow-native load: posting binaries are decoded ONCE per
        # file in a single vectorized concatenated-stream pass
        # (decode_segment_streams).  Local-space segments (round-3 format)
        # decode straight into per-shard local ids — a cumsum + one gather
        # through shard_map, NO global searchsorted — which removes the
        # multi-second post-build decode the round-2 _postcache existed to
        # hide; the cache machinery is gone with it.  Legacy global-space
        # segments take the searchsorted path.  The (field, term) → slots
        # dictionary is a SORTED 128-bit key-hash array probed by binary
        # search; a probe matches only if BOTH independent 64-bit hashes
        # match (collision ~2^-128).
        tables, local_parts, tf_parts, count_parts = [], [], [], []
        pos_bufs: list[np.ndarray] = []
        pos_off_parts: list[np.ndarray] = []   # per-slot byte offsets (n+1)
        pos_base = 0
        for s in shards:
            pattern = os.path.join(ckpt.shard_dir(index_dir, s),
                                   "bucket=*", "postings.parquet")
            for path in sorted(glob.glob(pattern)):
                t = pq.read_table(path)
                space = segment_docid_space(t)
                doc_vals, tfs, slot_off = decode_segment_streams(t)
                if space == "local":
                    local = shard_map[s][doc_vals]
                else:
                    local = np.searchsorted(self._docs, doc_vals)
                local_parts.append(local.astype(np.int32))
                tf_parts.append(tfs.astype(np.uint32))
                count_parts.append(np.diff(slot_off))
                # positional segments: keep the packed per-term positions
                # streams (decoded lazily per phrase term, not eagerly)
                from ..stages.postings import binary_column_bytes
                if "positions" in t.column_names and t.num_rows:
                    buf, off = binary_column_bytes(t["positions"])
                    pos_bufs.append(buf)
                    pos_off_parts.append(off[:-1] + pos_base)
                    pos_base += buf.size
                else:
                    pos_off_parts.append(
                        np.full(t.num_rows, pos_base, dtype=np.int64))
                t = t.drop_columns(
                    [c for c in ("doc_ids", "tfs", "positions")
                     if c in t.column_names])
                t = t.replace_schema_metadata(None)
                if "field" not in t.column_names:
                    t = t.append_column(
                        "field", pa.array([field] * t.num_rows,
                                          type=pa.string()))
                tables.append(t)
        seg = (pa.concat_tables(tables).combine_chunks() if tables
               else None)
        self._seg = seg
        # slot i's packed positions = _pos_buf[_pos_off[i]:_pos_off[i+1]]
        # (zero-length when the index carries no positions)
        self._pos_buf = (np.concatenate(pos_bufs) if pos_bufs
                         else np.zeros(0, dtype=np.uint8))
        self._pos_off = (np.append(np.concatenate(pos_off_parts), pos_base)
                         .astype(np.int64) if pos_off_parts
                         else np.zeros(1, dtype=np.int64))
        self.has_positions = bool(pos_bufs)
        if seg is not None and seg.num_rows:
            self._post_local = np.concatenate(local_parts)
            self._post_tf = np.concatenate(tf_parts)
            counts = np.concatenate(count_parts)
            self._slot_off = np.zeros(counts.size + 1, dtype=np.int64)
            np.cumsum(counts, out=self._slot_off[1:])
        else:
            self._slot_off = np.zeros(1, dtype=np.int64)
            self._post_local = np.zeros(0, dtype=np.int32)
            self._post_tf = np.zeros(0, dtype=np.uint32)
        self._max_tf_col = (seg["max_tf"].to_numpy(zero_copy_only=False)
                            .astype(np.int64) if seg is not None
                            else np.zeros(0, dtype=np.int64))
        if seg is not None and seg.num_rows:
            keys = pc.binary_join_element_wise(seg["field"], seg["term"],
                                               "\x00")
            h1 = fnv1a64_array(keys)
            h2 = fnv1a64_array(keys, offset=_ALT_OFFSET, prime=_ALT_PRIME)
            order = np.lexsort((h2, h1))
            self._key_h1, self._key_h2 = h1[order], h2[order]
            self._slot_order = order.astype(np.int64)
        else:
            self._key_h1 = np.zeros(0, dtype=np.uint64)
            self._key_h2 = np.zeros(0, dtype=np.uint64)
            self._slot_order = np.zeros(0, dtype=np.int64)

        # GLOBAL df for scoring (summed across ALL doc shards), as another
        # sorted hash-keyed array.  Preferred source is the materialized
        # termstats table (merge_indexes / write_termstats — the artifact
        # for extreme vocab); otherwise aggregate from the segment files'
        # tiny (field, term, df) columns — parquet column pruning skips the
        # posting binaries, so this reads ~the global term dictionary.
        ts_dir = ckpt.termstats_dir(index_dir)
        if os.path.exists(ts_dir):
            has_field = "field" in pq.read_schema(
                glob.glob(os.path.join(ts_dir, "*.parquet"))[0]).names
            ts = pq.read_table(
                ts_dir, columns=["term", "df"] + (["field"] if has_field
                                                  else []))
            if has_field:
                ts = ts.filter(pc.equal(ts["field"], field))
            dfs = ts["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            terms_col = ts["term"].combine_chunks()
        else:
            parts = []
            pattern = os.path.join(ckpt.segments_dir(index_dir), "shard=*",
                                   "bucket=*", "postings.parquet")
            for path in sorted(glob.glob(pattern)):
                t = pq.read_table(path, columns=["field", "term", "df"])
                parts.append(t.filter(pc.equal(t["field"], field)))
            if parts:
                allp = pa.concat_tables(parts)
                agg = allp.group_by("term").aggregate([("df", "sum")])
                dfs = agg["df_sum"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                terms_col = agg["term"].combine_chunks()
            else:
                dfs = np.zeros(0, dtype=np.int64)
                terms_col = pa.array([], type=pa.string())
        if len(terms_col):
            fld = pa.array([field] * len(terms_col), type=pa.string())
            dkeys = pc.binary_join_element_wise(fld, terms_col, "\x00")
            d1 = fnv1a64_array(dkeys)
            d2 = fnv1a64_array(dkeys, offset=_ALT_OFFSET, prime=_ALT_PRIME)
            # keep only terms present in this searcher's shards (memory:
            # a shard holds ~vocab/n_shards of the global dictionary)
            local = np.isin(d1, self._key_h1)
            order = np.lexsort((d2[local], d1[local]))
            self._df_h1 = d1[local][order]
            self._df_h2 = d2[local][order]
            self._df_vals = dfs[local][order]
        else:
            self._df_h1 = np.zeros(0, dtype=np.uint64)
            self._df_h2 = np.zeros(0, dtype=np.uint64)
            self._df_vals = np.zeros(0, dtype=np.int64)
        # decode-once cache: term → (local int32 ids, bm25 contributions);
        # BM25 per posting depends only on (tf, dl, df) — all fixed at build
        # time — so the per-term score vector is decoded+scored once and
        # every query is bincount+top-k.  LRU-bounded for web-scale shards
        # where the full decoded index exceeds the heap.
        from collections import OrderedDict
        self._score_cache: OrderedDict[str, tuple[np.ndarray, np.ndarray]] = \
            OrderedDict()
        # bounded by BYTES, not term count: one head term's vector is
        # df·12 B (int32 ids + float64 scores) — at web scale a count cap
        # alone would not bound the heap
        self._cache_max_bytes = 1 << 31
        # block-max summaries for the pruned path: per term, docID-sorted
        # scores plus per-block (first_docid, max_score) — ~1/BLOCK the
        # score vector, count-capped LRU
        self._block_cache: OrderedDict[str, tuple] = OrderedDict()
        # reused dense-union accumulator (see _union_scores)
        self._dense_buf: np.ndarray | None = None
        self._cache_bytes = 0
        # per-metadata-field doc→group multimaps for collapsed search,
        # built lazily on first use (see _group_map)
        self._group_maps: dict[str, tuple[np.ndarray, np.ndarray, list[str]]] = {}

    def _slots_of(self, field: str, term: str) -> np.ndarray:
        """Binary-search the sorted 128-bit key-hash arrays → slot indices
        of the (field, term) posting runs (one per shard×bucket, plus salt
        spreads).  O(log vocab) per probe, no dictionary build."""
        from ..functions.hashing import key_hash128_scalar
        k1, k2 = key_hash128_scalar(f"{field}\x00{term}")
        k1, k2 = np.uint64(k1), np.uint64(k2)
        lo = int(np.searchsorted(self._key_h1, k1, side="left"))
        hi = int(np.searchsorted(self._key_h1, k1, side="right"))
        if lo == hi:
            return np.zeros(0, dtype=np.int64)
        sel = lo + np.flatnonzero(self._key_h2[lo:hi] == k2)
        return self._slot_order[sel]

    def _global_df(self, term: str, field: str | None = None) -> int:
        from ..functions.hashing import key_hash128_scalar
        k1, k2 = key_hash128_scalar(f"{field or self.field}\x00{term}")
        k1, k2 = np.uint64(k1), np.uint64(k2)
        lo = int(np.searchsorted(self._df_h1, k1, side="left"))
        hi = int(np.searchsorted(self._df_h1, k1, side="right"))
        if lo == hi:
            return 0
        sel = np.flatnonzero(self._df_h2[lo:hi] == k2)
        return int(self._df_vals[lo + sel[0]]) if sel.size else 0

    def _decode_slot(self, slot: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One posting run → (local int32 ids, tf float64, doc_len float64).
        Postings were decoded once at load — this is a pure slice."""
        s, e = self._slot_off[slot], self._slot_off[slot + 1]
        local = self._post_local[s:e]
        tf = self._post_tf[s:e].astype(np.float64)
        if self._n_dead:
            m = self._alive[local]
            if not m.all():
                local, tf = local[m], tf[m]
        return (local, tf, self._doc_len[local])

    def _term_scores(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        cached = self._score_cache.get(term)
        if cached is not None:
            self._score_cache.move_to_end(term)
            return cached
        slots = self._slots_of(self.field, term)
        if not slots.size:
            return None
        idf = bm25_idf(self.n_docs, float(self._global_df(term)))
        ids_parts, score_parts = [], []
        for slot in slots:
            local_ids, tf, dl = self._decode_slot(slot)
            denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            ids_parts.append(local_ids)
            score_parts.append(idf * tf * (self.k1 + 1.0) / denom)
        entry = (np.concatenate(ids_parts), np.concatenate(score_parts))
        self._score_cache[term] = entry
        self._cache_bytes += entry[0].nbytes + entry[1].nbytes
        while self._cache_bytes > self._cache_max_bytes and \
                len(self._score_cache) > 1:
            _, (eids, esc) = self._score_cache.popitem(last=False)
            self._cache_bytes -= eids.nbytes + esc.nbytes
        return entry

    def _union_scores(self, parts: list[tuple[np.ndarray, np.ndarray]]
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Adaptive OR-union → (ascending unique local ids, summed scores).
        Head-heavy queries (touched postings a large fraction of this
        searcher's docs) take the dense gather-add, whose O(n_docs) cost is
        then amortized by the work itself; everything else takes the
        corpus-size-independent :func:`sparse_union`.  Both orders add each
        doc's contributions in term order — identical floats."""
        m = sum(p[0].size for p in parts)
        if parts and m >= (len(self._docs) >> 3) and len(parts) > 1:
            # REUSED per-searcher accumulator: a fresh np.zeros(n_docs)
            # per query faults ~n_docs/512 pages each time (3 MB at a
            # 400k-doc shard) — the dominant per-query cost on this
            # fault-slow host.  The buffer is restored to all-zeros by
            # re-scattering 0.0 through the SAME per-part id lists the add
            # loop used — correct for any scorer sign (a zero/negative
            # contribution can't strand residue the way a ``dense > 0``
            # reset mask would); any failure discards the buffer.
            dense = self._dense_buf
            if dense is None or dense.size != len(self._docs):
                dense = self._dense_buf = np.zeros(len(self._docs),
                                                   dtype=np.float64)
            try:
                for ids, sc in parts:
                    # ids are unique within a term (one posting per doc), so
                    # the fused gather-add is exact — and ~2× cheaper than a
                    # sort-merge at head-term sizes
                    dense[ids] += sc
                hits = np.flatnonzero(dense != 0.0)
                out = dense[hits]          # fancy index → fresh array
                for ids, _sc in parts:
                    dense[ids] = 0.0
            except BaseException:
                self._dense_buf = None     # buffer state unknown — drop it
                raise
            return hits, out
        return sparse_union([p[0] for p in parts], [p[1] for p in parts])

    def search(self, terms: list[str], k: int = 10
               ) -> tuple[np.ndarray, np.ndarray]:
        """OR-union BM25 over this searcher's docs → local top-k
        (doc_ids int64, scores float64), ordered by (-score, doc_id)."""
        parts = [p for p in (self._term_scores(t) for t in sorted(set(terms)))
                 if p is not None]
        if not parts:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        hits, scores = self._union_scores(parts)
        if hits.size > 4 * k > 0:
            # exact prefilter: keep every doc scoring >= the k-th largest
            # (ties at the boundary included), then tie-break-sort the rest
            thresh = np.partition(scores, hits.size - k)[hits.size - k]
            sel = scores >= thresh
            hits, scores = hits[sel], scores[sel]
        return top_k(self._docs[hits], scores, k)

    def search_fielded(self, terms: list[str], k: int = 10,
                       title_weight: float = 2.0,
                       title_field: str = "title"
                       ) -> tuple[np.ndarray, np.ndarray]:
        """Simple BM25F (Robertson & Zaragoza): per-term field tfs are
        combined into ONE weighted pseudo-frequency BEFORE the saturation
        nonlinearity — ``tfw = tf_text/B(d) + w_title·tf_title`` with the
        text field length-normalized (``B = 1 − b + b·dl/avgdl``) and the
        title field unnormalized (``b_title = 0``, the standard config for
        a short near-constant-length field) — then scored once:
        ``idf_text · tfw·(k1+1)/(tfw + k1)``.  IDF comes from the main
        (text) field's global df; on a title⊆text corpus every title match
        is also a text match, so df_text covers the full candidate set."""
        parts = []
        for t in sorted(set(terms)):
            key = f"\x01bm25f\x00{title_field}\x00{title_weight!r}\x00{t}"
            cached = self._score_cache.get(key)
            if cached is not None:
                self._score_cache.move_to_end(key)
                parts.append(cached)
                continue
            tf_parts = []
            for slot in self._slots_of(self.field, t):
                local, tf, dl = self._decode_slot(slot)
                norm = 1.0 - self.b + self.b * dl / self.avgdl
                tf_parts.append((local, tf / norm))
            for slot in self._slots_of(title_field, t):
                local, tf, _dl = self._decode_slot(slot)
                tf_parts.append((local, title_weight * tf))
            if not tf_parts:
                continue
            ids, tfw = self._union_scores(tf_parts)
            idf = bm25_idf(self.n_docs, float(self._global_df(t)))
            entry = (ids, idf * tfw * (self.k1 + 1.0) / (tfw + self.k1))
            self._score_cache[key] = entry
            self._cache_bytes += entry[0].nbytes + entry[1].nbytes
            while self._cache_bytes > self._cache_max_bytes and \
                    len(self._score_cache) > 1:
                _, (eids, esc) = self._score_cache.popitem(last=False)
                self._cache_bytes -= eids.nbytes + esc.nbytes
            parts.append(entry)
        if not parts:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        hits, scores = self._union_scores(parts)
        if hits.size > 4 * k > 0:
            thresh = np.partition(scores, hits.size - k)[hits.size - k]
            sel = scores >= thresh
            hits, scores = hits[sel], scores[sel]
        return top_k(self._docs[hits], scores, k)

    def search_boolean(self, must: list[str], must_not: list[str],
                       k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Conjunctive BM25 with negation: a doc qualifies iff it contains
        EVERY ``must`` term and NONE of the ``must_not`` terms; the score is
        the summed BM25 of the must terms (idf global, as everywhere).
        Doc-sharded serving makes this exact locally — a doc's postings for
        all its terms live in this searcher, so AND/NOT need no cross-shard
        traffic.  A must term absent from this shard → no local hits."""
        empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        musts = sorted(set(must))
        if not musts:
            return empty
        parts = [self._term_scores(t) for t in musts]
        if any(p is None for p in parts):
            return empty
        # sparse AND: sort-merge the must postings; a doc qualifies iff its
        # group has one contribution per must term (ids unique within a
        # term).  O(Σdf_must log), never O(n_docs).
        cat = np.concatenate([p[0] for p in parts])
        if cat.size == 0:
            return empty
        sc = np.concatenate([p[1] for p in parts])
        order = np.argsort(cat, kind="stable")
        cid, csc = cat[order], sc[order]
        starts = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
        counts = np.diff(np.append(starts, cid.size))
        full = counts == len(musts)
        hits = cid[starts[full]].astype(np.int64)
        scores = np.add.reduceat(csc, starts)[full] if starts.size else \
            np.zeros(0, dtype=np.float64)
        for t in sorted(set(must_not)):
            p = self._term_scores(t)
            if p is not None and hits.size:
                bad = np.isin(hits, p[0], assume_unique=False)
                hits, scores = hits[~bad], scores[~bad]
        if hits.size > 4 * k > 0:
            thresh = np.partition(scores, hits.size - k)[hits.size - k]
            sel = scores >= thresh
            hits, scores = hits[sel], scores[sel]
        return top_k(self._docs[hits], scores, k)

    def search_collapsed(self, terms: list[str], group_field: str,
                         ) -> tuple[list[str], np.ndarray, np.ndarray]:
        """Field-collapsed (diversity) BM25 partials: for every value of the
        metadata ``group_field``, this searcher's best-scoring matching doc
        (ties → lowest global docID).  Output is ≤ one row per group value —
        the driver merge sees n_searchers × n_groups rows, never docs.
        Scores stay global-df BM25; docs with no query term don't qualify."""
        empty = ([], np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        parts = [p for p in (self._term_scores(t) for t in sorted(set(terms)))
                 if p is not None]
        if not parts or self._seg is None:
            return empty
        hits, hit_sc = self._union_scores(parts)
        gdocs, gcodes, values = self._group_map(group_field)
        if not hits.size or not gdocs.size:
            return empty
        # (doc, group) pairs whose doc matched a query term: one sorted-
        # array intersection against the ascending scored-union ids
        pos = np.searchsorted(hits, gdocs)
        ok = pos < hits.size
        ok[ok] = hits[pos[ok]] == gdocs[ok]
        md, mg, ms = gdocs[ok], gcodes[ok], hit_sc[pos[ok]]
        if not md.size:
            return empty
        # champion per group = max score, tie → min global docID (global
        # order == ascending local index); one lexsort, first row per group
        order = np.lexsort((md, -ms, mg))
        md, mg, ms = md[order], mg[order], ms[order]
        first = np.concatenate(([True], mg[1:] != mg[:-1]))
        return ([values[g] for g in mg[first]],
                self._docs[md[first]].astype(np.int64),
                ms[first].astype(np.float64))

    def _group_map(self, field: str
                   ) -> tuple[np.ndarray, np.ndarray, list[str]]:
        """Lazily-built doc→group multimap for one metadata field:
        (ascending local doc ids, aligned group codes, sorted group value
        strings).  A doc appears once per value it carries (metadata fields
        are sets).  Built ONCE per searcher so collapsed search never pays
        the O(n_groups) per-query dictionary walk it replaced — at web
        scale a collapse field (e.g. host) has millions of values."""
        got = self._group_maps.get(field)
        if got is not None:
            return got
        empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64),
                 [])
        if self._seg is None or not self._seg.num_rows:
            self._group_maps[field] = empty
            return empty
        # fully vectorized build — no Python loop over group values: take
        # the field's slots, expand each slot's posting run via a ranges-
        # concat gather, tag with the value's code, dedupe (group, doc)
        mask = pc.equal(self._seg["field"], field).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        slots = np.flatnonzero(mask)
        if not slots.size:
            self._group_maps[field] = empty
            return empty
        slot_terms = self._seg["term"].combine_chunks() \
            .to_numpy(zero_copy_only=False)[slots]
        values_arr = np.unique(slot_terms)          # sorted unique values
        codes = np.searchsorted(values_arr, slot_terms)
        lens = np.diff(self._slot_off)[slots].astype(np.int64)
        starts = self._slot_off[slots]
        total = int(lens.sum())
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(offs, lens) + np.repeat(starts, lens))
        docs = self._post_local[idx].astype(np.int64)
        gcodes = np.repeat(codes, lens)
        order = np.lexsort((docs, gcodes))
        docs, gcodes = docs[order], gcodes[order]
        keep = np.concatenate(([True], (docs[1:] != docs[:-1])
                               | (gcodes[1:] != gcodes[:-1])))
        docs, gcodes = docs[keep], gcodes[keep]
        order = np.argsort(docs, kind="stable")
        entry = (docs[order], gcodes[order], values_arr.tolist())
        self._group_maps[field] = entry
        return entry

    def vocabulary(self, field: str | None = None) -> set[str]:
        """Debug/test accessor: this searcher's term set (optionally one
        field's).  Materializes Python strings — NOT a query-path API."""
        if self._seg is None:
            return set()
        t = self._seg
        if field is not None:
            t = t.filter(pc.equal(t["field"], field))
        return set(t["term"].to_pylist())

    def df_of(self, terms: list[str]) -> dict[str, int]:
        out = {}
        for t in terms:
            df = self._global_df(t)
            if df:
                out[t] = df
        return out

    def search_with_stats(self, terms: list[str], k: int,
                          df_map: dict, n_docs: int, avgdl: float
                          ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k with CALLER-SUPPLIED corpus statistics (summed df,
        total n_docs, pooled avgdl) — the scoring half of federated
        multi-index search, where statistics span indexes this searcher
        has never seen.  Bypasses the per-term score cache (its entries
        bake in this index's own stats)."""
        parts = []
        for t in sorted(set(terms)):
            df = int(df_map.get(t, 0))
            if df <= 0:
                continue
            slots = self._slots_of(self.field, t)
            if not slots.size:
                continue
            idf = bm25_idf(n_docs, float(df))
            ids_parts, sc_parts = [], []
            for slot in slots:
                local_ids, tf, dl = self._decode_slot(slot)
                denom = tf + self.k1 * (1.0 - self.b
                                        + self.b * dl / avgdl)
                ids_parts.append(local_ids)
                sc_parts.append(idf * tf * (self.k1 + 1.0) / denom)
            parts.append((np.concatenate(ids_parts),
                          np.concatenate(sc_parts)))
        if not parts:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.float64))
        hits, scores = self._union_scores(parts)
        return top_k(self._docs[hits], scores, k)

    def explain(self, terms: list[str], doc_ids) -> pa.Table:
        """Per-(doc, term) BM25 breakdown for the given GLOBAL docIDs this
        searcher owns → (doc_id, term, tf, doc_len, df, idf, contribution);
        a doc's contributions sum to exactly its :meth:`search` score.
        Cost is one postings probe per query term (the docs filter is a
        searchsorted against a k-sized id list), so it's cheap enough to
        run per served query for debugging/relevance work."""
        want = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        cols: dict[str, list] = {c: [] for c in (
            "doc_id", "term", "tf", "doc_len", "df", "idf", "contribution")}
        for t in sorted(set(terms)):
            slots = self._slots_of(self.field, t)
            if not slots.size or not want.size:
                continue
            df = int(self._global_df(t))
            idf = float(bm25_idf(self.n_docs, float(df)))
            for slot in slots:
                local_ids, tf, dl = self._decode_slot(slot)
                g = self._docs[local_ids]
                pos = np.minimum(np.searchsorted(want, g), want.size - 1)
                m = want[pos] == g
                if not m.any():
                    continue
                tfm, dlm = tf[m].astype(np.float64), dl[m].astype(np.float64)
                denom = tfm + self.k1 * (1.0 - self.b
                                         + self.b * dlm / self.avgdl)
                cols["doc_id"].extend(g[m].tolist())
                cols["term"].extend([t] * int(m.sum()))
                cols["tf"].extend(tf[m].astype(np.int64).tolist())
                cols["doc_len"].extend(dl[m].astype(np.int64).tolist())
                cols["df"].extend([df] * int(m.sum()))
                cols["idf"].extend([idf] * int(m.sum()))
                cols["contribution"].extend(
                    (idf * tfm * (self.k1 + 1.0) / denom).tolist())
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], type=pa.int64()),
            "term": pa.array(cols["term"], type=pa.string()),
            "tf": pa.array(cols["tf"], type=pa.int64()),
            "doc_len": pa.array(cols["doc_len"], type=pa.int64()),
            "df": pa.array(cols["df"], type=pa.int64()),
            "idf": pa.array(cols["idf"], type=pa.float64()),
            "contribution": pa.array(cols["contribution"],
                                     type=pa.float64()),
        })

    def _sorted_field_terms(self) -> np.ndarray:
        """Lazily-built SORTED unique term-string array for the scored
        field — the range-scannable half of the term dictionary (the
        hash-keyed arrays can't serve prefix scans).  Built once per
        searcher from the already-resident segment table's term column;
        memory ≈ this searcher's share of the vocabulary."""
        if getattr(self, "_terms_sorted", None) is None:
            if self._seg is None or not self._seg.num_rows:
                self._terms_sorted = np.array([], dtype=object)
            else:
                t = self._seg.filter(pc.equal(self._seg["field"],
                                              self.field))
                uniq = pc.unique(t["term"].combine_chunks())
                self._terms_sorted = np.sort(
                    uniq.to_numpy(zero_copy_only=False))
        return self._terms_sorted

    def expand_prefix(self, prefix: str, *, limit: int = 1024) -> list[str]:
        """Terms of the scored field starting with ``prefix``, ascending —
        a binary-search range scan on the sorted term strings.  ``limit``
        is the Lucene-style max-expansion guard (head prefixes like 'a'
        would otherwise explode the OR-union)."""
        terms = self._sorted_field_terms()
        if not terms.size or not prefix:
            return []
        lo = int(np.searchsorted(terms, prefix, side="left"))
        hi = int(np.searchsorted(terms, prefix + "\U0010FFFF",
                                 side="left"))
        return terms[lo:hi][:limit].tolist()

    def _deletion_index(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Lazily-built SymSpell deletion-neighborhood index over the scored
        field's term dictionary: sorted uint64 hashes of every term's
        distance-≤1 deletion variants (the term itself plus each
        single-char deletion), with aligned term indexes.  Memory ≈
        vocab·(avg_len+1) rows — the classic symmetric-delete trade: built
        ONCE per searcher (vectorized per deletion position, no per-term
        Python loop), probed in O(log) per query variant.  Hash collisions
        are harmless: every candidate is re-verified with the exact
        distance check."""
        if getattr(self, "_del_idx", None) is None:
            from ..functions.hashing import fnv1a64_array
            terms = self._sorted_field_terms()
            if not terms.size:
                self._del_idx = (np.zeros(0, dtype=np.uint64),
                                 np.zeros(0, dtype=np.int64), terms)
                return self._del_idx
            tarr = pa.array(terms, type=pa.string())
            lens = pc.utf8_length(tarr).to_numpy(zero_copy_only=False)
            hs = [fnv1a64_array(tarr)]
            ti = [np.arange(terms.size, dtype=np.int64)]
            for j in range(int(lens.max())):
                m = lens > j
                sub = tarr.filter(pa.array(m))
                var = pc.binary_join_element_wise(
                    pc.utf8_slice_codeunits(sub, 0, j),
                    pc.utf8_slice_codeunits(sub, j + 1, 2**30), "")
                hs.append(fnv1a64_array(var))
                ti.append(np.flatnonzero(m).astype(np.int64))
            h = np.concatenate(hs)
            idx = np.concatenate(ti)
            order = np.argsort(h, kind="stable")
            self._del_idx = (h[order], idx[order], terms)
        return self._del_idx

    def expand_fuzzy(self, term: str, *, limit: int = 1024) -> list[str]:
        """Dictionary terms within Levenshtein distance ≤ 1 of ``term``
        (ascending).  SymSpell candidate generation: any dist-≤1 pair
        shares a member of each other's deletion neighborhoods, so probing
        the query's |term|+1 variants finds every candidate; an exact
        distance check filters hash collisions and dist-2 del-pairs."""
        h, ti, terms = self._deletion_index()
        if not terms.size or not term:
            return []
        from ..functions.hashing import fnv1a64_scalar
        variants = {term} | {term[:j] + term[j + 1:]
                             for j in range(len(term))}
        cand: set[int] = set()
        for v in variants:
            k = np.uint64(fnv1a64_scalar(v.encode()))
            lo = int(np.searchsorted(h, k, side="left"))
            hi = int(np.searchsorted(h, k, side="right"))
            cand.update(ti[lo:hi].tolist())
        out = [terms[i] for i in sorted(cand)
               if edit_distance_le1(term, terms[i])]
        return out[:limit]

    def search_fuzzy(self, exact: list[str], fuzzy: list[str],
                     k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Typo-tolerant BM25 (Lucene ``term~`` semantics at max edit
        distance 1): each fuzzy token expands to every dictionary term
        within distance 1 locally, OR-unioned with the exact tokens; each
        matched term keeps its OWN global df/idf."""
        terms = set(exact)
        for f in fuzzy:
            terms.update(self.expand_fuzzy(f))
        if not terms:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.float64))
        return self.search(sorted(terms), k)

    def search_expanded(self, exact: list[str], prefixes: list[str],
                        k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Wildcard BM25: each ``p`` in ``prefixes`` expands to every
        matching dictionary term (locally — a term absent from this
        searcher's shards has no postings here to score), then the usual
        OR-union scoring; each expanded term keeps its OWN global df/idf
        (Lucene multi-term-query semantics)."""
        terms = set(exact)
        for p in prefixes:
            terms.update(self.expand_prefix(p))
        if not terms:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.float64))
        return self.search(sorted(terms), k)

    def _metadata_docset(self, probes: list[tuple[str, str]]) -> np.ndarray:
        """AND-intersection of metadata set-index postings → local doc ids
        (the faceted-search filter).  Each (field, value) probe is one
        binary search + slice; no text-field postings are touched."""
        cur: np.ndarray | None = None
        for field, value in probes:
            slots = self._slots_of(field, value)
            ids = (np.unique(np.concatenate(
                [self._post_local[self._slot_off[s]:self._slot_off[s + 1]]
                 for s in slots])) if slots.size
                else np.zeros(0, dtype=np.int32))
            cur = ids if cur is None else \
                np.intersect1d(cur, ids, assume_unique=True)
            if not cur.size:
                break
        return cur if cur is not None else np.zeros(0, dtype=np.int32)

    def search_filtered(self, terms: list[str], k: int,
                        filters: list[tuple[str, str]]
                        ) -> tuple[np.ndarray, np.ndarray]:
        """Faceted BM25: OR-union scores exactly as :meth:`search`, then
        the candidate set is intersected with the metadata filter docset
        BEFORE top-k.  df/idf stay GLOBAL (unfiltered) — the convention the
        SQL oracle mirrors (score first, facet second).  An EMPTY filter
        list is a vacuous AND: every doc matches, i.e. plain search — not
        the zero-results an empty intersection would produce."""
        if not filters:
            return self.search(terms, k)
        allowed = self._metadata_docset(filters)
        if not allowed.size:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        parts = [p for p in (self._term_scores(t) for t in sorted(set(terms)))
                 if p is not None]
        if not parts:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        uids, usc = self._union_scores(parts)
        # sorted-array intersection: scored docs ∩ facet docset
        pos = np.searchsorted(uids, allowed)
        ok = pos < uids.size
        ok[ok] = uids[pos[ok]] == allowed[ok]
        hits = allowed[ok].astype(np.int64)
        scores = usc[pos[ok]]
        if hits.size > 4 * k > 0:
            thresh = np.partition(scores, hits.size - k)[hits.size - k]
            sel = scores >= thresh
            hits, scores = hits[sel], scores[sel]
        return top_k(self._docs[hits], scores, k)

    # ---- phrase queries (positional index; IndexConfig.positions) ----

    def _term_positions(self, term: str
                        ) -> tuple[np.ndarray, np.ndarray] | None:
        """All of a term's occurrences in this searcher's shards →
        ``(local_doc int64[n_occ], abs_pos int64[n_occ])``.

        One concatenated varint decode over the term's slots (salting may
        split a term across slots; doc sets are disjoint).  Absolute
        positions are reconstructed from per-doc delta runs with the same
        cumsum-minus-run-base trick as the docID decode."""
        slots = self._slots_of(self.field, term)
        if not slots.size:
            return None
        docs_parts, pos_parts = [], []
        for slot in slots:
            s, e = self._slot_off[slot], self._slot_off[slot + 1]
            local = self._post_local[s:e].astype(np.int64)
            tf = self._post_tf[s:e].astype(np.int64)
            bs, be = self._pos_off[slot], self._pos_off[slot + 1]
            from ..functions.varint import varint_decode
            deltas = varint_decode(self._pos_buf[bs:be]).astype(np.int64)
            if deltas.size != int(tf.sum()):
                raise ValueError(
                    f"positions stream for term {term!r} has {deltas.size} "
                    f"values, expected {int(tf.sum())} — index built "
                    "without positions? (IndexConfig.positions)")
            ends = np.cumsum(tf)
            starts = ends - tf
            prefix = np.cumsum(deltas)
            base = np.where(starts > 0, prefix[np.maximum(starts, 1) - 1], 0)
            abs_pos = prefix - np.repeat(base, tf)
            docs_rep = np.repeat(local, tf)
            if self._n_dead:
                m = self._alive[docs_rep]   # tombstoned docs drop out
                docs_rep, abs_pos = docs_rep[m], abs_pos[m]
            docs_parts.append(docs_rep)
            pos_parts.append(abs_pos)
        return np.concatenate(docs_parts), np.concatenate(pos_parts)

    def _phrase_eval(self, terms: list[str]
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Exact phrase occurrences → ``(local_doc int64, phrase_tf int64)``
        for docs with ≥1 occurrence.

        Fully vectorized: each phrase slot i contributes rows
        ``(doc, pos - i)``; a phrase starts at (doc, p) iff ALL n slots
        contribute that key (positions are unique per (term, doc), so a
        slot contributes each key at most once) — one sort + run-length
        count, no per-doc Python loop."""
        n_terms = len(terms)
        per_slot = []
        for i, t in enumerate(terms):
            r = self._term_positions(t)
            if r is None:
                return (np.zeros(0, np.int64), np.zeros(0, np.int64))
            docs, pos = r
            adj = pos - i
            keep = adj >= 0
            per_slot.append((docs[keep], adj[keep]))
        # candidate docs = intersection of the slots' doc sets (cheap
        # pre-filter so the sort below runs over matching docs only)
        cand = np.unique(per_slot[0][0])
        for docs, _ in per_slot[1:]:
            cand = np.intersect1d(cand, np.unique(docs), assume_unique=True)
            if not cand.size:
                return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        keys_parts = []
        for docs, adj in per_slot:
            sel = np.isin(docs, cand, assume_unique=False)
            # key packs (doc, start): local ids < 2^31, positions < 2^31
            keys_parts.append((docs[sel] << np.int64(31)) | adj[sel])
        keys = np.concatenate(keys_parts)
        keys.sort(kind="stable")
        run_start = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        run_len = np.diff(np.append(run_start, keys.size))
        hit = keys[run_start[run_len == n_terms]]
        if not hit.size:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        hit_docs = hit >> np.int64(31)
        uniq, counts = np.unique(hit_docs, return_counts=True)
        return uniq, counts.astype(np.int64)

    def _phrase_cached(self, terms: list[str]
                       ) -> tuple[np.ndarray, np.ndarray]:
        key = tuple(terms)
        memo = getattr(self, "_phrase_memo", None)
        if memo is None:
            from collections import OrderedDict
            memo = self._phrase_memo = OrderedDict()
        if key in memo:
            memo.move_to_end(key)
            return memo[key]
        r = self._phrase_eval(terms)
        memo[key] = r
        if len(memo) > 32:
            memo.popitem(last=False)
        return r

    def phrase_count(self, terms: list[str]) -> int:
        """Local phrase document frequency (round 1 of the two-round phrase
        protocol: the driver sums these into the GLOBAL phrase df)."""
        return int(self._phrase_cached(terms)[0].size)

    def phrase_topk(self, terms: list[str], k: int, global_df: int
                    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k over phrase occurrences (tf = phrase frequency,
        idf from the phrase's GLOBAL df) — round 2; reuses round 1's
        memoized evaluation."""
        local, ptf = self._phrase_cached(terms)
        if not local.size:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        idf = bm25_idf(self.n_docs, float(global_df))
        tf = ptf.astype(np.float64)
        dl = self._doc_len[local]
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        scores = idf * tf * (self.k1 + 1.0) / denom
        return top_k(self._docs[local], scores, k)

    def search_many(self, queries: list[list[str]], k: int = 10,
                    prune: bool = False) -> list[tuple[np.ndarray, np.ndarray]]:
        """Batched evaluation: one actor round-trip for a whole query batch
        (RPC latency dominates single-query cost at ~2 ms/call)."""
        fn = self.search_pruned if prune else self.search
        return [fn(terms, k) for terms in queries]

    # ---- dynamic pruning (MaxScore family; north-rule top-k path) ----

    _BLOCK = 128   # postings per block-max block

    def _term_sorted_blocks(self, term: str
                            ) -> tuple[np.ndarray, np.ndarray,
                                       np.ndarray, np.ndarray]:
        """``(ids_sorted, scores_sorted, block_first_ids, block_max)`` for
        one term — the block-max WAND structure: per ``_BLOCK`` postings,
        the first (local) docID and the maximum BM25 contribution, so a
        candidate's potential gain from this term is bounded by ITS block's
        maximum instead of the term's global bound."""
        entry = self._block_cache.get(term)
        if entry is not None:
            self._block_cache.move_to_end(term)
            return entry
        ids, sc = self._term_scores(term)
        srt = np.argsort(ids, kind="stable")
        ids_s, sc_s = ids[srt], sc[srt]
        starts = np.arange(0, ids_s.size, self._BLOCK)
        entry = (ids_s, sc_s, ids_s[starts],
                 np.maximum.reduceat(sc_s, starts)
                 if ids_s.size else np.zeros(0, dtype=np.float64))
        self._block_cache[term] = entry
        while len(self._block_cache) > 256:
            self._block_cache.popitem(last=False)
        return entry

    def _term_upper_bound(self, term: str) -> float:
        """Score upper bound from segment metadata alone (no decode):
        BM25 is monotone in tf and anti-monotone in doc_len, so
        ``score ≤ idf · (k1+1) · max_tf / (max_tf + k1·(1−b+b·dl_min/avgdl))``."""
        slots = self._slots_of(self.field, term)
        mtf = float(self._max_tf_col[slots].max()) if slots.size else 0.0
        if mtf <= 0:
            return 0.0
        idf = bm25_idf(self.n_docs, float(self._global_df(term)))
        denom = mtf + self.k1 * (1.0 - self.b + self.b * self._dl_min / self.avgdl)
        return float(idf * mtf * (self.k1 + 1.0) / denom)

    def search_pruned(self, terms: list[str], k: int = 10
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized MaxScore top-k: exact same result set as
        :meth:`search` (float sums may differ in the last bits — terms are
        accumulated in bound order, not lexicographic order).

        Terms are split into an ESSENTIAL prefix (by descending upper bound)
        and non-essential rest: any doc absent from every essential posting
        list cannot reach the top-k, so non-essential terms are only gathered
        for the surviving candidate set (``np.searchsorted`` into their
        docID-sorted lists), and a term whose bound cannot lift the current
        k-th score is never even decoded."""
        uniq = [t for t in dict.fromkeys(terms)
                if self._slots_of(self.field, t).size]
        if not uniq:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
        bounds = {t: self._term_upper_bound(t) for t in uniq}
        ordered = sorted(uniq, key=lambda t: (-bounds[t], t))
        suffix_ub = np.cumsum([bounds[t] for t in ordered][::-1])[::-1]

        # static feasibility: a split at i needs theta ≥ suffix_ub[i], and
        # theta after i terms is ≤ their summed bounds (prefix_ub[i-1]) —
        # if no position can ever satisfy that (all-head-term queries with
        # similar bounds), pruning can't skip ANY work and its bookkeeping
        # is pure overhead: take the exhaustive path outright
        prefix_ub = np.cumsum([bounds[t] for t in ordered])
        if not any(prefix_ub[i - 1] >= suffix_ub[i]
                   for i in range(1, len(ordered))):
            return self.search(terms, k)
        # adaptive dispatch: pruning pays when the HIGHEST-BOUND term is
        # rare — the essential candidate pool is then small, theta rises
        # fast, and weak head terms are gathered over few candidates (or
        # skipped outright).  When even the strongest term is corpus-wide,
        # the candidate pool is a large fraction of the shard and phase 2
        # must stream ~everything through extra bound bookkeeping —
        # measured 2.6× slower than the plain union on all-head queries vs
        # 2.8× faster on mixed ones; results are exact either way, this
        # picks the cheaper evaluation order from metadata alone
        if self._global_df(ordered[0]) > 0.05 * max(self.n_docs, 1):
            return self.search(terms, k)

        # phase 1: essential prefix — sparse sort-merge accumulation into a
        # candidate pool (never an O(n_docs) dense array: the pruned path
        # exists precisely to touch only postings).  A term is non-essential
        # once the k-th best score so far exceeds the sum of ALL remaining
        # bounds.  The union and the k-th-score partition are LAZY: theta is
        # bounded above by the processed terms' summed bounds, so until that
        # sum reaches the next suffix bound a split is provably impossible
        # and maintaining theta is wasted work — on head-heavy queries
        # (similar bounds, no split ever) this collapses T incremental
        # O(pool log pool) unions + T partitions into ONE of each,
        # making the pruned path never slower than exhaustive.
        theta = -np.inf
        split = len(ordered)
        pend_ids: list[np.ndarray] = []
        pend_sc: list[np.ndarray] = []
        pend_is_union = False
        processed_ub = 0.0
        cand = np.zeros(0, dtype=np.int64)
        scores = np.zeros(0, dtype=np.float64)
        for i, t in enumerate(ordered):
            if i >= 1 and theta >= suffix_ub[i]:
                split = i
                break
            ids, sc = self._term_scores(t)
            # pool entries precede the new term so each doc's running sum
            # accumulates in term order (exact floats, same as sequential)
            pend_ids.append(ids)
            pend_sc.append(sc)
            pend_is_union = False
            processed_ub += bounds[t]
            if i + 1 < len(ordered) and processed_ub >= suffix_ub[i + 1]:
                cand, scores = sparse_union(pend_ids, pend_sc)
                pend_ids, pend_sc = [cand], [scores]
                pend_is_union = True
                if cand.size >= k:
                    theta = np.partition(scores,
                                         cand.size - k)[cand.size - k]
        if len(pend_ids) == 1 and pend_is_union:
            cand, scores = pend_ids[0], pend_sc[0]
        else:
            cand, scores = sparse_union(pend_ids, pend_sc)

        if cand.size == 0:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))

        # phase 2: gather non-essential terms for candidates only, with
        # BLOCK-MAX pruning (the block-max WAND refinement): a candidate's
        # potential gain from term t is bounded by the max score of ITS
        # block of t's docID-sorted postings — strictly tighter than t's
        # global bound, and exactly 0 outside t's docID range — so
        # candidates drop earlier and later gathers touch fewer docs.
        rest = ordered[split:]
        if rest and cand.size >= k and not np.isfinite(theta):
            theta = np.partition(scores, cand.size - k)[cand.size - k]
        for j, t in enumerate(rest):
            if bounds[t] <= 0.0:
                continue
            suffix_after = float(suffix_ub[split + j]) - bounds[t]
            ids_s, sc_s, bfirst, bmax = self._term_sorted_blocks(t)
            bi = np.searchsorted(bfirst, cand, side="right") - 1
            ub_t = np.where(bi >= 0, bmax[np.maximum(bi, 0)], 0.0)
            keep = scores + ub_t + suffix_after >= theta
            cand, scores = cand[keep], scores[keep]
            if cand.size == 0:
                break
            pos = np.searchsorted(ids_s, cand)
            pos_ok = pos < ids_s.size
            match = np.zeros(cand.size, dtype=bool)
            match[pos_ok] = ids_s[pos[pos_ok]] == cand[pos_ok]
            scores[match] += sc_s[pos[pos_ok]][match[pos_ok]]
            if cand.size >= k:
                theta = max(theta, np.partition(
                    scores, cand.size - k)[cand.size - k])

        if cand.size > 4 * k > 0:
            thresh = np.partition(scores, cand.size - k)[cand.size - k]
            sel = scores >= thresh
            cand, scores = cand[sel], scores[sel]
        return top_k(self._docs[cand], scores, k)

    # ---- reference-ranking evaluation (SURVEY §2.5 A4 + §2.6 O1) ----

    # accumulator layout: field → (kind, column); comparator order below
    _REF_FIELDS = {"text": ("sum_tf", "text_wc"),
                   "title": ("sum_tf", "title_wc"),
                   "person": ("count", "person_count"),
                   "organization": ("count", "org_count"),
                   "author": ("count", "author_count"),
                   "site": ("flag", "site_flag"),
                   "language": ("flag", "language_flag"),
                   "location": ("flag", "location_flag"),
                   "country": ("flag", "country_flag")}

    def search_reference(self, probes: list[tuple[str, str]], k: int = 10
                         ) -> dict[str, np.ndarray]:
        """Reference ``HandleQuery`` semantics over this searcher's docs
        (``/root/reference/SearchEngine.h:134-338``): OR-union accumulators
        per doc — tf sums for text/title, match counters for person/org/
        author, booleans for site/language/location/country — ranked by the
        9-level comparator (``SearchEngine.h:342-381``) with the added
        deterministic ascending-docID tie-break.  Returns the local top-k
        accumulator columns (docs disjoint across shards → exact)."""
        # two passes, both sparse in the union of matched docs (the
        # accumulator tables must never be O(n_docs) — see sparse_union):
        # collect per-slot contributions, then scatter into union-indexed
        # accumulator columns via bincount on searchsorted positions.
        contribs: list[tuple[str, str, np.ndarray, np.ndarray]] = []
        for field, term in sorted(set(probes)):
            spec = self._REF_FIELDS.get(field)
            if spec is None:
                continue
            kind, col = spec
            for slot in self._slots_of(field, term):
                local_ids, tf, _dl = self._decode_slot(slot)
                if local_ids.size:
                    contribs.append((kind, col, local_ids, tf))
        cols_all = [col for _, col in self._REF_FIELDS.values()]
        if not contribs:
            return {"doc_id": np.zeros(0, dtype=np.int64),
                    **{c: np.zeros(0, dtype=np.int64) for c in cols_all}}
        sel = np.unique(np.concatenate([c[2] for c in contribs]))
        acc = {col: np.zeros(sel.size, dtype=np.int64) for col in cols_all}
        for kind, col, local_ids, tf in contribs:
            idx = np.searchsorted(sel, local_ids)
            if kind == "sum_tf":
                acc[col] += np.bincount(idx, weights=tf,
                                        minlength=sel.size).astype(np.int64)
            elif kind == "count":
                acc[col] += np.bincount(idx, minlength=sel.size)
            else:  # flag
                acc[col][idx] = 1
        cols = acc
        docs = self._docs[sel]
        order = np.lexsort((
            docs, -cols["text_wc"], -cols["author_count"],
            -cols["person_count"], -cols["org_count"], -cols["title_wc"],
            -cols["location_flag"], -cols["country_flag"], -cols["site_flag"],
            -cols["language_flag"]))[:k]
        return {"doc_id": docs[order],
                **{c: cols[c][order] for c in cols}}


def merge_partials(doc_ids: np.ndarray,
                   scores: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group-sum (doc_id → Σ score); deterministic given input order."""
    uniq, inv = np.unique(doc_ids, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(summed, inv, scores)
    return uniq, summed


def top_k(doc_ids: np.ndarray, scores: np.ndarray,
          k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (-score, doc_id) — deterministic tie-break (SURVEY §2.6 O1)."""
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def fetch_texts(corpus_path: str, doc_ids, *, id_col: str = "doc_id",
                text_col: str = "text") -> dict[int, str]:
    """One filtered parquet read covering every requested doc (row-group
    predicate push-down; two columns only) → ``{doc_id: text}``.  The
    serving-tier point-get for snippet rendering: k≈10 ids per query, never
    a corpus scan.  At cluster scale the docstore keeps source paths and
    this becomes a path-addressed fetch (reference ``DisplaySource``
    re-opens the source file the same way)."""
    ids = [int(d) for d in doc_ids]
    if not ids:
        return {}
    t = pq.read_table(corpus_path, columns=[id_col, text_col],
                      filters=[(id_col, "in", ids)])
    return dict(zip(t[id_col].to_pylist(), t[text_col].to_pylist()))


class QueryEngine:
    """Driver-side facade: query parsing, shard fan-out, top-k merge.

    ``use_actors=True`` deploys ``num_searchers`` Ray actors, each owning a
    slice of doc shards (state loaded once, reused across queries);
    ``use_actors=False`` runs the same code in-process (tests, tiny corpora).
    """

    def __init__(self, index_dir: str, *, num_searchers: int = 4,
                 use_actors: bool = True, num_replicas: int = 1):
        """``num_searchers`` partitions the corpus (each actor owns a doc-
        shard slice — the LATENCY / corpus-size axis); ``num_replicas``
        deploys that many independent full searcher groups and splits
        batched query traffic across them (the THROUGHPUT axis).  Doc-
        partitioned fan-out pays a fixed per-query cost in EVERY searcher,
        so on a fixed corpus adding searchers stops paying once postings
        work per actor is small — adding replicas keeps scaling because
        each query still touches only ``num_searchers`` actors."""
        self.index_dir = index_dir
        man = ckpt.read_manifest(index_dir)
        self.cfg = man["config"]
        n_shards = self.cfg["n_doc_shards"]
        self.stopwords = ENGLISH_STOPWORDS if self.cfg["stopwords"] else None
        self.stem = self.cfg["stem"]
        self.use_actors = use_actors
        num_searchers = min(num_searchers, n_shards)
        slices = [list(range(n_shards))[i::num_searchers]
                  for i in range(num_searchers)]
        if use_actors:
            remote = ray.remote(SegmentSearcher)
            self._replicas = [
                [remote.remote(index_dir, sl) for sl in slices]
                for _ in range(max(1, num_replicas))]
        else:
            self._replicas = [[SegmentSearcher(index_dir, sl)
                               for sl in slices]]
        self.searchers = self._replicas[0]

    def query(self, text: str, k: int = 10, *,
              prune: bool = False) -> list[tuple[int, float]]:
        """``prune=True`` uses the MaxScore dynamic-pruning path (same
        result set; float sums may differ in the last bits)."""
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return []
        method = "search_pruned" if prune else "search"
        if self.use_actors:
            partials = ray.get([getattr(s, method).remote(terms, k)
                                for s in self.searchers])
        else:
            partials = [getattr(s, method)(terms, k) for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def query_with_snippets(self, text: str, texts, k: int = 10, *,
                            window: int = 30,
                            mark: tuple[str, str] = ("**", "**"),
                            prune: bool = False
                            ) -> list[tuple[int, float, str | None]]:
        """BM25 top-k plus a query-biased highlighted excerpt per hit
        (``functions.snippet`` — the web-scale counterpart of the reference
        REPL's whole-document ``DisplaySource``).  ``texts`` maps doc_id →
        document text: a dict (use :func:`fetch_texts` for one filtered
        corpus read covering all k hits) or any callable.  Snippet term
        matching uses the SAME analyzer chain as the index (stopwords +
        stem from the manifest), so a term highlights iff it scored."""
        from ..functions.snippet import make_snippet
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        hits = self.query(text, k=k, prune=prune)
        get = texts.get if hasattr(texts, "get") else texts
        out = []
        for doc_id, score in hits:
            doc_text = get(doc_id)
            snip = (make_snippet(doc_text, terms, window=window, mark=mark,
                                 stem=self.stem)
                    if doc_text is not None else None)
            out.append((doc_id, score, snip))
        return out

    def fielded_query(self, text: str, k: int = 10, *,
                      title_weight: float = 2.0,
                      title_field: str = "title") -> list[tuple[int, float]]:
        """BM25F top-k over a fielded (text+title) index — see
        :meth:`SegmentSearcher.search_fielded` for the scoring model."""
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return []
        if self.use_actors:
            partials = ray.get([
                s.search_fielded.remote(terms, k, title_weight, title_field)
                for s in self.searchers])
        else:
            partials = [s.search_fielded(terms, k, title_weight, title_field)
                        for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def df_of(self, terms: list[str]) -> dict[str, int]:
        """GLOBAL document frequency per term.  Each searcher stores the
        global df for every term present in its own shards (and 0 for the
        rest), so combining with max — not sum — yields the global value."""
        if self.use_actors:
            parts = ray.get([s.df_of.remote(terms) for s in self.searchers])
        else:
            parts = [s.df_of(terms) for s in self.searchers]
        out = {t: 0 for t in terms}
        for p in parts:
            for t, v in p.items():
                if v > out[t]:
                    out[t] = v
        return out

    def explain(self, text: str, k: int = 10) -> pa.Table:
        """Score breakdown for the top-k of ``text``: one row per
        (doc, matched term) with tf/doc_len/df/idf/contribution, sorted by
        (doc_id, term).  Per doc, ``sum(contribution)`` equals the
        :meth:`query` score exactly."""
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "term": pa.array([], type=pa.string()),
                          "tf": pa.array([], type=pa.int64()),
                          "doc_len": pa.array([], type=pa.int64()),
                          "df": pa.array([], type=pa.int64()),
                          "idf": pa.array([], type=pa.float64()),
                          "contribution": pa.array([], type=pa.float64())})
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return empty
        ids = np.asarray([d for d, _ in self.query(text, k=k)],
                         dtype=np.int64)
        if not ids.size:
            return empty
        if self.use_actors:
            parts = ray.get([s.explain.remote(terms, ids)
                             for s in self.searchers])
        else:
            parts = [s.explain(terms, ids) for s in self.searchers]
        tbl = pa.concat_tables(parts)
        return tbl.take(pc.sort_indices(
            tbl, sort_keys=[("doc_id", "ascending"), ("term", "ascending")]))

    def query_many(self, texts: list[str], k: int = 10, *,
                   prune: bool = False) -> list[list[tuple[int, float]]]:
        """Batched top-k: one RPC per actor for the whole batch — the
        throughput path (single-query latency is RPC-dominated)."""
        compiled = [tokenize(t, stopwords=self.stopwords, stem=self.stem)
                    for t in texts]
        live = [(i, terms) for i, terms in enumerate(compiled) if terms]
        out: list[list[tuple[int, float]]] = [[] for _ in texts]
        if not live:
            return out
        batch = [terms for _, terms in live]

        def _merge(per_actor, start: int) -> None:
            for j in range(len(per_actor[0])):
                i = live[start + j][0]
                ids = np.concatenate([p[j][0] for p in per_actor])
                sc = np.concatenate([p[j][1] for p in per_actor])
                if ids.size:
                    tids, tsc = top_k(ids, sc, k)
                    out[i] = [(int(d), float(s))
                              for d, s in zip(tids, tsc)]

        if self.use_actors and len(self._replicas) > 1:
            # replica-parallel: contiguous batch chunk per replica group,
            # ALL RPCs in flight before any merge
            bounds = np.linspace(0, len(batch),
                                 len(self._replicas) + 1).astype(int)
            inflight = []
            for r, group in enumerate(self._replicas):
                chunk = batch[bounds[r]:bounds[r + 1]]
                if chunk:
                    inflight.append(
                        (int(bounds[r]),
                         [s.search_many.remote(chunk, k, prune)
                          for s in group]))
            for start, refs in inflight:
                _merge(ray.get(refs), start)
            return out
        if self.use_actors:
            per_actor = ray.get([s.search_many.remote(batch, k, prune)
                                 for s in self.searchers])
        else:
            per_actor = [s.search_many(batch, k, prune)
                         for s in self.searchers]
        _merge(per_actor, 0)
        return out

    def query_filtered(self, text: str, filters: list[tuple[str, str]],
                       k: int = 10) -> list[tuple[int, float]]:
        """Faceted BM25 top-k over a FIELDED index: score the text terms as
        :meth:`query`, keep only docs whose metadata set-indexes match ALL
        ``(field, value)`` filters (values normalized with the engine's
        CleanMetaData rules).  df/idf are global — facets restrict the
        result set, not the statistics.  ``filters=[]`` (all facets
        deselected) degrades to the plain unfiltered :meth:`query`."""
        from ..functions.analyze import clean_metadata
        if not filters:
            return self.query(text, k)
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return []
        probes = [(f, clean_metadata(v)) for f, v in filters]
        if self.use_actors:
            partials = ray.get([s.search_filtered.remote(terms, k, probes)
                                for s in self.searchers])
        else:
            partials = [s.search_filtered(terms, k, probes)
                        for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def boolean_query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Boolean BM25 top-k: whitespace tokens prefixed ``-`` are negated
        (``"scan merge -window"`` = docs containing scan AND merge AND NOT
        window), everything else is a conjunctive must term; scores are the
        summed BM25 of the must terms.  Both halves run through the engine
        analyzer (normalize / stopwords / stem)."""
        must: list[str] = []
        must_not: list[str] = []
        for raw in text.split():
            neg = raw.startswith("-")
            toks = tokenize(raw[1:] if neg else raw,
                            stopwords=self.stopwords, stem=self.stem)
            (must_not if neg else must).extend(toks)
        if not must:
            return []
        if self.use_actors:
            partials = ray.get([s.search_boolean.remote(must, must_not, k)
                                for s in self.searchers])
        else:
            partials = [s.search_boolean(must, must_not, k)
                        for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Query autocomplete: top-k indexed terms starting with ``prefix``,
        ranked by global df desc then term asc.  Each searcher range-scans
        ITS shards' sorted term dictionary (the vocabulary is doc-shard
        partitioned, so the union across searchers is the full dictionary);
        the driver unions candidates and ranks them via the engine-level
        ``df_of`` max-merge (each searcher's df table is filtered to the
        terms its own shards contain, so no single searcher can rank the
        union).

        The fragment is normalized WITHOUT the stopword filter or stemmer
        — same rule as ``prefix_query``: a user typing "the" wants
        "theory"/"thermal" completions even on a stopworded index, and a
        stem of a prefix isn't a prefix of the stems."""
        frag = tokenize(prefix)
        if not frag:
            return []
        p = frag[0]
        if self.use_actors:
            sets = ray.get([s.expand_prefix.remote(p)
                            for s in self.searchers])
        else:
            sets = [s.expand_prefix(p) for s in self.searchers]
        cand = sorted(set().union(*map(set, sets)))
        dfs = self.df_of(cand) if cand else {}
        return sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def collapsed_query(self, text: str, group_field: str, k: int = 10
                        ) -> list[tuple[str, int, float]]:
        """Diversity top-k: collapse results to ONE best doc per value of a
        metadata field (fielded index required), then rank the group
        champions by (-score, doc_id) and keep ``k``.  Each searcher returns
        at most one row per group, so the merge is n_searchers × n_groups
        rows regardless of corpus size."""
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return []
        if self.use_actors:
            partials = ray.get([s.search_collapsed.remote(terms, group_field)
                                for s in self.searchers])
        else:
            partials = [s.search_collapsed(terms, group_field)
                        for s in self.searchers]
        best: dict[str, tuple[float, int]] = {}
        for groups, ids, scores in partials:
            for g, d, s in zip(groups, ids.tolist(), scores.tolist()):
                cur = best.get(g)
                # keep the higher score; ties → lower docID
                if cur is None or (-s, d) < (-cur[0], cur[1]):
                    best[g] = (s, d)
        ranked = sorted(((s, d, g) for g, (s, d) in best.items()),
                        key=lambda t: (-t[0], t[1]))[:k]
        return [(g, d, s) for s, d, g in ranked]

    def prefix_query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Wildcard BM25 top-k: query tokens ending in ``*`` match every
        indexed term with that prefix (term-dictionary range scan inside
        each shard searcher), OR-unioned with the exact tokens; every
        matched term scores with its own global df/idf.  Prefix fragments
        are normalized with the analyzer's character rules but never
        stemmed (a stem of a prefix isn't a prefix of the stems)."""
        exact: list[str] = []
        prefixes: list[str] = []
        for raw_tok in text.split():
            if raw_tok.endswith("*") and len(raw_tok) > 1:
                frag = tokenize(raw_tok[:-1])
                if frag:
                    prefixes.append(frag[0])
            else:
                exact.extend(tokenize(raw_tok, stopwords=self.stopwords,
                                      stem=self.stem))
        if not exact and not prefixes:
            return []
        if self.use_actors:
            partials = ray.get(
                [s.search_expanded.remote(exact, prefixes, k)
                 for s in self.searchers])
        else:
            partials = [s.search_expanded(exact, prefixes, k)
                        for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def phrase_query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact-phrase BM25 top-k over a POSITIONAL index
        (``IndexConfig(positions=True)``): the phrase's tokens must appear
        consecutively in the kept-token stream (the engine's analyzer
        stream — after normalization and any stopword/stem config).

        Two-round protocol: (1) every shard actor evaluates the phrase once
        (memoized) and reports its local phrase document count, summed into
        the GLOBAL phrase df; (2) actors score BM25 with tf = per-doc phrase
        frequency and return local top-k — bounded k × actors fan-in, like
        :meth:`query`."""
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms:
            return []
        if self.use_actors:
            counts = ray.get([s.phrase_count.remote(terms)
                              for s in self.searchers])
        else:
            counts = [s.phrase_count(terms) for s in self.searchers]
        df = int(sum(counts))
        if df == 0:
            return []
        if self.use_actors:
            partials = ray.get([s.phrase_topk.remote(terms, k, df)
                                for s in self.searchers])
        else:
            partials = [s.phrase_topk(terms, k, df) for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def fuzzy_query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Typo-tolerant BM25 top-k: query tokens ending in ``~`` (Lucene
        fuzzy syntax) match every indexed term within Levenshtein distance
        1 (SymSpell deletion-neighborhood expansion inside each shard
        searcher), OR-unioned with the exact tokens; every matched term
        scores with its own global df/idf.  Fuzzy fragments are normalized
        with the analyzer's character rules but never stemmed (the stem of
        a typo is not a typo of the stem)."""
        exact: list[str] = []
        fuzzy: list[str] = []
        for raw_tok in text.split():
            if raw_tok.endswith("~") and len(raw_tok) > 1:
                frag = tokenize(raw_tok[:-1])
                if frag:
                    fuzzy.append(frag[0])
            else:
                exact.extend(tokenize(raw_tok, stopwords=self.stopwords,
                                      stem=self.stem))
        if not exact and not fuzzy:
            return []
        if self.use_actors:
            partials = ray.get([s.search_fuzzy.remote(exact, fuzzy, k)
                                for s in self.searchers])
        else:
            partials = [s.search_fuzzy(exact, fuzzy, k)
                        for s in self.searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]

    def reference_query(self, raw: str, k: int = 10, *,
                        strict_compat: bool = False) -> list[int]:
        """Reference-grammar query (``values: .. | title: .. | people: ..``)
        ranked by the reference's 9-level comparator; returns docIDs."""
        from ..functions.analyze import clean_metadata, normalize_token
        from ..functions.queryparse import TEXT_CATEGORIES, parse_query
        compiled: list[tuple[str, str]] = []
        for p in parse_query(raw, strict_compat=strict_compat):
            if p.category in TEXT_CATEGORIES:
                term = normalize_token(p.term)
                if term is None:
                    continue
            else:
                term = clean_metadata(p.term)
            compiled.append((p.field, term))
        if not compiled:
            return []
        if self.use_actors:
            partials = ray.get([s.search_reference.remote(compiled, k)
                                for s in self.searchers])
        else:
            partials = [s.search_reference(compiled, k) for s in self.searchers]
        merged = {c: np.concatenate([p[c] for p in partials])
                  for c in partials[0]}
        if merged["doc_id"].size == 0:
            return []
        order = np.lexsort((
            merged["doc_id"], -merged["text_wc"], -merged["author_count"],
            -merged["person_count"], -merged["org_count"], -merged["title_wc"],
            -merged["location_flag"], -merged["country_flag"],
            -merged["site_flag"], -merged["language_flag"]))[:k]
        return [int(d) for d in merged["doc_id"][order]]


class FederatedEngine:
    """Query-time federation over MULTIPLE independent indexes (delta
    builds that haven't been merged yet, or per-tenant/per-crawl indexes):
    corpus statistics are pooled up front (Σ n_docs, Σ total_tokens →
    pooled avgdl), per-query term df is gathered from every index (round 1)
    and SUMMED, then every searcher of every index scores its own docs
    with the federated statistics (round 2, ``search_with_stats``) — the
    same two-round protocol the phrase path uses for global df.

    With DISJOINT doc sets (the normal delta situation) results are
    rank/score-IDENTICAL to querying one physically merged index — pinned
    in ``tests/test_merge.py``.  Overlapping doc sets double-count df and
    return the doc once per index holding it; merging (doc-level
    last-input-wins) is the tool for that case, not federation."""

    def __init__(self, index_dirs: list[str], *, num_searchers: int = 2,
                 use_actors: bool = True):
        assert index_dirs, "need at least one index"
        self.engines = [QueryEngine(d, num_searchers=num_searchers,
                                    use_actors=use_actors)
                        for d in index_dirs]
        e0 = self.engines[0]
        for e in self.engines[1:]:
            assert (e.stopwords == e0.stopwords and e.stem == e0.stem), \
                "federated indexes must share the analyzer config"
        stats = [ckpt.read_docstats(d) for d in index_dirs]
        self.n_docs = sum(s["n_docs"] for s in stats)
        total_tokens = sum(s["total_tokens"] for s in stats)
        self.avgdl = (total_tokens / self.n_docs) if self.n_docs else 1.0
        self.stopwords = e0.stopwords
        self.stem = e0.stem
        self.use_actors = use_actors

    def query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        terms = tokenize(text, stopwords=self.stopwords, stem=self.stem)
        if not terms or self.n_docs == 0:
            return []
        # round 1: summed df across indexes (each engine's df_of is its
        # own global df — max across its searchers)
        df: dict[str, int] = {}
        for e in self.engines:
            for t, v in e.df_of(terms).items():
                df[t] = df.get(t, 0) + v
        # round 2: every searcher scores its disjoint docs with the pooled
        # statistics; all RPCs in flight before the merge
        searchers = [s for e in self.engines for s in e.searchers]
        if self.use_actors:
            partials = ray.get([
                s.search_with_stats.remote(terms, k, df, self.n_docs,
                                           self.avgdl)
                for s in searchers])
        else:
            partials = [s.search_with_stats(terms, k, df, self.n_docs,
                                            self.avgdl)
                        for s in searchers]
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        if ids.size == 0:
            return []
        ids, sc = top_k(ids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids, sc)]
