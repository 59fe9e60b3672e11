"""Posting-list assembly: the final aggregation of the term shuffle.

Ray Data restatement of the reference's arbitrator + filler threads
(``/root/reference/KaggleFinanceSourceEngine.cpp:284-325``): the arbitrator's
``shard = term % M`` routing becomes a ``bucket`` column + ``groupby
("bucket")``; each filler thread's exclusive ownership of one shard becomes
``map_groups`` partition exclusivity.  Where the reference stores postings as
``unordered_map<term, unordered_map<docid, tf>>`` (``SourceEngine.h:23``), we
emit docID-sorted, delta+varint-compressed posting lists with df / total_tf /
max_tf statistics — the north-rule segment format.

The whole bucket is encoded in ~a dozen vectorized numpy passes: one global
sort, segmented delta with per-term resets, ONE varint pass over every docID
delta in the bucket, then zero-copy slicing of the packed buffer into
per-term binary cells via Arrow offset buffers.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state import checkpoint as ckpt
from ..functions.varint import (delta_decode, varint_decode,
                                varint_decode_with_ends,
                                varint_encode_with_sizes)

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("field", pa.string()),
    ("df", pa.int32()),          # document frequency
    ("total_tf", pa.int64()),    # collection frequency
    ("max_tf", pa.int32()),      # per-term tf upper bound (MaxScore pruning)
    ("doc_ids", pa.binary()),    # delta+varint, ascending docID
    ("tfs", pa.binary()),        # varint, aligned with doc_ids
])
# BM25 doc-length norms live in the docstore (one value per doc), not in the
# postings — carrying them per posting tripled encode work and segment bytes;
# the searcher joins them through its local docID dictionary at score time.

# Segment docID space, recorded as schema metadata on every written segment:
# - "global": ``doc_ids`` deltas reconstruct the 64-bit content-hash docIDs
#   (hash-random → ~7-byte varints; the round-1/2 format).
# - "local":  ``doc_ids`` deltas reconstruct int32 LOCAL ids — positions in
#   the owning doc shard's SORTED docID dictionary (``docstore/shard=K``).
#   Local ids are dense within the shard, so deltas are 1-2 bytes and the
#   searcher's load decode needs no global→local searchsorted at all — the
#   round-3 fix for the per-actor O(corpus) startup decode.
DOCID_SPACE_KEY = b"docid_space"


def segment_docid_space(seg: pa.Table) -> str:
    """``"local"`` or ``"global"`` (absent metadata = legacy global)."""
    meta = seg.schema.metadata or {}
    return (meta.get(DOCID_SPACE_KEY) or b"global").decode()


def binary_column_bytes(col: pa.ChunkedArray | pa.Array
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a (large_)binary column's packed payload:
    (uint8 data over all values concatenated, int64 byte offsets len n+1,
    rebased to 0)."""
    arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                 else np.int32)
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0]:offsets[-1]]
    return data, offsets - offsets[0]


def decode_segment_streams(seg: pa.Table
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-segment posting decode in ONE vectorized pass (no per-term
    loop): → ``(doc_vals int64, tfs uint64, slot_off int64[n_rows+1])``
    where ``doc_vals[slot_off[i]:slot_off[i+1]]`` are row i's absolute
    (local or global, per :func:`segment_docid_space`) ascending docIDs.

    The trick: varint streams are self-delimiting, so the CONCATENATION of
    all rows' ``doc_ids`` cells decodes in one :func:`varint_decode` call;
    per-row boundaries come from mapping Arrow's byte offsets to value
    indices, and the segmented delta→absolute reconstruction is a global
    cumsum minus a per-run base (vectorized ``np.repeat``)."""
    if seg.num_rows == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64),
                np.zeros(1, np.int64))
    ids_buf, byte_off = binary_column_bytes(seg["doc_ids"])
    tfs_buf, _ = binary_column_bytes(seg["tfs"])
    deltas, end_pos = varint_decode_with_ends(ids_buf)
    voff = np.searchsorted(end_pos, byte_off[:-1], side="left")
    slot_off = np.append(voff, deltas.size).astype(np.int64)
    counts = np.diff(slot_off)
    prefix = np.cumsum(deltas, dtype=np.uint64)
    starts = slot_off[:-1]
    base_v = np.where(starts > 0, prefix[np.maximum(starts, 1) - 1],
                      np.uint64(0))
    doc_vals = (prefix - np.repeat(base_v, counts)).astype(np.int64)
    return doc_vals, varint_decode(tfs_buf), slot_off


def _binary_from_slices(packed: bytes, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy pa.binary array whose cell i is packed[off[i]:off[i+1]]."""
    if len(byte_offsets) and int(byte_offsets[-1]) >= 2**31:
        # pa.binary() uses int32 offsets; silently wrapping them would
        # corrupt the segment.  Partition sizing is the tuning knob.
        raise ValueError(
            f"partition postings exceed 2 GiB packed ({int(byte_offsets[-1])} "
            "bytes); increase n_buckets / n_doc_shards so each (shard, "
            "bucket) partition stays under the int32 offset limit")
    return pa.Array.from_buffers(
        pa.binary(), len(byte_offsets) - 1,
        [None, pa.py_buffer(byte_offsets.astype(np.int32).tobytes()),
         pa.py_buffer(packed)])


def encode_postings_table(group: pa.Table,
                          doc_dict: np.ndarray | None = None, *,
                          ids_are_local: bool = False) -> pa.Table:
    """One partition's ``(term, field?, doc_id, tf)`` rows → SEGMENT_SCHEMA.

    Fully vectorized; no per-term Python loop.  A ``doc_len`` column, if
    present (doc rows from the single-pass build), is ignored.

    ``doc_dict`` — the owning doc shard's SORTED UNIQUE global docID array —
    switches the output to the LOCAL docID space (see ``DOCID_SPACE_KEY``):
    each posting's global docID is replaced by its position in ``doc_dict``
    before delta+varint packing.  Every group docID must be present in the
    dictionary (postings and docstore rows come from the same tokenize pass).

    ``ids_are_local=True`` (requires ``doc_dict``) declares the ``doc_id``
    column ALREADY holds local ids (``resolve_fragment_docids`` with a
    shard dict) — the per-row mapping is skipped, the local-space metadata
    still applies.
    """
    n = group.num_rows
    space = b"local" if doc_dict is not None else b"global"
    has_pos = "pos" in group.column_names
    schema = (SEGMENT_SCHEMA.append(pa.field("positions", pa.binary()))
              if has_pos else SEGMENT_SCHEMA)
    out_schema = schema.with_metadata({DOCID_SPACE_KEY: space})
    empty_cols = {name: pa.array([], type=typ)
                  for name, typ in zip(schema.names, schema.types)}
    if n == 0:
        return pa.table(empty_cols, schema=out_schema)

    has_field = "field" in group.column_names
    field = group["field"].combine_chunks() if has_field else None
    term = group["term"].combine_chunks()
    doc_id = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if doc_dict is not None and not ids_are_local:
        local = np.searchsorted(doc_dict, doc_id)
        ok = (local < doc_dict.size)
        ok[ok] = doc_dict[local[ok]] == doc_id[ok]
        if not ok.all():
            missing = np.unique(doc_id[~ok])[:5]
            raise ValueError(
                f"{int((~ok).sum())} posting docIDs absent from the shard "
                f"docstore dictionary (e.g. {missing.tolist()}) — postings "
                "and docstore must come from the same build pass")
        doc_id = local
    doc_id = doc_id.astype(np.uint64)
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)

    # canonical order: (field, term, doc_id) ascending — true string order,
    # NOT dictionary-code order, so segment bytes are identical no matter
    # how the exchange happened to order the input rows.  Sort RANKS, not
    # strings: dictionary-encode once (distinct terms ≪ rows), rank the
    # SMALL dictionary by string order, then one integer np.lexsort over
    # the rows.  vs the previous 3-column string sort table: no n-row
    # string copies (sort table + post-sort take), n·log(n) integer
    # comparisons instead of string comparisons — stage-2 encode was the
    # build's allocation-churn scaling drag (BASELINE.md round-3 ledger).
    def _string_ranks(arr: pa.Array
                      ) -> tuple[np.ndarray, np.ndarray, pa.Array]:
        """(per-row string-order rank, rank → dictionary-index map,
        dictionary)."""
        dic = arr.dictionary_encode()
        d = dic.dictionary
        by_str = pa.compute.sort_indices(d).to_numpy(zero_copy_only=False)
        rank_of_dic = np.empty(len(d), dtype=np.int64)
        rank_of_dic[by_str] = np.arange(len(d), dtype=np.int64)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        return rank_of_dic[codes], by_str, d

    def _sort2(hi_keys: np.ndarray, hi_max: int) -> np.ndarray:
        """argsort by (hi_keys, doc_id): one packed-uint64 STABLE argsort
        (numpy radix for ints) when the key widths fit — always true in
        LOCAL docID space, where ids < shard size — else the 2-pass stable
        lexsort.  Stability matters only for duplicate (field, term, doc)
        rows, which tokenize output never produces, but both paths must
        order ties identically so global- and local-space encodes of the
        same input stay byte-equal."""
        db = int(doc_id.max()).bit_length() if n else 0
        hb = hi_max.bit_length()
        if hb + db <= 63:
            return np.argsort((hi_keys.astype(np.uint64) << np.uint64(db))
                              | doc_id, kind="stable")
        return np.lexsort((doc_id.view(np.int64), hi_keys))

    t_keys, t_rank_to_dic, t_dict = _string_ranks(term)
    if has_field:
        f_keys, f_rank_to_dic, f_dict = _string_ranks(field)
        tmax = int(t_keys.max()) if n else 0
        combined = f_keys * np.int64(tmax + 1) + t_keys
        order = _sort2(combined, int(f_keys.max()) * (tmax + 1) + tmax)
        f_codes = f_keys[order]
    else:
        f_dict = pa.array(["text"], type=pa.string())
        f_rank_to_dic = np.zeros(1, dtype=np.int64)
        order = _sort2(t_keys, int(t_keys.max()) if n else 0)
        f_codes = np.zeros(n, dtype=np.int64)
    t_codes = t_keys[order]
    doc_id, tf = doc_id[order], tf[order]

    # term-run boundaries over the sorted rows
    newrun = np.empty(n, dtype=bool)
    newrun[0] = True
    newrun[1:] = (t_codes[1:] != t_codes[:-1]) | (f_codes[1:] != f_codes[:-1])
    starts = np.flatnonzero(newrun)
    run_ends = np.append(starts[1:], n)
    df = (run_ends - starts).astype(np.int32)
    total_tf = np.add.reduceat(tf, starts).astype(np.int64)
    max_tf = np.maximum.reduceat(tf, starts).astype(np.int32)

    # segmented delta: absolute at each run start
    deltas = doc_id.copy()
    deltas[1:] -= doc_id[:-1]
    deltas[starts] = doc_id[starts]

    packed_ids, sz_ids = varint_encode_with_sizes(deltas)
    packed_tfs, sz_tfs = varint_encode_with_sizes(tf)

    def offsets(sizes: np.ndarray) -> np.ndarray:
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=csum[1:])
        return np.append(csum[starts], csum[n])

    out_term = t_dict.take(pa.array(t_rank_to_dic[t_codes[starts]]))
    out_field = f_dict.take(pa.array(f_rank_to_dic[f_codes[starts]]))
    cols = {
        "term": out_term.cast(pa.string()),
        "field": out_field.cast(pa.string()),
        "df": pa.array(df, type=pa.int32()),
        "total_tf": pa.array(total_tf, type=pa.int64()),
        "max_tf": pa.array(max_tf, type=pa.int32()),
        "doc_ids": _binary_from_slices(packed_ids, offsets(sz_ids)),
        "tfs": _binary_from_slices(packed_tfs, offsets(sz_tfs)),
    }
    if has_pos:
        # positional postings: each input row's ``pos`` cell is the already
        # delta+varint-packed positions of one (term, doc); a term's segment
        # cell is the doc-order CONCATENATION of its rows' cells — a pure
        # byte re-slice (take by the sort order, then per-run byte offsets).
        # Per-doc boundaries are implicit: doc j's positions are the next
        # tf_j varints of the stream.  Null cells (shouldn't occur in
        # posting rows) contribute zero bytes.
        pos_sorted = group["pos"].combine_chunks().take(pa.array(order))
        pos_buf, pos_off = binary_column_bytes(pos_sorted)
        cols["positions"] = _binary_from_slices(
            pos_buf.tobytes(), offsets(np.diff(pos_off)))
    return pa.table(cols, schema=out_schema)


def decode_posting(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """Segment row → (doc_ids asc, tfs) as uint64 arrays."""
    return (delta_decode(row["doc_ids"]),
            varint_decode(row["tfs"]))


def decode_segment_to_rows(seg: pa.Table,
                           doc_dict: np.ndarray | None = None) -> pa.Table:
    """SEGMENT_SCHEMA table → flat ``(field, term, doc_id, tf)`` rows (the
    encode input layout), decoded in ONE vectorized concatenated-stream pass
    (:func:`decode_segment_streams` — no per-term Python loop).

    Local-space segments (see ``DOCID_SPACE_KEY``) require ``doc_dict``, the
    owning shard's sorted docID dictionary, to restore GLOBAL docIDs.
    """
    doc_vals, tfs, slot_off = decode_segment_streams(seg)
    if segment_docid_space(seg) == "local":
        if doc_dict is None:
            raise ValueError("local-docID segment needs the shard's docstore "
                             "dictionary to decode to global docIDs")
        doc_vals = doc_dict[doc_vals]
    field_rep = np.repeat(np.arange(seg.num_rows), np.diff(slot_off))
    fields = seg["field"].take(pa.array(field_rep))
    terms = seg["term"].take(pa.array(field_rep))
    cols = {
        "field": fields.combine_chunks() if isinstance(fields, pa.ChunkedArray) else fields,
        "term": terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms,
        "doc_id": pa.array(doc_vals.astype(np.int64), type=pa.int64()),
        "tf": pa.array(tfs.astype(np.int32), type=pa.int32()),
    }
    if "positions" in seg.column_names:
        # re-slice each term's positions stream back into per-(term, doc)
        # ``pos`` cells (the encode input layout): doc j's positions are the
        # next tf_j varints, so per-row byte boundaries come from mapping
        # cumulative-tf value indices through the stream's terminal byte
        # positions.  Deltas reset per doc at tokenize time → the cells are
        # reusable as-is by a re-encode (merge path).
        pos_buf, _ = binary_column_bytes(seg["positions"])
        _, pos_ends = varint_decode_with_ends(pos_buf)
        val_ends = np.cumsum(tfs.astype(np.int64))
        n_post = doc_vals.size
        row_off = np.zeros(n_post + 1, dtype=np.int64)
        if n_post:
            row_off[1:] = pos_ends[val_ends - 1] + 1
        cols["pos"] = _binary_from_slices(pos_buf.tobytes(), row_off)
    return pa.table(cols)


def merge_segment_tables(segs: list[pa.Table],
                         doc_id_offsets: list[int] | None = None,
                         in_dicts: list[np.ndarray | None] | None = None,
                         out_dict: np.ndarray | None = None,
                         drop_docs: list | None = None) -> pa.Table:
    """K-way merge of segment partitions into one SEGMENT_SCHEMA table.

    Inputs are docID-sorted posting lists; the merged list is produced by a
    stable sort over the concatenated runs (numpy's stable sort is timsort —
    it detects and merges the pre-sorted runs, i.e. this IS the k-way merge,
    vectorized).  When the same (field, term, doc_id) appears in several
    inputs (re-crawled doc in a delta build), the LAST input wins.
    ``doc_id_offsets`` optionally remaps each input's docID space by a fixed
    offset (north-rule "docID remapping" for locally-numbered segments).

    ``in_dicts[i]`` is input i's shard docID dictionary (required when that
    input is a local-space segment); ``out_dict`` re-encodes the merged
    output in local space against the MERGED shard's dictionary.

    ``drop_docs[i]`` (sorted global docIDs, post-offset space) drops ALL of
    input i's postings for those documents — DOC-level last-input-wins for
    re-crawls: when a later input re-crawls a doc, the posting-level dedup
    below only overrides terms present in BOTH versions; terms the new
    version no longer contains must be dropped outright or they survive as
    stale postings and inflate df.
    """
    rows = []
    for rank, seg in enumerate(segs):
        r = decode_segment_to_rows(
            seg, in_dicts[rank] if in_dicts is not None else None)
        if doc_id_offsets is not None and doc_id_offsets[rank]:
            r = r.set_column(r.schema.get_field_index("doc_id"), "doc_id",
                             pa.array(r["doc_id"].to_numpy(zero_copy_only=False)
                                      + doc_id_offsets[rank], type=pa.int64()))
        dd = drop_docs[rank] if drop_docs is not None else None
        if dd is not None and len(dd) and r.num_rows:
            dvals = r["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(dd, dvals), len(dd) - 1)
            stale = dd[pos] == dvals
            if stale.any():
                r = r.filter(pa.array(~stale))
        rows.append(r.append_column(
            "rank", pa.array(np.full(r.num_rows, rank, dtype=np.int32))))
    if not rows:
        return SEGMENT_SCHEMA.with_metadata(
            {DOCID_SPACE_KEY: b"local" if out_dict is not None else b"global"}
        ).empty_table()
    # positions survive a merge only if every NON-EMPTY input carries them —
    # a mixed merge (positional + legacy index) cannot reconstruct the
    # missing streams, so it degrades to a non-positional output rather
    # than emitting misaligned position data.  Empty partitions (committed
    # with the base schema, no pos column) contribute nothing and must not
    # trigger the degrade.
    live = [r for r in rows if r.num_rows]
    if live:
        rows = live
    if any("pos" in r.column_names for r in rows) and \
            not all("pos" in r.column_names for r in rows):
        rows = [r.drop_columns(["pos"]) if "pos" in r.column_names else r
                for r in rows]
    flat = pa.concat_tables(rows)
    # last-input-wins dedup on (field, term, doc_id)
    fld = flat["field"].combine_chunks().dictionary_encode()
    trm = flat["term"].combine_chunks().dictionary_encode()
    f = fld.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    t = trm.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    d = flat["doc_id"].to_numpy(zero_copy_only=False)
    rk = flat["rank"].to_numpy(zero_copy_only=False)
    order = np.lexsort((rk, d, t, f))  # rank last-key: highest rank last
    f, t, d = f[order], t[order], d[order]
    keep = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        same = (f[1:] == f[:-1]) & (t[1:] == t[:-1]) & (d[1:] == d[:-1])
        keep[:-1][same] = False  # keep the last (highest-rank) duplicate
    kept = flat.take(pa.array(order[keep]))
    return encode_postings_table(kept.drop_columns(["rank"]), out_dict)


class FragmentSpiller:
    """``map_batches`` stage implementing the map side of a FILESYSTEM
    exchange (external shuffle): each batch's posting rows are split by
    ``part`` and appended as parquet fragments under
    ``tmp_dir/part=P/frag-<h>.parquet``; doc rows (part == -1) are spilled to
    ``docstore_tmp/shard=K/`` (K = doc_id % n_doc_shards — the doc-shard
    partitioning that lets each query searcher read ONLY its own shards'
    docstore rows instead of filtering the full corpus).  Only a tiny
    metrics row returns through the object store.

    Rationale: on a single node, Ray's sort-based shuffle funnels the full
    posting stream through one plasma store three times (materialize, sort
    map out, reduce in) — a serializing resource that caps throughput
    regardless of CPU count.  Spilling through the page-cache-backed
    filesystem is parallel per task, the way external shuffle services work;
    on a multi-node cluster the object store scales per node and the
    ``groupby`` exchange is equivalent.  Fragment names are derived from a
    content hash of the batch's full docID column, so task retries overwrite
    idempotently while distinct blocks never collide.
    """

    def __init__(self, tmp_dir: str, docstore_tmp: str | None,
                 n_doc_shards: int = 1):
        self.tmp_dir = tmp_dir
        self.docstore_tmp = docstore_tmp
        self.n_doc_shards = n_doc_shards

    @staticmethod
    def _metrics(n_rows: int, n_docs: int, total_tokens: int) -> pa.Table:
        """Tiny per-batch metric row: the ONLY thing returned through the
        object store.  ``n_docs`` / ``total_tokens`` are summed by the
        consuming aggregate into docstats.json (no docstore re-read pass)."""
        return pa.table({"n_rows": pa.array([n_rows], type=pa.int64()),
                         "n_docs": pa.array([n_docs], type=pa.int64()),
                         "total_tokens": pa.array([total_tokens],
                                                  type=pa.int64())})

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._metrics(0, 0, 0)
        # fragment tag = content hash of the batch's FULL doc_id column (not
        # just the first docID): stable across task retries (same block →
        # same tag → idempotent overwrite) yet distinct for two blocks that
        # happen to start with the same duplicate document
        import zlib
        ids_np = batch["doc_id"].to_numpy(zero_copy_only=False)
        first_doc = int(ids_np[0])
        content = zlib.crc32(np.ascontiguousarray(ids_np).tobytes())
        tag = f"{first_doc & 0xFFFFFFFFFFFF:012x}-{content:08x}-{len(ids_np)}"
        doc_rows = batch.filter(pa.compute.equal(batch["part"], -1))
        total_tokens = (int(pa.compute.sum(doc_rows["doc_len"]).as_py() or 0)
                        if "doc_len" in doc_rows.column_names else 0)
        if self.docstore_tmp is not None and doc_rows.num_rows:
            drop = [c for c in ("term", "tf", "part", "field", "pos")
                    if c in doc_rows.column_names]
            doc_rows = doc_rows.drop_columns(drop)
            # shard-partitioned spill: sort by shard once, slice runs
            dshard = (doc_rows["doc_id"].to_numpy(zero_copy_only=False)
                      % self.n_doc_shards)
            dorder = np.argsort(dshard, kind="stable")
            doc_rows = doc_rows.take(pa.array(dorder))
            dshard = dshard[dorder]
            dstarts = np.flatnonzero(np.r_[True, np.diff(dshard) != 0])
            dends = np.append(dstarts[1:], len(dshard))
            for s, e in zip(dstarts, dends):
                d = os.path.join(self.docstore_tmp, f"shard={int(dshard[s])}")
                os.makedirs(d, exist_ok=True)
                # per-attempt nonce in the STAGING name: a zombie task (lost
                # raylet heartbeat, process still writing) and its retry
                # must never interleave writes into one tmp file — each
                # attempt stages privately, the deterministic frag-<tag>
                # rename target keeps retries idempotent
                tmp = os.path.join(
                    d, f".tmp-{tag}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                       ".parquet")
                # lz4, not zstd: these fragments get PUBLISHED as the
                # docstore via rename, but zstd's encoder allocations cost
                # more build wall than the ~1.3× size win is worth on the
                # slow-fault-path host; searcher read speed is equivalent
                pq.write_table(doc_rows.slice(s, e - s), tmp,
                               compression="lz4")
                os.replace(tmp, os.path.join(d, f"frag-{tag}.parquet"))
        # ZERO-COPY column select — posting rows are isolated by the run
        # slicing below, not a full-block filter copy (doc rows sort into
        # the first run via the part+1 key and are simply skipped).  This
        # plus the per-slice gathers below removes the spiller's three
        # full-block allocations (filter copy, whole-table take, pvals
        # gather) — the ≥16-way spill CPU inflation was allocator page
        # churn on exactly these (same mechanism the tokenize sub-chunking
        # fixed: allocations under the oversize threshold reuse dirty
        # pages batch-over-batch, VERDICT r4 item 3).
        postings = batch.select(
            [c for c in ("field", "term", "doc_id", "tf", "part", "pos")
             if c in batch.column_names])
        pvals = postings["part"].to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        n_posting_rows = int((pvals >= 0).sum())
        if n_posting_rows == 0:
            # a block whose every doc tokenizes to nothing (empty/binary
            # text, all-stopword) yields zero posting rows; the sort/run
            # machinery below indexes pvals[0] — guard, doc rows already
            # spilled above
            return self._metrics(batch.num_rows, doc_rows.num_rows,
                                 total_tokens)
        import pyarrow.feather as feather
        # BLOCK-LOCAL docID indices (default on; SERX_SPILL_DOCIDX=0 for the
        # legacy raw-docID fragments): docIDs are 64-bit content hashes —
        # incompressible random bytes that were ~85% of fragment volume.
        # Replace the per-row doc_id with a uint16/uint32 index into the
        # block's SORTED unique docID array, written ONCE per block (shared
        # by all its partition slices) as docdict/dict-<tag>.feather.  The
        # encode stage reconstructs global ids with one np.take per
        # fragment.  Cuts exchange tmpfs WRITES ~3× — the shmem page path
        # is the measured 32-way scaling drag (BASELINE.md round-4 ledger);
        # on a real cluster it equally cuts exchange network bytes.  The
        # dict is written BEFORE any fragment that references it, tagged by
        # the same content hash, so task retries stay idempotent.
        use_idx = os.environ.get("SERX_SPILL_DOCIDX", "1") != "0"
        if use_idx:
            block_dict = np.unique(ids_np)
            ddir = os.path.join(self.tmp_dir, "docdict")
            os.makedirs(ddir, exist_ok=True)
            tmpd = os.path.join(ddir, f".tmp-{tag}.feather")
            feather.write_feather(
                pa.table({"doc_id": pa.array(block_dict.astype(np.int64),
                                             type=pa.int64())}),
                tmpd, compression="lz4")
            os.replace(tmpd, os.path.join(ddir, f"dict-{tag}.feather"))
            idx_dtype = (np.uint16 if block_dict.size <= (1 << 16)
                         else np.uint32)
            pdoc = postings["doc_id"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(block_dict, pdoc).astype(idx_dtype)
            di = postings.column_names.index("doc_id")
            postings = postings.set_column(di, "doc_idx", pa.array(idx))
            # tf rides as uint16 when every value fits (exact check, never
            # clipped — a >65535 tf keeps int32); the encoder casts back.
            tfs = postings["tf"].to_numpy(zero_copy_only=False)
            if tfs.size and int(tfs.max()) < (1 << 16):
                ti = postings.column_names.index("tf")
                postings = postings.set_column(
                    ti, "tf", pa.array(tfs.astype(np.uint16)))
        # one stable sort + run slicing instead of a filter scan per part.
        # PRESORT (default on): secondary keys (term code, doc_id) inside
        # each part run cost ~nothing over the plain part argsort (one
        # integer lexsort either way) but give lz4 long runs of identical
        # term codes and ascending docIDs — measurably smaller fragments,
        # i.e. fewer tmpfs pages written through the host's contended
        # shmem path (the round-4 32-way scaling drag).  Encode order is
        # canonicalized downstream (encode_postings_table lexsorts), so
        # fragment row order is free.  SERX_SPILL_PRESORT=0 restores the
        # part-only sort for A/B.
        tcol = postings["term"]
        if isinstance(tcol, pa.ChunkedArray):
            # unify the per-chunk dictionaries ONCE (tokenize sub-chunking
            # emits one dictionary per ~2k-doc chunk) and put the combined
            # column back — the per-slice takes below would otherwise each
            # redo the unification against the full batch vocab
            tcol = tcol.combine_chunks()
            postings = postings.set_column(
                postings.column_names.index("term"), "term", tcol)
        if (os.environ.get("SERX_SPILL_PRESORT", "1") != "0"
                and pa.types.is_dictionary(tcol.type)):
            dkey = ("doc_idx" if "doc_idx" in postings.column_names
                    else "doc_id")
            dvals = postings[dkey].to_numpy(zero_copy_only=False)
            tidx = tcol.indices
            # doc rows ride with NULL term codes: fill with 0 — they sort
            # into the part+1 == 0 run regardless of term bits and are
            # skipped below, so the fill value is never observed
            tvals = (pa.compute.fill_null(tidx, 0) if tidx.null_count
                     else tidx).to_numpy(zero_copy_only=False)
            # pack (part+1, term code, doc) into ONE uint64 sort key when
            # the bit widths fit — a single argsort costs the same as the
            # part-only sort, vs 3 stable passes for np.lexsort (+37% spill
            # CPU measured).  Ties (same term+doc across fields) need no
            # stable order: encode lexsorts canonically by (field, term,
            # doc) downstream.
            pb = (int(pvals.max()) + 1).bit_length()
            tb = max(int(tvals.max()) if tvals.size else 0, 0).bit_length()
            db = max(int(dvals.max()) if dvals.size else 0, 0).bit_length()
            if pb + tb + db <= 63 and (dvals >= 0).all():
                key = (((pvals + 1).astype(np.uint64) << np.uint64(tb + db))
                       | (tvals.astype(np.uint64) << np.uint64(db))
                       | dvals.astype(np.uint64))
                order = np.argsort(key)
            else:
                order = np.lexsort((dvals, tvals, pvals))
            # either branch leaves term codes ASCENDING within each part
            # run — the per-slice dictionary compaction below exploits that
            presorted_terms = True
        else:
            order = np.argsort(pvals, kind="stable")
            presorted_terms = False
        # run boundaries straight from per-part counts (no pvals gather);
        # bin 0 is the doc-row run (part == -1), spilled above and skipped
        counts = np.bincount(pvals + 1)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        postings = postings.drop_columns(["part"])
        # posting fragments are TRANSIENT (read once by the encode stage) —
        # Arrow IPC (feather/lz4) instead of parquet: no column-chunk/stats/
        # dictionary machinery, ~3× less allocation churn per write, which
        # this VM's slow virtualized fault path punishes hard (measured:
        # stage1 49.4 s with parquet fragments vs 16.9 s with IPC at 32
        # CPUs on 1.6M pages).  The durable artifacts (docstore above,
        # segments in FragmentEncoder) stay parquet.
        str_cols = [i for i, c in enumerate(postings.column_names)
                    if c in ("term", "field")]
        for b in np.flatnonzero(counts):
            if b == 0:
                continue               # doc-row run (part == -1)
            p = int(b) - 1
            s, e = int(bounds[b]), int(bounds[b + 1])
            d = os.path.join(self.tmp_dir, f"part={p:05d}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(
                d, f".tmp-{tag}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                   ".feather")
            # PER-SLICE gather from the original (zero-copy-selected)
            # table: ~block/128 bytes per allocation instead of one
            # block-sized take — small enough for the allocator to reuse
            # dirty pages across slices and batches
            sl = postings.take(pa.array(order[s:e]))
            # dictionary-encode term/field PER PARTITION SLICE: a slice
            # holds one term bucket, so its dict is ~vocab/n_buckets
            # entries — fragments carry int32 codes + a small dict instead
            # of n_rows strings, and the encode stage materializes codes
            # (encode_postings_table's dictionary_encode() is a no-op on
            # dict arrays).  Cuts exchange bytes AND stage-2 allocation
            # churn — the 32-way page-allocator contention this VM's
            # kernel profile blamed (BASELINE.md round-3 scaling ledger).
            # Worst case (unbounded web vocab, dict ≈ rows) degrades to
            # ~today's cost: one extra hash pass, no size regression.
            for i in str_cols:
                f_ = sl.field(i)
                col = sl.column(i)
                if pa.types.is_dictionary(col.type):
                    # already dict-encoded upstream (TokenizePostings
                    # dict_terms): COMPACT the slice's dictionary to the
                    # codes it actually uses — int32 ops only, no string
                    # re-hash — so a fragment never ships the whole batch
                    # vocab per partition slice
                    arr = col.combine_chunks() \
                        if isinstance(col, pa.ChunkedArray) else col
                    codes = arr.indices.to_numpy(zero_copy_only=False)
                    if presorted_terms and f_.name == "term" and codes.size:
                        # presorted slice: term codes ascend, so compaction
                        # is run-boundary detection — O(n), no argsort (the
                        # np.unique below was the spiller's hottest loop:
                        # 128 slices × sort per block)
                        newrun = np.empty(codes.size, dtype=bool)
                        newrun[0] = True
                        np.not_equal(codes[1:], codes[:-1], out=newrun[1:])
                        inv = np.cumsum(newrun, dtype=np.int32) - 1
                        uniq = codes[newrun]
                    else:
                        uniq, inv = np.unique(codes, return_inverse=True)
                        inv = inv.astype(np.int32)
                    compact = pa.DictionaryArray.from_arrays(
                        pa.array(inv),
                        arr.dictionary.take(pa.array(uniq)))
                    sl = sl.set_column(i, f_.name, compact)
                else:
                    sl = sl.set_column(i, f_.name, col.dictionary_encode())
            feather.write_feather(sl, tmp, compression="lz4")
            os.replace(tmp, os.path.join(d, f"frag-{tag}.feather"))
        return self._metrics(batch.num_rows, doc_rows.num_rows, total_tokens)


# worker-local shard-dictionary cache: encode tasks land ~n_buckets times
# per shard on far fewer workers, and each docstore shard is immutable once
# published (the build writes it BEFORE stage 2; a re-published docstore
# bumps the directory mtime, which keys the cache).  Tiny: one int64 array
# of O(corpus / n_doc_shards) per entry, ≤4 entries per worker.
_SHARD_DICT_CACHE: dict[tuple[str, int, int], np.ndarray] = {}
_SHARD_DICT_CACHE_MAX = 4


def load_shard_dict(docstore_dir: str, shard: int) -> np.ndarray | None:
    """Sorted unique global docIDs of ``docstore_dir/shard=K`` — the local
    docID dictionary.  ``None`` when the docstore isn't shard-partitioned
    (legacy layout or docstore-less build) → callers encode in global space.
    One int64 column read of O(corpus / n_doc_shards) rows, cached per
    worker process across tasks."""
    d = os.path.join(docstore_dir, f"shard={shard}")
    if not os.path.isdir(d):
        return None
    if not any(f.endswith(".parquet") for f in os.listdir(d)):
        # pre-created / crash-leftover dir with no rows yet: treat like a
        # missing shard (reading an empty directory raises in pyarrow)
        return None
    key = (os.path.abspath(d), shard, os.stat(d).st_mtime_ns)
    hit = _SHARD_DICT_CACHE.get(key)
    if hit is not None:
        return hit
    ids = pq.read_table(d, columns=["doc_id"])["doc_id"] \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.unique(ids)
    if len(_SHARD_DICT_CACHE) >= _SHARD_DICT_CACHE_MAX:
        _SHARD_DICT_CACHE.pop(next(iter(_SHARD_DICT_CACHE)))
    _SHARD_DICT_CACHE[key] = out
    return out


# worker-local block-dict cache: every encode task reads the same ~n_blocks
# docdict files (one per spilled block); a worker runs several partition
# tasks, so cache the decoded int64 arrays across tasks.  Bounded: ≤256
# entries × O(block docs) ≈ ≤50 MB per worker at default block sizes.
_BLOCK_DICT_CACHE: dict[tuple[str, str], np.ndarray] = {}
_BLOCK_DICT_CACHE_MAX = 256


def _load_block_dict(tmp_dir: str, tag: str) -> np.ndarray:
    """Sorted unique global docIDs of the spilled block ``tag`` (written by
    :class:`FragmentSpiller` under ``tmp_dir/docdict/``)."""
    key = (tmp_dir, tag)
    hit = _BLOCK_DICT_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.feather as feather
    p = os.path.join(tmp_dir, "docdict", f"dict-{tag}.feather")
    arr = feather.read_table(p)["doc_id"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(_BLOCK_DICT_CACHE) >= _BLOCK_DICT_CACHE_MAX:
        _BLOCK_DICT_CACHE.pop(next(iter(_BLOCK_DICT_CACHE)))
    _BLOCK_DICT_CACHE[key] = arr
    return arr


_LOCAL_DICT_CACHE: dict[tuple, np.ndarray] = {}
_LOCAL_DICT_CACHE_MAX = 64


def _block_to_local(tmp_dir: str, tag: str, doc_dict: np.ndarray,
                    dict_key) -> np.ndarray:
    """Block dictionary → SHARD-LOCAL id per entry (-1 = not in this shard's
    dictionary).  Cached per (block, shard): the expensive searchsorted runs
    over the ~25k-entry block dict ONCE, and every fragment of that block
    landing on this worker (one per term bucket of the shard) reuses it —
    vs one binary search per posting ROW, the encode stage's former
    per-partition hotspot (≈0.12 s per 1M rows, cache-miss bound)."""
    key = (tmp_dir, tag, dict_key)
    hit = _LOCAL_DICT_CACHE.get(key)
    if hit is not None:
        return hit
    dic = _load_block_dict(tmp_dir, tag)
    pos = np.searchsorted(doc_dict, dic)
    ok = pos < doc_dict.size
    ok[ok] = doc_dict[pos[ok]] == dic[ok]
    local = np.where(ok, pos, -1).astype(np.int64)
    if len(_LOCAL_DICT_CACHE) >= _LOCAL_DICT_CACHE_MAX:
        _LOCAL_DICT_CACHE.pop(next(iter(_LOCAL_DICT_CACHE)))
    _LOCAL_DICT_CACHE[key] = local
    return local


def resolve_fragment_docids(t: pa.Table, tmp_dir: str, frag_name: str,
                            doc_dict: np.ndarray | None = None,
                            dict_key=None) -> pa.Table:
    """Reconstruct ``doc_id`` for a fragment spilled with block-local
    ``doc_idx`` indices (no-op for legacy raw-docID fragments).

    With ``doc_dict`` (the owning shard's sorted unique global docIDs,
    keyed for caching by ``dict_key``): emit SHARD-LOCAL ids directly via
    the cached block→local map; rows whose docID is absent from the shard
    dictionary raise (same contract as ``encode_postings_table``'s check).
    Without it: emit global ids (legacy / dict-less callers)."""
    if "doc_idx" not in t.column_names:
        return t
    tag = frag_name[len("frag-"):].rsplit(".", 1)[0]
    idx = t["doc_idx"].to_numpy(zero_copy_only=False)
    di = t.column_names.index("doc_idx")
    if doc_dict is not None:
        local = _block_to_local(tmp_dir, tag, doc_dict, dict_key)
        vals = local[idx]
        if vals.size and int(vals.min()) < 0:
            n_bad = int((vals < 0).sum())
            raise ValueError(
                f"{n_bad} posting docIDs absent from the shard docstore "
                "dictionary — postings and docstore must come from the "
                "same build pass")
        t = t.set_column(di, "doc_id", pa.array(vals, type=pa.int64()))
    else:
        dic = _load_block_dict(tmp_dir, tag)
        t = t.set_column(di, "doc_id", pa.array(dic[idx], type=pa.int64()))
    if not pa.types.is_int32(t["tf"].type):
        # tf may have shrunk to uint16 in the fragment; normalize so
        # cross-block concat always sees one schema
        ti = t.column_names.index("tf")
        t = t.set_column(ti, "tf", t["tf"].cast(pa.int32()))
    return t


class FragmentEncoder:
    """Reduce side of the filesystem exchange: one task per pending
    partition reads its fragments, encodes (in LOCAL docID space when the
    shard-partitioned docstore is available — published before this stage
    runs), and commits atomically."""

    def __init__(self, tmp_dir: str, out_dir: str, n_buckets: int,
                 docstore_dir: str | None = None):
        self.tmp_dir = tmp_dir
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.docstore_dir = docstore_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time
        out = []
        import pyarrow.feather as feather
        for part in batch["part"].to_pylist():
            t0 = time.time()
            part_dir = os.path.join(self.tmp_dir, f"part={part:05d}")
            frags = (sorted(f for f in os.listdir(part_dir)
                            if f.startswith("frag-"))
                     if os.path.isdir(part_dir) else [])
            n_frags = len(frags)
            shard, bucket = ckpt.split_part(part, self.n_buckets)
            doc_dict = (load_shard_dict(self.docstore_dir, shard)
                        if self.docstore_dir else None)
            # resolve block-local doc_idx straight to SHARD-LOCAL ids (the
            # cached per-(block, shard) map) so encode skips its per-row
            # global→local binary search; key the cache by content identity:
            # size + last docID + the shard directory mtime_ns (same key
            # component _SHARD_DICT_CACHE uses), so a docstore republished
            # at the same path with equal size/max-docID but different
            # interior content cannot serve a stale block→local map
            if doc_dict is None:
                dkey = None
            else:
                sdir = os.path.join(self.docstore_dir, f"shard={shard}")
                try:
                    mt = os.stat(sdir).st_mtime_ns
                except OSError:
                    mt = -1
                dkey = (self.docstore_dir, shard, mt, doc_dict.size,
                        int(doc_dict[-1]) if doc_dict.size else -1)
            # feather is the current fragment format; parquet fragments can
            # coexist when resuming a stage1 spilled by an older build
            raw_tables = [
                feather.read_table(os.path.join(part_dir, f))
                if f.endswith(".feather")
                else pq.read_table(os.path.join(part_dir, f))
                for f in frags]
            # pre-localize only when EVERY fragment carries doc_idx — a mix
            # with legacy raw-docID fragments (resume across formats) keeps
            # global ids throughout and lets encode do its own mapping
            use_local = (doc_dict is not None and bool(raw_tables) and
                         all("doc_idx" in t.column_names
                             for t in raw_tables))
            parts_tables = [
                resolve_fragment_docids(t, self.tmp_dir, f,
                                        doc_dict if use_local else None,
                                        dkey)
                for t, f in zip(raw_tables, frags)]
            rows = (pa.concat_tables(parts_tables, promote_options="default")
                    if parts_tables else None)
            t_read = time.time()
            seg = encode_postings_table(rows, doc_dict,
                                        ids_are_local=use_local) \
                if rows is not None \
                else encode_postings_table(pa.table(
                    {"term": pa.array([], type=pa.string()),
                     "doc_id": pa.array([], type=pa.int64()),
                     "tf": pa.array([], type=pa.int32())}), doc_dict)
            t_enc = time.time()
            part_dir = ckpt.partition_dir_in(self.out_dir, shard, bucket)
            os.makedirs(part_dir, exist_ok=True)
            tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
            pq.write_table(seg, tmp, compression="zstd")
            final = os.path.join(part_dir, "postings.parquet")
            os.replace(tmp, final)
            t_write = time.time()
            metrics = {"part": part, "shard": shard, "bucket": bucket,
                       "n_terms": seg.num_rows,
                       "n_postings": int(pa.compute.sum(seg["df"]).as_py() or 0),
                       "bytes": os.path.getsize(final),
                       # lineage + per-partition build metrics (north rule)
                       "n_input_rows": rows.num_rows if rows is not None else 0,
                       "n_fragments": n_frags,
                       "exchange": "fs",
                       "wall_ms": int((time.time() - t0) * 1000),
                       # per-phase split for scaling diagnosis: fragment
                       # read / encode / segment write (ms)
                       "read_ms": int((t_read - t0) * 1000),
                       "encode_ms": int((t_enc - t_read) * 1000),
                       "write_ms": int((t_write - t_enc) * 1000)}
            with open(os.path.join(part_dir, "_DONE"), "w") as f:
                json.dump(metrics, f)
            out.append(metrics)
        return pa.table({k: [r[k] for r in out]
                         for k in ("part", "shard", "bucket", "n_terms",
                                   "n_postings", "bytes", "n_input_rows",
                                   "n_fragments", "wall_ms")})


def commit_empty_partition(out_dir: str, part: int, n_buckets: int,
                           docstore_dir: str | None = None) -> dict:
    """Write an empty segment + ``_DONE`` for a partition that received no
    posting rows (common with many partitions on small corpora) so the
    manifest completes and resume doesn't re-run the whole build."""
    shard, bucket = ckpt.split_part(part, n_buckets)
    doc_dict = (load_shard_dict(docstore_dir, shard)
                if docstore_dir else None)
    seg = encode_postings_table(pa.table(
        {"term": pa.array([], type=pa.string()),
         "doc_id": pa.array([], type=pa.int64()),
         "tf": pa.array([], type=pa.int32())}), doc_dict)
    part_dir = ckpt.partition_dir_in(out_dir, shard, bucket)
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(seg, tmp, compression="zstd")
    final = os.path.join(part_dir, "postings.parquet")
    os.replace(tmp, final)
    metrics = {"part": part, "shard": shard, "bucket": bucket,
               "n_terms": 0, "n_postings": 0,
               "bytes": os.path.getsize(final)}
    with open(os.path.join(part_dir, "_DONE"), "w") as f:
        json.dump(metrics, f)
    return metrics


class EncodePartitionWriter:
    """``groupby('part').map_groups`` callable: encode one (doc-shard,
    term-bucket) partition and write it atomically (tmp file + rename +
    ``_DONE`` marker) — the north-rule checkpoint unit.  Returns one metrics
    row per partition.

    ``docstore_dir``: when the shard-partitioned docstore is already
    published (the build writes it before this stage), postings encode in
    LOCAL docID space against the shard's dictionary."""

    def __init__(self, out_dir: str, n_buckets: int,
                 docstore_dir: str | None = None):
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.docstore_dir = docstore_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py()) if group.num_rows else -1
        shard, bucket = ckpt.split_part(part, self.n_buckets)
        doc_dict = (load_shard_dict(self.docstore_dir, shard)
                    if self.docstore_dir else None)
        seg = encode_postings_table(group.drop_columns(["part"]), doc_dict)
        part_dir = ckpt.partition_dir_in(self.out_dir, shard, bucket)
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(seg, tmp, compression="zstd")
        final = os.path.join(part_dir, "postings.parquet")
        os.replace(tmp, final)
        metrics = {
            "part": part,
            "shard": shard,
            "bucket": bucket,
            "n_terms": seg.num_rows,
            "n_postings": int(pa.compute.sum(seg["df"]).as_py() or 0),
            "bytes": os.path.getsize(final),
        }
        with open(os.path.join(part_dir, "_DONE"), "w") as f:
            json.dump(metrics, f)
        return pa.table({k: [v] for k, v in metrics.items()})
