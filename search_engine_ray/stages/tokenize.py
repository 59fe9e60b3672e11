"""Vectorized tokenize + per-doc term-frequency counting (map-side combine).

This is the Ray Data restatement of the reference's parser threads
(``/root/reference/KaggleFinanceSourceEngine.cpp:252-267``): tokenize the body
text and pre-aggregate ``{term → tf}`` per document INSIDE the batch, so the
downstream ``groupby`` shuffle moves one row per distinct ``(doc, term)``
instead of one row per token — the classic partial/final aggregate split
(reference analogue: per-doc ``word_map`` at ``.cpp:263-264``).

All kernels are pyarrow.compute / numpy over zero-copy Arrow batches; the
only per-element Python runs over the batch's *unique vocabulary* (dictionary
values) for Porter stemming, which has no vectorized kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.analyze import TOKEN_SPLIT_PATTERN, porter_stem
from ..functions.hashing import fnv1a64_array


# byte-translation table folding DELIMITER→space and ASCII-lowercase into
# ONE numpy pass over the batch's text bytes: every delimiter in
# TOKEN_SPLIT_PATTERN is a single ASCII byte, so splitting the translated
# text on a literal space is equivalent to the regex-class split, and
# A-Z+32 is exactly ascii_lower.  UTF-8 continuation/lead bytes (>0x7F)
# pass through untouched and are handled by the non-ASCII token reject.
_TOKEN_DELIMS = b' \t\v\n\r,.?!;:"/()'
_NORM_LUT = np.arange(256, dtype=np.uint8)
for _d in _TOKEN_DELIMS:
    _NORM_LUT[_d] = 0x20
for _c in range(ord("A"), ord("Z") + 1):
    _NORM_LUT[_c] = _c + 32
# bytes.translate twin of the LUT: libc-speed table walk, ~3× the numpy
# fancy-index gather on this host (29.6 vs 90.1 ms per 25k-doc block), and
# its delete argument strips apostrophes IN THE SAME PASS — deleting ``'``
# from the normalized text is byte-for-byte equivalent to the reference's
# per-token apostrophe strip (``'`` is not a delimiter, so deletion never
# merges two tokens; all-apostrophe tokens become empty strings and are
# dropped by the existing empty-token filter).
_NORM_TRANS = bytes(_NORM_LUT.tolist())


# Arrow value-set arrays for pc.is_in, memoized by SET IDENTITY: the
# stopword / hot-term sets live for an actor's lifetime while the ~2k-doc
# tokenize sub-chunking calls down here hundreds of times per block —
# re-sorting and re-materializing the same string array per chunk violated
# the once-per-actor rule (north-rule ST5).  The cache holds a strong ref
# to the keying set, so an id() is never reused while its entry exists.
_VALUE_SET_CACHE: dict[int, tuple[object, pa.Array]] = {}


def _value_set(s) -> pa.Array:
    hit = _VALUE_SET_CACHE.get(id(s))
    if hit is not None and hit[0] is s:
        return hit[1]
    arr = pa.array(sorted(s))
    _VALUE_SET_CACHE[id(s)] = (s, arr)
    return arr


def split_and_normalize(texts: pa.Array | pa.ChunkedArray,
                        *, stopwords: frozenset[str] | None = None,
                        stem: bool = False) -> tuple[np.ndarray, pa.Array]:
    """Tokenize a string column → ``(row_indices, terms)``.

    ``row_indices[i]`` is the batch row that produced ``terms[i]``.  Semantics
    match ``functions.analyze.tokenize`` exactly (property-tested).

    Hot-path shape (2.5× over the regex-kernel chain it replaces): one
    numpy LUT pass lowercases and maps delimiters to space, a literal-space
    split replaces the regex-class split, non-ASCII token rejection walks
    only the (rare) high bytes, and the apostrophe strip runs only when a
    token actually carries one.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    off_dt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    off = np.frombuffer(texts.buffers()[1], off_dt)[
        texts.offset: texts.offset + len(texts) + 1]
    vals = np.frombuffer(texts.buffers()[2] or b"", np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    raw = vals[lo:hi].tobytes()
    if raw.find(b"'") >= 0:
        # apostrophes are deleted by the translate pass below, which shifts
        # every later byte left: rebase each row offset by the count of
        # apostrophes before it (sparse scan + searchsorted — ~10 ms/block
        # vs the ~180 ms token-level match+replace+refilter chain this
        # replaces)
        apos = np.flatnonzero(np.frombuffer(raw, np.uint8) == 0x27)
        new_off = (off - lo - np.searchsorted(apos, off - lo)).astype(off_dt)
        seg = raw.translate(_NORM_TRANS, b"'")
    else:
        new_off = (off - lo).astype(off_dt)
        seg = raw.translate(_NORM_TRANS)
    norm = pa.Array.from_buffers(texts.type, len(texts),
                                 [None, pa.py_buffer(new_off),
                                  pa.py_buffer(seg)])
    splits = pc.split_pattern(norm, " ")
    counts = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    flat = pc.list_flatten(splits)

    # Reject empty fragments and any token containing a non-ASCII byte
    # (reference CleanValue, .cpp:142-144).  High bytes are rare in web
    # text: locate them directly and map each to its token instead of
    # regex-scanning every token.
    fdt = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    foff = np.frombuffer(flat.buffers()[1], fdt)[
        flat.offset: flat.offset + len(flat) + 1]
    fvals = np.frombuffer(flat.buffers()[2] or b"", np.uint8)
    s0, s1 = foff[:-1], foff[1:]
    keep_np = s1 > s0
    flo, fhi = int(foff[0]), int(foff[-1])
    hi_pos = np.flatnonzero(fvals[flo:fhi] > 0x7F) + flo
    if hi_pos.size:
        tok = np.searchsorted(s1, hi_pos, side="right")
        ok = tok < len(keep_np)
        # guard: only kill the token if the byte is inside its span (a
        # high byte in an inter-token gap — impossible for space-separated
        # values, but cheap to exclude — must not kill the next token)
        ok[ok] = hi_pos[ok] >= s0[tok[ok]]
        keep_np = keep_np.copy()
        keep_np[tok[ok]] = False
    flat = flat.filter(pa.array(keep_np))
    row_idx = row_idx[keep_np]
    # (apostrophe strip happened at the byte level in the translate pass
    # above; empty-after-strip tokens were dropped by the empty filter)
    terms = flat

    if stopwords:
        drop = pc.is_in(terms, value_set=_value_set(stopwords))
        keep3 = pc.invert(drop)
        keep3_np = keep3.to_numpy(zero_copy_only=False)
        terms = terms.filter(keep3)
        row_idx = row_idx[keep3_np]

    if stem:
        dic = pc.dictionary_encode(terms)
        vocab = dic.dictionary.to_pylist()
        stemmed = pa.array([porter_stem(t) for t in vocab], type=pa.string())
        terms = stemmed.take(dic.indices)

    return row_idx, terms


def derive_title_column(texts: pa.Array | pa.ChunkedArray,
                        n_tokens: int = 8) -> pa.Array:
    """Deterministic per-row "title": the first ``n_tokens`` kept tokens of
    the normalized token stream, space-joined.  Because kept tokens contain
    no delimiter characters and normalization is idempotent, re-tokenizing
    the title reproduces exactly those tokens — which is what makes the
    BM25F oracle expressible as ``ord <= n_tokens`` over the ordinal
    tokenize CTE (``sql_ordinal_tokenize_cte``)."""
    row_idx, terms = split_and_normalize(texts)
    n = len(texts)
    counts = np.bincount(row_idx, minlength=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    within = np.arange(row_idx.size, dtype=np.int64) - starts[row_idx]
    sel = within < n_tokens
    head_counts = np.bincount(row_idx[sel], minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(head_counts, out=offsets[1:])
    values = terms.filter(pa.array(sel))
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   values)
    return pc.binary_join(lst, " ")


# Sub-chunk size (docs) for the tokenize map stages.  Ray Data blocks on
# the build path are ~25k docs (block-per-task keeps the exchange's
# fragment count minimal), but running the whole block through the kernel
# chain as ONE batch makes every intermediate (normalized text copy, token
# splits, group keys) a tens-of-MB allocation — jemalloc treats ≥8 MB
# buffers as oversize and purges them on EVERY free, so each batch
# re-faults its full working set; under ≥16-way concurrency those faults
# serialize on this host's contended page path (BASELINE.md round-4
# ladder: identical work costs 110 CPU·s at 2–4 way but 300 CPU·s at
# 16-way).  Processing ~2k-doc sub-slices keeps intermediates under the
# oversize threshold so the allocator reuses dirty pages batch-over-batch:
# measured tok-stage wall 8.76 → 4.90 s at 32 CPUs and 56.8 → 40.6 s at
# 4 CPUs on the 1.6M-page corpus (within-run A/B, healthy host).  The
# chunk outputs are collected with zero-copy ``pa.concat_tables`` so the
# downstream spiller still sees one table per block (fragment count
# unchanged).  ``SERX_TOK_CHUNK=0`` disables; any int overrides.
def _tok_chunk_docs() -> int:
    import os
    try:
        return int(os.environ.get("SERX_TOK_CHUNK", "2048"))
    except ValueError:
        return 2048


def _chunked_call(inner, batch: pa.Table) -> pa.Table:
    """Apply ``inner`` to ≤chunk-doc slices of ``batch`` and concat
    (zero-copy chunk collection).  Dictionary columns may carry per-chunk
    dictionaries — Arrow ChunkedArrays allow that, and every consumer
    (FragmentSpiller's per-slice compaction, encode's dictionary_encode)
    unifies on use."""
    chunk = _tok_chunk_docs()
    if chunk <= 0 or batch.num_rows <= chunk:
        return inner(batch)
    outs = [inner(batch.slice(off, chunk))
            for off in range(0, batch.num_rows, chunk)]
    return pa.concat_tables(outs, promote_options="default")


def _group_term_doc(row_idx: np.ndarray, terms: pa.Array
                    ) -> tuple[np.ndarray, np.ndarray, pa.Array, np.ndarray]:
    """(token rows) → per-(row, distinct-term) groups:
    ``(group_rows, term_codes, vocab, tf)``.

    One dictionary hash pass over the token strings, then a single int64
    ``value_counts`` over the packed ``(row, code)`` key — replaces an Acero
    ``group_by`` on (string, int64), which is ~1.7× slower and far more
    allocation-hungry (hash-table churn per batch is exactly what this VM's
    throttled page-fault path punishes at 32-way width).  Downstream hashing
    (term → bucket) then needs only the *vocab*, not one hash per group row.
    Packing bound: batch rows < 2³¹ and per-batch vocab < 2³² — both orders
    of magnitude above any real block size."""
    dic = pc.dictionary_encode(terms)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key = (row_idx << np.int64(32)) | codes
    vc = pc.value_counts(pa.array(key))
    k = vc.field("values").to_numpy(zero_copy_only=False)
    tf = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int32)
    rows = (k >> np.int64(32)).astype(np.int64)
    gcodes = (k & np.int64(0xFFFFFFFF)).astype(np.int32)
    vocab = dic.dictionary
    if isinstance(vocab, pa.ChunkedArray):
        vocab = vocab.combine_chunks()
    return rows, gcodes, vocab, tf


def count_tf(row_idx: np.ndarray, terms: pa.Array,
             doc_ids: np.ndarray) -> pa.Table:
    """Per-(doc, term) frequency within the batch → ``(term, doc_id, tf)``."""
    if len(terms) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "tf": pa.array([], type=pa.int32())})
    rows, gcodes, vocab, tf = _group_term_doc(row_idx, terms)
    return pa.table({"term": vocab.take(pa.array(gcodes)),
                     "doc_id": pa.array(doc_ids[rows], type=pa.int64()),
                     "tf": pa.array(tf, type=pa.int32())})


class TokenizePostings:
    """``map_batches`` callable: documents batch → ``(term, doc_id, tf,
    doc_len, part)`` where ``part = (doc_id % n_doc_shards) * n_buckets +
    term_hash % n_buckets`` — the single shuffle key for the (doc-shard,
    term-bucket) partition grid (see ``state/checkpoint.py``).

    Stateless w.r.t. data but holds compiled configuration; used as an actor
    pool so stopword sets / config are built once per actor (north-rule ST5).
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id",
                 stopwords: frozenset[str] | None = None, stem: bool = False,
                 n_buckets: int = 32, n_doc_shards: int = 1,
                 emit_doc_rows: bool = False, keep_cols: tuple[str, ...] = (),
                 hot_terms: frozenset[str] | None = None, salt: int = 8,
                 emit_positions: bool = False):
        self.text_col = text_col
        self.id_col = id_col
        self.stopwords = stopwords
        self.stem = stem
        self.n_buckets = n_buckets
        self.n_doc_shards = n_doc_shards
        self.emit_doc_rows = emit_doc_rows
        self.keep_cols = keep_cols
        # positional postings (phrase-query support): each (term, doc) row
        # additionally carries a ``pos`` binary cell — the term's token
        # positions within the doc's KEPT-token stream (the stream that
        # defines doc_len), delta+varint packed.  Adds one lexsort per batch.
        self.emit_positions = emit_positions
        # head-term skew salting (SURVEY §7.5 item 2): a hot term's postings
        # spread over ``salt`` term-buckets WITHIN its doc shard (bucket =
        # (hash(term) + doc_id % salt) % n_buckets), bounding any single
        # partition's share of a Zipf head term.  Correctness is unaffected:
        # a shard searcher loads all its buckets and merges a term's slot
        # runs, so a term may legally live in several buckets.
        self.hot_terms = hot_terms
        self.salt = salt
        # dict_terms: emit ``term`` (and the constant ``field``) dictionary-
        # encoded instead of as flat strings.  Opt-in for the fs-exchange
        # build path (pipelines/build sets it): the spiller then only
        # COMPACTS per-partition-slice dictionaries (int32 ops) instead of
        # re-hashing term strings per slice, and the batch never materializes
        # a per-group string column at all.  Default off so direct callers
        # and the groupby exchange keep plain-string blocks.
        self.dict_terms = False

    def _bucket(self, term_col: pa.Array, doc_ids: np.ndarray) -> np.ndarray:
        bucket = (fnv1a64_array(term_col) % np.uint64(self.n_buckets)).astype(np.int64)
        if self.hot_terms:
            hot = pc.is_in(term_col, value_set=_value_set(self.hot_terms)) \
                .to_numpy(zero_copy_only=False)
            if hot.any():
                bucket[hot] = (bucket[hot] + doc_ids[hot] % self.salt) % self.n_buckets
        return bucket

    def _grouped_with_positions(self, row_idx: np.ndarray, terms: pa.Array,
                                doc_len: np.ndarray
                                ) -> tuple[np.ndarray, pa.Array, pa.Array,
                                           pa.Array]:
        """(token rows) → per-(row, term) groups WITH packed positions:
        ``(group_rows, term_col, tf_col, pos_col)``.

        Token position within its doc = index in the kept-token stream
        (``split_and_normalize`` preserves token order, so positions are
        ``arange - row_start``).  One lexsort groups (row, term) while
        keeping positions ascending; per-group positions are delta-encoded
        (reset at each group) and varint-packed in ONE pass, then sliced
        into per-group binary cells zero-copy."""
        from ..functions.varint import varint_encode_with_sizes
        from .postings import _binary_from_slices
        n_tok = len(row_idx)
        counts = np.bincount(row_idx, minlength=doc_len.size)
        row_start = np.zeros(doc_len.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=row_start[1:])
        pos = np.arange(n_tok, dtype=np.int64) - row_start[row_idx]
        dic = pc.dictionary_encode(terms)
        t_codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, t_codes, row_idx))
        r, c, p = row_idx[order], t_codes[order], pos[order]
        newrun = np.empty(n_tok, dtype=bool)
        newrun[0] = True
        newrun[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(newrun)
        tf = np.diff(np.append(starts, n_tok)).astype(np.int32)
        deltas = p.copy()
        deltas[1:] -= p[:-1]
        deltas[starts] = p[starts]
        packed, sizes = varint_encode_with_sizes(deltas.astype(np.uint64))
        csum = np.zeros(n_tok + 1, dtype=np.int64)
        np.cumsum(sizes, out=csum[1:])
        pos_col = _binary_from_slices(packed, np.append(csum[starts], csum[n_tok]))
        term_col = dic.dictionary.take(pa.array(c[starts])).cast(pa.string())
        return r[starts], term_col, pa.array(tf, type=pa.int32()), pos_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _chunked_call(self._call_one, batch)

    def _call_one(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, terms = split_and_normalize(
            batch[self.text_col], stopwords=self.stopwords, stem=self.stem)
        doc_len = np.bincount(row_idx, minlength=batch.num_rows)
        if len(terms) == 0:
            out = None
        elif self.emit_positions:
            rows, term_col, tf_col, pos_col = self._grouped_with_positions(
                row_idx, terms, doc_len)
            bucket = self._bucket(term_col, doc_ids[rows])
            shard = doc_ids[rows] % self.n_doc_shards
            part = (shard * self.n_buckets + bucket).astype(np.int32)
            out = pa.table({
                "term": term_col,
                "doc_id": pa.array(doc_ids[rows], type=pa.int64()),
                "tf": tf_col,
                "doc_len": pa.array(doc_len[rows], type=pa.int32()),
                "part": pa.array(part, type=pa.int32()),
                "pos": pos_col,
            })
        else:
            rows, gcodes, vocab, tf = _group_term_doc(row_idx, terms)
            # hash ONLY the unique vocab (≈2% of group rows), gather codes
            vbucket = (fnv1a64_array(vocab)
                       % np.uint64(self.n_buckets)).astype(np.int64)
            bucket = vbucket[gcodes]
            gdocs = doc_ids[rows]
            if self.hot_terms:
                vhot = pc.is_in(vocab, value_set=_value_set(
                    self.hot_terms)).to_numpy(zero_copy_only=False)
                hot = vhot[gcodes]
                if hot.any():
                    bucket[hot] = (bucket[hot] + gdocs[hot] % self.salt) \
                        % self.n_buckets
            shard = gdocs % self.n_doc_shards
            part = (shard * self.n_buckets + bucket).astype(np.int32)
            term_col = (pa.DictionaryArray.from_arrays(pa.array(gcodes),
                                                       vocab)
                        if self.dict_terms else vocab.take(pa.array(gcodes)))
            out = pa.table({
                "term": term_col,
                "doc_id": pa.array(gdocs, type=pa.int64()),
                "tf": pa.array(tf, type=pa.int32()),
                "doc_len": pa.array(doc_len[rows], type=pa.int32()),
                "part": pa.array(part, type=pa.int32()),
            })
        # positional branch still emits flat strings — dict output applies
        # only to the (far hotter) tf-only branch
        term_t = (pa.dictionary(pa.int32(), pa.string())
                  if self.dict_terms and not self.emit_positions
                  else pa.string())
        empty_cols = {"term": pa.array([], type=term_t),
                      "doc_id": pa.array([], type=pa.int64()),
                      "tf": pa.array([], type=pa.int32()),
                      "doc_len": pa.array([], type=pa.int32()),
                      "part": pa.array([], type=pa.int32())}
        if self.emit_positions:
            empty_cols["pos"] = pa.array([], type=pa.binary())
        empty = pa.table(empty_cols)
        if not self.emit_doc_rows:
            return out if out is not None else empty
        # single-pass build: one extra row per input doc (part = -1) carries
        # the docstore payload through the same stream — no second
        # read+extract pass (see pipelines/build.py)
        n = batch.num_rows
        doc_rows = {
            "term": pa.nulls(n, type=term_t),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "tf": pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
            "doc_len": pa.array(doc_len.astype(np.int32), type=pa.int32()),
            "part": pa.array(np.full(n, -1, dtype=np.int32), type=pa.int32()),
        }
        if self.emit_positions:
            doc_rows["pos"] = pa.nulls(n, type=pa.binary())
        base = out if out is not None else empty
        for c in self.keep_cols:
            doc_rows[c] = batch[c].combine_chunks() \
                if isinstance(batch[c], pa.ChunkedArray) else batch[c]
            base = base.append_column(
                c, pa.nulls(base.num_rows, type=batch[c].type))
        tables = ([base] if out is not None else []) + [pa.table(doc_rows)]
        return pa.concat_tables(tables, promote_options="default")


def clean_metadata_array(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized reference ``CleanMetaData``
    (``/root/reference/KaggleFinanceSourceEngine.cpp:155-173``): strip ``'``,
    ASCII-lowercase; a value containing ANY non-ASCII byte maps to the EMPTY
    STRING — and is still indexed under ``""`` (the reference quirk)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = pc.fill_null(values, "")
    non_ascii = pc.match_substring_regex(values, "[^\\x00-\\x7F]")
    cleaned = pc.ascii_lower(pc.replace_substring(values, "'", ""))
    return pc.if_else(non_ascii, "", cleaned)


class FieldedPostings:
    """``map_batches`` callable for the multi-field reference index: emits
    ``(field, term, doc_id, tf, doc_len, part)`` rows.

    - **text fields** (reference ``value_index`` / ``title_index``,
      ``SourceEngine.h:23-24``): tokenized, per-doc tf counts, per-field
      ``doc_len``.
    - **metadata fields** (the 7 set-indexes, ``SourceEngine.h:25-31``):
      ``CleanMetaData`` normalization, set semantics (tf=1, duplicates
      collapse), empty-string key preserved; list<string> columns (persons/
      locations/organizations entities) are flattened per doc.
    """

    def __init__(self, *, id_col: str = "doc_id",
                 text_fields: dict[str, str] | None = None,
                 metadata_fields: dict[str, str] | None = None,
                 stopwords: frozenset[str] | None = None, stem: bool = False,
                 n_buckets: int = 16, n_doc_shards: int = 4,
                 emit_doc_rows: bool = False, keep_cols: tuple[str, ...] = ()):
        self.id_col = id_col
        self.text_fields = text_fields or {"text": "text"}
        self.metadata_fields = metadata_fields or {}
        self.stopwords = stopwords
        self.stem = stem
        self.n_buckets = n_buckets
        self.n_doc_shards = n_doc_shards
        self.emit_doc_rows = emit_doc_rows
        self.keep_cols = keep_cols
        # the BM25-normed field: "text" if present, else the first text field
        self.main_field = ("text" if "text" in self.text_fields
                          else next(iter(self.text_fields), None))

    def _part(self, terms: pa.Array, doc_ids: np.ndarray) -> pa.Array:
        bucket = (fnv1a64_array(terms) % np.uint64(self.n_buckets)).astype(np.int64)
        shard = doc_ids % self.n_doc_shards
        return pa.array((shard * self.n_buckets + bucket).astype(np.int32),
                        type=pa.int32())

    def _part_coded(self, vocab: pa.Array, gcodes: np.ndarray,
                    doc_ids: np.ndarray) -> pa.Array:
        """``_part`` over dictionary codes: hash the vocab once, gather."""
        vbucket = (fnv1a64_array(vocab)
                   % np.uint64(self.n_buckets)).astype(np.int64)
        shard = doc_ids % self.n_doc_shards
        return pa.array((shard * self.n_buckets
                         + vbucket[gcodes]).astype(np.int32), type=pa.int32())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _chunked_call(self._call_one, batch)

    def _call_one(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        outs = []
        main_doc_len = np.zeros(n, dtype=np.int64)
        for field_name, col in self.text_fields.items():
            row_idx, terms = split_and_normalize(
                batch[col], stopwords=self.stopwords, stem=self.stem)
            if field_name == self.main_field:
                main_doc_len = np.bincount(row_idx, minlength=n)
            if len(terms) == 0:
                continue
            doc_len = np.bincount(row_idx, minlength=n)
            rows, gcodes, vocab, tf = _group_term_doc(row_idx, terms)
            outs.append(pa.table({
                "field": pa.array([field_name] * len(rows), type=pa.string()),
                "term": vocab.take(pa.array(gcodes)),
                "doc_id": pa.array(doc_ids[rows], type=pa.int64()),
                "tf": pa.array(tf, type=pa.int32()),
                "doc_len": pa.array(doc_len[rows], type=pa.int32()),
                "part": self._part_coded(vocab, gcodes, doc_ids[rows]),
            }))
        for field_name, col in self.metadata_fields.items():
            arr = batch[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                counts = pc.list_value_length(pc.fill_null(arr, [])) \
                    .to_numpy(zero_copy_only=False)
                row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
                flat = pc.list_flatten(arr)
            else:
                row_idx = np.arange(n, dtype=np.int64)
                flat = arr
            terms = clean_metadata_array(flat)
            if len(terms) == 0:
                continue
            # set semantics: distinct (term, doc) — tf from the grouped
            # counts is deliberately discarded (duplicates collapse to 1)
            rows, gcodes, vocab, _tf = _group_term_doc(row_idx, terms)
            if len(rows) == 0:
                continue
            outs.append(pa.table({
                "field": pa.array([field_name] * len(rows), type=pa.string()),
                "term": vocab.take(pa.array(gcodes)),
                "doc_id": pa.array(doc_ids[rows], type=pa.int64()),
                "tf": pa.array(np.ones(len(rows), dtype=np.int32), type=pa.int32()),
                "doc_len": pa.array(np.zeros(len(rows), dtype=np.int32),
                                    type=pa.int32()),
                "part": self._part_coded(vocab, gcodes, doc_ids[rows]),
            }))
        empty = pa.table({"field": pa.array([], type=pa.string()),
                          "term": pa.array([], type=pa.string()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "tf": pa.array([], type=pa.int32()),
                          "doc_len": pa.array([], type=pa.int32()),
                          "part": pa.array([], type=pa.int32())})
        if self.emit_doc_rows:
            doc_rows = {
                "field": pa.nulls(n, type=pa.string()),
                "term": pa.nulls(n, type=pa.string()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "tf": pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
                "doc_len": pa.array(main_doc_len.astype(np.int32),
                                    type=pa.int32()),
                "part": pa.array(np.full(n, -1, dtype=np.int32), type=pa.int32()),
            }
            for c in self.keep_cols:
                doc_rows[c] = batch[c].combine_chunks() \
                    if isinstance(batch[c], pa.ChunkedArray) else batch[c]
            outs.append(pa.table(doc_rows))
        if not outs:
            return empty
        return pa.concat_tables(outs, promote_options="default")


class DocStats:
    """``map_batches`` callable: documents batch → ``(doc_id, doc_len)`` plus
    pass-through metadata columns — the docstore / BM25-norms side table
    (reference ``id_map``, ``/root/reference/SourceEngine.h:22``)."""

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id",
                 keep_cols: tuple[str, ...] = (),
                 stopwords: frozenset[str] | None = None, stem: bool = False):
        self.text_col = text_col
        self.id_col = id_col
        self.keep_cols = keep_cols
        self.stopwords = stopwords
        self.stem = stem

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, _terms = split_and_normalize(
            batch[self.text_col], stopwords=self.stopwords, stem=self.stem)
        doc_len = np.bincount(row_idx, minlength=batch.num_rows).astype(np.int32)
        cols = {"doc_id": batch[self.id_col].cast(pa.int64()),
                "doc_len": pa.array(doc_len, type=pa.int32())}
        for c in self.keep_cols:
            cols[c] = batch[c]
        return pa.table(cols)
