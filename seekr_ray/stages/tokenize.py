"""Tokenizer stage: documents -> exploded postings (elastic tasks).

The Ray-Data equivalent of ``Indexer.index()``'s thread-pool fan-out
(``Indexer/Indexer.java:36-128``).  The stage state (stopword set +
memoized Porter stemmer + token cache) is held in a per-worker-process
module singleton, so it is built once per worker like an actor's
``__init__`` — but the stage runs as stateless TASKS, which the streaming
executor can interleave freely with the read and write stages (a fixed
actor pool here starved: reserved CPUs left too few slots to feed the
pool, capping throughput at 1/3 of the machine).

Output schema (one row per (doc, stem) — the ``InvertedIndex`` row analog,
``Indexer/SQLiteSearcher.java:63-73``):

    doc_id: int64, term: string, tf: float64, positions: binary

``positions`` is ALREADY delta+varbyte-encoded here (one blob per
posting, built vectorized per batch), so position bytes flow unchanged
from the tokenizer through the shuffle into the segment file — the wide
exchange moves ~2 bytes/position instead of an int32 list, and the chunk
writer just memcpy-slices blobs (stages/postings.py).

``tf`` is the normalized weighted frequency (SURVEY.md §1.3), so the
posting shuffle never needs doc-level data.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pyarrow as pa

from ..codec import delta_encode_lists, varbyte_encode_concat
from ..text.tokenizer import Tokenizer

POSTINGS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.float64()),
        ("positions", pa.binary()),
        # per-posting importance = weight of the term's best section
        # (``Indexer/SQLiteSearcher.java:69,273`` stores
        # ``getPositionWeight(token.getPosition())`` per InvertedIndex
        # row).  Single-section corpus -> constant 1.0; parquet
        # dictionary-encodes the constant to ~nothing, and the segment
        # chunk encoder stores null for all-1.0 chunks.
        ("importance", pa.float64()),
    ]
)

_TOKENIZER: Tokenizer | None = None


def _shared_tokenizer() -> Tokenizer:
    global _TOKENIZER
    if _TOKENIZER is None:
        _TOKENIZER = Tokenizer()
    return _TOKENIZER


def _positions_binary(pos_lists: list[list[int]]) -> pa.Array:
    """Vectorized: flat concat -> delta with per-list resets -> one
    varbyte buffer -> Arrow binary column built straight from buffers."""
    n = len(pos_lists)
    lens = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.fromiter(chain.from_iterable(pos_lists), dtype=np.uint64, count=total)
    deltas = delta_encode_lists(flat, offsets)
    buf, byte_lens = varbyte_encode_concat(deltas, offsets)
    boffs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(byte_lens, out=boffs[1:])
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(buf)]
    )


def _term_part_column(terms: list[str], num_partitions: int) -> pa.Array:
    """hash(term) % P per posting row, memoized per worker process (the
    same cache the stats path uses)."""
    from .postings import _part_cache, term_partition

    cache = _part_cache(num_partitions)
    out = np.empty(len(terms), dtype=np.int64)
    for i, t in enumerate(terms):
        p = cache.get(t)
        if p is None:
            p = term_partition(t, num_partitions)
            cache[t] = p
        out[i] = p
    return pa.array(out, pa.int64())


def tokenize_batch_scalar(
    batch: pa.Table,
    content_col: str = "content",
    store_positions: bool = True,
    num_partitions: int | None = None,
) -> pa.Table:
    """Per-doc python-loop kernel (round-1 form) — kept as the golden
    reference for ``tokenize_batch``; both paths are asserted
    value-identical in tests."""
    tokenizer = _shared_tokenizer()
    doc_ids = batch["doc_id"].to_pylist()
    contents = batch[content_col].to_pylist()
    out_doc: list[int] = []
    out_term: list[str] = []
    out_tf: list[float] = []
    out_pos: list[list[int]] = []
    tokenize = tokenizer.tokenize_document
    for doc_id, content in zip(doc_ids, contents):
        if not content:
            continue
        info, _total = tokenize(content)
        for term, (tf, positions) in info.items():
            out_doc.append(doc_id)
            out_term.append(term)
            out_tf.append(tf)
            out_pos.append(positions if store_positions else [])
    tbl = pa.Table.from_arrays(
        [
            pa.array(out_doc, pa.int64()),
            pa.array(out_term, pa.string()),
            pa.array(out_tf, pa.float64()),
            _positions_binary(out_pos),
            # single-section mode: best section == content, weight 1.0
            pa.array(np.ones(len(out_doc)), pa.float64()),
        ],
        schema=POSTINGS_SCHEMA,
    )
    if num_partitions is not None:
        # write-side shuffle key: the hive-partitioned postings write
        # replaces the object-store all-to-all (stages/segments.py)
        tbl = tbl.append_column(
            "term_part", _term_part_column(out_term, num_partitions)
        )
    return tbl


def tokenize_batch(
    batch: pa.Table,
    content_col: str = "content",
    store_positions: bool = True,
    num_partitions: int | None = None,
    emit_doclen: bool = False,
) -> pa.Table:
    """Vectorized tokenize kernel: Arrow regex split + dictionary-encode,
    per-DISTINCT-token stemming through the worker cache, numpy grouping.

    Identical output values to ``tokenize_batch_scalar`` (asserted by
    golden test; only row order differs, and every downstream consumer
    fully sorts — stages/postings.py:30).  Token identity rides on
    ``split('[^\\w']+') + strip("'") == findall(r"\\b[\\w']+\\b")``: a
    maximal [\\w']+ run yields exactly one \\b-delimited match, the run
    minus its leading/trailing apostrophes (interior apostrophes and
    underscores kept, all-apostrophe runs vanish) — RE2's \\w is ASCII
    like the scalar kernel's re.ASCII."""
    import pyarrow.compute as pc

    tokenizer = _shared_tokenizer()
    n_docs = batch.num_rows
    content = pc.coalesce(
        batch[content_col].combine_chunks(), pa.scalar("", pa.string())
    )
    # RE2 split (not a byte-level LUT splitter): a hand-rolled numpy
    # splitter measured 1.4x faster SINGLE-threaded but is memory-
    # bandwidth-bound — at 8 concurrent workers it scaled 0.63 (vs 0.87
    # for RE2, which burns more compute per byte) and was SLOWER in
    # absolute terms, so the regex kernel wins at every realistic
    # per-node concurrency.
    toks = pc.split_pattern_regex(pc.utf8_lower(content), pattern=r"[^\w']+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.utf8_trim(toks.flatten(), "'")
    doc_lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=doc_starts[1:])
    dict_arr = flat.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary.to_pylist()

    # resolve each DISTINCT token once (worker-cached across batches)
    resolve = tokenizer.resolve
    stem_ids: dict[str, int] = {}
    stems_list: list[str] = []
    stem_of = np.empty(len(vocab), dtype=np.int64)
    valid_of = np.zeros(len(vocab), dtype=bool)
    for vi, w in enumerate(vocab):
        s, valid = resolve(w)
        if s is None:
            stem_of[vi] = -1
        else:
            sid = stem_ids.get(s)
            if sid is None:
                sid = len(stems_list)
                stem_ids[s] = sid
                stems_list.append(s)
            stem_of[vi] = sid
            valid_of[vi] = valid

    s_codes = stem_of[codes]
    keep = s_codes >= 0
    # position = index within the doc's SURVIVING token stream
    kc = np.cumsum(keep, dtype=np.int64)
    kc0 = np.concatenate([np.zeros(1, dtype=np.int64), kc])
    pos = (kc - keep) - kc0[doc_starts][doc_idx]
    # denominator: kept tokens whose STEM re-passes validity, per doc
    tvalid = keep & valid_of[codes]
    totals = np.bincount(doc_idx[tvalid], minlength=n_docs).astype(np.float64)

    d = doc_idx[keep]
    sc = s_codes[keep]
    p = pos[keep].astype(np.uint64)
    # one stable argsort of a composite (doc, stem) key — positions stay
    # ascending within each group because stable preserves stream order
    order = np.argsort(d * np.int64(len(stems_list) + 1) + sc, kind="stable")
    d, sc, p = d[order], sc[order], p[order]
    # run boundaries per (doc, stem)
    if d.size:
        new_grp = np.empty(d.size, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (d[1:] != d[:-1]) | (sc[1:] != sc[:-1])
        grp_starts = np.flatnonzero(new_grp)
        grp_counts = np.diff(np.concatenate([grp_starts, [d.size]]))
        g_doc = d[grp_starts]
        g_stem = sc[grp_starts]
        g_tot = totals[g_doc]
        tf = np.where(
            g_tot > 0, grp_counts / np.where(g_tot > 0, g_tot, 1.0),
            grp_counts.astype(np.float64),
        )
        offsets = np.zeros(len(grp_starts) + 1, dtype=np.int64)
        np.cumsum(grp_counts, out=offsets[1:])
        if store_positions:
            deltas = delta_encode_lists(p, offsets)
            buf, byte_lens = varbyte_encode_concat(deltas, offsets)
        else:
            buf = b""
            byte_lens = np.zeros(len(grp_starts), dtype=np.int64)
        boffs = np.zeros(len(grp_starts) + 1, dtype=np.int32)
        np.cumsum(byte_lens, out=boffs[1:])
        pos_col = pa.BinaryArray.from_buffers(
            pa.binary(),
            len(grp_starts),
            [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(buf)],
        )
        stems_pa = pa.array(stems_list, pa.string())
        term_col = pc.take(stems_pa, pa.array(g_stem, pa.int64()))
        doc_col = batch["doc_id"].combine_chunks().take(
            pa.array(g_doc, pa.int64())
        )
        tbl = pa.Table.from_arrays(
            [
                doc_col,
                term_col,
                pa.array(tf, pa.float64()),
                pos_col,
                pa.array(np.ones(len(grp_starts)), pa.float64()),
            ],
            schema=POSTINGS_SCHEMA,
        )
    else:
        tbl = POSTINGS_SCHEMA.empty_table()
        g_stem = np.empty(0, dtype=np.int64)
        stems_list = []
    if num_partitions is not None:
        from .postings import _part_cache, term_partition

        cache = _part_cache(num_partitions)
        stem_parts = np.empty(len(stems_list), dtype=np.int64)
        for i, t in enumerate(stems_list):
            pt = cache.get(t)
            if pt is None:
                pt = term_partition(t, num_partitions)
                cache[t] = pt
            stem_parts[i] = pt
        tbl = tbl.append_column(
            "term_part", pa.array(stem_parts[g_stem], pa.int64())
        )
    if emit_doclen:
        # one sidecar row per doc carrying its tf denominator (`totals`,
        # the BM25 document length), tagged term_part=-1 so the
        # partitioned writer routes it to doclen/ instead of a segment
        # partition.  term=""/empty positions are inert sentinels — ""
        # can never be a real term (validity needs length >= 2).
        if num_partitions is None:
            raise ValueError("emit_doclen requires the partitioned write")
        dl_tbl = pa.Table.from_arrays(
            [
                batch["doc_id"].combine_chunks(),
                pa.array([""] * n_docs, pa.string()),
                pa.array(totals, pa.float64()),
                pa.array([b""] * n_docs, pa.binary()),
                pa.array(np.ones(n_docs), pa.float64()),
            ],
            schema=POSTINGS_SCHEMA,
        ).append_column(
            "term_part", pa.array(np.full(n_docs, -1, dtype=np.int64), pa.int64())
        )
        tbl = pa.concat_tables([dl_tbl, tbl])
    return tbl


def postings_from_sections(
    doc_id: int, sections: list[tuple[str, str]]
) -> pa.Table:
    """POSTINGS_SCHEMA rows for one multi-section document: tf/positions
    from the weighted section walk and ``importance`` = the best
    section's weight — the multi-section analog of ``tokenize_batch``
    (HTML-shaped inputs; the code corpus runs single-section)."""
    from ..text.tokenizer import SECTION_WEIGHTS

    tokenizer = _shared_tokenizer()
    info, _total = tokenizer.tokenize_sections(sections)
    terms = sorted(info)
    pos_lists = [info[t][1] for t in terms]
    return pa.Table.from_arrays(
        [
            pa.array([doc_id] * len(terms), pa.int64()),
            pa.array(terms, pa.string()),
            pa.array([info[t][0] for t in terms], pa.float64()),
            _positions_binary(pos_lists),
            pa.array(
                [SECTION_WEIGHTS.get(info[t][2], 1.0) for t in terms],
                pa.float64(),
            ),
        ],
        schema=POSTINGS_SCHEMA,
    )


class TokenizeStem:
    """Actor-pool form of the same stage (kept for callers that want an
    explicit pool, e.g. when the tokenizer grows heavy model state)."""

    def __init__(
        self,
        content_col: str = "content",
        store_positions: bool = True,
        num_partitions: int | None = None,
        emit_doclen: bool = False,
    ):
        self.tokenizer = Tokenizer()
        self.content_col = content_col
        self.store_positions = store_positions
        self.num_partitions = num_partitions
        self.emit_doclen = emit_doclen

    def __call__(self, batch: pa.Table) -> pa.Table:
        global _TOKENIZER
        _TOKENIZER = self.tokenizer  # reuse the batch path
        return tokenize_batch(
            batch,
            self.content_col,
            self.store_positions,
            self.num_partitions,
            self.emit_doclen,
        )


def write_postings_partitioned(
    docs_ds, cfg, content_col: str, postings_dir: str,
    doclen_dir: str | None = None,
) -> None:
    """Tokenize then write-side shuffle: postings land hive-partitioned
    by ``hash(term) % P`` with NO object-store all-to-all.

    Two map stages on purpose:

    * tokenize runs at small batches (cfg.tokenize_batch_size, default
      128 docs) — the per-doc Python/numpy working set stays
      CPU-cache-resident (measured 1.3 ms/doc at 128 vs 9 ms/doc at
      8192: list/str churn at millions of live objects thrashes the
      allocator);
    * the writer runs at ``batch_size=None`` over the re-aggregated
      output blocks Ray builds between operators (~target block size),
      so each write call sorts one LARGE block by term_part and emits
      one parquet slice per non-empty partition (zero-copy slices,
      tmp+rename).  File count stays ~blocks x live partitions without
      paying Ray's generic ``partition_cols=`` sink, which re-filters
      every block once per partition value.
    """
    import posixpath
    import uuid

    import pyarrow.compute as pc

    from ..fsio import ensure_dir, resolve_fs, write_table_atomic

    P = cfg.num_term_partitions
    # postings_dir / doclen_dir may be object-store URIs on a real
    # cluster (no shared POSIX filesystem across nodes) — all IO below
    # goes through pyarrow.fs; see fsio.py for the atomicity contract
    post_fs, post_root = resolve_fs(postings_dir)
    ensure_dir(post_fs, post_root)
    for p in range(P):
        ensure_dir(post_fs, posixpath.join(post_root, f"term_part={p}"))
    if doclen_dir is not None:
        dl_fs, dl_root = resolve_fs(doclen_dir)
        ensure_dir(dl_fs, dl_root)

    def write_block(tbl: pa.Table) -> pa.Table:
        parts = tbl["term_part"].to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        tbl = tbl.take(order).drop_columns(["term_part"])
        sorted_parts = parts[order]
        bounds = np.searchsorted(sorted_parts, np.arange(P + 1))
        task_id = uuid.uuid4().hex[:16]
        # doclen sentinel rows (term_part=-1) sort to the front: write
        # them as a (doc_id, dl) sidecar, never into a segment partition
        n_dl = int(bounds[0])
        if n_dl and doclen_dir is not None:
            dl_slice = tbl.slice(0, n_dl)
            write_table_atomic(
                pa.table(
                    {
                        "doc_id": dl_slice["doc_id"],
                        "dl": pc.cast(dl_slice["tf"], pa.int64()),
                    }
                ),
                dl_fs,
                posixpath.join(dl_root, f"{task_id}.parquet"),
                compression="zstd",
                compression_level=1,
            )
        out_parts, out_rows = [], []
        for p in range(P):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if lo == hi:
                continue
            # zstd-1: ~2x smaller intermediate than snappy for pennies of
            # CPU — this write (and its re-read by the segment builder)
            # is the shared-disk cost that caps 2->8 cpu scaling
            write_table_atomic(
                tbl.slice(lo, hi - lo),
                post_fs,
                posixpath.join(
                    post_root, f"term_part={p}", f"{task_id}.parquet"
                ),
                compression="zstd",
                compression_level=1,
            )
            out_parts.append(p)
            out_rows.append(hi - lo)
        return pa.table(
            {
                "term_part": pa.array(out_parts, pa.int64()),
                "rows": pa.array(out_rows, pa.int64()),
            }
        )

    postings = tokenize_documents(
        docs_ds, cfg, content_col, num_partitions=P,
        emit_doclen=doclen_dir is not None,
    )
    written = postings.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    )
    # consume the tiny per-task manifests on the driver to drive
    # execution; an Aggregate op here would RESERVE a CPU slot and starve
    # the map stage at low cluster sizes
    for _ in written.iter_batches(batch_format="pyarrow"):
        pass


def tokenize_documents(
    docs_ds,
    cfg,
    content_col: str = "content",
    num_partitions: int | None = None,
    emit_doclen: bool = False,
):
    """documents Dataset -> postings Dataset (+ term_part column when
    ``num_partitions`` is given, for the partitioned write; + one
    term_part=-1 doclen sentinel row per doc when ``emit_doclen``)."""
    if cfg.tokenize_concurrency is not None:
        return docs_ds.map_batches(
            TokenizeStem,
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            fn_constructor_kwargs={
                "content_col": content_col,
                "store_positions": cfg.store_positions,
                "num_partitions": num_partitions,
                "emit_doclen": emit_doclen,
            },
            concurrency=cfg.tokenize_concurrency,
        )
    return docs_ds.map_batches(
        tokenize_batch,
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        fn_kwargs={
            "content_col": content_col,
            "store_positions": cfg.store_positions,
            "num_partitions": num_partitions,
            "emit_doclen": emit_doclen,
        },
    )
