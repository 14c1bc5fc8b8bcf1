"""Segment store: partition-pruned, row-group-pruned posting lookup
(SURVEY.md §2.6 J2).

The query-side replacement for the SQLite B-tree probe
(``QP/QueryIndex.java:121-166``), two levels of pruning:

* partition level — each stem routes to its ``hash(term) % P`` partition
  file; only those files are opened;
* row-group level — segment files are (term, salt, chunk_seq)-sorted, so
  a term's chunk rows are one contiguous range.  ``_PartitionIndex``
  reads ONLY the term column once per partition (dictionary-encoded,
  cheap), locates the range by binary search, and decodes just the row
  groups covering it (``ParquetFile.read_row_groups``) — a single-term
  lookup never decodes unrelated terms' posting payloads.

Term stats are held as sorted parallel arrays per partition (binary
search lookups), not per-term Python dicts; decoded postings are cached
in a bounded LRU per store instance — the "loaded once per actor" state
of SURVEY.md §2.3 T8.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec import decode_doc_ids, decode_position_blobs, unpack_f64, varbyte_decode
from ..stages.postings import term_partition
from ..stages.extend import partition_files
from ..stages.segments import partition_file

_CHUNK_COLUMNS = [
    "n_docs",
    "doc_ids_enc",
    "tfs_enc",
    "pos_blob_lens_enc",
    "pos_blobs",
    # nullable; absent entirely in round-1 segment files
    "importance_enc",
]


@dataclass
class TermPostings:
    """Decoded, merged posting list of one term.

    ``doc_ids`` is globally sorted (salted chunks are merged at decode
    time); ``block_starts``/``block_max_tf`` are re-derived block-max
    metadata over the merged order for WAND.

    Positions decode LAZILY: top-k scoring (TAAT/WAND/boolean) never
    touches them, and a hot term's position payload is an order of
    magnitude more varbyte bytes than its ids+tfs — only the phrase path
    pays for it, once, cached on the instance.
    """

    term: str
    df: int
    idf: float
    doc_ids: np.ndarray  # int64, sorted
    tfs: np.ndarray  # float64, aligned
    pos_chunks: list[tuple[bytes, bytes]]  # (lens_enc, blobs) per chunk row
    chunk_counts: np.ndarray  # postings per chunk row (decode order)
    order: np.ndarray | None  # merge order: sorted idx -> decode idx
    block_starts: np.ndarray  # int64 offsets of block boundaries
    block_max_tf: np.ndarray  # float64 per block
    imp_chunks: list | None = None  # importance_enc per chunk row (None = all 1.0)
    _positions: list | None = None
    _importances: np.ndarray | None = None

    @property
    def importances(self) -> np.ndarray:
        """Per-posting importance aligned with ``doc_ids`` (best-section
        weight; 1.0 everywhere for single-section corpora and round-1
        segments).  Decodes lazily — scoring never reads it (§2.9:
        wordInfo carries [frequency, IDF] only)."""
        if self._importances is None:
            n = int(self.chunk_counts.sum())
            if self.imp_chunks is None or all(
                e is None for e in self.imp_chunks
            ):
                self._importances = np.ones(n, dtype=np.float64)
            else:
                parts = [
                    unpack_f64(e)
                    if e is not None
                    else np.ones(int(c), dtype=np.float64)
                    for e, c in zip(self.imp_chunks, self.chunk_counts)
                ]
                imp = np.concatenate(parts)
                self._importances = (
                    imp[self.order] if self.order is not None else imp
                )
        return self._importances

    @property
    def positions(self) -> list[np.ndarray]:
        if self._positions is None:
            parts: list[np.ndarray] = []
            for lens_enc, blobs in self.pos_chunks:
                parts.extend(
                    decode_position_blobs(varbyte_decode(lens_enc), blobs)
                )
            if self.order is not None:
                parts = [parts[i] for i in self.order]
            self._positions = parts
        return self._positions

    def positions_for(self, sorted_indices) -> list[np.ndarray]:
        """Positions of SELECTED postings only (indices into the sorted
        doc_id order) — the phrase path's candidate set is usually tiny,
        so slicing each candidate's varbyte blob out of its chunk beats
        decoding the term's full position payload."""
        if self._positions is not None:
            return [self._positions[int(i)] for i in sorted_indices]
        dec_idx = (
            self.order[sorted_indices]
            if self.order is not None
            else np.asarray(sorted_indices, dtype=np.int64)
        )
        dec_idx = np.asarray(dec_idx, dtype=np.int64)
        chunk_starts = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(self.chunk_counts)]
        )
        chunk_of = np.searchsorted(chunk_starts, dec_idx, side="right") - 1
        # chunks where the candidate set is dense decode whole-chunk
        # vectorized; sparse chunks slice per-posting blobs
        per_chunk_hits: dict[int, int] = {}
        for c in chunk_of.tolist():
            per_chunk_hits[c] = per_chunk_hits.get(c, 0) + 1
        full_cache: dict[int, list[np.ndarray]] = {}
        boffs_cache: dict[int, np.ndarray] = {}
        out: list[np.ndarray] = []
        for di, c in zip(dec_idx.tolist(), chunk_of.tolist()):
            local = int(di - chunk_starts[c])
            lens_enc, blob = self.pos_chunks[c]
            if per_chunk_hits[c] * 4 >= int(self.chunk_counts[c]):
                lists = full_cache.get(c)
                if lists is None:
                    lists = decode_position_blobs(
                        varbyte_decode(lens_enc), blob
                    )
                    full_cache[c] = lists
                out.append(lists[local])
                continue
            boffs = boffs_cache.get(c)
            if boffs is None:
                byte_lens = varbyte_decode(lens_enc).astype(np.int64)
                boffs = np.concatenate(
                    [np.zeros(1, dtype=np.int64), np.cumsum(byte_lens)]
                )
                boffs_cache[c] = boffs
            s, e = int(boffs[local]), int(boffs[local + 1])
            deltas = varbyte_decode(memoryview(blob)[s:e])
            out.append(np.cumsum(deltas, dtype=np.uint64))
        return out

    def positions_flat_for(
        self, sorted_indices
    ) -> tuple[np.ndarray, np.ndarray]:
        """Positions of SELECTED postings as ``(flat_values, offsets)``
        (offsets has n_sel+1 entries) — the vectorized-walk form of
        ``positions_for``: each touched chunk decodes ONCE fully
        vectorized and the per-posting segments gather by index ranges,
        with no per-posting Python materialization."""
        dec_idx = (
            self.order[sorted_indices]
            if self.order is not None
            else np.asarray(sorted_indices, dtype=np.int64)
        )
        dec_idx = np.asarray(dec_idx, dtype=np.int64)
        n_sel = len(dec_idx)
        sel_lens = np.zeros(n_sel, dtype=np.int64)
        if n_sel == 0:
            return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
        chunk_starts = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(self.chunk_counts)]
        )
        chunk_of = np.searchsorted(chunk_starts, dec_idx, side="right") - 1
        locals_ = dec_idx - chunk_starts[chunk_of]
        grp = np.argsort(chunk_of, kind="stable")
        gch = chunk_of[grp]
        bounds = np.flatnonzero(
            np.concatenate([[True], gch[1:] != gch[:-1]])
        )
        bounds = np.concatenate([bounds, [n_sel]])
        per_group: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for bi in range(len(bounds) - 1):
            sel = grp[bounds[bi] : bounds[bi + 1]]
            c = int(gch[bounds[bi]])
            lens_enc, blob = self.pos_chunks[c]
            b = np.frombuffer(blob, dtype=np.uint8)
            if b.size == 0:
                continue
            byte_lens = varbyte_decode(lens_enc).astype(np.int64)
            boffs = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(byte_lens)]
            )
            is_last = (b & 0x80) == 0
            cum_last = np.zeros(b.size + 1, dtype=np.int64)
            np.cumsum(is_last, out=cum_last[1:])
            counts = cum_last[boffs[1:]] - cum_last[boffs[:-1]]
            vals = np.cumsum(varbyte_decode(b), dtype=np.uint64)
            ends = np.cumsum(counts)
            starts = ends - counts
            ls = starts[locals_[sel]]
            ln = counts[locals_[sel]]
            sel_lens[sel] = ln
            total = int(ln.sum())
            if total == 0:
                continue
            po = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(ln)])
            gi = np.repeat(ls - po[:-1], ln) + np.arange(total, dtype=np.int64)
            seg = vals[gi]
            base = np.where(
                ls > 0, vals[np.maximum(ls - 1, 0)], np.uint64(0)
            ).astype(np.uint64)
            seg = seg - np.repeat(base, ln)
            per_group.append((sel, ln, seg))
        offsets = np.zeros(n_sel + 1, dtype=np.int64)
        np.cumsum(sel_lens, out=offsets[1:])
        flat = np.zeros(int(offsets[-1]), dtype=np.uint64)
        for sel, ln, seg in per_group:
            po = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(ln)])
            tgt = np.repeat(offsets[sel] - po[:-1], ln) + np.arange(
                len(seg), dtype=np.int64
            )
            flat[tgt] = seg
        return flat, offsets

    @property
    def max_tf(self) -> float:
        return float(self.block_max_tf.max()) if self.block_max_tf.size else 0.0


# chunk-level metadata persisted by the segment writer (postings.py
# CHUNK_SCHEMA): enough to run block-max WAND over a term's chunks
# without touching a single posting payload
_META_COLUMNS = ["n_docs", "max_tf", "min_doc_id", "max_doc_id"]
# the cold top-k decode set: ids+tfs only — position/importance payloads
# (the bulk of a chunk's bytes) stay on disk
_TOPK_PAYLOAD_COLUMNS = ["n_docs", "doc_ids_enc", "tfs_enc"]


class _PartitionIndex:
    """Row-group-pruned access to one (term, salt, chunk_seq)-sorted
    segment partition file."""

    def __init__(self, path: str):
        self.pf = pq.ParquetFile(path)
        md = self.pf.metadata
        rows = np.array(
            [md.row_group(i).num_rows for i in range(md.num_row_groups)],
            dtype=np.int64,
        )
        self.rg_starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(rows)])
        file_cols = set(self.pf.schema_arrow.names)
        self.columns = [c for c in _CHUNK_COLUMNS if c in file_cols]
        self.has_chunk_meta = set(_META_COLUMNS) <= file_cols
        tcol = self.pf.read(columns=["term"])["term"]
        self.terms = np.asarray(tcol.to_pylist(), dtype=object)
        # one-slot row-group cache for the chunk-lazy decode path:
        # consecutive decodes of one term's chunks usually share a group
        self._rg_cache: tuple[int, pa.Table] | None = None

    def term_range(self, term: str) -> tuple[int, int]:
        lo = int(np.searchsorted(self.terms, term, side="left"))
        hi = int(np.searchsorted(self.terms, term, side="right"))
        return lo, hi

    def read_rows(self, lo: int, hi: int, columns: list[str] | None = None):
        """Chunk rows [lo, hi) — decodes only the covering row groups."""
        g0 = int(np.searchsorted(self.rg_starts, lo, side="right")) - 1
        g1 = int(np.searchsorted(self.rg_starts, hi - 1, side="right")) - 1
        t = self.pf.read_row_groups(
            list(range(g0, g1 + 1)), columns=columns or self.columns
        )
        return t.slice(lo - int(self.rg_starts[g0]), hi - lo)

    def read_meta_rows(self, lo: int, hi: int):
        """Chunk METADATA rows [lo, hi) — None on legacy files that
        predate the persisted (max_tf, min/max_doc_id) columns."""
        if not self.has_chunk_meta:
            return None
        return self.read_rows(lo, hi, columns=_META_COLUMNS)

    def read_topk_payload_row(self, row: int):
        """One chunk row's (n_docs, doc_ids_enc, tfs_enc) through a
        one-slot row-group cache.  IO granularity is the parquet row
        group (~128 chunk rows); decode granularity is the single chunk —
        the cold BMW path skips decode per chunk and IO per row group."""
        g = int(np.searchsorted(self.rg_starts, row, side="right")) - 1
        cached = self._rg_cache  # capture: postings_many runs threaded
        if cached is None or cached[0] != g:
            cached = (
                g,
                self.pf.read_row_groups([g], columns=_TOPK_PAYLOAD_COLUMNS),
            )
            self._rg_cache = cached
        return cached[1].slice(row - int(self.rg_starts[g]), 1)


class _StatsPartition:
    """One term_stats partition as sorted parallel arrays."""

    __slots__ = ("terms", "df", "idf", "n_salts")

    def __init__(self, path: str | None):
        if path is None:
            self.terms = np.empty(0, dtype=object)
            self.df = self.idf = self.n_salts = np.empty(0)
            return
        t = pq.read_table(path, columns=["term", "df", "idf", "n_salts"])
        terms = np.asarray(t["term"].to_pylist(), dtype=object)
        # the salted-groupby path writes stats in groupby order; sort once
        order = np.argsort(terms)
        self.terms = terms[order]
        self.df = t["df"].to_numpy(zero_copy_only=False)[order]
        self.idf = t["idf"].to_numpy(zero_copy_only=False)[order]
        self.n_salts = t["n_salts"].to_numpy(zero_copy_only=False)[order]

    def get(self, term: str) -> tuple[int, float, int] | None:
        i = int(np.searchsorted(self.terms, term, side="left"))
        if i < len(self.terms) and self.terms[i] == term:
            return int(self.df[i]), float(self.idf[i]), int(self.n_salts[i])
        return None


@dataclass
class ChunkRef:
    """One undecoded chunk row of a term: persisted metadata plus the
    handle needed to decode it on demand."""

    __slots__ = ("pidx", "row", "n_docs", "max_tf", "min_doc", "max_doc")

    pidx: _PartitionIndex
    row: int  # absolute row index in the partition file
    n_docs: int
    max_tf: float
    min_doc: int
    max_doc: int


class LazyTermPostings:
    """Chunk-lazy view of one term's postings for the cold block-max WAND
    path (engine mode="bmw_cold").

    Where ``TermPostings`` decodes the term's ENTIRE posting list into
    the serving actor before scoring (hot terms at 10^12-doc scale make
    that a per-actor memory/IO ceiling), this object holds only the
    persisted per-chunk metadata (min/max doc_id, max_tf — written by the
    segment builder, postings.py CHUNK_SCHEMA) and decodes a chunk's
    (doc_ids, tfs) the first time the pivot loop actually needs a posting
    inside it.  Chunks the threshold proves irrelevant are never read:
    memory and decode work scale with the chunks TOUCHED, not with df.

    Chunks may overlap in doc range (salted hot terms, delta segments) —
    each (term, doc) posting lives in exactly one chunk, so treating
    every chunk as its own posting list and summing across lists is
    score-identical to the merged list.
    """

    __slots__ = ("term", "df", "idf", "chunks", "_decoded", "decode_count")

    # decoded-chunk LRU bound per term: without it a long-running actor
    # answering many queries against one hot term would accrete the full
    # posting list — exactly the ceiling the chunk-lazy path removes.
    # 256 chunks x 4096 postings ~ 12 MB worst case per resident term.
    MAX_DECODED_CHUNKS = 256

    def __init__(self, term: str, df: int, idf: float, chunks: list[ChunkRef]):
        self.term = term
        self.df = df
        self.idf = idf
        # doc-range order makes the engine's unit lists start near-sorted
        self.chunks = sorted(chunks, key=lambda c: (c.min_doc, c.max_doc))
        self._decoded: OrderedDict[int, tuple[np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self.decode_count = 0

    def decode(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfs) of chunk ``i``, decoded once and LRU-cached."""
        got = self._decoded.get(i)
        if got is None:
            ref = self.chunks[i]
            rows = ref.pidx.read_topk_payload_row(ref.row)
            ids = decode_doc_ids(
                rows["doc_ids_enc"][0].as_py(), ref.n_docs
            ).astype(np.int64)
            tfs = unpack_f64(rows["tfs_enc"][0].as_py())
            got = (ids, tfs)
            self._decoded[i] = got
            self.decode_count += 1
            if len(self._decoded) > self.MAX_DECODED_CHUNKS:
                self._decoded.popitem(last=False)
        else:
            self._decoded.move_to_end(i)
        return got


class SegmentStore:
    def __init__(self, index_dir: str, num_term_partitions: int, block_size: int = 4096):
        self.index_dir = index_dir
        self.seg_dir = os.path.join(index_dir, "segments")
        self.stats_dir = os.path.join(index_dir, "term_stats")
        # finish any compaction interrupted mid-commit BEFORE reading
        # segment files — a half-committed partition would double-count
        # its delta postings (see extend.recover_compaction)
        if os.path.isdir(self.seg_dir):
            from ..stages.extend import recover_compaction

            recover_compaction(self.seg_dir)
        self.P = num_term_partitions
        self.block_size = block_size
        self._stats_cache: dict[int, _StatsPartition] = {}
        self._pindex_cache: dict[int, list[_PartitionIndex]] = {}
        self._postings_cache: OrderedDict[str, TermPostings | None] = OrderedDict()
        self._postings_cache_max = 4096
        self._lazy_cache: OrderedDict[str, LazyTermPostings | None] = OrderedDict()
        self._lazy_cache_max = 4096
        self._all_terms: np.ndarray | None = None
        self._part_terms_cache: dict[tuple, np.ndarray] = {}

    # -- term stats ---------------------------------------------------------

    def _stats_partition(self, part: int) -> _StatsPartition:
        cached = self._stats_cache.get(part)
        if cached is None:
            path = os.path.join(self.stats_dir, f"term_part={part}")
            cached = _StatsPartition(path if os.path.isdir(path) else None)
            self._stats_cache[part] = cached
        return cached

    def term_stat(self, term: str) -> tuple[int, float, int] | None:
        """(df, idf, n_salts); the stats row always lives at the unsalted
        partition hash(term) % P."""
        return self._stats_partition(term_partition(term, self.P)).get(term)

    def all_terms_array(self) -> np.ndarray:
        """Sorted distinct term vocabulary (suggestion path K3) as an
        object ndarray — prefix ranges bisect in O(log V)."""
        if self._all_terms is None:
            parts = [self._stats_partition(p).terms for p in range(self.P)]
            allv = np.concatenate(parts) if parts else np.empty(0, dtype=object)
            self._all_terms = np.sort(allv)
        return self._all_terms

    def partition_terms_array(self, parts: "list[int] | None") -> np.ndarray:
        """Sorted vocabulary restricted to the given term partitions —
        the scatter-serving unit (each actor of a pool holds ONE slice's
        suggestion/correction structures instead of all of them).
        ``None`` means the full vocabulary."""
        if parts is None:
            return self.all_terms_array()
        key = tuple(sorted(parts))
        cached = self._part_terms_cache.get(key)
        if cached is None:
            arrs = [self._stats_partition(p).terms for p in key]
            allv = (
                np.concatenate(arrs) if arrs else np.empty(0, dtype=object)
            )
            cached = np.sort(allv)
            self._part_terms_cache[key] = cached
        return cached

    def all_terms(self) -> list[str]:
        return self.all_terms_array().tolist()

    def prefix_terms(
        self, prefix: str, parts: "list[int] | None" = None
    ) -> list[str]:
        """Terms with the given prefix via bisect over the sorted vocab
        (O(log V + matches); replaces the round-1 full linear scan).
        ``parts`` restricts the scan to a term-partition slice (vocab
        partitions by term hash, so slices are disjoint and their
        prefix-match union is exactly the full-vocab match set)."""
        terms = self.partition_terms_array(parts)
        lo = int(np.searchsorted(terms, prefix, side="left"))
        hi = int(np.searchsorted(terms, prefix + "\U0010FFFF", side="left"))
        return terms[lo:hi].tolist()

    # -- postings -----------------------------------------------------------

    def _partition_indexes(self, part: int) -> list[_PartitionIndex]:
        """Base + delta files of one partition (stages/extend.py appends
        part-XXXXX.deltaGGG.parquet next to the base; chunk rows from
        every file merge at decode exactly like salted chunks)."""
        if part not in self._pindex_cache:
            self._pindex_cache[part] = [
                _PartitionIndex(p) for p in partition_files(self.seg_dir, part)
            ]
        return self._pindex_cache[part]

    def postings(self, term: str) -> TermPostings | None:
        if term in self._postings_cache:
            self._postings_cache.move_to_end(term)
            return self._postings_cache[term]
        return self._postings_load(term, self.term_stat(term))

    def postings_many(self, terms) -> None:
        """Warm the postings cache for several terms with the cold loads
        in parallel — each uncached term reads different partition files
        and ``pq.read_table`` releases the GIL, so a k-term cold query
        pays ~one load instead of k.  Results land in the same LRU the
        serial path uses; callers then fetch via ``postings``."""
        from concurrent.futures import ThreadPoolExecutor

        missing = [
            t for t in dict.fromkeys(terms) if t not in self._postings_cache
        ]
        if len(missing) > 1:
            with ThreadPoolExecutor(min(4, len(missing))) as ex:
                list(ex.map(self.postings, missing))

    def postings_meta(self, term: str) -> LazyTermPostings | None:
        """Chunk-lazy postings view for the cold BMW path: reads ONLY the
        persisted per-chunk metadata columns (min/max doc_id, max_tf) for
        the term's chunk-row range — no posting payload leaves disk until
        ``LazyTermPostings.decode`` is called for a specific chunk.

        Returns None when the term is absent OR when any touched segment
        file predates the chunk-metadata columns (legacy round-1 files);
        callers fall back to the eager ``postings`` load."""
        if term in self._lazy_cache:
            self._lazy_cache.move_to_end(term)
            return self._lazy_cache[term]
        stat = self.term_stat(term)
        result: LazyTermPostings | None = None
        legacy = False
        if stat is not None:
            df, idf, n_salts = stat
            chunks: list[ChunkRef] = []
            visited: set[int] = set()
            for salt in range(n_salts):
                part = term_partition(term, self.P, salt)
                if part in visited:
                    continue
                visited.add(part)
                for pidx in self._partition_indexes(part):
                    lo, hi = pidx.term_range(term)
                    if hi <= lo:
                        continue
                    meta = pidx.read_meta_rows(lo, hi)
                    if meta is None:
                        legacy = True
                        break
                    nd = meta["n_docs"].to_pylist()
                    mtf = meta["max_tf"].to_pylist()
                    mn = meta["min_doc_id"].to_pylist()
                    mx = meta["max_doc_id"].to_pylist()
                    for j in range(meta.num_rows):
                        chunks.append(
                            ChunkRef(
                                pidx,
                                lo + j,
                                int(nd[j]),
                                float(mtf[j]),
                                int(mn[j]),
                                int(mx[j]),
                            )
                        )
                if legacy:
                    break
            if not legacy and chunks:
                result = LazyTermPostings(term, df, idf, chunks)
        if legacy:
            return None  # don't cache: the store may mix file versions
        self._lazy_cache[term] = result
        if len(self._lazy_cache) > self._lazy_cache_max:
            self._lazy_cache.popitem(last=False)
        return result

    @staticmethod
    def _collect_chunk_rows(
        rows: pa.Table,
        ids_parts: list,
        tf_parts: list,
        pos_chunks: list,
        imp_chunks: list,
        chunk_counts: list,
    ) -> None:
        """Decode one file's chunk rows for a term into the accumulator
        lists (shared by every base/delta/salt file the term touches)."""
        n_docs_col = rows["n_docs"].to_pylist()
        ids_enc = rows["doc_ids_enc"].to_pylist()
        tfs_enc = rows["tfs_enc"].to_pylist()
        lens_enc = rows["pos_blob_lens_enc"].to_pylist()
        blobs = rows["pos_blobs"].to_pylist()
        imp_enc = (
            rows["importance_enc"].to_pylist()
            if "importance_enc" in rows.column_names
            else [None] * rows.num_rows
        )
        for i in range(rows.num_rows):
            ids_parts.append(
                decode_doc_ids(ids_enc[i], n_docs_col[i]).astype(np.int64)
            )
            tf_parts.append(unpack_f64(tfs_enc[i]))
            pos_chunks.append((lens_enc[i], blobs[i]))
            imp_chunks.append(imp_enc[i])
            chunk_counts.append(n_docs_col[i])

    def _postings_load(self, term, stat) -> TermPostings | None:
        result: TermPostings | None = None
        if stat is not None:
            df, idf, n_salts = stat
            # hot terms spread their chunks over one partition per salt
            # (stages/postings.py routing) — fan the read across them.
            # Each distinct partition file already holds ALL of the term's
            # chunks routed to it, so visit each partition once even when
            # several salts hash to it.
            ids_parts, tf_parts, pos_chunks = [], [], []
            imp_chunks: list = []
            chunk_counts: list[int] = []
            visited: set[int] = set()
            for salt in range(n_salts):
                part = term_partition(term, self.P, salt)
                if part in visited:
                    continue
                visited.add(part)
                for pidx in self._partition_indexes(part):
                    lo, hi = pidx.term_range(term)
                    if hi <= lo:
                        continue
                    rows = pidx.read_rows(lo, hi)
                    self._collect_chunk_rows(
                        rows,
                        ids_parts,
                        tf_parts,
                        pos_chunks,
                        imp_chunks,
                        chunk_counts,
                    )
            if ids_parts:
                ids = np.concatenate(ids_parts)
                tfs = np.concatenate(tf_parts)
                order = np.argsort(ids, kind="stable")
                already_sorted = bool((order == np.arange(len(order))).all())
                ids = ids[order]
                tfs = tfs[order]
                starts = np.arange(0, len(ids), self.block_size, dtype=np.int64)
                block_max = np.array(
                    [tfs[s : s + self.block_size].max() for s in starts]
                )
                result = TermPostings(
                    term=term,
                    df=df,
                    idf=idf,
                    doc_ids=ids,
                    tfs=tfs,
                    pos_chunks=pos_chunks,
                    chunk_counts=np.asarray(chunk_counts, dtype=np.int64),
                    order=None if already_sorted else order,
                    block_starts=starts,
                    block_max_tf=block_max,
                    imp_chunks=imp_chunks,
                )
        self._postings_cache[term] = result
        if len(self._postings_cache) > self._postings_cache_max:
            self._postings_cache.popitem(last=False)
        return result


def load_pagerank(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Sorted ``(doc_ids int64, ranks float64)`` parallel arrays; docs
    outside the graph default to 0.0 at lookup (Crawler.java:400 column
    default).  Arrays, not a dict: 16 B/graph-doc in the serving
    process, shared zero-copy by the vectorized scorers; the per-doc
    faithful path bisects (``searchsorted``)."""
    from .sidecar import SIDECAR_META, open_sidecar

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    pr_dir = os.path.join(index_dir, "pagerank")
    if not os.path.isdir(pr_dir):
        return empty
    if os.path.isfile(os.path.join(pr_dir, SIDECAR_META)):
        sc = open_sidecar(pr_dir, "page_rank")
        return sc.to_arrays() if sc is not None else empty
    files = [
        os.path.join(pr_dir, f)
        for f in sorted(os.listdir(pr_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return empty
    t = pq.read_table(files, columns=["doc_id", "page_rank"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ranks = t["page_rank"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], ranks[order]


def load_doclens(index_dir: str) -> tuple[np.ndarray, np.ndarray, float]:
    """Sorted ``(doc_ids int64, dls int64)`` parallel arrays plus avgdl,
    from the build's ``doclen/`` sidecar (one row per doc carrying its tf
    denominator — the BM25 document length).  Same arrays-not-dict
    discipline as ``load_pagerank``: 16 B/doc in the serving process,
    ``searchsorted`` lookups in the vectorized scorers.

    Raises FileNotFoundError for indexes built without the sidecar (the
    salted_groupby strategy or round-1 layouts) — BM25 needs dl; the
    tf·idf paths never touch it.
    """
    from .sidecar import SIDECAR_META, open_sidecar

    dl_dir = os.path.join(index_dir, "doclen")
    if os.path.isfile(os.path.join(dl_dir, SIDECAR_META)):
        sc = open_sidecar(dl_dir, "dl")
        if sc is not None:
            ids, vals = sc.to_arrays()
            return ids, vals.astype(np.int64), sc.avg
    files = (
        [
            os.path.join(dl_dir, f)
            for f in sorted(os.listdir(dl_dir))
            if f.endswith(".parquet")
        ]
        if os.path.isdir(dl_dir)
        else []
    )
    if not files:
        raise FileNotFoundError(
            f"no doclen sidecar under {dl_dir}: BM25 requires an index "
            "built with the partitioned-write strategy (round 2+)"
        )
    t = pq.read_table(files, columns=["doc_id", "dl"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    dls = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, dls = ids[order], dls[order]
    # dedupe by doc_id (keep first): a crashed-then-rerun extend leaves
    # the rolled-back generation's rows behind and the re-run re-emits
    # identical (doc_id, dl) pairs — without this, avgdl counts those
    # docs twice and BM25 drifts from a fresh union build
    if len(ids) > 1:
        keep = np.ones(len(ids), bool)
        keep[1:] = ids[1:] != ids[:-1]
        ids, dls = ids[keep], dls[keep]
    avgdl = float(dls.sum() / len(dls)) if len(dls) else 0.0
    return ids, dls, avgdl
