"""Segment store: partition-pruned posting lookup (SURVEY.md §2.6 J2).

The query-side replacement for the SQLite B-tree probe
(``QP/QueryIndex.java:121-166``): each stem routes to its
``hash(term) % P`` partition; only those partition files are touched, and
term-level row filtering rides parquet predicate pushdown.  Partition
tables and decoded term postings are cached per store instance — the
"loaded once per actor" state of SURVEY.md §2.3 T8.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..codec import decode_doc_ids, decode_position_blobs, unpack_f64, varbyte_decode
from ..stages.postings import term_partition
from ..stages.segments import partition_file


@dataclass
class TermPostings:
    """Decoded, merged posting list of one term.

    ``doc_ids`` is globally sorted (salted chunks are merged at decode
    time); ``block_starts``/``block_max_tf`` are re-derived block-max
    metadata over the merged order for WAND.
    """

    term: str
    df: int
    idf: float
    doc_ids: np.ndarray  # int64, sorted
    tfs: np.ndarray  # float64, aligned
    positions: list[np.ndarray] | None  # aligned, or None if not stored
    block_starts: np.ndarray  # int64 offsets of block boundaries
    block_max_tf: np.ndarray  # float64 per block

    @property
    def max_tf(self) -> float:
        return float(self.block_max_tf.max()) if self.block_max_tf.size else 0.0


class SegmentStore:
    def __init__(self, index_dir: str, num_term_partitions: int, block_size: int = 4096):
        self.index_dir = index_dir
        self.seg_dir = os.path.join(index_dir, "segments")
        self.stats_dir = os.path.join(index_dir, "term_stats")
        self.P = num_term_partitions
        self.block_size = block_size
        self._stats_cache: dict[int, dict[str, tuple[int, float]]] = {}
        self._seg_cache: dict[int, dict] = {}
        self._postings_cache: OrderedDict[str, TermPostings | None] = OrderedDict()
        self._postings_cache_max = 4096
        self._all_terms: list[str] | None = None

    # -- term stats ---------------------------------------------------------

    def _stats_partition(self, part: int) -> dict[str, tuple[int, float, int]]:
        cached = self._stats_cache.get(part)
        if cached is None:
            path = os.path.join(self.stats_dir, f"term_part={part}")
            cached = {}
            if os.path.isdir(path):
                t = pq.read_table(path, columns=["term", "df", "idf", "n_salts"])
                for term, df, idf, n_salts in zip(
                    t["term"].to_pylist(),
                    t["df"].to_pylist(),
                    t["idf"].to_pylist(),
                    t["n_salts"].to_pylist(),
                ):
                    cached[term] = (df, idf, n_salts)
            self._stats_cache[part] = cached
        return cached

    def term_stat(self, term: str) -> tuple[int, float, int] | None:
        """(df, idf, n_salts); the stats row always lives at the unsalted
        partition hash(term) % P."""
        return self._stats_partition(term_partition(term, self.P)).get(term)

    def all_terms(self) -> list[str]:
        """Sorted distinct term list (suggestion path K3)."""
        if self._all_terms is None:
            terms: list[str] = []
            for part in range(self.P):
                terms.extend(self._stats_partition(part).keys())
            self._all_terms = sorted(terms)
        return self._all_terms

    # -- postings -----------------------------------------------------------

    def _segment_partition(self, part: int) -> dict:
        """term -> list of raw chunk rows for one partition (cached)."""
        cached = self._seg_cache.get(part)
        if cached is None:
            path = partition_file(self.seg_dir, part)
            cached = {}
            if os.path.exists(path):
                t = pq.read_table(path)
                terms = t["term"].to_pylist()
                for i, term in enumerate(terms):
                    cached.setdefault(term, []).append(
                        {
                            "n_docs": t["n_docs"][i].as_py(),
                            "doc_ids_enc": t["doc_ids_enc"][i].as_py(),
                            "tfs_enc": t["tfs_enc"][i].as_py(),
                            "pos_blob_lens_enc": t["pos_blob_lens_enc"][i].as_py(),
                            "pos_blobs": t["pos_blobs"][i].as_py(),
                        }
                    )
            self._seg_cache[part] = cached
        return cached

    def postings(self, term: str) -> TermPostings | None:
        if term in self._postings_cache:
            self._postings_cache.move_to_end(term)
            return self._postings_cache[term]
        stat = self.term_stat(term)
        result: TermPostings | None = None
        if stat is not None:
            df, idf, n_salts = stat
            # hot terms spread their chunks over one partition per salt
            # (stages/postings.py routing) — fan the read across them.
            # Each distinct partition file already holds ALL of the term's
            # chunks routed to it, so visit each partition once even when
            # several salts hash to it.
            chunks = []
            visited: set[int] = set()
            for salt in range(n_salts):
                part = term_partition(term, self.P, salt)
                if part not in visited:
                    visited.add(part)
                    chunks.extend(self._segment_partition(part).get(term, []))
            ids_parts, tf_parts, pos_parts = [], [], []
            for c in chunks:
                ids_parts.append(
                    decode_doc_ids(c["doc_ids_enc"], c["n_docs"]).astype(np.int64)
                )
                tf_parts.append(unpack_f64(c["tfs_enc"]))
                pos_parts.extend(
                    decode_position_blobs(
                        varbyte_decode(c["pos_blob_lens_enc"]), c["pos_blobs"]
                    )
                )
            if ids_parts:
                ids = np.concatenate(ids_parts)
                tfs = np.concatenate(tf_parts)
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                tfs = tfs[order]
                positions = [pos_parts[i] for i in order]
                starts = np.arange(0, len(ids), self.block_size, dtype=np.int64)
                block_max = np.array(
                    [
                        tfs[s : s + self.block_size].max()
                        for s in starts
                    ]
                )
                result = TermPostings(
                    term=term,
                    df=df,
                    idf=idf,
                    doc_ids=ids,
                    tfs=tfs,
                    positions=positions,
                    block_starts=starts,
                    block_max_tf=block_max,
                )
        self._postings_cache[term] = result
        if len(self._postings_cache) > self._postings_cache_max:
            self._postings_cache.popitem(last=False)
        return result


def load_pagerank(index_dir: str) -> dict[int, float]:
    """doc_id -> page_rank; docs outside the graph default to 0.0 at
    lookup (Crawler.java:400 column default)."""
    pr_dir = os.path.join(index_dir, "pagerank")
    out: dict[int, float] = {}
    if os.path.isdir(pr_dir):
        files = [
            os.path.join(pr_dir, f)
            for f in os.listdir(pr_dir)
            if f.endswith(".parquet")
        ]
        for f in files:
            t = pq.read_table(f)
            for d, r in zip(t["doc_id"].to_pylist(), t["page_rank"].to_pylist()):
                out[d] = r
    return out
