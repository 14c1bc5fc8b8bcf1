"""Query engine: boolean / phrase / free-text search with the reference's
exact scoring semantics, plus a block-max WAND top-k fast path.

Faithful-path semantics (the oracle-checked contract):

* free text: stems batched lookup, per-doc wordInfo keyed by the ORIGINAL
  query word via stem->original (``QueryIndex.java:151-158``); merge across
  stems unions wordInfo maps (``QP.java:220-238``);
* boolean (``QP.java:245-358``): AND keeps only the LEFT side's wordInfo
  (B1 asymmetry), OR merges with right-overwrite and pageRank = max (B2),
  NOT is left minus right ids (B3); at most one operator, detection order
  OR > AND > NOT (B4);
* phrase (``QueryIndex.java:190-395``): candidates must contain ALL stems,
  then the position walk must find each next word in
  ``(current, current + MAX_GAP]`` — including the reference's quirk that
  the walk keeps sliding ``current`` forward across *every* position in
  range, not just the first (``QueryIndex.java:371-379``);
* score = 0.7 * Σ_{t in queryWords} tf·idf·1.0 + 0.3 * pagerank
  (``Ranker.java:18-40``); duplicate entries in queryWords double-count;
* ordering: score desc, doc_id asc (determinized tie-break — the
  reference's tie order is HashMap-unstable, SURVEY.md §7.5.1);
* LRU query cache of 1000 (``QP.java:25-37``) and an unbounded phrase
  cache (``QueryIndex.java:112``).

The top-k fast paths (``search_topk`` / ``bm25_topk``) serve the common
case — plain free-text query, top-k — three rank-identical ways:
"auto" vectorized TAAT (numpy, exact, wins at in-memory segment scale),
"wand" plain WAND (one global ``0.7·max_contrib`` bound per term plus
the ``0.3·max_pagerank`` static bound), and "bmw" block-max WAND
(Ding & Suel WSDM'11: per-64-posting block maxima let the pivot loop
skip whole candidate windows without evaluating a document — the
pruning path for k << candidate-count over long posting lists).  All
are asserted equal to the faithful path in tests (FIXTURES.md §5
"WAND", tests/test_bmw.py).
"""

from __future__ import annotations

import heapq
import os
from collections import OrderedDict

import numpy as np

from ..build import load_meta
from ..config import IndexConfig
from ..nputil import isin_sorted
from .parser import (
    detect_operator,
    is_quoted,
    split_query,
    strip_quotes,
    tokenize_and_stem,
)
from .snippets import generate_snippet
from .sidecar import open_sidecar
from .store import SegmentStore

# postings per block-max WAND block: small enough that one block's max is
# a tight bound over its docs, large enough that the per-block metadata is
# ~3% of the posting list (two 8-byte values per 64 postings)
_BMW_BLOCK = 64
# fraction of block mass that must be provably skippable for the Python
# BMW pivot loop to beat vectorized TAAT (measured: the loop costs
# ~1 us/doc, TAAT ~15 ns/doc, so BMW needs to skip the large majority of
# candidates before it pays)
_BMW_MIN_SKIP_FRAC = 0.5


def _block_meta(
    ids: np.ndarray, contrib: np.ndarray, block: int = _BMW_BLOCK
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last_doc_id, max_contrib) over a doc_id-sorted posting
    array — the block-max WAND skip table (Ding & Suel, WSDM'11).  One
    vectorized pad-reshape-max; O(n/block) output."""
    m = len(ids)
    if m == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    nb = (m + block - 1) // block
    pad = nb * block - m
    if pad:
        cpad = np.concatenate([contrib, np.full(pad, -np.inf)])
    else:
        cpad = contrib
    blk_max = cpad.reshape(nb, block).max(axis=1)
    last_idx = np.minimum(np.arange(1, nb + 1) * block - 1, m - 1)
    return ids[last_idx].astype(np.int64, copy=False), blk_max


class DocumentData:
    """Query-time candidate (``QueryIndex.java:37-77``)."""

    __slots__ = ("doc_id", "word_info", "page_rank")

    def __init__(self, doc_id: int, word_info: dict[str, tuple[float, float]]):
        self.doc_id = doc_id
        self.word_info = word_info
        self.page_rank = 0.0


class QueryResult:
    __slots__ = ("documents", "query_words")

    def __init__(self, documents: list[DocumentData], query_words: list[str]):
        self.documents = documents
        self.query_words = query_words


class QueryEngine:
    def __init__(
        self,
        index_dir: str,
        use_wand: bool = True,
        query_log_dir: str | None = None,
        bm25_k1: float = 1.2,
        bm25_b: float = 0.75,
    ):
        from ..memtune import tune_allocator

        tune_allocator()  # once per process; see memtune.py
        self.index_dir = index_dir
        meta = load_meta(index_dir)
        self.cfg = IndexConfig.from_dict(meta["config"])
        self.n_docs = meta["n_docs"]
        self.store = SegmentStore(index_dir, self.cfg.num_term_partitions)
        # pagerank sidecar: sharded row-group faulting when the build
        # compacted it (actor memory O(touched ranges)), full sorted
        # arrays on legacy layouts (see query/sidecar.py)
        self._pr = open_sidecar(
            os.path.join(index_dir, "pagerank"), "page_rank"
        )
        self.max_pagerank = self._pr.value_max if self._pr else 0.0
        self.use_wand = use_wand
        # optional search_queries write side (query_log.py): every search
        # appends (query, ts); suggestions can aggregate from the log
        self.query_log = None
        if query_log_dir:
            from .query_log import QueryLogWriter

            self.query_log = QueryLogWriter(query_log_dir)
        self._query_cache: OrderedDict[str, QueryResult] = OrderedDict()
        self._query_cache_max = 1000  # QP.java:26
        self._phrase_cache: dict[str, QueryResult] = {}
        # phrase match set as arrays (matched doc_ids, per-original-word
        # (tf array, idf)) — written by query_phrase, read by the
        # vectorized _phrase_topk scorer
        self._phrase_arrays_cache: dict[
            str, tuple[np.ndarray, dict[str, tuple[np.ndarray, float]]]
        ] = {}
        self._docs_dataset = None
        self._doc_cache: OrderedDict[int, tuple[str, str, str]] = OrderedDict()
        self._doc_cache_max = 4096
        # BM25 scorer state: doc-length arrays load lazily from the
        # doclen/ sidecar on the first bm25_topk call; per-term contrib
        # arrays (idf * saturation part, aligned with doc_ids) cache in a
        # bounded dict — the index is immutable, so no invalidation
        self.bm25_k1 = bm25_k1
        self.bm25_b = bm25_b
        self._doclen = None  # doclen sidecar, lazy (first bm25 call)
        self._bm25_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._bm25_cache_max = 4096
        # block-max WAND metadata: per-(term, scorer) arrays of per-block
        # (last_doc_id, max_contrib) at _BMW_BLOCK postings/block —
        # computed lazily from the decoded posting arrays (one vectorized
        # reshape-max per term), cached because the index is immutable
        self._blockmeta_cache: OrderedDict[
            tuple[str, str], tuple[np.ndarray, np.ndarray]
        ] = OrderedDict()
        self._blockmeta_cache_max = 4096
        # adaptive-planner memo: (scorer, term-set) whose BMW run hit
        # the eval-budget bail-out — repeat queries skip the Python
        # probe and go straight to vectorized TAAT (the index is
        # immutable, so a non-pruning workload stays non-pruning)
        self._bmw_abort_cache: OrderedDict[tuple, bool] = OrderedDict()
        self._bmw_abort_cache_max = 4096
        # instrumentation for the pruning tests: full evaluations and
        # block skips performed by the last _wand_arrays/_bmw_arrays call
        self.wand_stats = {"evals": 0, "block_skips": 0}
        # ... and chunk decode counts of the last _topk_cold call
        self.cold_stats = {"chunks_total": 0, "chunks_decoded": 0}

    # ------------------------------------------------------------------
    # QP.search / processQuery
    # ------------------------------------------------------------------

    def query(self, query: str) -> QueryResult:
        """``QP.search`` — cache probe then processQuery (``QP.java:86-112``)."""
        if query is None or not query.strip():
            return QueryResult([], [])
        cache_key = query.strip().lower()
        cached = self._query_cache.get(cache_key)
        if cached is not None:
            self._query_cache.move_to_end(cache_key)
            return cached
        result = self._process_query(query)
        if result.documents:
            self._query_cache[cache_key] = result
            if len(self._query_cache) > self._query_cache_max:
                self._query_cache.popitem(last=False)
        return result

    def _process_query(self, query: str) -> QueryResult:
        operator = detect_operator(query)
        if operator:
            parts = split_query(query)
            if len(parts) != 2:
                return self._process_component(query)
            left = self._process_component(parts[0].strip())
            right = self._process_component(parts[1].strip())
            combined_words = list(left.query_words) + list(right.query_words)
            if operator == "AND":
                docs = self._intersect(left.documents, right.documents)
            elif operator == "OR":
                docs = self._union(left.documents, right.documents)
            else:  # NOT
                docs = self._difference(left.documents, right.documents)
            return QueryResult(docs, combined_words)
        return self._process_component(query)

    def _process_component(self, query: str) -> QueryResult:
        if is_quoted(query):
            clean = strip_quotes(query)
            original_words = clean.split() or [clean]
            stems, _ = tokenize_and_stem(clean)
            if not stems:
                return QueryResult([], list(original_words))
            phrase = self.query_phrase(stems, list(original_words))
            return QueryResult(phrase.documents, list(original_words))
        stems, stem_to_original = tokenize_and_stem(query)
        query_words = list(stem_to_original.values())
        if not stems:
            return QueryResult([], query_words)
        docs = self.query_words(stems, stem_to_original)
        return QueryResult(docs, query_words)

    # ------------------------------------------------------------------
    # posting lookup (QueryIndex.queryWords)
    # ------------------------------------------------------------------

    def query_words(
        self, stems: list[str], stem_to_original: dict[str, str]
    ) -> list[DocumentData]:
        doc_word_info: dict[int, dict[str, tuple[float, float]]] = {}
        self.store.postings_many(stems)
        for stem in stems:
            tp = self.store.postings(stem)
            if tp is None:
                continue
            original = stem_to_original.get(stem, stem)
            idf = tp.idf
            for doc_id, tf in zip(tp.doc_ids.tolist(), tp.tfs.tolist()):
                doc_word_info.setdefault(doc_id, {})[original] = (tf, idf)
        return [DocumentData(d, wi) for d, wi in doc_word_info.items()]

    # ------------------------------------------------------------------
    # phrase path (QueryIndex.queryPhrase + checkSequentialPositions)
    # ------------------------------------------------------------------

    def _phrase_match_arrays(
        self,
        stems: list[str],
        original_words: list[str],
        lo: int | None = None,
        hi: int | None = None,
    ) -> tuple[np.ndarray, dict[str, tuple[np.ndarray, float]]]:
        """Phrase candidate semi-join + position walk as arrays:
        (matched doc_ids asc, {original_word: (tf rows, idf)}).

        ``lo``/``hi`` optionally restrict to the doc-id range [lo, hi) —
        phrase candidacy is a PER-DOC property (all-stems membership +
        that doc's own positions), so cutting the sorted candidate set
        before the walk is exact AND means a scatter range actor decodes
        only its range's position payloads (the expensive half)."""
        # pair each original word with ITS OWN stem (QP.java:379-422);
        # a positional zip over the DEDUPED stems list misaligns the map
        # when phrase words repeat or share a stem
        _, stem_to_original = tokenize_and_stem(" ".join(original_words))

        empty: tuple[np.ndarray, dict] = (np.empty(0, dtype=np.int64), {})
        postings = {}
        self.store.postings_many(stems)
        for s in stems:
            tp = self.store.postings(s)
            if tp is None:
                # a stem with no postings -> no doc has ALL stems
                return empty
            postings[s] = tp
        # docs containing ALL stems (J3 semi-join)
        candidate = None
        for s in stems:
            ids = postings[s].doc_ids
            candidate = ids if candidate is None else np.intersect1d(candidate, ids)
            if candidate.size == 0:
                break
        if candidate is not None and candidate.size and (
            lo is not None or hi is not None
        ):
            c0 = int(
                np.searchsorted(
                    candidate, lo if lo is not None else -(1 << 62), side="left"
                )
            )
            c1 = int(
                np.searchsorted(
                    candidate, hi if hi is not None else 1 << 62, side="left"
                )
            )
            candidate = candidate[c0:c1]
        if candidate is None or candidate.size == 0:
            return empty
        max_gap = self.cfg.max_phrase_gap
        # vectorized row lookup: one searchsorted per stem for the
        # whole candidate set (J4 positions are inline per posting);
        # positions decode ONLY for candidate postings (store
        # positions_for — never the term's full payload)
        per_stem_idx = {
            s: np.searchsorted(postings[s].doc_ids, candidate)
            for s in stems
        }
        if len(stems) == 1:
            # single-word phrase: every posting trivially passes the
            # walk (checkSequentialPositions with one word) — no
            # position decode needed
            matched_ci = np.arange(candidate.size, dtype=np.int64)
        elif len(stems) == 2:
            # two-word phrase: the in-range slide cannot change
            # the outcome, so the walk reduces to the vectorized
            # pair predicate (_phrase_pair_match), slab by slab
            parts = []
            for s0 in range(0, candidate.size, _PHRASE_SLAB):
                s1 = min(s0 + _PHRASE_SLAB, candidate.size)
                f1, o1 = postings[stems[0]].positions_flat_for(
                    per_stem_idx[stems[0]][s0:s1]
                )
                f2, o2 = postings[stems[1]].positions_flat_for(
                    per_stem_idx[stems[1]][s0:s1]
                )
                m = _phrase_pair_match(f1, o1, f2, o2, max_gap)
                if m.size:
                    parts.append(m + s0)
            matched_ci = (
                np.concatenate(parts)
                if parts
                else np.empty(0, dtype=np.int64)
            )
        else:
            # >= 3 words: the sequential walk (incl. the
            # cursor-slide quirk) vectorized across every start
            # position of every candidate at once
            # (_phrase_walk_vectorized; golden-tested equal to
            # _check_sequential_positions), slab by slab
            parts = []
            for s0 in range(0, candidate.size, _PHRASE_SLAB):
                s1 = min(s0 + _PHRASE_SLAB, candidate.size)
                flats = [
                    postings[s].positions_flat_for(
                        per_stem_idx[s][s0:s1]
                    )
                    for s in stems
                ]
                m = _phrase_walk_vectorized(flats, max_gap)
                if m.size:
                    parts.append(m + s0)
            matched_ci = (
                np.concatenate(parts)
                if parts
                else np.empty(0, dtype=np.int64)
            )
        matched_ids = candidate[matched_ci]
        # per-original-word arrays over the matched set (later
        # stems overwrite the same original word — the word_info
        # putAll semantics, vectorized)
        word_arrays: dict[str, tuple[np.ndarray, float]] = {}
        for s in stems:
            tp = postings[s]
            word_arrays[stem_to_original.get(s, s)] = (
                tp.tfs[per_stem_idx[s][matched_ci]],
                tp.idf,
            )
        return matched_ids, word_arrays

    def query_phrase(
        self, stems: list[str], original_words: list[str]
    ) -> QueryResult:
        cache_key = repr(stems)
        if (
            cache_key in self._phrase_cache
            and cache_key in self._phrase_arrays_cache
        ):
            # both caches must agree: the result cache is unbounded (T4)
            # but the arrays cache is capped, and the vectorized paths
            # read the arrays — a hit here without arrays would serve
            # empty results after an eviction
            return self._phrase_cache[cache_key]
        matched_ids, word_arrays = self._phrase_match_arrays(
            stems, original_words
        )
        self._phrase_arrays_cache[cache_key] = (matched_ids, word_arrays)
        if len(self._phrase_arrays_cache) > 256:
            self._phrase_arrays_cache.pop(
                next(iter(self._phrase_arrays_cache))
            )
        documents: list[DocumentData] = []
        for row, doc_id in enumerate(matched_ids.tolist()):
            word_info = {
                w: (float(arr[row]), idf)
                for w, (arr, idf) in word_arrays.items()
            }
            documents.append(DocumentData(doc_id, word_info))
        result = QueryResult(documents, list(original_words))
        self._phrase_cache[cache_key] = result
        return result

    # ------------------------------------------------------------------
    # boolean set ops (QP.java:245-358)
    # ------------------------------------------------------------------

    @staticmethod
    def _intersect(left, right):
        if not left or not right:
            return []
        right_ids = {d.doc_id for d in right}
        return [d for d in left if d.doc_id in right_ids]

    @staticmethod
    def _union(left, right):
        merged: dict[int, DocumentData] = {}
        for doc in list(left) + list(right):
            prev = merged.get(doc.doc_id)
            if prev is None:
                merged[doc.doc_id] = doc
            else:
                wi = dict(prev.word_info)
                wi.update(doc.word_info)  # right overwrites shared words (B2)
                d = DocumentData(doc.doc_id, wi)
                d.page_rank = max(prev.page_rank, doc.page_rank)
                merged[doc.doc_id] = d
        return list(merged.values())

    @staticmethod
    def _difference(left, right):
        if not left:
            return []
        if not right:
            return list(left)
        right_ids = {d.doc_id for d in right}
        return [d for d in left if d.doc_id not in right_ids]

    # ------------------------------------------------------------------
    # ranking (Ranker.java)
    # ------------------------------------------------------------------

    def rank(
        self, documents: list[DocumentData], query_words: list[str]
    ) -> list[tuple[int, float]]:
        w_tfidf = self.cfg.tfidf_weight
        w_pr = self.cfg.pagerank_weight
        prs = self._pr_lookup(
            np.fromiter((d.doc_id for d in documents), dtype=np.int64)
        )
        out = []
        for doc, doc_pr in zip(documents, prs):
            doc.page_rank = float(doc_pr)
            tfidf = 0.0
            wi = doc.word_info
            for w in query_words:
                info = wi.get(w)
                if info is not None:
                    tfidf += info[0] * info[1]  # importance == 1.0 (§2.9)
            out.append((doc.doc_id, w_tfidf * tfidf + w_pr * doc.page_rank))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    # ------------------------------------------------------------------
    # WAND top-k fast path
    # ------------------------------------------------------------------

    def search_topk(
        self, query: str, k: int = 10, mode: str = "auto"
    ) -> list[tuple[int, float]]:
        """Top-k for a plain free-text query; falls back to the faithful
        path for boolean/phrase queries.

        ``mode``: "auto" = vectorized term-at-a-time (exact, numpy — wins
        at in-memory segment scale), "wand" = plain WAND (one global
        upper bound per term), "bmw" = block-max WAND (per-block upper
        bounds skip whole candidate windows — the pruning path for
        k << candidate-count over cold segments), "faithful" = the
        dict-based reference-semantics path, "bmw_cold" = chunk-lazy
        BMW over persisted chunk metadata (decode only touched chunks;
        falls back to "auto" on legacy indexes or non-pruning
        workloads).  All five are asserted rank-identical in tests."""
        if mode not in ("auto", "wand", "bmw", "bmw_cold", "faithful"):
            raise ValueError(f"unknown mode {mode!r}")
        if not self.use_wand or mode == "faithful":
            result = self.query(query)
            return self.rank(result.documents, result.query_words)[:k]
        operator = detect_operator(query or "")
        if operator:
            parts = split_query(query)
            if len(parts) == 2:
                return self._bool_topk(
                    operator, parts[0].strip(), parts[1].strip(), k
                )
            # malformed boolean falls through to the plain-query path
            query = query
        if is_quoted((query or "").strip()):
            return self._phrase_topk((query or "").strip(), k)
        stems, stem_to_original = tokenize_and_stem(query or "")
        if mode == "bmw_cold":
            cold = self._topk_cold(stems, k, scorer="tfidf")
            if cold is not None:
                return cold
            # legacy segment files OR a non-pruning workload (the
            # eval-budget guard): rerun on the warm vectorized path
            mode = "auto"
        self.store.postings_many(stems)
        terms = []
        for s in stems:
            tp = self.store.postings(s)
            if tp is not None:
                terms.append(tp)
        if not terms:
            return []
        if mode == "wand":
            return self._wand(terms, k)
        if mode == "bmw":
            return self._bmw(terms, k, scorer="tfidf")
        return self._taat(terms, k)

    def _phrase_topk(
        self,
        query: str,
        k: int,
        lo: int | None = None,
        hi: int | None = None,
    ) -> list[tuple[int, float]]:
        """Vectorized top-k for a pure quoted-phrase query: the match set
        comes from query_phrase's arrays cache and scoring runs as array
        ops with the SAME per-word FP addition order as rank() — asserted
        rank-identical in tests.  With ``lo``/``hi`` the candidacy, walk
        and scoring all restrict to the doc-id range (the scatter path);
        range results cache under a range-qualified key."""
        clean = strip_quotes(query)
        original_words = clean.split() or [clean]
        stems, _ = tokenize_and_stem(clean)
        if not stems:
            if lo is not None or hi is not None:
                return []  # no-stem phrases carry no per-doc candidacy
            result = self.query(query)
            return self.rank(result.documents, result.query_words)[:k]
        cache_key = (
            repr(stems) if lo is None and hi is None else repr((stems, lo, hi))
        )
        entry = self._phrase_arrays_cache.get(cache_key)
        if entry is None:
            if lo is None and hi is None:
                self.query_phrase(stems, list(original_words))
                entry = self._phrase_arrays_cache.get(cache_key)
            else:
                entry = self._phrase_match_arrays(
                    stems, list(original_words), lo, hi
                )
                self._phrase_arrays_cache[cache_key] = entry
                if len(self._phrase_arrays_cache) > 256:
                    self._phrase_arrays_cache.pop(
                        next(iter(self._phrase_arrays_cache))
                    )
        if entry is None:
            # no-postings/no-candidate phrase: nothing matched
            return []
        ids, word_arrays = entry
        if ids.size == 0:
            return []
        tfidf = np.zeros(ids.size)
        for w in original_words:  # rank() iterates query_words in order
            wa = word_arrays.get(w)
            if wa is not None:
                tfidf = tfidf + wa[0] * wa[1]
        scores = (
            self.cfg.tfidf_weight * tfidf
            + self.cfg.pagerank_weight * self._pr_lookup(ids)
        )
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    # ------------------------------------------------------------------
    # vectorized boolean top-k (exact: same per-doc FP addition order and
    # the same B1/B2/B3 wordInfo semantics as the faithful path)
    # ------------------------------------------------------------------

    def _component_arrays(
        self, query: str, lo: int | None = None, hi: int | None = None
    ):
        """One boolean operand as arrays: (query_words,
        {original_word: (sorted doc_ids, tf*idf contrib)}, candidates).
        ``lo``/``hi`` restrict every array to the doc-id range [lo, hi)
        — membership and contributions are per-doc, so boolean set ops
        over range-restricted components equal the range restriction of
        the global set ops (the scatter exactness argument)."""
        ranged = lo is not None or hi is not None
        rlo = lo if lo is not None else -(1 << 62)
        rhi = hi if hi is not None else 1 << 62
        if is_quoted(query):
            clean = strip_quotes(query)
            original_words = clean.split() or [clean]
            stems, _ = tokenize_and_stem(clean)
            if not stems:
                return list(original_words), {}, np.empty(0, dtype=np.int64)
            if ranged:
                entry = self._phrase_match_arrays(
                    stems, list(original_words), lo, hi
                )
            else:
                cache_key = repr(stems)
                if cache_key not in self._phrase_arrays_cache:
                    self.query_phrase(stems, list(original_words))
                entry = self._phrase_arrays_cache.get(cache_key)
            if entry is None:
                return list(original_words), {}, np.empty(0, dtype=np.int64)
            # matched ids are already sorted (candidate asc ∩ matched_ci
            # asc); every matched doc carries every phrase word, so the
            # per-word id arrays are all the matched set
            ids, arrays = entry
            word_arrays = {
                w: (ids, arr * idf) for w, (arr, idf) in arrays.items()
            }
            return list(original_words), word_arrays, ids
        stems, stem_to_original = tokenize_and_stem(query)
        words = list(stem_to_original.values())
        word_arrays = {}
        cand_parts = []
        self.store.postings_many(stems)
        for s in stems:
            tp = self.store.postings(s)
            if tp is None:
                continue
            orig = stem_to_original.get(s, s)
            if ranged:
                i0 = int(np.searchsorted(tp.doc_ids, rlo, side="left"))
                i1 = int(np.searchsorted(tp.doc_ids, rhi, side="left"))
                word_arrays[orig] = (
                    tp.doc_ids[i0:i1],
                    tp.tfs[i0:i1] * tp.idf,
                )
                cand_parts.append(tp.doc_ids[i0:i1])
            else:
                word_arrays[orig] = (tp.doc_ids, tp.tfs * tp.idf)
                cand_parts.append(tp.doc_ids)
        cand = (
            np.unique(np.concatenate(cand_parts))
            if cand_parts
            else np.empty(0, dtype=np.int64)
        )
        return words, word_arrays, cand

    @staticmethod
    def _merge_overwrite(left, right):
        """OR-merge one word's arrays: right's rows win for shared docs
        (the putAll overwrite, B2)."""
        lids, lc = left
        rids, rc = right
        if lids.size == 0:
            return right
        if rids.size == 0:
            return left
        in_right, _ = isin_sorted(rids, lids)
        keep = ~in_right
        ids = np.concatenate([lids[keep], rids])
        c = np.concatenate([lc[keep], rc])
        order = np.argsort(ids, kind="stable")
        return ids[order], c[order]

    def _bool_topk(
        self,
        operator,
        left_q,
        right_q,
        k,
        lo: int | None = None,
        hi: int | None = None,
    ):
        lwords, larr, lcand = self._component_arrays(left_q, lo, hi)
        rwords, rarr, rcand = self._component_arrays(right_q, lo, hi)
        words = lwords + rwords
        if operator == "AND":
            cand = np.intersect1d(lcand, rcand)
            sources = larr  # left wordInfo only (B1)
        elif operator == "NOT":
            cand = np.setdiff1d(lcand, rcand)
            sources = larr
        else:  # OR
            cand = np.union1d(lcand, rcand)
            sources = dict(larr)
            for w, arr in rarr.items():
                sources[w] = (
                    self._merge_overwrite(sources[w], arr)
                    if w in sources
                    else arr
                )
        if cand.size == 0:
            return []
        acc = np.zeros(cand.size)
        for w in words:  # multiplicity and order preserved (Ranker.java:26-35)
            arr = sources.get(w)
            if arr is None:
                continue
            ids, contrib = arr
            pos = np.searchsorted(cand, ids)
            pos_c = np.minimum(pos, cand.size - 1)
            hit = cand[pos_c] == ids
            acc[pos_c[hit]] += contrib[hit]
        pr = self._pr_lookup(cand)
        scores = self.cfg.tfidf_weight * acc + self.cfg.pagerank_weight * pr
        if k < cand.size:
            kth = -np.partition(-scores, k - 1)[k - 1]
            part = np.flatnonzero(scores >= kth)
        else:
            part = np.arange(cand.size)
        order = part[np.lexsort((cand[part], -scores[part]))][:k]
        return [(int(cand[i]), float(scores[i])) for i in order]

    def _pr_lookup(self, doc_ids: np.ndarray) -> np.ndarray:
        """Vectorized pagerank lookup (0.0 for docs outside the graph)."""
        if self._pr is None or not len(doc_ids):
            return np.zeros(len(doc_ids))
        return self._pr.get(np.asarray(doc_ids, np.int64))

    def _taat(self, terms, k: int) -> list[tuple[int, float]]:
        """Vectorized exact scoring: accumulate tf·idf per doc with
        np.add.at (per-doc addition order == query-term order, so the FP
        sum matches the faithful path bit-for-bit), blend pagerank via
        searchsorted, top-k via lexsort."""
        return self._taat_arrays(
            [t.doc_ids for t in terms], [t.tfs * t.idf for t in terms], k
        )

    def _taat_arrays(
        self,
        ids_list: list[np.ndarray],
        contribs: list[np.ndarray],
        k: int,
    ) -> list[tuple[int, float]]:
        """Scorer-agnostic TAAT core over per-term (doc_ids, contrib)
        arrays — shared by the tf·idf and BM25 paths."""
        w_tfidf = self.cfg.tfidf_weight
        w_pr = self.cfg.pagerank_weight
        all_ids = np.concatenate(ids_list)
        all_contrib = np.concatenate(contribs)
        uids, inv = np.unique(all_ids, return_inverse=True)
        acc = np.zeros(len(uids))
        np.add.at(acc, inv, all_contrib)
        pr = self._pr_lookup(uids)
        scores = w_tfidf * acc + w_pr * pr
        if k < len(uids):
            # k-th best score, then keep every doc at-or-above it so
            # boundary ties are resolved by the deterministic lexsort
            kth = -np.partition(-scores, k - 1)[k - 1]
            part = np.flatnonzero(scores >= kth)
        else:
            part = np.arange(len(uids))
        order = part[np.lexsort((uids[part], -scores[part]))][:k]
        return [(int(uids[i]), float(scores[i])) for i in order]

    def _wand(self, terms, k: int) -> list[tuple[int, float]]:
        contribs = [t.tfs * t.idf for t in terms]
        # fl(max_tf)·idf == max(fl(tf_i·idf)) — rounding is monotone and
        # idf >= 0, so the precomputed-array UB is bit-identical to the
        # round-1 max_tf·idf form (asserted by the rank-identity tests)
        ubs = [
            self.cfg.tfidf_weight * (float(c.max()) if c.size else 0.0)
            for c in contribs
        ]
        ids_list = [t.doc_ids for t in terms]
        # memoize the work-budget abort like the BMW paths: a repeat
        # query on a known non-pruning workload goes straight to TAAT
        # instead of re-paying the bounded detour every call
        key = ("wand", k, tuple(sorted(t.term for t in terms)))
        if key in self._bmw_abort_cache:
            self._bmw_abort_cache.move_to_end(key)
            return self._taat_arrays(ids_list, contribs, k)
        res = self._wand_arrays(ids_list, contribs, ubs, k)
        if self.wand_stats.get("aborted"):
            self._bmw_abort_cache[key] = True
            if len(self._bmw_abort_cache) > self._bmw_abort_cache_max:
                self._bmw_abort_cache.popitem(last=False)
        return res

    def _bmw(self, terms, k: int, scorer: str = "tfidf") -> list[tuple[int, float]]:
        if scorer == "bm25":
            contribs = [self._bm25_contribs(t) for t in terms]
        else:
            contribs = [t.tfs * t.idf for t in terms]
        # k is part of the key: prunability is k-dependent (the k-th-best
        # threshold estimate) — a k=1000 abort must not force TAAT on the
        # same terms' highly-prunable k=10 serving requests
        key = (scorer, k, tuple(sorted(t.term for t in terms)))
        if key in self._bmw_abort_cache:
            self._bmw_abort_cache.move_to_end(key)
            return self._taat_arrays(
                [t.doc_ids for t in terms], contribs, k
            )
        ubs = [
            self.cfg.tfidf_weight * (float(c.max()) if c.size else 0.0)
            for c in contribs
        ]
        metas = [
            self._term_block_meta(t.term, scorer, t.doc_ids, c)
            for t, c in zip(terms, contribs)
        ]
        if not self._bmw_prunable(contribs, ubs, metas, k):
            # predicted non-pruning workload: skip the per-doc Python
            # pivot loop entirely (VERDICT r3 #4 — the old path paid up
            # to the full eval budget before bailing) and memoize
            self._bmw_abort_cache[key] = True
            if len(self._bmw_abort_cache) > self._bmw_abort_cache_max:
                self._bmw_abort_cache.popitem(last=False)
            return self._taat_arrays(
                [t.doc_ids for t in terms], contribs, k
            )
        res = self._bmw_arrays(
            [t.doc_ids for t in terms], contribs, ubs, k, metas=metas
        )
        if res is None:  # eval-budget bail-out: vectorized TAAT
            self._bmw_abort_cache[key] = True
            if len(self._bmw_abort_cache) > self._bmw_abort_cache_max:
                self._bmw_abort_cache.popitem(last=False)
            return self._taat_arrays(
                [t.doc_ids for t in terms], contribs, k
            )
        return res

    def _wand_arrays(
        self,
        ids_list: list[np.ndarray],
        contribs: list[np.ndarray],
        ubs: list[float],
        k: int,
    ) -> list[tuple[int, float]]:
        """Scorer-agnostic WAND core: document-at-a-time with per-term
        upper bounds over precomputed (doc_ids, contrib) arrays — shared
        by the tf·idf and BM25 paths."""
        w_tfidf = self.cfg.tfidf_weight
        w_pr = self.cfg.pagerank_weight
        static_ub = w_pr * self.max_pagerank
        pr_sidecar = self._pr

        def pr_of(doc_id: int) -> float:
            if pr_sidecar is None:
                return 0.0
            return pr_sidecar.get_one(doc_id)

        n = len(ids_list)
        pos = [0] * n  # cursor per term
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top k
        threshold = -np.inf
        evals = 0
        iters = 0

        def cur_doc(i: int) -> int:
            ids = ids_list[i]
            p = pos[i]
            return int(ids[p]) if p < len(ids) else _MAX_DOC

        while True:
            # total-work guard (round 5, same law as _topk_cold): on a
            # non-pruning workload the per-doc Python loop degenerates to
            # evaluating the whole candidate union (minutes at 10^6
            # postings); past the budget, vectorized TAAT over the SAME
            # arrays is strictly faster and rank-identical by test.
            iters += 1
            if iters * (64 + n) > _COLD_WORK_BUDGET:
                self.wand_stats = {
                    "evals": evals,
                    "block_skips": 0,
                    "aborted": True,
                }
                return self._taat_arrays(ids_list, contribs, k)
            order = sorted(range(n), key=cur_doc)
            if cur_doc(order[0]) == _MAX_DOC:
                break
            # find pivot
            acc = static_ub
            pivot_idx = None
            for j, i in enumerate(order):
                if cur_doc(i) == _MAX_DOC:
                    break
                acc += ubs[i]
                if acc > threshold:
                    pivot_idx = j
                    break
            if pivot_idx is None:
                break  # no doc can beat the threshold
            pivot_doc = cur_doc(order[pivot_idx])
            if pivot_doc == _MAX_DOC:
                break
            if cur_doc(order[0]) == pivot_doc:
                # fully evaluate pivot_doc
                evals += 1
                score = 0.0
                for i in range(n):
                    ids = ids_list[i]
                    p = pos[i]
                    if p < len(ids) and int(ids[p]) == pivot_doc:
                        score += contribs[i][p]
                        pos[i] += 1
                score = w_tfidf * score + w_pr * pr_of(pivot_doc)
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                    if len(heap) == k:
                        threshold = heap[0][0] - 1e-12
                else:
                    if item > heap[0]:
                        heapq.heapreplace(heap, item)
                        threshold = heap[0][0] - 1e-12
            else:
                # advance the leading terms up to pivot_doc
                for j in range(pivot_idx):
                    i = order[j]
                    pos[i] = int(
                        np.searchsorted(ids_list[i], pivot_doc, side="left")
                    )
        self.wand_stats = {"evals": evals, "block_skips": 0}
        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [(-d, float(s)) for s, d in out]

    # ------------------------------------------------------------------
    # "did you mean" spelling correction (extras beyond the reference:
    # its Trie serves prefixes only — Suggestions/src/.../Trie.java)
    # ------------------------------------------------------------------

    def _correction_index(self, parts: list[int] | None = None):
        """FastSS deletion-neighborhood index over the INDEX VOCABULARY
        (extras/fuzzy.py discipline, serving-side): variant -> vocab
        ids.  Built once per engine per partition slice; memory is
        O(slice vocab x token length) — ``parts`` restricts the build to
        a term-partition slice so a serving pool shards the warm-build
        (and the memory) instead of every actor holding the full map."""
        cache = getattr(self, "_corr_index_cache", None)
        if cache is None:
            cache = self._corr_index_cache = {}
        key = None if parts is None else tuple(sorted(parts))
        got = cache.get(key)
        if got is None:
            vocab = self.store.partition_terms_array(parts)
            idx: dict[str, list[int]] = {}
            for j, w in enumerate(vocab.tolist()):
                idx.setdefault(w, []).append(j)
                for p in range(len(w)):
                    idx.setdefault(w[:p] + w[p + 1 :], []).append(j)
            got = cache[key] = (vocab, idx)
        return got

    def correction_best(
        self, query: str, parts: list[int] | None = None
    ) -> dict[str, tuple[int, str]]:
        """The mergeable half of ``suggest_correction``: for each query
        token whose stem misses the vocabulary, the best
        ``(-df, word)`` key among edit-distance-1 candidates in the
        ``parts`` vocabulary slice (``None`` = full).  Slices partition
        the vocab by term hash, so the element-wise MIN of per-slice
        results equals the full-vocab answer — the scatter-gather merge
        rule (``SearchService.suggest_correction_scatter``)."""
        from ..extras.fuzzy import _is_edit1

        out: dict[str, tuple[int, str]] = {}
        stems, stem_to_original = tokenize_and_stem(query or "")
        vocab, idx = self._correction_index(parts)
        for s in dict.fromkeys(stems):
            if self.store.term_stat(s) is not None:
                continue  # resolves in the index
            cands: set[int] = set()
            for var in [s] + [s[:p] + s[p + 1 :] for p in range(len(s))]:
                cands.update(idx.get(var, ()))
            best: tuple[int, str] | None = None
            for j in cands:
                w = str(vocab[j])
                if not _is_edit1(s, w):
                    continue
                # the suggestion must SURVIVE the query pipeline: a
                # vocab stem that re-stems to a missing term (e.g.
                # "pars" -> "par") would correct into zero hits
                restems, _ = tokenize_and_stem(w)
                if not restems or self.store.term_stat(restems[0]) is None:
                    continue
                df = (self.store.term_stat(restems[0]) or (0,))[0]
                key = (-df, w)
                if best is None or key < best:
                    best = key
            if best is not None:
                out[stem_to_original.get(s, s)] = best
        return out

    def suggest_correction(self, query: str) -> dict[str, str]:
        """For each query token whose stem misses the vocabulary, the
        highest-df vocabulary term at Levenshtein distance 1 (ties:
        lexicographically smallest) — {original_token: correction},
        empty when every token resolves."""
        return {
            tok: best[1] for tok, best in self.correction_best(query).items()
        }

    def _pr_window_ub(self, lo: int, hi: int) -> float:
        """Upper bound on the blended pagerank term over docs in
        [lo, hi] — the sidecar's range_max where available (exact for
        eager arrays, per-row-group manifest maxima for sharded, no IO),
        else the global max.  Replaces the global static bound in the
        block-max WINDOW check: with a skewed pagerank, most windows
        carry a far smaller bound than the global max and prune."""
        if self._pr is None:
            return 0.0
        rm = getattr(self._pr, "range_max", None)
        if rm is None:
            return self.cfg.pagerank_weight * self.max_pagerank
        return self.cfg.pagerank_weight * rm(lo, hi)

    def _term_block_meta(
        self, term: str, scorer: str, ids: np.ndarray, contrib: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Cached per-(term, scorer) block-max metadata — the index is
        immutable, so the (last_doc, max_contrib) tables never change."""
        key = (scorer, term)
        cached = self._blockmeta_cache.get(key)
        if cached is not None:
            self._blockmeta_cache.move_to_end(key)
            return cached
        meta = _block_meta(ids, contrib)
        self._blockmeta_cache[key] = meta
        if len(self._blockmeta_cache) > self._blockmeta_cache_max:
            self._blockmeta_cache.popitem(last=False)
        return meta

    def _bmw_prunable(
        self,
        contribs: list[np.ndarray],
        ubs: list[float],
        metas: list[tuple[np.ndarray, np.ndarray]],
        k: int,
    ) -> bool:
        """Predict from the (persisted / cached) block-max metadata
        whether block-max pruning can pay, BEFORE entering the per-doc
        Python pivot loop (VERDICT r3 #4: the old flow burned up to the
        full eval budget — ~250 ms — discovering a non-pruning workload
        at runtime).

        Lower bound on the final top-k heap threshold: the k-th largest
        single-term contribution (each such posting's total score
        dominates its own term's share, so >= k docs beat it).  A TYPICAL
        window's upper bound for a block of term i is its own block max
        plus the MEDIAN block max of every other term (the BMW window
        check sums the leading terms' block maxima — modelling the
        others at their global UB would be plain WAND's weakness, which
        is exactly what block maxima fix) plus the global pagerank
        bound.  Evaluated vectorized over all blocks at once
        (O(total_postings / block) numpy).  If fewer than
        ``_BMW_MIN_SKIP_FRAC`` of blocks beat-proof against that
        threshold, BMW degenerates to per-doc Python evaluation and the
        caller should run vectorized TAAT.  A heuristic in the routing
        sense only — every route returns the identical ranking, and the
        eval-budget guard inside ``_bmw_arrays`` stays as the runtime
        backstop for workloads the prediction gets wrong."""
        w_tfidf = self.cfg.tfidf_weight
        static_ub = self.cfg.pagerank_weight * self.max_pagerank
        thr = 0.0
        for c in contribs:
            if c.size >= k > 0:
                kth = float(np.partition(c, c.size - k)[c.size - k])
                thr = max(thr, w_tfidf * kth)
        if thr <= 0.0:
            # heap may never fill (fewer than k candidates per term):
            # no usable threshold estimate, assume non-pruning
            return False
        med = [
            w_tfidf * float(np.median(m[1])) if len(m[1]) else 0.0
            for m in metas
        ]
        med_sum = sum(med) + static_ub
        skippable = 0
        total = 0
        for mi, (_, blk_max) in zip(med, metas):
            nb = len(blk_max)
            if nb == 0:
                continue
            others = med_sum - mi
            total += nb
            skippable += int(
                np.count_nonzero(w_tfidf * blk_max + others < thr)
            )
        return total > 0 and skippable >= _BMW_MIN_SKIP_FRAC * total

    def _bmw_arrays(
        self,
        ids_list: list[np.ndarray],
        contribs: list[np.ndarray],
        ubs: list[float],
        k: int,
        metas: list[tuple[np.ndarray, np.ndarray]] | None = None,
        eval_budget: int | None = None,
    ) -> list[tuple[int, float]] | None:
        """Block-max WAND core (Ding & Suel, WSDM'11): the WAND pivot
        loop plus a per-block refinement.  After the global-UB pivot is
        found, the per-block maxima of the blocks holding each leading
        term's first posting >= pivot bound every candidate in
        ``[pivot_doc, min(block_last, next_term_doc - 1)]`` at once — if
        that bound can't beat the heap threshold the whole window is
        skipped without evaluating a single document.  Rank-identical to
        plain WAND / TAAT by construction (the block bound dominates each
        doc's true score; asserted by tests/test_bmw.py).

        ``metas`` carries precomputed (blk_last_doc, blk_max_contrib)
        per term — pass it when slicing (search_topk_range) computes
        fresh tables; omitted, tables build vectorized from the arrays.

        Like the cold path, the pivot loop is per-document Python and
        wins only when the threshold PRUNES; ``eval_budget`` (default
        ``max(4096, 64k)``) detects a non-pruning workload — many
        evaluations, (almost) no skips — and returns None so callers
        rerun on the vectorized TAAT path.
        """
        if eval_budget is None:
            eval_budget = max(4096, 64 * k)
        w_tfidf = self.cfg.tfidf_weight
        w_pr = self.cfg.pagerank_weight
        static_ub = w_pr * self.max_pagerank
        pr_sidecar = self._pr

        def pr_of(doc_id: int) -> float:
            if pr_sidecar is None:
                return 0.0
            return pr_sidecar.get_one(doc_id)

        n = len(ids_list)
        if metas is None:
            metas = [
                _block_meta(ids, c) for ids, c in zip(ids_list, contribs)
            ]
        blk_last = [m[0] for m in metas]
        blk_max = [m[1] for m in metas]
        lens = [len(ids) for ids in ids_list]
        pos = [0] * n
        heap: list[tuple[float, int]] = []
        threshold = -np.inf
        evals = 0
        skips = 0

        def cur_doc(i: int) -> int:
            p = pos[i]
            return int(ids_list[i][p]) if p < lens[i] else _MAX_DOC

        while True:
            order = sorted(range(n), key=cur_doc)
            if cur_doc(order[0]) == _MAX_DOC:
                break
            # global-UB pivot selection (identical to plain WAND)
            acc = static_ub
            pivot_idx = None
            for j, i in enumerate(order):
                if cur_doc(i) == _MAX_DOC:
                    break
                acc += ubs[i]
                if acc > threshold:
                    pivot_idx = j
                    break
            if pivot_idx is None:
                break
            pivot_doc = cur_doc(order[pivot_idx])
            if pivot_doc == _MAX_DOC:
                break
            # block-max refinement: bound every doc in the window
            # [pivot_doc, d_limit] by the leading terms' current-block
            # maxima (terms past the pivot have cur_doc > d_limit and
            # cannot touch the window; doc_ids are unique per list, so
            # docs <= blk_last sit inside the cursor's block)
            block_acc = 0.0
            d_limit = _MAX_DOC
            for j in range(pivot_idx + 1):
                i = order[j]
                q = int(
                    np.searchsorted(ids_list[i], pivot_doc, side="left")
                )
                if q < lens[i]:
                    b = q // _BMW_BLOCK
                    block_acc += float(blk_max[i][b])
                    d_limit = min(d_limit, int(blk_last[i][b]))
            nxt = (
                cur_doc(order[pivot_idx + 1]) if pivot_idx + 1 < n else _MAX_DOC
            )
            d_limit = min(d_limit, nxt - 1)
            if (
                d_limit >= pivot_doc
                and self._pr_window_ub(pivot_doc, d_limit)
                + w_tfidf * block_acc
                <= threshold
            ):
                # nothing in [pivot_doc, d_limit] can enter the heap —
                # hop every leading cursor past the window in one move
                target = d_limit + 1
                for j in range(pivot_idx + 1):
                    i = order[j]
                    if cur_doc(i) < target:
                        pos[i] = int(
                            np.searchsorted(
                                ids_list[i], target, side="left"
                            )
                        )
                skips += 1
                continue
            if cur_doc(order[0]) == pivot_doc:
                evals += 1
                if evals >= eval_budget and skips * 16 < evals:
                    self.wand_stats = {
                        "evals": evals,
                        "block_skips": skips,
                        "aborted": True,
                    }
                    return None  # non-pruning workload: caller -> TAAT
                score = 0.0
                for i in range(n):
                    ids = ids_list[i]
                    p = pos[i]
                    if p < lens[i] and int(ids[p]) == pivot_doc:
                        score += contribs[i][p]
                        pos[i] += 1
                score = w_tfidf * score + w_pr * pr_of(pivot_doc)
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                    if len(heap) == k:
                        threshold = heap[0][0] - 1e-12
                else:
                    if item > heap[0]:
                        heapq.heapreplace(heap, item)
                        threshold = heap[0][0] - 1e-12
            else:
                for j in range(pivot_idx):
                    i = order[j]
                    pos[i] = int(
                        np.searchsorted(ids_list[i], pivot_doc, side="left")
                    )
        self.wand_stats = {"evals": evals, "block_skips": skips}
        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [(-d, float(s)) for s, d in out]

    # ------------------------------------------------------------------
    # chunk-lazy cold block-max WAND (mode="bmw_cold")
    # ------------------------------------------------------------------

    def _chunk_ub(self, scorer: str, idf: float, max_tf: float) -> float:
        """Provable upper bound on any posting's contribution in a chunk,
        from persisted metadata alone (no decode).

        tfidf: contrib = tf·idf <= max_tf·idf (idf >= 0, monotone).
        bm25:  contrib = idf·(k1+1)·c / (c + k1·(1-b+b·dl/avgdl)) with
        c = tf·dl (normalized storage) or c = tf (dl==0 fallback docs).
        Substituting c = tf·dl gives
        idf(k1+1) / (1 + k1(1-b)/c + k1·b/(tf·avgdl)) — dropping the
        middle term and tf <= max_tf bounds the normalized case; the
        dl==0 case is idf(k1+1)·c/(c+k1(1-b)), increasing in c <= max_tf.
        The max of the two covers every posting."""
        if max_tf <= 0.0:
            return 0.0
        if scorer == "tfidf":
            return idf * max_tf
        k1, b = self.bm25_k1, self.bm25_b
        avgdl = self._doclen_sidecar().avg
        avgdl = avgdl if avgdl > 0 else 1.0
        b1 = idf * (k1 + 1.0) / (1.0 + k1 * b / (max_tf * avgdl))
        # dl==0 docs recover c = rint(tf); rint is monotone, so
        # c <= rint(max_tf) — bounding at max_tf itself would
        # under-bound a fractional stored tf that rounds UP (a
        # normalized-tf doc missing its doclen row: tf=0.6 -> c=1)
        cm = float(np.rint(max_tf))
        b2 = (
            idf * (k1 + 1.0) * cm / (cm + k1 * (1.0 - b)) if cm > 0 else 0.0
        )
        return max(b1, b2)

    def _chunk_contribs(
        self, scorer: str, idf: float, ids: np.ndarray, tfs: np.ndarray
    ) -> np.ndarray:
        """Exact per-posting contribution for one decoded chunk — the
        chunk-local form of ``_bm25_contribs`` (same expressions)."""
        if scorer == "tfidf":
            return tfs * idf
        dl_sc = self._doclen_sidecar()
        avgdl = dl_sc.avg
        dl = dl_sc.get(ids, default=0.0)
        c = np.where(dl > 0, np.rint(tfs * dl), np.rint(tfs))
        k1, b = self.bm25_k1, self.bm25_b
        denom = c + k1 * (1.0 - b + b * dl / (avgdl if avgdl > 0 else 1.0))
        return idf * ((c * (k1 + 1.0)) / denom)

    def _topk_cold(
        self,
        stems: list[str],
        k: int,
        scorer: str,
        lo: int = 0,
        hi: int | None = None,
        eval_budget: int | None = None,
    ) -> list[tuple[int, float]] | None:
        """Chunk-lazy block-max WAND: every CHUNK of every query term is
        its own posting-list unit (each (term, doc) posting lives in
        exactly one chunk, so summing across units == summing across
        terms), undecoded units are represented purely by their persisted
        (min_doc, max_doc, max_tf) metadata, and a unit decodes its
        ids/tfs only when the pivot loop needs a posting inside it.
        Units the threshold proves irrelevant are never read — serving
        memory and decode work scale with chunks TOUCHED, not with df
        (the eager paths decode a hot term's entire posting list; at
        10^12-doc scale that is the per-actor ceiling).

        Returns None when any query term's segment files predate the
        chunk-metadata columns — callers fall back to the warm paths.

        The pivot loop is per-document Python, so its win is conditional
        on PRUNING: skewed contributions (Zipfian text, BM25 saturation,
        selective queries) let the threshold skip most windows and most
        chunk decodes.  On dense low-skew workloads (every candidate
        scores alike) nothing prunes and document-at-a-time degenerates
        to evaluating the full candidate union — measured 15-30 s vs
        <1 s vectorized TAAT on a 400k-doc uniform corpus.  The
        ``eval_budget`` guard (default ``max(4096, 64k)``) detects that
        regime early — many evaluations, (almost) no skips — and
        returns None so callers rerun on the warm vectorized path; the
        wasted work is bounded by the budget."""
        if eval_budget is None:
            eval_budget = max(4096, 64 * k)
        # k in the key for the same reason as the warm path: the abort
        # condition (eval budget = max(4096, 64k) vs skip ratio) is
        # k-dependent
        memo_key = ("cold", scorer, k, tuple(sorted(set(stems))), lo, hi)
        if memo_key in self._bmw_abort_cache:
            self._bmw_abort_cache.move_to_end(memo_key)
            return None  # known non-pruning workload: caller -> TAAT
        lazies = []
        for s in dict.fromkeys(stems):
            lz = self.store.postings_meta(s)
            if lz is None:
                if self.store.term_stat(s) is not None:
                    return None  # legacy segment files: no chunk metadata
                continue  # term absent from the index
            lazies.append(lz)
        # duplicate query stems double-count in the reference formula —
        # weight each unique term's contribs by its multiplicity
        mult = {}
        for s in stems:
            mult[s] = mult.get(s, 0) + 1
        w_tfidf = self.cfg.tfidf_weight
        w_pr = self.cfg.pagerank_weight
        static_ub = w_pr * self.max_pagerank
        pr_sidecar = self._pr

        def pr_of(doc_id: int) -> float:
            if pr_sidecar is None:
                return 0.0
            return pr_sidecar.get_one(doc_id)

        # flatten to chunk units; a doc-id range [lo, hi) drops
        # out-of-range chunks by METADATA alone and eagerly
        # decodes+slices only the (few) chunks straddling a boundary —
        # everything else keeps the lazy representation
        hi_eff = (1 << 62) if hi is None else hi
        u_ltp: list = []  # owning LazyTermPostings
        u_chunk: list[int] = []
        u_mult: list[float] = []
        u_min: list[int] = []
        u_max: list[int] = []
        u_ub_raw: list[float] = []
        predec: list[tuple | None] = []
        for lz in lazies:
            m = float(mult[lz.term])
            for ci, ch in enumerate(lz.chunks):
                if ch.max_doc < lo or ch.min_doc >= hi_eff:
                    continue  # fully outside: dropped without decode
                if ch.min_doc >= lo and ch.max_doc < hi_eff:
                    u_ltp.append(lz)
                    u_chunk.append(ci)
                    u_mult.append(m)
                    u_min.append(ch.min_doc)
                    u_max.append(ch.max_doc)
                    u_ub_raw.append(
                        m * self._chunk_ub(scorer, lz.idf, ch.max_tf)
                    )
                    predec.append(None)
                    continue
                # boundary chunk: decode now, slice to the range (a
                # lazily-clamped cursor would fully evaluate phantom
                # docs at `lo` that carry no postings)
                ids, tfs = lz.decode(ci)
                i0 = int(np.searchsorted(ids, lo, side="left"))
                i1 = int(np.searchsorted(ids, hi_eff, side="left"))
                if i1 <= i0:
                    continue
                ids, tfs = ids[i0:i1], tfs[i0:i1]
                contribs = m * self._chunk_contribs(scorer, lz.idf, ids, tfs)
                last, mx = _block_meta(ids, contribs)
                u_ltp.append(lz)
                u_chunk.append(ci)
                u_mult.append(m)
                u_min.append(int(ids[0]))
                u_max.append(int(ids[-1]))
                u_ub_raw.append(float(mx.max()) if mx.size else 0.0)
                predec.append((ids, contribs, last, mx))
        n = len(u_ltp)
        if n == 0:
            return []
        u_ub = [w_tfidf * u for u in u_ub_raw]
        # per-unit state: None = undecoded (cursor at min_doc),
        # (ids, contribs, blk_last, blk_max) once decoded; -1 pos marks
        # exhausted-without-decode
        dec: list[tuple | None] = list(predec)
        pos = [0] * n
        exhausted = [False] * n
        evals = 0
        skips = 0
        # cursor docs maintained as an int64 array so the per-iteration
        # unit ordering is one C argsort, not n Python key calls (round
        # 5: the Python sort made skip-heavy 1M-doc queries pay seconds
        # BEFORE any guard could see an eval)
        cur = np.empty(n, dtype=np.int64)

        def sync(u: int) -> None:
            if exhausted[u]:
                cur[u] = _MAX_DOC
                return
            d = dec[u]
            if d is None:
                cur[u] = u_min[u]
            elif pos[u] < len(d[0]):
                cur[u] = int(d[0][pos[u]])
            else:
                exhausted[u] = True
                cur[u] = _MAX_DOC

        def decode_unit(u: int) -> None:
            lz, ci = u_ltp[u], u_chunk[u]
            ids, tfs = lz.decode(ci)
            contribs = u_mult[u] * self._chunk_contribs(
                scorer, lz.idf, ids, tfs
            )
            last, mx = _block_meta(ids, contribs)
            dec[u] = (ids, contribs, last, mx)

        def cur_doc(u: int) -> int:
            return int(cur[u])

        def advance(u: int, target: int) -> None:
            """Move unit ``u``'s cursor to the first posting >= target.
            Undecoded units advance in metadata space: past max_doc they
            exhaust WITHOUT ever decoding (the IO win); inside the range
            they decode first."""
            if exhausted[u]:
                return
            d = dec[u]
            if d is None:
                if target > u_max[u]:
                    exhausted[u] = True
                elif target > u_min[u]:
                    decode_unit(u)
                    d = dec[u]
                    pos[u] = int(np.searchsorted(d[0], target, side="left"))
                    if pos[u] >= len(d[0]):
                        exhausted[u] = True
                sync(u)
                return
            pos[u] = int(np.searchsorted(d[0], target, side="left"))
            if pos[u] >= len(d[0]):
                exhausted[u] = True
            sync(u)

        for u in range(n):
            sync(u)
        heap: list[tuple[float, int]] = []
        threshold = -np.inf
        iters = 0
        while True:
            # total-WORK guard (round 5): every loop turn costs ~(argsort
            # n + pivot scan), so iters*(64+n) models the spend; a query
            # that has not produced its top-k within the budget is slower
            # than vectorized TAAT no matter how its skip ratio looks —
            # the eval-ratio guard below cannot see skip-heavy loops.
            iters += 1
            if iters * (64 + n) > _COLD_WORK_BUDGET:
                self._bmw_abort_cache[memo_key] = True
                if len(self._bmw_abort_cache) > self._bmw_abort_cache_max:
                    self._bmw_abort_cache.popitem(last=False)
                self.cold_stats = {
                    "chunks_total": n,
                    "chunks_decoded": sum(1 for d in dec if d is not None),
                    "evals": evals,
                    "block_skips": skips,
                    "aborted": True,
                }
                return None
            order = np.argsort(cur, kind="stable")
            if cur_doc(order[0]) == _MAX_DOC:
                break
            acc = static_ub
            pivot_idx = None
            for j, u in enumerate(order):
                if cur_doc(u) == _MAX_DOC:
                    break
                acc += u_ub[u]
                if acc > threshold:
                    pivot_idx = j
                    break
            if pivot_idx is None:
                break
            pivot_doc = cur_doc(order[pivot_idx])
            if pivot_doc == _MAX_DOC:
                break
            # block refinement: undecoded units are one whole-chunk
            # block; decoded units use their 64-posting tables
            block_acc = 0.0
            d_limit = _MAX_DOC
            for j in range(pivot_idx + 1):
                u = order[j]
                d = dec[u]
                if d is None:
                    block_acc += u_ub_raw[u]
                    d_limit = min(d_limit, u_max[u])
                else:
                    q = int(np.searchsorted(d[0], pivot_doc, side="left"))
                    if q < len(d[0]):
                        b = q // _BMW_BLOCK
                        block_acc += float(d[3][b])
                        d_limit = min(d_limit, int(d[2][b]))
            nxt = (
                cur_doc(order[pivot_idx + 1])
                if pivot_idx + 1 < n
                else _MAX_DOC
            )
            d_limit = min(d_limit, nxt - 1)
            if (
                d_limit >= pivot_doc
                and self._pr_window_ub(pivot_doc, d_limit)
                + w_tfidf * block_acc
                <= threshold
            ):
                target = d_limit + 1
                for j in range(pivot_idx + 1):
                    u = order[j]
                    if cur_doc(u) < target:
                        advance(u, target)
                skips += 1
                continue
            if cur_doc(order[0]) == pivot_doc:
                evals += 1
                if evals >= eval_budget and (
                    skips * 16 < evals or evals >= 8 * eval_budget
                ):
                    # Bail out to the warm vectorized path: either the
                    # non-pruning REGIME (skip ratio < 1/16 at the
                    # budget) or — round 5 — the absolute WORK bound
                    # (8x budget).  The ratio test alone let a
                    # mediocre-pruning query on a 1M-doc index run
                    # ~100k+ per-doc Python evals (measured p95 8.1 s)
                    # because skips stayed just above 1/16; pruning
                    # that has not produced a top-k by 8x budget is
                    # slower than TAAT regardless of the ratio.
                    self._bmw_abort_cache[memo_key] = True
                    if len(self._bmw_abort_cache) > self._bmw_abort_cache_max:
                        self._bmw_abort_cache.popitem(last=False)
                    self.cold_stats = {
                        "chunks_total": n,
                        "chunks_decoded": sum(
                            1 for d in dec if d is not None
                        ),
                        "evals": evals,
                        "block_skips": skips,
                        "aborted": True,
                    }
                    return None
                score = 0.0
                for u in range(n):
                    if cur_doc(u) != pivot_doc:
                        continue
                    if dec[u] is None:
                        decode_unit(u)
                        pos[u] = int(
                            np.searchsorted(
                                dec[u][0], pivot_doc, side="left"
                            )
                        )
                    d = dec[u]
                    p = pos[u]
                    if p < len(d[0]) and int(d[0][p]) == pivot_doc:
                        score += d[1][p]
                        pos[u] += 1
                        if pos[u] >= len(d[0]):
                            exhausted[u] = True
                    sync(u)
                score = w_tfidf * score + w_pr * pr_of(pivot_doc)
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                    if len(heap) == k:
                        threshold = heap[0][0] - 1e-12
                else:
                    if item > heap[0]:
                        heapq.heapreplace(heap, item)
                        threshold = heap[0][0] - 1e-12
            else:
                for j in range(pivot_idx):
                    u = order[j]
                    advance(u, pivot_doc)
        self.cold_stats = {
            "chunks_total": n,
            "chunks_decoded": sum(1 for d in dec if d is not None),
            "evals": evals,
            "block_skips": skips,
        }
        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [(-d, float(s)) for s, d in out]

    # ------------------------------------------------------------------
    # BM25 scorer (north-star ranking mode; k1=1.2, b=0.75)
    # ------------------------------------------------------------------

    def _doclen_sidecar(self):
        if self._doclen is None:
            self._doclen = open_sidecar(
                os.path.join(self.index_dir, "doclen"), "dl"
            )
            if self._doclen is None:
                raise FileNotFoundError(
                    f"no doclen sidecar under {self.index_dir}/doclen: "
                    "BM25 requires an index built with the "
                    "partitioned-write strategy (round 2+)"
                )
        return self._doclen

    def _bm25_contribs(self, tp) -> np.ndarray:
        """Per-posting BM25 contribution aligned with ``tp.doc_ids``:
        ``idf · (c·(k1+1)) / (c + k1·(1 − b + b·dl/avgdl))`` with the raw
        count recovered exactly as ``rint(tf · dl)`` (tf was stored as
        fl(c/dl); the product is within 1 ulp of the integer c).
        Computed once per term per engine, cached — the index is
        immutable."""
        cached = self._bm25_cache.get(tp.term)
        if cached is not None:
            self._bm25_cache.move_to_end(tp.term)
            return cached
        dl_sc = self._doclen_sidecar()
        avgdl = dl_sc.avg
        dl = dl_sc.get(tp.doc_ids, default=0.0)
        # dl == 0 marks a doc whose tf was stored UNNORMALIZED (the
        # tokenize zero-division guard: no valid stems) — tf IS the raw
        # count there, so recover c from tf directly instead of the
        # rint(tf·dl) product (which would zero the contribution while
        # the reference formula scores it)
        c = np.where(dl > 0, np.rint(tp.tfs * dl), np.rint(tp.tfs))
        k1, b = self.bm25_k1, self.bm25_b
        denom = c + k1 * (1.0 - b + b * dl / (avgdl if avgdl > 0 else 1.0))
        contrib = tp.idf * ((c * (k1 + 1.0)) / denom)
        self._bm25_cache[tp.term] = contrib
        if len(self._bm25_cache) > self._bm25_cache_max:
            self._bm25_cache.popitem(last=False)
        return contrib

    def bm25_topk(
        self, query: str, k: int = 10, mode: str = "auto"
    ) -> list[tuple[int, float]]:
        """Top-k for a plain free-text query under BM25 (k1/b from the
        constructor), blended with PageRank by the same cfg weights as
        the tf·idf scorer.  ``mode``: "auto" = vectorized term-at-a-time,
        "wand" = plain WAND with per-term BM25 upper bounds, "bmw" =
        block-max WAND, "bmw_cold" = chunk-lazy BMW over persisted chunk
        metadata (falls back to "auto" on legacy indexes / non-pruning
        workloads) — all rank-identical by test.  Boolean / phrase
        operators are the reference's tf·idf semantics (§2.9) and are
        not redefined here — use ``search_topk`` for those."""
        if mode not in ("auto", "wand", "bmw", "bmw_cold"):
            raise ValueError(f"unknown mode {mode!r}")
        q = (query or "").strip()
        if not q:
            return []
        if detect_operator(q) or is_quoted(q):
            raise ValueError(
                "bm25_topk scores plain free-text queries; boolean/phrase "
                "queries keep the reference tf·idf semantics "
                "(search_topk)"
            )
        stems, _ = tokenize_and_stem(q)
        if mode == "bmw_cold":
            cold = self._topk_cold(stems, k, scorer="bm25")
            if cold is not None:
                return cold
            mode = "auto"  # legacy files / non-pruning workload: vectorized
        self.store.postings_many(stems)
        terms = []
        for s in stems:
            tp = self.store.postings(s)
            if tp is not None:
                terms.append(tp)
        if not terms:
            return []
        ids_list = [t.doc_ids for t in terms]
        contribs = [self._bm25_contribs(t) for t in terms]
        if mode == "wand":
            ubs = [
                self.cfg.tfidf_weight * (float(c.max()) if c.size else 0.0)
                for c in contribs
            ]
            key = ("wand_bm25", k, tuple(sorted(t.term for t in terms)))
            if key in self._bmw_abort_cache:
                self._bmw_abort_cache.move_to_end(key)
                return self._taat_arrays(ids_list, contribs, k)
            res = self._wand_arrays(ids_list, contribs, ubs, k)
            if self.wand_stats.get("aborted"):
                self._bmw_abort_cache[key] = True
                if len(self._bmw_abort_cache) > self._bmw_abort_cache_max:
                    self._bmw_abort_cache.popitem(last=False)
            return res
        if mode == "bmw":
            return self._bmw(terms, k, scorer="bm25")
        return self._taat_arrays(ids_list, contribs, k)

    # ------------------------------------------------------------------
    # scatter-gather: doc-range-restricted top-k (service.py)
    # ------------------------------------------------------------------

    def search_topk_range(
        self,
        query: str,
        k: int = 10,
        lo: int = 0,
        hi: int = 1 << 62,  # == _MAX_DOC (defined below this method)
        mode: str = "auto",
        scorer: str = "tfidf",
    ) -> list[tuple[int, float]]:
        """Top-k restricted to doc ids in ``[lo, hi)`` — the per-shard
        half of scatter-gather serving (``SearchService.search_topk_
        scatter``): W actors each score one doc-id range of the SAME
        query in parallel and the caller merges the W top-k lists.

        Exact by construction: a doc's score depends only on its own
        postings plus global constants (idf, avgdl, pagerank), so
        partitioning the doc space partitions the candidates, never the
        scores, and every global top-k doc is in its range's top-k.
        Posting lists are doc_id-sorted, so the restriction is two
        searchsorted cuts per term — no decode beyond the slice ever
        happens on the TAAT path, and WAND's block-max pruning applies
        within the slice.  Boolean and phrase queries scatter too
        (round 4): phrase candidacy (all-stems membership + that doc's
        own positions) and boolean membership (set ops distribute over
        the range partition) are per-doc properties, so each range actor
        computes its slice of the match set — including the position
        walk — independently and exactly.  Those carry the reference
        tfidf-blend semantics only (``scorer="bm25"`` raises, matching
        ``search_topk``)."""
        q = (query or "").strip()
        if mode not in ("auto", "wand", "bmw", "bmw_cold"):
            raise ValueError(f"unknown mode {mode!r}")
        operator = detect_operator(q)
        if operator or is_quoted(q):
            if scorer != "tfidf":
                raise ValueError(
                    "boolean/phrase queries carry the reference tfidf-blend "
                    f"semantics; scorer {scorer!r} applies to plain queries"
                )
            if operator:
                parts = split_query(q)
                if len(parts) == 2:
                    return self._bool_topk(
                        operator,
                        parts[0].strip(),
                        parts[1].strip(),
                        k,
                        lo=lo,
                        hi=hi,
                    )
                # malformed boolean falls through to the plain path,
                # mirroring search_topk
            else:
                return self._phrase_topk(q, k, lo=lo, hi=hi)
        stems, _ = tokenize_and_stem(q)
        if mode == "bmw_cold":
            if scorer not in ("tfidf", "bm25"):
                raise ValueError(f"unknown scorer {scorer!r}")
            cold = self._topk_cold(stems, k, scorer=scorer, lo=lo, hi=hi)
            if cold is not None:
                return cold
            mode = "auto"  # legacy files / non-pruning workload: vectorized
        self.store.postings_many(stems)
        terms = []
        for s in stems:
            tp = self.store.postings(s)
            if tp is not None:
                terms.append(tp)
        if not terms:
            return []
        if scorer == "bm25":
            contribs = [self._bm25_contribs(t) for t in terms]
        elif scorer == "tfidf":
            contribs = [t.tfs * t.idf for t in terms]
        else:
            raise ValueError(f"unknown scorer {scorer!r}")
        ids_list = []
        cut = []
        for t, c in zip(terms, contribs):
            i0 = int(np.searchsorted(t.doc_ids, lo, side="left"))
            i1 = int(np.searchsorted(t.doc_ids, hi, side="left"))
            ids_list.append(t.doc_ids[i0:i1])
            cut.append(c[i0:i1])
        if mode in ("wand", "bmw"):
            ubs = [
                self.cfg.tfidf_weight * (float(c.max()) if c.size else 0.0)
                for c in cut
            ]
            if mode == "bmw":
                # slices get fresh block tables (cheap: one reshape-max
                # over the cut arrays; cache keys are whole-list only)
                metas = [_block_meta(i, c) for i, c in zip(ids_list, cut)]
                if not self._bmw_prunable(cut, ubs, metas, k):
                    return self._taat_arrays(ids_list, cut, k)
                res = self._bmw_arrays(ids_list, cut, ubs, k, metas=metas)
                if res is None:  # eval-budget bail-out
                    return self._taat_arrays(ids_list, cut, k)
                return res
            return self._wand_arrays(ids_list, cut, ubs, k)
        return self._taat_arrays(ids_list, cut, k)

    # ------------------------------------------------------------------
    # serving (BackendManager.search analog)
    # ------------------------------------------------------------------

    def _doc_meta(self, doc_ids: list[int]) -> dict[int, tuple[str, str, str]]:
        """Point lookups against the doc_id-sorted docs parquet: the
        ``isin`` filter prunes row groups via statistics (docs are
        written in doc_id-sorted 2048-row groups), so a page of results
        decodes a handful of row groups — never the whole corpus
        (round-1's ``_docs`` dict held every document in the serving
        process).  Fetched rows live in a bounded LRU.

        Key-dup rows share a doc_id; the winner is the min-sha row (the
        same deterministic rule the build's drop table applies)."""
        import pyarrow.dataset as pads

        if self._docs_dataset is None:
            self._docs_dataset = pads.dataset(
                os.path.join(self.index_dir, "docs")
            )
        missing = [d for d in doc_ids if d not in self._doc_cache]
        if missing:
            tbl = self._docs_dataset.to_table(
                filter=pads.field("doc_id").isin(missing),
                columns=["doc_id", "url", "title", "content", "content_sha256"],
            )
            best: dict[int, tuple[str, tuple[str, str, str]]] = {}
            for d, u, t, c, s in zip(
                tbl["doc_id"].to_pylist(),
                tbl["url"].to_pylist(),
                tbl["title"].to_pylist(),
                tbl["content"].to_pylist(),
                tbl["content_sha256"].to_pylist(),
            ):
                prev = best.get(d)
                if prev is None or s < prev[0]:
                    best[d] = (s, (u, t, c))
            for d, (_s, row) in best.items():
                self._doc_cache[d] = row
                self._doc_cache.move_to_end(d)
            while len(self._doc_cache) > self._doc_cache_max:
                self._doc_cache.popitem(last=False)
        return {d: self._doc_cache.get(d, ("", "", "")) for d in doc_ids}

    def search(self, query: str, page: int = 0, size: int = 10) -> dict:
        """Full serving flow (``BackendManager.java:278-406``): query ->
        rank -> paginate -> metadata fetch in rank order -> snippets."""
        if self.query_log is not None:
            self.query_log.record(query)
        result = self.query(query)
        documents = result.documents
        total_count = len(documents)
        if not documents:
            return {"results": [], "total_count": 0}
        ranked = self.rank(documents, result.query_words)
        start = page * size
        end = min(start + size, len(ranked))
        if start >= len(ranked):
            return {"results": [], "total_count": len(ranked)}
        page_ids = [doc_id for doc_id, _ in ranked[start:end]]
        docs_meta = self._doc_meta(page_ids)
        doc_data = {d.doc_id: d for d in documents}
        results = []
        query_words_set = set(result.query_words)
        for doc_id, score in ranked[start:end]:
            url, title, content = docs_meta.get(doc_id, ("", "", ""))
            snippet = generate_snippet(
                content, doc_data[doc_id].word_info, query_words_set
            )
            results.append(
                {
                    "doc_id": doc_id,
                    "url": url,
                    "title": title,
                    "score": score,
                    "snippet": snippet,
                }
            )
        return {"results": results, "total_count": len(ranked)}

    def total_hits(self, query: str) -> int:
        """COUNT(DISTINCT doc_id) over the query stems' postings — the A6
        analog (``BackendManager.java:96-119``; dead code in the reference
        serving path, which uses documents.size(), but part of the
        operator surface)."""
        stems, _ = tokenize_and_stem(query or "")
        ids = [
            tp.doc_ids
            for tp in (self.store.postings(s) for s in stems)
            if tp is not None
        ]
        if not ids:
            return 0
        return int(np.unique(np.concatenate(ids)).size)

    # ------------------------------------------------------------------
    # suggestions (BackendManager.java:408-446, K3)
    # ------------------------------------------------------------------

    def suggest(
        self, query: str, limit: int = 5, parts: list[int] | None = None
    ) -> list[str]:
        if query is None or not query.strip():
            return []
        term = query.strip().lower()
        # O(log V + matches) bisect over the sorted vocabulary (round 1
        # linearly scanned every term per call); ``parts`` restricts to
        # a term-partition slice for scatter serving (service.py)
        matches = self.store.prefix_terms(term, parts=parts)

        def rank_key(w: str):
            if w == term:
                c = 1
            elif w.startswith(term + " "):
                c = 2  # kept for parity; indexed terms never contain spaces
            else:
                c = 3
            return (c, w)

        matches.sort(key=rank_key)
        return matches[:limit]


_MAX_DOC = 1 << 62

# _topk_cold total-work budget in unit-steps (~iters * (64 + n)): caps
# the wall time a skip-heavy-but-not-winning cold query can burn before
# falling back to vectorized TAAT (~0.1-0.3 s at the C-argsort loop cost)
_COLD_WORK_BUDGET = 10_000_000

# candidate docs per phrase-walk slab: bounds every temporary array to
# ~slab × positions-per-doc values, so walking a hot term never allocates
# corpus-sized buffers (large first-touch allocations stall hard on
# overcommitted VMs, and at index scale the full flat array may not fit)
_PHRASE_SLAB = 4096


def _phrase_pair_match(
    f1: np.ndarray,
    o1: np.ndarray,
    f2: np.ndarray,
    o2: np.ndarray,
    max_gap: int,
) -> np.ndarray:
    """Local candidate indices with an in-gap (a, b) occurrence pair —
    the two-word phrase predicate "exists a in p1, b in p2 with
    a < b <= a+gap", fully vectorized across candidates.

    Positions are word offsets < 2^32, so candidate_rank * 2^32 windows
    every candidate into ONE globally sorted array per stem — a single
    searchsorted replaces the per-candidate loop, and a cross-candidate
    neighbor can never satisfy <= +gap (window bases differ by >= 2^32).
    The probe runs from the SMALLER side (cost ∝ probes); +gap on both
    windows keeps the b-side's p2-gap probe from underflowing uint64."""
    n = len(o1) - 1
    base = np.uint64(1) << np.uint64(32)
    gap = np.uint64(max_gap)
    r1 = np.repeat(np.arange(n, dtype=np.uint64), np.diff(o1))
    r2 = np.repeat(np.arange(n, dtype=np.uint64), np.diff(o2))
    p1 = f1 + r1 * base + gap
    p2 = f2 + r2 * base + gap
    if p1.size <= p2.size:
        nxt = np.searchsorted(p2, p1, side="right")
        hit = np.zeros(p1.size, dtype=bool)
        valid = nxt < p2.size
        if p1.size:
            hit[valid] = p2[nxt[valid]] <= p1[valid] + gap
        return np.unique(r1[hit]).astype(np.int64)
    prev = np.searchsorted(p1, p2 - gap, side="left")
    hit = np.zeros(p2.size, dtype=bool)
    valid = prev < p1.size
    if p2.size:
        hit[valid] = p1[prev[valid]] < p2[valid]
    return np.unique(r2[hit]).astype(np.int64)


def _phrase_walk_vectorized(
    flats: list[tuple[np.ndarray, np.ndarray]], max_gap: int
) -> np.ndarray:
    """Local candidate indices passing the full sequential walk — the
    exact ``checkSequentialPositions`` semantics (incl. the in-range
    slide quirk) vectorized across every start position of every
    candidate at once.  Golden-tested equal to
    ``_check_sequential_positions``.

    Model: per word, the scan's cursor behavior is (1) ENTER at the first
    position > cursor, required <= cursor+gap (non-strict), then
    (2) SLIDE along consecutive positions while each is STRICTLY within
    gap of the previously accepted one; sorted positions mean the slide
    is exactly the maximal strict-delta chain from the entry index, so a
    precomputed per-run chain-end array answers it in O(1).  Candidate
    windows (rank * 2^32, positions < 2^32) make all of word wi's
    positions ONE sorted array, so each word costs a single searchsorted
    over every surviving start simultaneously; a cursor can never slide
    or enter across windows (bases differ by 2^32 > gap)."""
    base = np.uint64(1) << np.uint64(32)
    gap = np.uint64(max_gap)
    windowed: list[np.ndarray] = []
    ranks0: np.ndarray | None = None
    for wi, (f, o) in enumerate(flats):
        r = np.repeat(
            np.arange(len(o) - 1, dtype=np.uint64), np.diff(o)
        )
        if wi == 0:
            ranks0 = r
        windowed.append(f + r * base)
    cur = windowed[0]
    ok = np.ones(cur.size, dtype=bool)
    for q in windowed[1:]:
        if q.size == 0 or not ok.any():
            return np.empty(0, dtype=np.int64)
        # chain ends: runs split where the strict-slide delta fails
        run_id = np.zeros(q.size, dtype=np.int64)
        np.cumsum(q[1:] >= q[:-1] + gap, out=run_id[1:])
        chain_end = np.searchsorted(run_id, run_id, side="right") - 1
        j = np.searchsorted(q, cur, side="right")
        valid = j < q.size
        jc = np.minimum(j, q.size - 1)
        ok &= valid & (q[jc] <= cur + gap)
        cur = q[chain_end[jc]]
    return np.unique(ranks0[ok]).astype(np.int64)


def _check_sequential_positions(
    pos_lists: list[np.ndarray], max_gap: int
) -> bool:
    """Exact port of ``QueryIndex.checkSequentialPositions`` semantics
    (``QueryIndex.java:341-395``), including the in-range slide where
    ``currentPos`` keeps moving to later positions while they stay within
    ``currentPos + MAX_GAP`` of the *updated* cursor."""
    n_words = len(pos_lists)
    first_positions = pos_lists[0]
    for start_pos in first_positions.tolist():
        valid = True
        current = start_pos
        for wi in range(1, n_words):
            found = False
            for p in pos_lists[wi].tolist():
                if p > current and p <= current + max_gap:
                    if not found or p < current + max_gap:
                        current = p
                        found = True
            if not found:
                valid = False
                break
        if valid:
            return True
    return False
