"""Actor-pool query serving (SURVEY.md §2.3 T8, §3.3 rebuild lifecycle c).

``SearchService`` holds a pool of Ray actors, each loading the segment
store + term stats + pagerank ONCE in its constructor (the "stateful
stage = actor pool" rule), and round-robins queries across them.  Actors
cache partition tables and decoded postings independently, so throughput
scales with the pool while a single query's latency stays that of one
engine.

This is the serving topology for a real cluster: co-locate actors with
segment storage, route by query hash for cache affinity (``affinity=True``
routes repeat queries to the same actor so its LRU query cache — T3 —
hits).
"""

from __future__ import annotations

import ray


@ray.remote
class _EngineActor:
    def __init__(self, index_dir: str, query_log_dir: str | None = None):
        from .engine import QueryEngine

        self.engine = QueryEngine(index_dir, query_log_dir=query_log_dir)

    def search(self, query: str, page: int, size: int) -> dict:
        return self.engine.search(query, page=page, size=size)

    def search_topk(self, query: str, k: int, mode: str) -> list:
        return self.engine.search_topk(query, k, mode=mode)

    def search_topk_range(
        self, query: str, k: int, lo: int, hi: int, mode: str, scorer: str
    ) -> list:
        return self.engine.search_topk_range(
            query, k, lo=lo, hi=hi, mode=mode, scorer=scorer
        )

    def suggest(self, query: str, limit: int) -> list:
        return self.engine.suggest(query, limit)

    def suggest_parts(self, query: str, limit: int, parts: list[int]) -> list:
        return self.engine.suggest(query, limit, parts=parts)

    def correction_best(self, query: str, parts: list[int]) -> dict:
        return self.engine.correction_best(query, parts=parts)

    def warm_correction(self, parts: list[int]) -> int:
        """Build this actor's FastSS slice off the serving path; returns
        the slice vocab size."""
        vocab, _ = self.engine._correction_index(parts)
        return len(vocab)

    def total_hits(self, query: str) -> int:
        return self.engine.total_hits(query)

    def flush_query_log(self) -> None:
        if self.engine.query_log is not None:
            self.engine.query_log.flush()


class SearchService:
    def __init__(
        self,
        index_dir: str,
        num_actors: int = 2,
        affinity: bool = True,
        query_log_dir: str | None = None,
    ):
        # each actor appends to its own part files (query_log.py), so one
        # shared log_dir needs no cross-actor coordination
        self.index_dir = index_dir
        self.actors = [
            _EngineActor.remote(index_dir, query_log_dir)
            for _ in range(num_actors)
        ]
        self.affinity = affinity
        self._rr = 0
        self._part_slices: list[list[int]] | None = None

    def _pick(self, query: str):
        if self.affinity:
            # stable routing -> per-actor query-cache (T3) hits
            import hashlib

            h = int.from_bytes(
                hashlib.sha256((query or "").strip().lower().encode()).digest()[:4],
                "little",
            )
            return self.actors[h % len(self.actors)]
        actor = self.actors[self._rr % len(self.actors)]
        self._rr += 1
        return actor

    def search(self, query: str, page: int = 0, size: int = 10) -> dict:
        return ray.get(self._pick(query).search.remote(query, page, size))

    def search_topk(self, query: str, k: int = 10, mode: str = "auto") -> list:
        return ray.get(self._pick(query).search_topk.remote(query, k, mode))

    def search_many(self, queries: list[str], k: int = 10) -> list[list]:
        """Pipelined fan-out: one in-flight call per actor slot."""
        refs = [
            self._pick(q).search_topk.remote(q, k, "auto") for q in queries
        ]
        return ray.get(refs)

    def _range_bounds(self) -> list[tuple[int, int]]:
        """One contiguous doc-id range per actor, split along the id
        partitions (doc_id = pid << 40 | rank, stages/doc_table.py), so
        every doc lands in exactly one range.  pid-aligned bounds are
        even enough for the fixture's hash-uniform pids; a skewed corpus
        would derive bounds from the docs parquet's per-pid footer
        counts instead (same O(P) metadata, no data read)."""
        from ..build import load_meta
        from ..config import DOC_ID_PARTITION_SHIFT, IndexConfig

        meta = load_meta(self.index_dir)
        n_pid = IndexConfig.from_dict(meta["config"]).num_id_partitions
        w = len(self.actors)
        edges = [round(i * n_pid / w) for i in range(w + 1)]
        return [
            (edges[i] << DOC_ID_PARTITION_SHIFT,
             edges[i + 1] << DOC_ID_PARTITION_SHIFT)
            for i in range(w)
            if edges[i] < edges[i + 1]
        ]

    def search_topk_scatter(
        self,
        query: str,
        k: int = 10,
        mode: str = "auto",
        scorer: str = "tfidf",
    ) -> list:
        """Scatter-gather top-k: every actor scores one doc-id range of
        the SAME query in parallel, the driver merges the per-range
        top-k lists under the global tie rule (score desc, doc_id asc).
        Exact — equal to the single-engine result by test — and the
        latency path for queries whose posting lists dwarf one core
        (10^12-doc hot terms): wall time is the slowest RANGE, not the
        whole list.  Serves plain, boolean AND/OR/NOT and quoted-phrase
        queries (round 4: candidacy and the position walk are per-doc,
        so each actor computes its range's match slice exactly — see
        ``QueryEngine.search_topk_range``); bm25 scoring applies to
        plain queries only."""
        refs = [
            a.search_topk_range.remote(query, k, lo, hi, mode, scorer)
            for a, (lo, hi) in zip(self.actors, self._range_bounds())
        ]
        merged = [t for part in ray.get(refs) for t in part]
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def suggest(self, query: str, limit: int = 5) -> list:
        return ray.get(self._pick(query).suggest.remote(query, limit))

    def _term_part_slices(self) -> list[list[int]]:
        """One disjoint term-partition slice per actor (vocab partitions
        by term hash) — the scatter unit for suggestions and the FastSS
        correction index, mirroring ``_range_bounds`` for doc ids."""
        if self._part_slices is None:
            from ..build import load_meta
            from ..config import IndexConfig

            meta = load_meta(self.index_dir)
            P = IndexConfig.from_dict(meta["config"]).num_term_partitions
            w = len(self.actors)
            edges = [round(i * P / w) for i in range(w + 1)]
            self._part_slices = [
                list(range(edges[i], edges[i + 1]))
                for i in range(w)
                if edges[i] < edges[i + 1]
            ]
        return self._part_slices

    def suggest_scatter(self, query: str, limit: int = 5) -> list:
        """Scatter-gather suggestions: each actor bisects ONLY its term-
        partition slice's sorted vocab and returns its per-slice
        top-``limit`` under the rank rule; the driver merge-sorts.
        Exact (slices are disjoint and the rank rule is per-term, so the
        global top-limit is contained in the union of per-slice
        top-limits); no actor ever holds the full vocabulary."""
        refs = [
            a.suggest_parts.remote(query, limit, parts)
            for a, parts in zip(self.actors, self._term_part_slices())
        ]
        merged = [w for part in ray.get(refs) for w in part]
        term = (query or "").strip().lower()
        merged.sort(
            key=lambda w: (
                1 if w == term else 2 if w.startswith(term + " ") else 3,
                w,
            )
        )
        return merged[:limit]

    def warm_corrections(self) -> list:
        """Kick the per-actor FastSS slice builds OFF the serving path
        (fire-and-forget refs; ``ray.get`` them to block until warm).
        Each actor holds only its slice — the build cost and memory
        shard across the pool instead of serializing in one actor on
        the first miss."""
        return [
            a.warm_correction.remote(parts)
            for a, parts in zip(self.actors, self._term_part_slices())
        ]

    def suggest_correction_scatter(self, query: str) -> dict:
        """Scatter-gather did-you-mean: every actor evaluates its vocab
        slice's edit-1 candidates (``QueryEngine.correction_best``), the
        driver takes the per-token MIN (-df, word) key across slices —
        exactly the single-engine answer (slices partition the vocab)."""
        refs = [
            a.correction_best.remote(query, parts)
            for a, parts in zip(self.actors, self._term_part_slices())
        ]
        best: dict[str, tuple[int, str]] = {}
        for part in ray.get(refs):
            for tok, key in part.items():
                key = tuple(key)
                if tok not in best or key < best[tok]:
                    best[tok] = key
        return {tok: key[1] for tok, key in best.items()}

    def total_hits(self, query: str) -> int:
        return ray.get(self._pick(query).total_hits.remote(query))

    def flush_query_log(self) -> None:
        ray.get([a.flush_query_log.remote() for a in self.actors])

    def shutdown(self) -> None:
        self.flush_query_log()
        for a in self.actors:
            ray.kill(a)
        self.actors = []
