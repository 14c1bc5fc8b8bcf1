"""Suggestion structures: query-log Trie with per-node top-10
(``Suggestions/Trie.java:6-73``, SURVEY.md §2.3 T6, §2.5 K4) and the
query-log aggregation feeding it (A7/S10 analogs).

The Trie is a driver/serving-side structure; its inputs come from a Ray
Data aggregation over the query log (``suggestions_from_query_log``).
Note the live reference endpoint actually serves the SQL LIKE ranking
(K3) — implemented as ``QueryEngine.suggest`` — and the Trie is the
intended-but-bypassed design; both are provided.
"""

from __future__ import annotations

_TOP_K = 10  # Trie.java:28-42 keeps the 10 most frequent per node


class _Node:
    __slots__ = ("children", "top")

    def __init__(self) -> None:
        self.children: dict[str, _Node] = {}
        self.top: list[tuple[str, int]] = []  # (word, freq) freq-desc


class Trie:
    def __init__(self) -> None:
        self.root = _Node()

    def insert(self, word: str, freq: int) -> None:
        node = self.root
        for ch in word:
            node = node.children.setdefault(ch, _Node())
            self._update_top(node, word, freq)

    @staticmethod
    def _update_top(node: _Node, word: str, freq: int) -> None:
        top = [t for t in node.top if t[0] != word]
        top.append((word, freq))
        # freq desc, insertion-stable; truncate at 10 (Trie.java:28-42)
        top.sort(key=lambda t: -t[1])
        node.top = top[:_TOP_K]

    def lookup(self, prefix: str) -> list[str]:
        node = self.root
        for ch in prefix:
            nxt = node.children.get(ch)
            if nxt is None:
                return []
            node = nxt
        return [w for w, _ in node.top]


def aggregate_query_log(queries_ds, hours: float = 12.0):
    """Query-log aggregation: keep rows within ``hours`` of the max
    timestamp (the batch analog of ``Duration > 12h`` vs now,
    ``DataBaseManager.java:20-35``), then count per query string (A7).

    ``queries_ds`` needs columns (query: string, ts: timestamp).
    Returns a Dataset (query, n).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    max_ts = queries_ds.max("ts")

    def recent(batch):
        cutoff = max_ts - __import__("datetime").timedelta(hours=hours)
        return batch.filter(pc.greater_equal(batch["ts"], pa.scalar(cutoff)))

    from ..bucket_agg import bucketed_group_agg

    recent_ds = queries_ds.map_batches(recent, batch_format="pyarrow")
    # distinct-query cardinality is open-ended (it is user input):
    # bucketed exchange, not Ray's per-group Python walk
    return bucketed_group_agg(recent_ds, "query", [("query", "count")])


def trie_from_counts(counts) -> Trie:
    """counts: iterable of (query, freq) -> populated Trie."""
    trie = Trie()
    for q, f in counts:
        trie.insert(q, int(f))
    return trie
