"""Query-log writer — the write side of the reference's
``search_queries`` table (read at ``DataBaseManager.java:19-34``; the
reference ships no writer, so this completes the loop the reference
implies: searches land in the log, suggestions aggregate from it).

Design is append-only, not upsert: each serving actor appends
``(query, ts)`` rows to its OWN parquet part files (uuid names, tmp +
rename) with no cross-actor coordination — the distributed-friendly
shape of the reference's ``count``/``lastAdded`` upsert row.  Counts
and last-seen derive at read time via the same aggregation that feeds
suggestions (``suggestions.aggregate_query_log``), so N serving actors
scale writes linearly and the 12-hour recency filter applies at read
time exactly as the reference applies it.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

QUERY_LOG_SCHEMA = pa.schema(
    [
        ("query", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


class QueryLogWriter:
    """Buffered appender: ``record()`` per search, one parquet part file
    per ``flush_every`` records (or explicit ``flush()``/``close()``).
    One instance per serving actor; part files never conflict."""

    def __init__(self, log_dir: str, flush_every: int = 256):
        self.log_dir = log_dir
        self.flush_every = flush_every
        self._buf: list[tuple[str, datetime]] = []
        os.makedirs(log_dir, exist_ok=True)

    def record(self, query: str, ts: datetime | None = None) -> None:
        q = query.strip().lower()
        if not q:
            return
        self._buf.append((q, ts or datetime.now(timezone.utc)))
        if len(self._buf) >= self.flush_every:
            self.flush()

    def flush(self) -> str | None:
        if not self._buf:
            return None
        tbl = pa.table(
            {
                "query": [q for q, _ in self._buf],
                "ts": pa.array([t for _, t in self._buf], pa.timestamp("us")),
            },
            schema=QUERY_LOG_SCHEMA,
        )
        path = os.path.join(self.log_dir, f"{uuid.uuid4().hex[:16]}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        self._buf.clear()
        return path

    close = flush

    def __enter__(self) -> "QueryLogWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.flush()


def read_query_log(log_dir: str):
    """The written log as a Ray Dataset (query, ts) — feed it to
    ``suggestions.aggregate_query_log`` for the (query, n) counts /
    ``trie_from_counts`` for the serving Trie."""
    import ray.data as rd

    return rd.read_parquet(log_dir)


def query_counts(log_dir: str, hours: float = 12.0) -> list[tuple[str, int]]:
    """(query, count) within the recency window, count-desc then query —
    the materialized equivalent of the reference's ``GetALLQueries``
    (``DataBaseManager.java:19-34``) over the appended log.  Local
    parquet read + Arrow aggregation: the log is serving-side small; the
    distributed form is ``aggregate_query_log(read_query_log(...))``."""
    import pyarrow.compute as pc

    files = [
        os.path.join(log_dir, f)
        for f in sorted(os.listdir(log_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return []
    t = pq.read_table(files, columns=["query", "ts"])
    if t.num_rows == 0:
        return []
    cutoff = pc.subtract(
        pc.max(t["ts"]), pa.scalar(int(hours * 3_600_000_000), pa.duration("us"))
    )
    t = t.filter(pc.greater_equal(t["ts"], cutoff))
    agg = t.group_by("query").aggregate([("query", "count")])
    rows = sorted(
        zip(agg["query"].to_pylist(), agg["query_count"].to_pylist()),
        key=lambda r: (-r[1], r[0]),
    )
    return [(q, int(n)) for q, n in rows]
