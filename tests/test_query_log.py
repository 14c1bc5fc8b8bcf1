"""Query-log write side (the reference's ``search_queries`` table has a
reader, ``DataBaseManager.java:19-34``, but no writer — this closes the
loop): append-only per-actor part files, counts + 12h recency at read
time, feeding the suggestion Trie."""

from datetime import datetime, timedelta, timezone

import pytest

from seekr_ray.query.query_log import QueryLogWriter, query_counts

T0 = datetime(2026, 1, 2, 12, 0, 0, tzinfo=timezone.utc)


def test_writer_flush_and_counts(tmp_path):
    d = str(tmp_path)
    with QueryLogWriter(d, flush_every=2) as w:
        w.record("Parse Buffer", ts=T0)           # normalized to lower
        w.record("parse buffer", ts=T0)           # auto-flush at 2
        w.record("  ", ts=T0)                     # blank dropped
        w.record("token stream", ts=T0)
    # ctx-exit flushed the remainder
    counts = query_counts(d)
    assert counts == [("parse buffer", 2), ("token stream", 1)]


def test_recency_window_relative_to_max_ts(tmp_path):
    d = str(tmp_path)
    with QueryLogWriter(d) as w:
        w.record("old query", ts=T0 - timedelta(hours=13))
        w.record("new query", ts=T0)
    assert query_counts(d, hours=12.0) == [("new query", 1)]


def test_multiple_writers_no_conflict(tmp_path):
    d = str(tmp_path)
    w1, w2 = QueryLogWriter(d), QueryLogWriter(d)
    for _ in range(3):
        w1.record("alpha", ts=T0)
        w2.record("alpha", ts=T0)
    w1.flush()
    w2.flush()
    assert query_counts(d) == [("alpha", 6)]


def test_feeds_suggestion_trie(tmp_path):
    from seekr_ray.query.suggestions import Trie

    d = str(tmp_path)
    with QueryLogWriter(d) as w:
        for _ in range(5):
            w.record("parse buffer", ts=T0)
        w.record("parse tree", ts=T0)
    trie = Trie()
    for q, n in query_counts(d):
        trie.insert(q, n)
    assert trie.lookup("parse")[0] == "parse buffer"


def test_engine_records_searches(ray_session, tmp_path):
    """QueryEngine(query_log_dir=...) appends every search to the log."""
    import os

    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.config import IndexConfig
    from seekr_ray.fixtures import cached_corpus_path
    from seekr_ray.query.engine import QueryEngine

    d = "/tmp/seekr_test_index"
    if not os.path.exists(os.path.join(d, "meta.json")):
        build_index(
            rd.read_parquet(cached_corpus_path(120)),
            d,
            IndexConfig(
                num_term_partitions=4,
                num_id_partitions=4,
                hot_df_threshold=40,
                postings_per_chunk=16,
            ),
            key_cols=["repo", "path", "commit"],
        )
    log_dir = str(tmp_path / "qlog")
    eng = QueryEngine(d, query_log_dir=log_dir)
    eng.search("parse buffer")
    eng.search("parse buffer")
    eng.search("token")
    eng.query_log.flush()
    assert query_counts(log_dir) == [("parse buffer", 2), ("token", 1)]


def test_distributed_aggregation_matches(ray_session, tmp_path):
    from seekr_ray.query.query_log import read_query_log
    from seekr_ray.query.suggestions import aggregate_query_log

    d = str(tmp_path)
    with QueryLogWriter(d) as w:
        for _ in range(3):
            w.record("alpha", ts=T0)
        w.record("beta", ts=T0)
        w.record("stale", ts=T0 - timedelta(hours=20))
    rows = aggregate_query_log(read_query_log(d)).take_all()
    agg = {
        r["query"]: next(v for k, v in r.items() if k != "query")
        for r in rows
    }
    assert agg == {"alpha": 3, "beta": 1}
