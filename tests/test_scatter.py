"""Scatter-gather serving: range-partitioned top-k == single engine.

Doc-range-restricted scoring is exact (scores depend only on a doc's
own postings plus global constants), so the W-way scatter must return
the SAME (doc_id, score) list as one engine scoring the whole corpus —
for every query, scorer, mode and actor count, including W larger than
the id-partition count (empty ranges drop out).
"""

import os

import numpy as np
import pytest

from seekr_ray.query.engine import QueryEngine


@pytest.fixture(scope="module")
def index_dir(ray_session):
    d = "/tmp/seekr_test_index"
    if not os.path.exists(os.path.join(d, "meta.json")):
        import ray.data as rd

        from seekr_ray.build import build_index
        from seekr_ray.config import IndexConfig
        from seekr_ray.fixtures import cached_corpus_path

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
    return d


PLAIN_QUERIES = [
    "parse",
    "parse buffer index",
    "hotspot",  # hot term: every range holds candidates
    "travel traveling traveler",
    "nosuchtermanywhere",
]


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize("mode", ["auto", "wand", "bmw", "bmw_cold"])
def test_range_union_covers_engine(index_dir, scorer, mode):
    """Engine-level: per-range results over a manual 4-way split merge
    to exactly the single-engine top-k."""
    from seekr_ray.config import DOC_ID_PARTITION_SHIFT

    e = QueryEngine(index_dir)
    edges = [p << DOC_ID_PARTITION_SHIFT for p in range(5)]
    for q in PLAIN_QUERIES:
        if scorer == "bm25":
            want = e.bm25_topk(q, k=10, mode=mode)
        else:
            want = e.search_topk(q, k=10, mode=mode)
        parts = []
        for lo, hi in zip(edges, edges[1:]):
            parts.extend(
                e.search_topk_range(q, k=10, lo=lo, hi=hi, mode=mode, scorer=scorer)
            )
        parts.sort(key=lambda t: (-t[1], t[0]))
        got = parts[:10]
        assert [(d, round(s, 12)) for d, s in got] == [
            (d, round(s, 12)) for d, s in want
        ], (q, scorer, mode)


@pytest.mark.parametrize("num_actors", [1, 3, 8])
def test_service_scatter_matches_single(index_dir, num_actors):
    from seekr_ray.query.service import SearchService

    svc = SearchService(index_dir, num_actors=num_actors)
    local = QueryEngine(index_dir)
    try:
        for q in PLAIN_QUERIES:
            got = svc.search_topk_scatter(q, k=10)
            want = local.search_topk(q, k=10)
            assert [(d, round(s, 12)) for d, s in got] == [
                (d, round(s, 12)) for d, s in want
            ], (q, num_actors)
            got_b = svc.search_topk_scatter(q, k=10, scorer="bm25")
            want_b = local.bm25_topk(q, k=10)
            assert [(d, round(s, 12)) for d, s in got_b] == [
                (d, round(s, 12)) for d, s in want_b
            ], (q, num_actors)
    finally:
        svc.shutdown()


BOOL_PHRASE_QUERIES = [
    "parse AND buffer",
    "parse OR hotspot",
    "parse NOT buffer",
    '"travel connect"',
    '"parse"',
    '"parse buffer token"',
    'parse AND "travel connect"',
    '"travel connect" OR hotspot',
    "nosuchterm AND parse",
]


def test_range_bool_phrase_union_covers_engine(index_dir):
    """Round 4: phrase candidacy and boolean membership are per-doc
    properties, so the 4-way range split must reproduce the full-engine
    result for every boolean/phrase form — including phrase operands
    inside boolean queries (the position walk runs per range)."""
    from seekr_ray.config import DOC_ID_PARTITION_SHIFT

    e = QueryEngine(index_dir)
    edges = [p << DOC_ID_PARTITION_SHIFT for p in range(5)]
    for q in BOOL_PHRASE_QUERIES:
        want = e.search_topk(q, k=10)
        parts = []
        for lo, hi in zip(edges, edges[1:]):
            parts.extend(e.search_topk_range(q, k=10, lo=lo, hi=hi))
        parts.sort(key=lambda t: (-t[1], t[0]))
        got = parts[:10]
        assert [(d, round(s, 12)) for d, s in got] == [
            (d, round(s, 12)) for d, s in want
        ], q


def test_service_scatter_bool_phrase(index_dir):
    from seekr_ray.query.service import SearchService

    svc = SearchService(index_dir, num_actors=3)
    local = QueryEngine(index_dir)
    try:
        for q in BOOL_PHRASE_QUERIES:
            got = svc.search_topk_scatter(q, k=10)
            want = local.search_topk(q, k=10)
            assert [(d, round(s, 12)) for d, s in got] == [
                (d, round(s, 12)) for d, s in want
            ], q
    finally:
        svc.shutdown()


def test_range_rejects_bm25_boolean_and_phrase(index_dir):
    """bm25 carries no reference boolean/phrase semantics — the range
    path must refuse rather than silently score the wrong formula."""
    e = QueryEngine(index_dir)
    for q in ["parse AND buffer", '"travel connect"']:
        with pytest.raises(ValueError):
            e.search_topk_range(q, k=5, lo=0, hi=1 << 62, scorer="bm25")


def test_ranges_partition_the_corpus(index_dir):
    """Every scored doc appears in exactly one range (no double count):
    the union of range result sets at k=corpus size equals the full
    candidate set, with multiplicity one."""
    from seekr_ray.config import DOC_ID_PARTITION_SHIFT

    e = QueryEngine(index_dir)
    edges = [p << DOC_ID_PARTITION_SHIFT for p in range(5)]
    all_ids = []
    for lo, hi in zip(edges, edges[1:]):
        all_ids.extend(
            d for d, _ in e.search_topk_range("parse", k=10**6, lo=lo, hi=hi)
        )
    full = [d for d, _ in e.search_topk("parse", k=10**6)]
    assert sorted(all_ids) == sorted(full)
    assert len(set(all_ids)) == len(all_ids)
