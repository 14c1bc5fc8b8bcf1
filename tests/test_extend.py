"""Incremental extension (stages/extend.py): extending an index with new
documents must be QUERY-EQUIVALENT to a fresh build over the union —
same term stats (df, idf), same (content, score) result sets for every
query-path branch, same doclen/avgdl — while never rewriting the base
segment files.  Ids differ by construction (extension continues rank
sequences; a fresh build interleaves), so equivalence is asserted on
content sha256, never on ids."""

import json
import math
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from seekr_ray.build import build_index, load_meta, read_docs_table
from seekr_ray.config import IndexConfig
from seekr_ray.fixtures import QUERY_SET, cached_corpus_path
from seekr_ray.query.engine import QueryEngine
from seekr_ray.stages.extend import extend_index, partition_files

N_DOCS = 160
BASE_DIR = "/tmp/seekr_extend_base"
FULL_DIR = "/tmp/seekr_extend_full"
HALF1 = "/tmp/seekr_extend_half1.parquet"
HALF2 = "/tmp/seekr_extend_half2.parquet"


def _cfg() -> IndexConfig:
    return IndexConfig(
        num_term_partitions=4, num_id_partitions=4, postings_per_chunk=16
    )


@pytest.fixture(scope="module")
def extended_and_full(ray_session):
    import ray.data as rd

    corpus = pq.read_table(cached_corpus_path(N_DOCS))
    half = N_DOCS // 2
    pq.write_table(corpus.slice(0, half), HALF1)
    pq.write_table(corpus.slice(half), HALF2)
    for d in (BASE_DIR, FULL_DIR):
        shutil.rmtree(d, ignore_errors=True)
    build_index(
        rd.read_parquet(HALF1), BASE_DIR, _cfg(),
        key_cols=["repo", "path", "commit"], input_path=HALF1,
    )
    metrics = extend_index(
        rd.read_parquet(HALF2), BASE_DIR, key_cols=["repo", "path", "commit"]
    )
    build_index(
        rd.read_parquet(cached_corpus_path(N_DOCS)), FULL_DIR, _cfg(),
        key_cols=["repo", "path", "commit"],
        input_path=cached_corpus_path(N_DOCS),
    )
    return metrics


def _sha_of(index_dir):
    tbl = read_docs_table(index_dir, columns=["doc_id", "content_sha256"])
    return dict(
        zip(tbl["doc_id"].to_pylist(), tbl["content_sha256"].to_pylist())
    )


def test_ndocs_and_kept_content_match_fresh_build(extended_and_full):
    assert extended_and_full["n_new_docs"] > 0
    assert load_meta(BASE_DIR)["n_docs"] == load_meta(FULL_DIR)["n_docs"]
    assert sorted(set(_sha_of(BASE_DIR).values())) == sorted(
        set(_sha_of(FULL_DIR).values())
    )


def test_no_doc_id_collisions_after_extension(extended_and_full):
    tbl = pq.read_table(os.path.join(BASE_DIR, "docs"), columns=["doc_id"])
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    assert len(np.unique(ids)) == len(ids)


def test_delta_segments_exist_base_untouched(extended_and_full):
    manifest_deltas = 0
    with open(os.path.join(BASE_DIR, "manifest.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            for d in row.get("deltas", []):
                manifest_deltas += 1
                assert os.path.exists(d["path"])
                assert ".delta001." in d["path"]
    assert manifest_deltas > 0
    multi = [
        p for p in range(4)
        if len(partition_files(os.path.join(BASE_DIR, "segments"), p)) > 1
    ]
    assert multi, "no partition gained a delta file"


def test_term_stats_equal_fresh_build(extended_and_full):
    def stats_of(d):
        out = {}
        for p in range(4):
            path = os.path.join(d, "term_stats", f"part-{p:05d}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path)
            for term, df, idf in zip(
                t["term"].to_pylist(), t["df"].to_pylist(), t["idf"].to_pylist()
            ):
                out[term] = (df, idf)
        return out

    a, b = stats_of(BASE_DIR), stats_of(FULL_DIR)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0] == b[term][0], term
        assert math.isclose(a[term][1], b[term][1], rel_tol=0, abs_tol=0), term


@pytest.mark.parametrize("qid,query,k", QUERY_SET, ids=[q[0] for q in QUERY_SET])
def test_query_equivalent_to_fresh_build(extended_and_full, qid, query, k):
    ea, eb = QueryEngine(BASE_DIR), QueryEngine(FULL_DIR)
    sa, sb = _sha_of(BASE_DIR), _sha_of(FULL_DIR)
    ra = [(round(s, 9), sa[d]) for d, s in ea.search_topk(query, k=100_000)]
    rb = [(round(s, 9), sb[d]) for d, s in eb.search_topk(query, k=100_000)]
    assert sorted(ra) == sorted(rb), qid


def test_bm25_equivalent_to_fresh_build(extended_and_full):
    ea, eb = QueryEngine(BASE_DIR), QueryEngine(FULL_DIR)
    sa, sb = _sha_of(BASE_DIR), _sha_of(FULL_DIR)
    for q in ["parse buffer", "hotspot", "travel traveling traveler"]:
        ra = [(round(s, 9), sa[d]) for d, s in ea.bm25_topk(q, k=100_000)]
        rb = [(round(s, 9), sb[d]) for d, s in eb.bm25_topk(q, k=100_000)]
        assert sorted(ra) == sorted(rb), q


def test_doclen_sidecar_extended(extended_and_full):
    from seekr_ray.query.store import load_doclens

    ids_a, dls_a, avg_a = load_doclens(BASE_DIR)
    ids_b, dls_b, avg_b = load_doclens(FULL_DIR)
    assert len(ids_a) == len(ids_b)
    assert math.isclose(avg_a, avg_b, rel_tol=0, abs_tol=0)
    assert sorted(dls_a.tolist()) == sorted(dls_b.tolist())


def test_reextending_same_docs_is_a_noop(extended_and_full, ray_session):
    import ray.data as rd

    before = load_meta(BASE_DIR)["n_docs"]
    m = extend_index(
        rd.read_parquet(HALF2), BASE_DIR, key_cols=["repo", "path", "commit"]
    )
    assert m["n_new_docs"] == 0
    assert load_meta(BASE_DIR)["n_docs"] == before
    # queries unaffected
    e = QueryEngine(BASE_DIR)
    assert e.search_topk("parse", k=5)


def test_compaction_is_query_equivalent(extended_and_full, ray_session):
    """compact_index on a COPY of the extended index: every partition
    folds to a single file and the full query set still matches the
    fresh union build on (sha, score)."""
    from seekr_ray.stages.extend import compact_index

    cdir = "/tmp/seekr_extend_compacted"
    shutil.rmtree(cdir, ignore_errors=True)
    shutil.copytree(BASE_DIR, cdir)
    m = compact_index(cdir)
    assert m["partitions_compacted"] > 0 and m["files_removed"] > 0
    for p in range(4):
        assert len(partition_files(os.path.join(cdir, "segments"), p)) <= 1
    # manifest has no delta entries left
    with open(os.path.join(cdir, "manifest.jsonl")) as f:
        for line in f:
            assert "deltas" not in json.loads(line)
    ec, eb = QueryEngine(cdir), QueryEngine(FULL_DIR)
    sc, sb = _sha_of(cdir), _sha_of(FULL_DIR)
    for qid, query, k in QUERY_SET:
        rc = [(round(s, 9), sc[d]) for d, s in ec.search_topk(query, k=100_000)]
        rb = [(round(s, 9), sb[d]) for d, s in eb.search_topk(query, k=100_000)]
        assert sorted(rc) == sorted(rb), qid
    # phrase path exercises the recombined position blobs
    assert ec.search_topk('"travel connect"', k=10) == QueryEngine(
        BASE_DIR
    ).search_topk('"travel connect"', k=10)
    # bm25 path (doclen untouched by compaction)
    a = ec.bm25_topk("parse buffer", k=20)
    b = QueryEngine(BASE_DIR).bm25_topk("parse buffer", k=20)
    assert a == b


def test_pagerank_refresh_matches_fresh_build(extended_and_full, ray_session):
    """refresh_pagerank over the extended index with the union link table
    must equal a fresh build's pagerank stage, compared by URL (ids
    differ by construction)."""
    from seekr_ray.build import refresh_pagerank
    from seekr_ray.fixtures import cached_links_path
    from seekr_ray.query.store import load_pagerank

    links = cached_links_path(N_DOCS)
    pdir = "/tmp/seekr_extend_pr"
    fdir = "/tmp/seekr_extend_pr_full"
    for d, src in ((pdir, BASE_DIR), (fdir, FULL_DIR)):
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(src, d)
    m = refresh_pagerank(pdir, links_path=links)
    assert m["n_ranked"] > 0
    refresh_pagerank(fdir, links_path=links)

    def by_url(d):
        tbl = read_docs_table(d, columns=["doc_id", "url"])
        urls = dict(zip(tbl["doc_id"].to_pylist(), tbl["url"].to_pylist()))
        ids, ranks = load_pagerank(d)
        return {urls[i]: r for i, r in zip(ids.tolist(), ranks.tolist())}

    a, b = by_url(pdir), by_url(fdir)
    assert set(a) == set(b)
    for url in a:
        assert math.isclose(a[url], b[url], rel_tol=0, abs_tol=1e-12), url


def test_compaction_multirange_query_equivalent(extended_and_full, ray_session):
    """Round-4 chunk-parallel compaction: force MANY doc-id ranges per
    partition (tiny target_postings_per_task) and assert the compacted
    index (a) preserves the (term, salt, chunk_seq) file invariant with
    doc-sorted per-term runs, and (b) serves the full query set, phrase
    and bm25 identically to the single-range form."""
    import numpy as np
    import pyarrow.parquet as pq

    from seekr_ray.stages.extend import _plan_compact_ranges, compact_index

    cdir = "/tmp/seekr_extend_compacted_mr"
    shutil.rmtree(cdir, ignore_errors=True)
    shutil.copytree(BASE_DIR, cdir)
    seg = os.path.join(cdir, "segments")
    # the plan must actually split: tiny per-task budget
    for p in range(4):
        files = partition_files(seg, p)
        if len(files) > 1:
            assert len(_plan_compact_ranges(files, target=50, max_ranges=8)) > 1
    m = compact_index(cdir, target_postings_per_task=50, max_range_parallel=8)
    assert m["partitions_compacted"] > 0 and m["files_removed"] > 0
    for p in range(4):
        files = partition_files(seg, p)
        assert len(files) <= 1
        if not files:
            continue
        t = pq.read_table(files[0])
        terms = np.asarray(t["term"].to_pylist(), dtype=object)
        seqs = t["chunk_seq"].to_numpy(zero_copy_only=False)
        mins = t["min_doc_id"].to_numpy(zero_copy_only=False)
        maxs = t["max_doc_id"].to_numpy(zero_copy_only=False)
        # terms sorted; within a term: chunk_seq 0..m-1 and doc ranges
        # strictly increasing and disjoint
        assert list(terms) == sorted(terms)
        for i in range(len(terms)):
            if i == 0 or terms[i] != terms[i - 1]:
                assert seqs[i] == 0
            else:
                assert seqs[i] == seqs[i - 1] + 1
                assert mins[i] > maxs[i - 1]
            assert mins[i] <= maxs[i]
    ec, eb = QueryEngine(cdir), QueryEngine(FULL_DIR)
    sc, sb = _sha_of(cdir), _sha_of(FULL_DIR)
    for qid, query, k in QUERY_SET:
        rc = [(round(s, 9), sc[d]) for d, s in ec.search_topk(query, k=100_000)]
        rb = [(round(s, 9), sb[d]) for d, s in eb.search_topk(query, k=100_000)]
        assert sorted(rc) == sorted(rb), qid
    assert ec.search_topk('"travel connect"', k=10) == QueryEngine(
        BASE_DIR
    ).search_topk('"travel connect"', k=10)
    assert ec.bm25_topk("parse buffer", k=20) == QueryEngine(BASE_DIR).bm25_topk(
        "parse buffer", k=20
    )


def test_compaction_converges_on_legacy_zero_posting_partition(
    extended_and_full, ray_session
):
    """A partition whose files lack the n_docs/max_doc_id chunk metadata
    (legacy layout) AND hold zero postings plans a single full range that
    rebuilds to no rows; no row reaches the finalize groupby, so without
    the post-run fold the deltas would survive every compact_index call.
    The fold must commit an empty base, unlink the delta, and converge."""
    from seekr_ray.stages.extend import compact_index
    from seekr_ray.stages.postings import CHUNK_SCHEMA

    cdir = "/tmp/seekr_extend_legacy_zero"
    shutil.rmtree(cdir, ignore_errors=True)
    shutil.copytree(BASE_DIR, cdir)
    seg = os.path.join(cdir, "segments")
    legacy = CHUNK_SCHEMA.empty_table().drop_columns(["min_doc_id", "max_doc_id"])
    for f in partition_files(seg, 0):
        os.remove(f)
    pq.write_table(legacy, os.path.join(seg, "part-00000.parquet"))
    pq.write_table(legacy, os.path.join(seg, "part-00000.delta001.parquet"))
    m = compact_index(cdir)
    assert m["files_removed"] >= 1
    files = partition_files(seg, 0)
    assert len(files) <= 1  # delta folded away
    if files:
        assert pq.read_table(files[0]).num_rows == 0
    # converged: a second call finds nothing left to fold for partition 0
    m2 = compact_index(cdir)
    assert len(partition_files(seg, 0)) <= 1
