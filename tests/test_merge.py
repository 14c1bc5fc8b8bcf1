"""merge_indexes: two shard-built indexes == one unified build.

The merged index must be IDENTICAL to a unified build over the
concatenated corpus — doc ids, docs table, drops, term stats, doclen,
pagerank and every query path — including the cross-shard duplicate
cases the module docstring enumerates (content-dup, key-dup, identical
row in both shards).  The fixture plants one of each across the shard
boundary.
"""

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
from seekr_ray.stages.merge import merge_indexes

N_DOCS = 200
HALF = N_DOCS // 2
DIR_A = "/tmp/seekr_merge_a"
DIR_B = "/tmp/seekr_merge_b"
DIR_M = "/tmp/seekr_merge_out"
DIR_U = "/tmp/seekr_merge_unified"
SHARD_A = "/tmp/seekr_merge_shard_a.parquet"
SHARD_B = "/tmp/seekr_merge_shard_b.parquet"
FULL = "/tmp/seekr_merge_full.parquet"


def _cfg() -> IndexConfig:
    return IndexConfig(
        num_term_partitions=4, num_id_partitions=4, postings_per_chunk=16
    )


def _doctored_corpus() -> pa.Table:
    """Corpus with cross-shard duplicate plants:

    * row HALF+3 gets row 5's CONTENT (content-dup across shards);
    * row HALF+7 gets row 9's KEYS, different content (key-dup across
      shards — both rows share one doc_id, min-sha content wins);
    * row HALF+11 gets row 13's keys AND content (identical row in
      both shards — exactly one posting copy may survive).
    """
    tbl = pq.read_table(cached_corpus_path(N_DOCS))
    cols = {c: tbl[c].to_pylist() for c in tbl.column_names}
    cols["content"][HALF + 3] = cols["content"][5]
    for k in ("repo", "path", "commit"):
        cols[k][HALF + 7] = cols[k][9]
        cols[k][HALF + 11] = cols[k][13]
    cols["content"][HALF + 11] = cols["content"][13]
    return pa.table(cols)


@pytest.fixture(scope="module")
def merged_and_unified(ray_session):
    import ray.data as rd

    from seekr_ray.stages.links import extract_links

    full = _doctored_corpus()
    pq.write_table(full, FULL)
    pq.write_table(full.slice(0, HALF), SHARD_A)
    pq.write_table(full.slice(HALF), SHARD_B)
    for d in (DIR_A, DIR_B, DIR_M, DIR_U):
        shutil.rmtree(d, ignore_errors=True)
    kw = dict(key_cols=["repo", "path", "commit"])
    build_index(rd.read_parquet(SHARD_A), DIR_A, _cfg(), input_path=SHARD_A, **kw)
    build_index(rd.read_parquet(SHARD_B), DIR_B, _cfg(), input_path=SHARD_B, **kw)
    links = extract_links(rd.read_parquet(FULL)).materialize()
    build_index(
        rd.read_parquet(FULL), DIR_U, _cfg(), input_path=FULL,
        links_ds=links, **kw,
    )
    metrics = merge_indexes(DIR_A, DIR_B, DIR_M, links_ds=links, **kw)
    return metrics


def _docs_map(index_dir):
    tbl = read_docs_table(index_dir, columns=["doc_id", "content_sha256"])
    return dict(
        zip(tbl["doc_id"].to_pylist(), tbl["content_sha256"].to_pylist())
    )


def test_docs_table_identical(merged_and_unified):
    # doc ids INCLUDED — assignment is a pure function of the union keys
    assert _docs_map(DIR_M) == _docs_map(DIR_U)
    assert load_meta(DIR_M)["n_docs"] == load_meta(DIR_U)["n_docs"]


def test_drops_identical(merged_and_unified):
    def drops_of(d):
        t = pq.read_table(os.path.join(d, "drops", "drops.parquet"))
        return sorted(
            zip(
                t["doc_id"].to_pylist(),
                t["content_sha256"].to_pylist(),
                t["reason"].to_pylist(),
            )
        )

    assert drops_of(DIR_M) == drops_of(DIR_U)
    # the planted cross-shard duplicates actually produced drops
    reasons = {r for _, _, r in drops_of(DIR_M)}
    assert {"content_dup", "key_dup"} <= reasons


def test_term_stats_identical(merged_and_unified):
    def stats_of(d):
        out = {}
        for p in range(4):
            path = os.path.join(
                d, "term_stats", f"term_part={p}", f"part-{p:05d}.parquet"
            )
            if not os.path.exists(path):
                continue
            t = pq.read_table(path)
            for term, df, idf in zip(
                t["term"].to_pylist(), t["df"].to_pylist(), t["idf"].to_pylist()
            ):
                out[term] = (df, idf)
        return out

    a, b = stats_of(DIR_M), stats_of(DIR_U)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0] == b[term][0], term
        assert math.isclose(a[term][1], b[term][1], rel_tol=0, abs_tol=0), term


def test_doclen_identical(merged_and_unified):
    from seekr_ray.query.sidecar import _read_raw

    ids_m, dl_m = _read_raw(os.path.join(DIR_M, "doclen"), "dl")
    ids_u, dl_u = _read_raw(os.path.join(DIR_U, "doclen"), "dl")
    assert np.array_equal(ids_m, ids_u)
    assert np.array_equal(np.asarray(dl_m), np.asarray(dl_u))


def test_pagerank_identical(merged_and_unified):
    pr_m = pq.read_table(os.path.join(DIR_M, "pagerank")).sort_by("doc_id")
    pr_u = pq.read_table(os.path.join(DIR_U, "pagerank")).sort_by("doc_id")
    assert pr_m["doc_id"].to_pylist() == pr_u["doc_id"].to_pylist()
    rm = np.asarray(pr_m["page_rank"].to_pylist())
    ru = np.asarray(pr_u["page_rank"].to_pylist())
    assert np.allclose(rm, ru, rtol=0, atol=0)


@pytest.mark.parametrize("qid,query,k", QUERY_SET, ids=[q[0] for q in QUERY_SET])
def test_query_identical_to_unified(merged_and_unified, qid, query, k):
    em, eu = QueryEngine(DIR_M), QueryEngine(DIR_U)
    rm = em.search_topk(query, k=100_000)
    ru = eu.search_topk(query, k=100_000)
    # doc ids are identical by construction, so exact tuple equality
    assert [(d, round(s, 12)) for d, s in rm] == [
        (d, round(s, 12)) for d, s in ru
    ], qid


def test_bm25_identical_to_unified(merged_and_unified):
    em, eu = QueryEngine(DIR_M), QueryEngine(DIR_U)
    for q in ["parse buffer", "hotspot", "travel traveling traveler"]:
        rm = em.bm25_topk(q, k=100_000)
        ru = eu.bm25_topk(q, k=100_000)
        assert [(d, round(s, 12)) for d, s in rm] == [
            (d, round(s, 12)) for d, s in ru
        ], q


def test_merge_resume_is_noop(merged_and_unified):
    import time

    t0 = time.monotonic()
    metrics = merge_indexes(
        DIR_A, DIR_B, DIR_M, key_cols=["repo", "path", "commit"]
    )
    assert metrics["stages"]["segments"]["partitions_built"] == 0
    assert metrics["stages"]["segments"]["partitions_skipped"] == 4
    assert time.monotonic() - t0 < 30
    assert _docs_map(DIR_M) == _docs_map(DIR_U)


def test_merge_rejects_mismatched_config(merged_and_unified, tmp_path):
    import json

    other = tmp_path / "other_index"
    shutil.copytree(DIR_A, other)
    meta_path = other / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["config"]["num_term_partitions"] = 8
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="num_term_partitions"):
        merge_indexes(
            str(other), DIR_B, "/tmp/seekr_merge_reject",
            key_cols=["repo", "path", "commit"],
        )
