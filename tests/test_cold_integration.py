"""End-to-end chunk-lazy cold BMW over REAL segment files: build a
deliberately SKEWED corpus (a handful of docs dominate the query term's
tf) with tiny chunks, and assert the cold path both matches the
vectorized path and actually skips chunk decodes — the store-level
counterpart of tests/test_bmw.py's _FakeLazy pruning tests."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from seekr_ray.build import build_index
from seekr_ray.config import IndexConfig
from seekr_ray.query.engine import QueryEngine

INDEX_DIR = "/tmp/seekr_cold_int_idx"
N_DOCS = 1200


@pytest.fixture(scope="module")
def skewed_index(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(17)
    rows = []
    filler = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(N_DOCS):
        # a third of the docs mention "needle" once in ~40 filler
        # words (df < N keeps idf > 0); five low-id docs are almost
        # nothing but "needle" (tf ~ 0.9) — the skew that lets the
        # threshold prune low-tf chunks
        if i in (3, 7, 11, 13, 17):
            words = ["needle"] * 36 + [filler[i % 6]] * 4
        elif i % 3 == 0:
            words = ["needle"] + [
                filler[int(j)] for j in rng.integers(0, 6, 39)
            ]
        else:
            words = [filler[int(j)] for j in rng.integers(0, 6, 40)]
        rng.shuffle(words)
        rows.append(
            {
                "repo": "org/r",
                "path": f"src/f{i:05d}.py",
                "commit": "c" * 8,
                "lang": "py",
                "content": " ".join(words),
            }
        )
    src = str(tmp_path_factory.mktemp("corpus") / "corpus.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    if os.path.exists(INDEX_DIR):
        shutil.rmtree(INDEX_DIR)
    cfg = IndexConfig(
        num_term_partitions=4,
        num_id_partitions=4,
        postings_per_chunk=64,  # ~19 chunks for the needle term
    )
    build_index(
        rd.read_parquet(src),
        INDEX_DIR,
        cfg,
        key_cols=["repo", "path", "commit"],
    )
    return INDEX_DIR


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_cold_matches_auto_and_skips_decodes(skewed_index, scorer):
    e = QueryEngine(skewed_index)
    if scorer == "bm25":
        want = e.bm25_topk("needle", k=3, mode="auto")
        got = e.bm25_topk("needle", k=3, mode="bmw_cold")
    else:
        want = e.search_topk("needle", k=3, mode="auto")
        got = e.search_topk("needle", k=3, mode="bmw_cold")
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_gd, gs), (_wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
    st = e.cold_stats
    assert st["chunks_total"] >= 6  # df ~ 405 needle docs / 64-posting chunks
    # once the heap holds the top-3 dominant docs, the low-tf chunks'
    # upper bounds can never produce a pivot: the loop terminates with
    # those chunks never decoded (termination-pruning — stronger than a
    # window skip, which would still touch the cursors)
    assert st["chunks_decoded"] < st["chunks_total"], st


def test_cold_range_restriction_on_real_store(skewed_index):
    e = QueryEngine(skewed_index)
    full = e.search_topk("needle", k=2000, mode="auto")
    ids = sorted(d for d, _ in full)
    lo, hi = ids[len(ids) // 4], ids[len(ids) // 2]
    got = e.search_topk_range("needle", k=2000, lo=lo, hi=hi, mode="bmw_cold")
    want = [(d, s) for d, s in full if lo <= d < hi]
    want.sort(key=lambda t: (-t[1], t[0]))
    assert [d for d, _ in got] == [d for d, _ in want]
