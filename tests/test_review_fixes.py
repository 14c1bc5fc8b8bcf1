"""Regression tests for the 2026-08-18 review findings: OR-merge with an
empty phrase operand, phrase cache desync after eviction, stem->original
misalignment on repeated phrase words, extend generation durability
across compaction, and extend crash rollback."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from seekr_ray.config import IndexConfig

IDX = "/tmp/seekr_review_idx"
CORPUS = "/tmp/seekr_review_corpus.parquet"

FILLER = " ".join(["filler"] * 8)


def _write_corpus(path, rows):
    tbl = pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array(["c0"] * len(rows), pa.string()),
            "lang": pa.array(["py"] * len(rows), pa.string()),
            "content": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def review_index(ray_session):
    import ray.data as rd

    from seekr_ray.build import build_index

    rows = [
        # alpha and gamma co-occur but far apart (> MAX_GAP=3): the
        # phrase "alpha gamma" has candidates yet zero positional matches
        ("r0", "a.py", f"alpha {FILLER} gamma"),
        ("r0", "b.py", f"alpha beta {FILLER}"),
        # adjacent pair for the cache-eviction test
        ("r0", "c.py", f"delta omega {FILLER}"),
        # repeated word phrase target: "alpha alpha gamma" contiguous
        ("r0", "d.py", "alpha alpha gamma " + FILLER),
    ]
    _write_corpus(CORPUS, rows)
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(
        rd.read_parquet(CORPUS),
        IDX,
        IndexConfig(num_term_partitions=4, num_id_partitions=4),
        key_cols=["repo", "path", "commit"],
        input_path=CORPUS,
    )
    return IDX


def test_or_with_no_match_phrase_operand(review_index):
    """OR where the phrase operand has candidates but no positional
    match used to IndexError in _merge_overwrite (empty right side)."""
    from seekr_ray.query.engine import QueryEngine

    eng = QueryEngine(review_index)
    got = eng.search_topk('alpha OR "alpha gamma"', k=10)
    # equivalent to plain alpha: the phrase matches nothing
    want = eng.search_topk("alpha", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_phrase_arrays_cache_eviction_recovers(review_index):
    """An arrays-cache eviction while the result cache still holds the
    phrase used to serve empty results forever."""
    from seekr_ray.query.engine import QueryEngine

    eng = QueryEngine(review_index)
    first = eng.search_topk('"delta omega"', k=10)
    assert first, "fixture phrase must match"
    eng._phrase_arrays_cache.clear()  # simulate eviction (cap 256)
    again = eng.search_topk('"delta omega"', k=10)
    assert again == first


def test_phrase_repeated_word_keys_word_info_correctly(review_index):
    """stems dedup to [alpha, gamma] for "alpha alpha gamma"; the old
    positional zip mapped gamma -> 'alpha' and collapsed word_info."""
    from seekr_ray.query.engine import QueryEngine
    from seekr_ray.query.parser import tokenize_and_stem

    eng = QueryEngine(review_index)
    stems, _ = tokenize_and_stem("alpha alpha gamma")
    res = eng.query_phrase(stems, ["alpha", "alpha", "gamma"])
    assert res.documents, "phrase must match doc d.py"
    keys = set(res.documents[0].word_info)
    assert "gamma" in keys and "alpha" in keys


def test_isin_sorted_empty_sides():
    from seekr_ray.nputil import isin_sorted

    mask, pos = isin_sorted(np.array([], np.int64), np.array([1, 2]))
    assert mask.tolist() == [False, False] and pos.tolist() == [0, 0]
    mask, pos = isin_sorted(np.array([1, 2]), np.array([], np.int64))
    assert mask.size == 0 and pos.size == 0


EXT_BASE = "/tmp/seekr_review_ext"
EXT_C1 = "/tmp/seekr_review_ext_c1.parquet"
EXT_C2 = "/tmp/seekr_review_ext_c2.parquet"
EXT_C3 = "/tmp/seekr_review_ext_c3.parquet"


def _build_ext_base(ray_session_unused):
    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.fixtures import cached_corpus_path

    corpus = pq.read_table(cached_corpus_path(120))
    pq.write_table(corpus.slice(0, 60), EXT_C1)
    pq.write_table(corpus.slice(60, 30), EXT_C2)
    pq.write_table(corpus.slice(90, 30), EXT_C3)
    shutil.rmtree(EXT_BASE, ignore_errors=True)
    build_index(
        rd.read_parquet(EXT_C1),
        EXT_BASE,
        IndexConfig(num_term_partitions=4, num_id_partitions=4),
        key_cols=["repo", "path", "commit"],
        input_path=EXT_C1,
    )


def test_extend_generation_survives_compaction(ray_session):
    import ray.data as rd

    from seekr_ray.build import load_meta
    from seekr_ray.stages.extend import compact_index, extend_index

    _build_ext_base(ray_session)
    n_base = load_meta(EXT_BASE)["n_docs"]
    m1 = extend_index(
        rd.read_parquet(EXT_C2), EXT_BASE, key_cols=["repo", "path", "commit"]
    )
    assert m1["generation"] == 1
    compact_index(EXT_BASE)  # removes every delta file
    m2 = extend_index(
        rd.read_parquet(EXT_C3), EXT_BASE, key_cols=["repo", "path", "commit"]
    )
    # pre-fix: generation reset to 1 and overwrote extend001 docs/drops
    assert m2["generation"] == 2
    meta = load_meta(EXT_BASE)
    assert [e["generation"] for e in meta["extensions"]] == [1, 2]
    docs = sorted(os.listdir(os.path.join(EXT_BASE, "docs")))
    assert any(f.startswith("extend001-") for f in docs)
    assert any(f.startswith("extend002-") for f in docs)
    assert meta["n_docs"] == n_base + m1["n_new_docs"] + m2["n_new_docs"]


def test_extend_crash_rolls_back_and_reruns(ray_session, monkeypatch):
    """Kill the extend after delta segments + stats rewrite but before
    the manifest/meta commit; the re-run must roll back and produce the
    same index as an uninterrupted extend."""
    import ray.data as rd

    from seekr_ray.build import load_meta
    from seekr_ray.query.engine import QueryEngine
    from seekr_ray.stages import extend as ext_mod

    _build_ext_base(ray_session)
    n_base = load_meta(EXT_BASE)["n_docs"]

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(ext_mod, "write_manifest", boom)
    with pytest.raises(RuntimeError, match="injected"):
        ext_mod.extend_index(
            rd.read_parquet(EXT_C2),
            EXT_BASE,
            key_cols=["repo", "path", "commit"],
        )
    assert os.path.exists(os.path.join(EXT_BASE, "_extend_pending.json"))
    monkeypatch.undo()

    metrics = ext_mod.extend_index(
        rd.read_parquet(EXT_C2),
        EXT_BASE,
        key_cols=["repo", "path", "commit"],
    )
    assert metrics["generation"] == 1  # rolled back, not bumped
    assert not os.path.exists(os.path.join(EXT_BASE, "_extend_pending.json"))
    meta = load_meta(EXT_BASE)
    assert meta["n_docs"] == n_base + metrics["n_new_docs"]

    # compare against an uninterrupted extend on a fresh copy
    ref_dir = "/tmp/seekr_review_ext_ref"
    _restore = EXT_BASE  # rebuild reference from scratch
    shutil.rmtree(ref_dir, ignore_errors=True)
    import ray.data as rd2

    from seekr_ray.build import build_index

    build_index(
        rd2.read_parquet(EXT_C1),
        ref_dir,
        IndexConfig(num_term_partitions=4, num_id_partitions=4),
        key_cols=["repo", "path", "commit"],
        input_path=EXT_C1,
    )
    ext_mod.extend_index(
        rd2.read_parquet(EXT_C2), ref_dir, key_cols=["repo", "path", "commit"]
    )
    got = QueryEngine(EXT_BASE)
    want = QueryEngine(ref_dir)
    for q in ["parse buffer", "token stream", '"travel connect"']:
        g = [(s, round(v, 10)) for s, v in got.search_topk(q, k=10)]
        w = [(s, round(v, 10)) for s, v in want.search_topk(q, k=10)]
        # doc ids are assignment-order dependent only within equal keys;
        # same inputs + deterministic ids -> identical results
        assert g == w, q
