"""Block-max WAND unit tests: the BMW core must (a) return exactly the
TAAT / plain-WAND ranking on synthetic posting lists, and (b) actually
prune — skip candidate windows and evaluate no more documents than plain
WAND.  End-to-end rank identity vs the reference oracle is covered by
tests/test_rank_identity.py's mode="bmw" parametrizations; this file
exercises the core against long skewed lists where pruning matters."""

import math
from types import SimpleNamespace

import numpy as np

from seekr_ray.query.engine import QueryEngine, _block_meta, _BMW_BLOCK


def _fake_engine():
    """Minimal engine surrogate for the scorer-core methods: cfg weights,
    no pagerank sidecar."""
    f = SimpleNamespace()
    f.cfg = SimpleNamespace(tfidf_weight=0.7, pagerank_weight=0.3)
    f.max_pagerank = 0.0
    f._pr = None
    f.wand_stats = {}
    f._pr_lookup = lambda uids: np.zeros(len(uids))
    return f


def _synthetic_terms(seed=7, n_docs=60_000, dfs=(9_000, 7_000, 600)):
    """doc_id-sorted posting lists with Pareto-tailed contributions: a few
    postings dominate, so most blocks have small maxima — the regime
    where block-max pruning wins."""
    rng = np.random.default_rng(seed)
    ids_list, contribs = [], []
    for df in dfs:
        ids = np.sort(
            rng.choice(n_docs, size=df, replace=False).astype(np.int64)
        )
        contrib = rng.pareto(2.0, size=df) + 0.01
        ids_list.append(ids)
        contribs.append(contrib)
    return ids_list, contribs


def _rank_equal(got, want):
    assert len(got) == len(want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd and math.isclose(gs, ws, rel_tol=0, abs_tol=1e-9), (
            got,
            want,
        )


def test_block_meta_shapes_and_bounds():
    ids = np.arange(0, 1000, 3, dtype=np.int64)  # 334 postings
    contrib = np.linspace(1.0, 2.0, len(ids))
    last, mx = _block_meta(ids, contrib)
    nb = (len(ids) + _BMW_BLOCK - 1) // _BMW_BLOCK
    assert len(last) == len(mx) == nb
    # each block's recorded max dominates every posting in the block and
    # the last_doc is the block's final id
    for b in range(nb):
        lo, hi = b * _BMW_BLOCK, min((b + 1) * _BMW_BLOCK, len(ids))
        assert mx[b] == contrib[lo:hi].max()
        assert last[b] == ids[hi - 1]


def test_bmw_matches_taat_and_wand():
    ids_list, contribs = _synthetic_terms()
    ubs = [0.7 * float(c.max()) for c in contribs]
    k = 10
    want = QueryEngine._taat_arrays(_fake_engine(), ids_list, contribs, k)
    fw = _fake_engine()
    got_w = QueryEngine._wand_arrays(fw, ids_list, contribs, ubs, k)
    fb = _fake_engine()
    got_b = QueryEngine._bmw_arrays(fb, ids_list, contribs, ubs, k)
    _rank_equal(got_w, want)
    _rank_equal(got_b, want)
    # BMW must actually prune: windows skipped, and never more full
    # evaluations than plain WAND
    assert fb.wand_stats["block_skips"] > 0
    assert fb.wand_stats["evals"] <= fw.wand_stats["evals"]


def test_bmw_matches_on_many_seeds_and_ks():
    for seed in (1, 2, 3):
        ids_list, contribs = _synthetic_terms(
            seed=seed, n_docs=20_000, dfs=(3_000, 2_500, 200)
        )
        ubs = [0.7 * float(c.max()) for c in contribs]
        for k in (1, 5, 50):
            want = QueryEngine._taat_arrays(
                _fake_engine(), ids_list, contribs, k
            )
            fb = _fake_engine()
            got = QueryEngine._bmw_arrays(fb, ids_list, contribs, ubs, k)
            _rank_equal(got, want)


def test_bmw_single_term_and_k_larger_than_candidates():
    rng = np.random.default_rng(11)
    ids = np.sort(rng.choice(5_000, size=300, replace=False).astype(np.int64))
    contrib = rng.pareto(2.0, size=300) + 0.01
    ubs = [0.7 * float(contrib.max())]
    want = QueryEngine._taat_arrays(_fake_engine(), [ids], [contrib], 500)
    fb = _fake_engine()
    got = QueryEngine._bmw_arrays(fb, [ids], [contrib], ubs, 500)
    _rank_equal(got, want)
    # k >= candidates: every doc evaluated, nothing pruned away
    assert len(got) == 300


def test_bmw_empty_and_disjoint_terms():
    fb = _fake_engine()
    assert (
        QueryEngine._bmw_arrays(
            fb, [np.empty(0, dtype=np.int64)], [np.empty(0)], [0.0], 10
        )
        == []
    )
    # two disjoint single-posting terms
    a = np.array([3], dtype=np.int64)
    b = np.array([9], dtype=np.int64)
    ca, cb = np.array([2.0]), np.array([1.0])
    got = QueryEngine._bmw_arrays(
        _fake_engine(), [a, b], [ca, cb], [1.4, 0.7], 10
    )
    want = QueryEngine._taat_arrays(_fake_engine(), [a, b], [ca, cb], 10)
    _rank_equal(got, want)
