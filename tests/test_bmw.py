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
    f._pr_window_ub = lambda lo, hi: 0.0
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


# ---------------------------------------------------------------------------
# chunk-lazy cold path (_topk_cold): decode skipping + legacy fallback
# ---------------------------------------------------------------------------


class _FakeLazy:
    """LazyTermPostings stand-in fed from in-memory arrays."""

    def __init__(self, term, idf, chunk_arrays):
        self.term = term
        self.df = sum(len(a[0]) for a in chunk_arrays)
        self.idf = idf
        self._arrays = chunk_arrays
        self.chunks = [
            SimpleNamespace(
                min_doc=int(ids[0]),
                max_doc=int(ids[-1]),
                max_tf=float(tfs.max()),
                n_docs=len(ids),
            )
            for ids, tfs in chunk_arrays
        ]
        self.decode_count = 0

    def decode(self, i):
        self.decode_count += 1
        return self._arrays[i]


class _FakeStore:
    def __init__(self, lazies, legacy_terms=()):
        self._lazies = {lz.term: lz for lz in lazies}
        self._legacy = set(legacy_terms)

    def postings_meta(self, term):
        if term in self._legacy:
            return None
        return self._lazies.get(term)

    def term_stat(self, term):
        if term in self._legacy:
            return (1, 1.0, 1)
        lz = self._lazies.get(term)
        return None if lz is None else (lz.df, lz.idf, 1)


def _cold_engine(store):
    e = object.__new__(QueryEngine)
    e.cfg = SimpleNamespace(tfidf_weight=0.7, pagerank_weight=0.3)
    e.max_pagerank = 0.0
    e._pr = None
    e.store = store
    e.bm25_k1, e.bm25_b = 1.2, 0.75
    e.wand_stats = {}
    e.cold_stats = {}
    e._pr_window_ub = lambda lo, hi: 0.0
    from collections import OrderedDict

    e._bmw_abort_cache = OrderedDict()
    e._bmw_abort_cache_max = 16
    return e


def _chunked(ids, tfs, size):
    return [
        (ids[i : i + size], tfs[i : i + size])
        for i in range(0, len(ids), size)
    ]


def test_cold_skips_decode_of_irrelevant_chunks():
    """One dominant low-id doc fills the k=1 heap; every later chunk has
    a max_tf bound below the threshold and must exhaust WITHOUT decode."""
    n = 64 * 10
    ids = np.arange(n, dtype=np.int64)
    tfs = np.full(n, 0.01)
    tfs[3] = 5.0  # dominant doc in chunk 0
    lz = _FakeLazy("alpha", idf=2.0, chunk_arrays=_chunked(ids, tfs, 64))
    e = _cold_engine(_FakeStore([lz]))
    got = e._topk_cold(["alpha"], k=1, scorer="tfidf")
    assert got == [(3, 0.7 * 5.0 * 2.0)]
    assert e.cold_stats["chunks_total"] == 10
    assert e.cold_stats["chunks_decoded"] == 1  # only chunk 0
    assert lz.decode_count == 1


def test_cold_matches_taat_on_overlapping_chunks():
    """Salted/delta chunks overlap in doc range; the unit decomposition
    must still sum each posting exactly once."""
    rng = np.random.default_rng(5)
    all_ids = rng.choice(20_000, size=3_000, replace=False).astype(np.int64)
    all_ids.sort()
    tfs = rng.pareto(2.0, size=3_000) + 0.01
    # interleave postings across two "salts" -> overlapping chunk ranges
    a_sel = np.zeros(3_000, dtype=bool)
    a_sel[rng.choice(3_000, size=1_500, replace=False)] = True
    chunks = _chunked(all_ids[a_sel], tfs[a_sel], 64) + _chunked(
        all_ids[~a_sel], tfs[~a_sel], 64
    )
    lz = _FakeLazy("beta", idf=1.5, chunk_arrays=chunks)
    e = _cold_engine(_FakeStore([lz]))
    got = e._topk_cold(["beta"], k=10, scorer="tfidf")
    want = QueryEngine._taat_arrays(
        _fake_engine(), [all_ids], [tfs * 1.5], 10
    )
    _rank_equal(got, want)


def test_cold_multi_term_and_duplicate_stems():
    rng = np.random.default_rng(9)
    lazies, ids_list, contribs = [], [], []
    for t, idf, seed in (("a", 1.0, 1), ("b", 2.5, 2)):
        r = np.random.default_rng(seed)
        ids = np.sort(r.choice(5_000, size=900, replace=False).astype(np.int64))
        tfs = r.pareto(2.0, size=900) + 0.01
        lazies.append(_FakeLazy(t, idf, _chunked(ids, tfs, 64)))
        ids_list.append(ids)
        contribs.append(tfs * idf)
    e = _cold_engine(_FakeStore(lazies))
    got = e._topk_cold(["a", "b"], k=7, scorer="tfidf")
    want = QueryEngine._taat_arrays(_fake_engine(), ids_list, contribs, 7)
    _rank_equal(got, want)
    # duplicate stem doubles term a's contribution
    got2 = e._topk_cold(["a", "b", "a"], k=7, scorer="tfidf")
    want2 = QueryEngine._taat_arrays(
        _fake_engine(), ids_list + [ids_list[0]], contribs + [contribs[0]], 7
    )
    _rank_equal(got2, want2)


def test_cold_returns_none_on_legacy_index():
    e = _cold_engine(_FakeStore([], legacy_terms={"old"}))
    assert e._topk_cold(["old"], k=5, scorer="tfidf") is None


def test_cold_absent_terms_empty():
    e = _cold_engine(_FakeStore([]))
    assert e._topk_cold(["nosuch"], k=5, scorer="tfidf") == []


# ---------------------------------------------------------------------------
# property-based equivalence: BMW == TAAT on arbitrary posting lists
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _posting_lists(draw):
    n_terms = draw(st.integers(1, 4))
    n_docs = draw(st.integers(1, 400))
    lists = []
    for _ in range(n_terms):
        df = draw(st.integers(1, min(n_docs, 80)))
        seed = draw(st.integers(0, 2**31))
        rng = np.random.default_rng(seed)
        ids = np.sort(rng.choice(n_docs, size=df, replace=False).astype(np.int64))
        contrib = rng.pareto(1.5, size=df) + 1e-3
        lists.append((ids, contrib))
    k = draw(st.integers(1, 20))
    return lists, k


@given(_posting_lists())
@settings(max_examples=150, deadline=None)
def test_bmw_equals_taat_property(case):
    lists, k = case
    ids_list = [x[0] for x in lists]
    contribs = [x[1] for x in lists]
    ubs = [0.7 * float(c.max()) for c in contribs]
    want = QueryEngine._taat_arrays(_fake_engine(), ids_list, contribs, k)
    got = QueryEngine._bmw_arrays(_fake_engine(), ids_list, contribs, ubs, k)
    _rank_equal(got, want)


@given(_posting_lists(), st.integers(2, 5))
@settings(max_examples=100, deadline=None)
def test_cold_equals_taat_property(case, chunk_size):
    lists, k = case
    ids_list = [x[0] for x in lists]
    contribs = [x[1] for x in lists]
    lazies = [
        _FakeLazy(f"t{j}", 1.0, _chunked(ids, c, chunk_size))
        for j, (ids, c) in enumerate(lists)
    ]
    e = _cold_engine(_FakeStore(lazies))
    got = e._topk_cold([f"t{j}" for j in range(len(lists))], k, scorer="tfidf")
    want = QueryEngine._taat_arrays(_fake_engine(), ids_list, contribs, k)
    _rank_equal(got, want)


def test_cold_range_skips_out_of_range_chunks():
    """Doc-range restriction must drop fully-outside chunks by metadata
    (no decode) and decode+slice only boundary straddlers."""
    n = 64 * 8
    ids = np.arange(n, dtype=np.int64)
    tfs = np.full(n, 1.0)
    lz = _FakeLazy("gamma", idf=1.0, chunk_arrays=_chunked(ids, tfs, 64))
    e = _cold_engine(_FakeStore([lz]))
    # range [100, 200): chunk 1 (64..127) and chunk 3 (192..255) straddle,
    # chunk 2 (128..191) is inside, chunks 0 and 4..7 fully outside
    got = e._topk_cold(["gamma"], k=512, scorer="tfidf", lo=100, hi=200)
    want_ids = list(range(100, 200))
    assert sorted(d for d, _ in got) == want_ids
    for d, s in got:
        assert s == 0.7 * 1.0
    # decodes: 2 boundary chunks eagerly + chunk 2 on evaluation = 3;
    # chunks 0, 4-7 never decoded
    assert lz.decode_count <= 3
    assert e.cold_stats["chunks_total"] == 3  # only in-range units exist


def test_bmw_prunable_predictor():
    """The round-4 prunability predictor (VERDICT r3 #4): skewed lists
    (most block maxima tiny vs the k-th best contribution) must predict
    prunable; uniform lists (every block can beat any threshold) must
    not — so mode="bmw" on a uniform corpus goes straight to TAAT
    without entering the Python pivot loop."""
    f = _fake_engine()
    # skewed: Pareto-tailed contributions, small k
    ids_list, contribs = _synthetic_terms(seed=3, n_docs=60_000,
                                          dfs=(9_000, 7_000))
    ubs = [0.7 * float(c.max()) for c in contribs]
    metas = [_block_meta(i, c) for i, c in zip(ids_list, contribs)]
    assert QueryEngine._bmw_prunable(f, contribs, ubs, metas, 10) is True

    # uniform: every contribution equal -> no block is skippable
    rng = np.random.default_rng(0)
    ids_u = [np.sort(rng.choice(60_000, size=df, replace=False).astype(np.int64))
             for df in (9_000, 7_000)]
    contribs_u = [np.full(len(i), 1.0) for i in ids_u]
    ubs_u = [0.7 * float(c.max()) for c in contribs_u]
    metas_u = [_block_meta(i, c) for i, c in zip(ids_u, contribs_u)]
    assert QueryEngine._bmw_prunable(f, contribs_u, ubs_u, metas_u, 10) is False

    # degenerate: fewer candidates than k -> no threshold estimate
    assert QueryEngine._bmw_prunable(
        f, [np.full(5, 1.0)], [0.7], [_block_meta(np.arange(5), np.full(5, 1.0))], 10
    ) is False


def test_bmw_mode_predictor_end_to_end_skewed():
    """On the skewed synthetic regime the predictor must let BMW run
    (and prune), keeping rank identity — guards against a predictor
    that just always says no."""
    ids_list, contribs = _synthetic_terms()
    ubs = [0.7 * float(c.max()) for c in contribs]
    f = _fake_engine()
    metas = [_block_meta(i, c) for i, c in zip(ids_list, contribs)]
    assert QueryEngine._bmw_prunable(f, contribs, ubs, metas, 10)
    got = QueryEngine._bmw_arrays(f, ids_list, contribs, ubs, 10, metas=metas)
    want = QueryEngine._taat_arrays(_fake_engine(), ids_list, contribs, 10)
    _rank_equal(got, want)
    assert f.wand_stats["block_skips"] > 0


def test_cold_work_budget_aborts_and_memoizes(monkeypatch):
    """Round-5 total-work guard: a uniform (non-pruning) workload under a
    tiny work budget must return None (fallback to TAAT) with
    ``aborted`` stats, memoize the abort, and never burn the loop
    again for the same key."""
    import seekr_ray.query.engine as eng

    n = 64 * 40
    ids = np.arange(n, dtype=np.int64)
    tfs = np.ones(n)  # perfectly uniform: nothing prunes
    lz = _FakeLazy("gamma", idf=1.0, chunk_arrays=_chunked(ids, tfs, 64))
    e = _cold_engine(_FakeStore([lz]))
    monkeypatch.setattr(eng, "_COLD_WORK_BUDGET", 1_000)
    got = e._topk_cold(["gamma"], k=5, scorer="tfidf")
    assert got is None
    assert e.cold_stats.get("aborted") is True
    # memoized: the second call short-circuits before any loop work
    got2 = e._topk_cold(["gamma"], k=5, scorer="tfidf")
    assert got2 is None
    # and with the default budget the same workload completes exactly
    monkeypatch.setattr(eng, "_COLD_WORK_BUDGET", 10_000_000)
    e2 = _cold_engine(_FakeStore([lz]))
    got3 = e2._topk_cold(["gamma"], k=5, scorer="tfidf")
    want = QueryEngine._taat_arrays(_fake_engine(), [ids], [tfs], 5)
    _rank_equal(got3, want)


def test_wand_work_budget_falls_back_to_taat(monkeypatch):
    """Plain WAND under a tiny work budget must fall back to the exact
    vectorized TAAT result (rank-identical) instead of walking the full
    candidate union per-doc."""
    import seekr_ray.query.engine as eng

    rng = np.random.default_rng(9)
    ids = np.sort(
        rng.choice(50_000, size=4_000, replace=False).astype(np.int64)
    )
    tfs = np.ones(4_000)  # uniform: nothing prunes
    e = _fake_engine()
    e._taat_arrays = lambda i, c, kk: QueryEngine._taat_arrays(e, i, c, kk)
    want = QueryEngine._taat_arrays(e, [ids], [tfs], 10)
    monkeypatch.setattr(eng, "_COLD_WORK_BUDGET", 1_000)
    got = QueryEngine._wand_arrays(e, [ids], [tfs], [1.0], 10)
    assert e.wand_stats.get("aborted") is True
    _rank_equal(got, want)
