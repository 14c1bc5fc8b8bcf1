"""End-to-end rank-identity: Ray-built index + QueryEngine vs the
in-process reference-formula oracle (FIXTURES.md §3-4), on every
query-path branch, plus WAND == faithful-path equivalence."""

import math
import os
import shutil

import pyarrow.parquet as pq
import pytest

from seekr_ray.build import build_index
from seekr_ray.config import IndexConfig
from seekr_ray.fixtures import QUERY_SET, cached_corpus_path, cached_links_path
from seekr_ray.oracle.reference import OracleIndex, reference_pagerank
from seekr_ray.query.engine import QueryEngine

N_DOCS = 120
INDEX_DIR = "/tmp/seekr_test_index"


@pytest.fixture(scope="session")
def built_index(ray_session):
    import ray.data as rd

    if os.path.exists(os.path.join(INDEX_DIR, "meta.json")):
        shutil.rmtree(INDEX_DIR)
    docs = rd.read_parquet(cached_corpus_path(N_DOCS))
    links = rd.read_parquet(cached_links_path(N_DOCS))
    cfg = IndexConfig(
        num_term_partitions=4,
        num_id_partitions=4,
        hot_df_threshold=40,  # force the salted path on fixture hot terms
        postings_per_chunk=16,  # force multi-chunk terms
    )
    build_index(
        docs,
        INDEX_DIR,
        cfg,
        key_cols=["repo", "path", "commit"],
        links_ds=links,
    )
    return INDEX_DIR


@pytest.fixture(scope="session")
def oracle(built_index):
    from seekr_ray.build import read_docs_table

    tbl = read_docs_table(built_index, columns=["doc_id", "content", "url"])
    doc_rows = list(zip(tbl["doc_id"].to_pylist(), tbl["content"].to_pylist()))
    url_to_id = dict(zip(tbl["url"].to_pylist(), tbl["doc_id"].to_pylist()))
    # resolve fixture links exactly like the build does
    links = pq.read_table(cached_links_path(N_DOCS))
    edges = set()
    for r, p, u in zip(
        links["src_repo"].to_pylist(),
        links["src_path"].to_pylist(),
        links["dst_url"].to_pylist(),
    ):
        s = url_to_id.get(f"repo://{r}/{p}")
        d = url_to_id.get(u)
        if s is not None and d is not None:
            edges.add((s, d))
    pr = reference_pagerank(sorted(edges))
    return OracleIndex(doc_rows, pagerank=pr)


@pytest.fixture(scope="session")
def engine(built_index):
    return QueryEngine(built_index)


def _assert_rank_identical(got, want, context=""):
    """Rank-identity modulo score ties: scores equal to 1e-9 and, within
    equal-score groups, the same id sets (FIXTURES.md §4 tie-break note);
    our determinized tie-break (doc_id asc) is asserted exactly."""
    assert len(got) == len(want), f"{context}: {len(got)} vs {len(want)} results"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd and math.isclose(gs, ws, rel_tol=0, abs_tol=1e-9), (
            f"{context}: got ({gd},{gs}) want ({wd},{ws})\n{got}\n{want}"
        )


@pytest.mark.parametrize("qid,query,k", QUERY_SET, ids=[q[0] for q in QUERY_SET])
def test_rank_identity(engine, oracle, qid, query, k):
    want = oracle.search(query)
    result = engine.query(query)
    got = engine.rank(result.documents, result.query_words)
    _assert_rank_identical(got, want, context=qid)


@pytest.mark.parametrize("mode", ["auto", "wand", "bmw", "bmw_cold"])
@pytest.mark.parametrize("qid,query,k", QUERY_SET, ids=[q[0] for q in QUERY_SET])
def test_topk_modes_equal_oracle(engine, oracle, qid, query, k, mode):
    want = oracle.search(query, k=k)
    got = engine.search_topk(query, k=k, mode=mode)
    _assert_rank_identical(got, want, context=f"{mode}:{qid}")


def test_pagerank_matches_oracle(built_index, oracle):
    from seekr_ray.query.store import load_pagerank

    ids, ranks = load_pagerank(built_index)
    got = dict(zip(ids.tolist(), ranks.tolist()))
    want = oracle.pagerank
    assert set(got) == set(want)
    for node, r in want.items():
        assert math.isclose(got[node], r, rel_tol=0, abs_tol=1e-12), node
    # probability mass sanity
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-3)


def test_content_sha256_invariant(built_index):
    """Per-row invariant (BASELINE.json input_hint): stored sha256 equals
    sha256 of the stored content, and matches the source row's content."""
    import hashlib

    from seekr_ray.build import read_docs_table

    tbl = read_docs_table(built_index, columns=["content", "content_sha256"])
    for content, sha in zip(
        tbl["content"].to_pylist(), tbl["content_sha256"].to_pylist()
    ):
        assert hashlib.sha256(content.encode()).hexdigest() == sha


def test_dedup_kept_min_doc_id(built_index):
    from seekr_ray.build import read_docs_table

    tbl = read_docs_table(built_index, columns=["doc_id", "content_sha256"])
    shas = tbl["content_sha256"].to_pylist()
    assert len(shas) == len(set(shas)), "duplicate content survived dedup"
    # source corpus had N_DOCS rows with ~2% duplicate pairs
    src = pq.read_table(cached_corpus_path(N_DOCS))
    n_unique = len(set(src["content"].to_pylist()))
    assert len(shas) == n_unique


def test_total_count_and_pagination(engine, oracle):
    want = oracle.search("parse")
    page0 = engine.search("parse", page=0, size=5)
    assert page0["total_count"] == len(want)
    assert [r["doc_id"] for r in page0["results"]] == [d for d, _ in want[:5]]
    page1 = engine.search("parse", page=1, size=5)
    assert [r["doc_id"] for r in page1["results"]] == [d for d, _ in want[5:10]]
    # out-of-range page: empty results, correct total (BackendManager.java:336-339)
    far = engine.search("parse", page=1000, size=5)
    assert far["results"] == [] and far["total_count"] == len(want)


def test_snippets_present_and_highlighted(engine):
    out = engine.search("parse", page=0, size=3)
    assert out["results"]
    for r in out["results"]:
        assert r["snippet"]
        # the matched word is highlighted when present in the snippet
        if "parse" in r["snippet"].lower():
            assert "<strong>" in r["snippet"]


def test_suggestions(engine):
    sugg = engine.suggest("par")
    assert sugg == sorted(sugg)[: len(sugg)] or sugg  # ordered by rank key
    assert all(s.startswith("par") for s in sugg)
    assert len(sugg) <= 5
    # exact match ranks first (BackendManager.java:423-428)
    sugg2 = engine.suggest("pars")
    if "pars" in sugg2:
        assert sugg2[0] == "pars"
    assert engine.suggest("") == []


def test_query_cache_hit_consistency(engine, oracle):
    r1 = engine.query("parse buffer")
    r2 = engine.query("PARSE  buffer".lower())
    # same normalized key -> cached object with identical ranking
    g1 = engine.rank(r1.documents, r1.query_words)
    g2 = engine.rank(r2.documents, r2.query_words)
    assert g1 == g2


# ---------------------------------------------------------------------------
# BM25 scorer (engine.bm25_topk) vs a brute-force in-process oracle
# ---------------------------------------------------------------------------

from seekr_ray.query.parser import detect_operator, is_quoted, tokenize_and_stem

BM25_PLAIN = [
    (qid, q, k)
    for qid, q, k in QUERY_SET
    if q.strip() and not detect_operator(q) and not is_quoted(q.strip())
]


@pytest.fixture(scope="session")
def bm25_oracle_state(built_index, oracle):
    """Per-doc dl (the tokenizer's n_valid) + avgdl over the SAME doc set
    the build tokenized (kept docs), straight from the raw corpus rows —
    independent of the doclen/ sidecar under test."""
    from seekr_ray.build import read_docs_table
    from seekr_ray.text.tokenizer import Tokenizer

    tok = Tokenizer()
    tbl = read_docs_table(built_index, columns=["doc_id", "content"])
    dls = {}
    for doc_id, content in zip(
        tbl["doc_id"].to_pylist(), tbl["content"].to_pylist()
    ):
        _info, n_valid = tok.tokenize_document(content or "")
        dls[doc_id] = n_valid
    avgdl = sum(dls.values()) / len(dls)
    return dls, avgdl


def _bm25_reference(oracle, dls, avgdl, query, k, k1=1.2, b=0.75):
    """Reference BM25: same expression shape as engine._bm25_contribs
    (c=len(positions), dl from the tokenizer), per-doc accumulation in
    query-stem order, 0.7/0.3 pagerank blend, (score desc, id asc)."""
    stems, _ = tokenize_and_stem(query)
    scores: dict[int, float] = {}
    for s in stems:
        posting = oracle.postings.get(s)
        if not posting:
            continue
        idf = oracle.idf[s]
        for doc_id, (_tf, pos) in posting.items():
            dl = float(dls[doc_id])
            c = float(len(pos))
            contrib = idf * (
                (c * (k1 + 1.0)) / (c + k1 * (1.0 - b + b * dl / avgdl))
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + contrib
    blended = [
        (d, 0.7 * s + 0.3 * oracle.pagerank.get(d, 0.0))
        for d, s in scores.items()
    ]
    blended.sort(key=lambda t: (-t[1], t[0]))
    return blended[:k]


@pytest.mark.parametrize("mode", ["auto", "wand", "bmw", "bmw_cold"])
@pytest.mark.parametrize(
    "qid,query,k", BM25_PLAIN, ids=[q[0] for q in BM25_PLAIN]
)
def test_bm25_rank_identity(
    engine, oracle, bm25_oracle_state, qid, query, k, mode
):
    dls, avgdl = bm25_oracle_state
    want = _bm25_reference(oracle, dls, avgdl, query, k)
    got = engine.bm25_topk(query, k=k, mode=mode)
    _assert_rank_identical(got, want, context=f"bm25:{mode}:{qid}")


def test_bm25_rejects_operator_queries(engine):
    with pytest.raises(ValueError):
        engine.bm25_topk("parse AND buffer")
    with pytest.raises(ValueError):
        engine.bm25_topk('"parse buffer"')


def test_bm25_differs_from_tfidf_on_length(engine):
    """BM25's length normalization must actually change the ranking
    somewhere in the fixture corpus (guards against the scorer silently
    collapsing to tf·idf)."""
    diffs = 0
    for _qid, q, k in BM25_PLAIN:
        a = [d for d, _ in engine.bm25_topk(q, k=k)]
        b = [d for d, _ in engine.search_topk(q, k=k)]
        if a != b:
            diffs += 1
    assert diffs > 0


def test_doclen_sidecar_matches_tokenizer(built_index, bm25_oracle_state):
    from seekr_ray.query.store import load_doclens

    dls, avgdl = bm25_oracle_state
    ids, sidecar_dls, sidecar_avgdl = load_doclens(built_index)
    got = dict(zip(ids.tolist(), sidecar_dls.tolist()))
    assert got == dls
    assert math.isclose(sidecar_avgdl, avgdl, rel_tol=0, abs_tol=0)
