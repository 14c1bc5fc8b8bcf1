"""Actor-pool serving layer returns the same results as a local engine."""

import os

import pytest


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


def test_service_matches_local_engine(index_dir):
    from seekr_ray.query.engine import QueryEngine
    from seekr_ray.query.service import SearchService

    svc = SearchService(index_dir, num_actors=2)
    local = QueryEngine(index_dir)
    try:
        for q in ["parse", "parse buffer", "parse AND buffer", '"travel connect"']:
            got = svc.search_topk(q, 10)
            want = local.search_topk(q, 10)
            assert [(d, round(s, 12)) for d, s in got] == [
                (d, round(s, 12)) for d, s in want
            ], q
        out = svc.search("parse", page=0, size=3)
        want_out = local.search("parse", page=0, size=3)
        assert [r["doc_id"] for r in out["results"]] == [
            r["doc_id"] for r in want_out["results"]
        ]
        assert out["total_count"] == want_out["total_count"]
        assert svc.suggest("par") == local.suggest("par")
        assert svc.total_hits("parse") == local.total_hits("parse")
        many = svc.search_many(["parse", "buffer", "parse"], k=5)
        assert many[0] == many[2]
    finally:
        svc.shutdown()


def test_scatter_suggest_and_correction_match_single_engine(index_dir):
    """Round-5: suggestions and did-you-mean scatter by term-partition
    slice — driver merges must equal the single-engine answers exactly,
    and the warm-build shards (every actor holds one slice only)."""
    from seekr_ray.query.engine import QueryEngine
    from seekr_ray.query.service import SearchService

    import ray

    svc = SearchService(index_dir, num_actors=3)
    local = QueryEngine(index_dir)
    try:
        sizes = ray.get(svc.warm_corrections())
        vocab_total = len(local.store.all_terms_array())
        assert sum(sizes) == vocab_total  # disjoint slices cover the vocab
        assert max(sizes) < vocab_total  # ...and no actor holds it all
        for q in ["tok", "pa", "p", "zzz", "", "token"]:
            for lim in (1, 5, 50):
                assert svc.suggest_scatter(q, lim) == local.suggest(q, lim), (
                    q, lim,
                )
        for q in ["tokxn", "parsq", "parse", "qqqq", "tokxn parsq"]:
            assert (
                svc.suggest_correction_scatter(q)
                == local.suggest_correction(q)
            ), q
    finally:
        svc.shutdown()
