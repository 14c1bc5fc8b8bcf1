"""REST parity: /api/search and /api/suggestions mirror the reference
controllers' response shapes and status-code behavior
(SearchController.java:27-51, SearchSuggestionsController.java:21-33)."""

import json
import os
import urllib.error
import urllib.request

import pytest

INDEX_DIR = "/tmp/seekr_test_index"


@pytest.fixture(scope="module")
def server(ray_session):
    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.config import IndexConfig
    from seekr_ray.fixtures import cached_corpus_path, cached_links_path
    from seekr_ray.query.engine import QueryEngine
    from seekr_ray.query.http_api import SearchHTTPServer

    if not os.path.exists(os.path.join(INDEX_DIR, "meta.json")):
        build_index(
            rd.read_parquet(cached_corpus_path(120)),
            INDEX_DIR,
            IndexConfig(
                num_term_partitions=4,
                num_id_partitions=4,
                hot_df_threshold=40,
                postings_per_chunk=16,
            ),
            key_cols=["repo", "path", "commit"],
            links_ds=rd.read_parquet(cached_links_path(120)),
        )
    srv = SearchHTTPServer(QueryEngine(INDEX_DIR)).start()
    yield srv
    srv.shutdown()


def _get(server, path):
    return urllib.request.urlopen(
        f"http://{server.host}:{server.port}{path}", timeout=10
    )


def test_search_endpoint_shape(server):
    with _get(server, "/api/search?query=parse&size=3") as r:
        assert r.status == 200
        out = json.loads(r.read())
    assert set(out) == {"results", "totalCount"}
    assert out["totalCount"] > 0
    assert 0 < len(out["results"]) <= 3
    for res in out["results"]:
        assert set(res) == {"url", "title", "score", "snippet"}
        assert res["url"].startswith("repo://")


def test_search_pagination_and_clamps(server):
    with _get(server, "/api/search?query=parse&page=0&size=5") as r:
        p0 = json.loads(r.read())
    with _get(server, "/api/search?query=parse&page=1&size=5") as r:
        p1 = json.loads(r.read())
    assert p0["results"] != p1["results"]
    # size outside (0, 100] falls back to 10 (SearchController.java:42-44)
    with _get(server, "/api/search?query=parse&size=1000") as r:
        big = json.loads(r.read())
    assert len(big["results"]) <= 10
    # negative page: 400 with an empty-response body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/api/search?query=parse&page=-1")
    assert ei.value.code == 400
    assert json.loads(ei.value.read()) == {"results": [], "totalCount": 0}


def test_blank_query_is_400(server):
    for path in ("/api/search?query=+", "/api/search", "/api/suggestions?q=+"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server, path)
        assert ei.value.code == 400


def test_suggestions_endpoint(server):
    with _get(server, "/api/suggestions?q=par") as r:
        assert r.status == 200
        out = json.loads(r.read())
    assert isinstance(out, list) and out
    assert all(isinstance(s, str) and s.startswith("par") for s in out)


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/api/nope")
    assert ei.value.code == 404


def test_web_ui_served_and_wired(server):
    """GET / serves the static search page, and the endpoints the page's
    JS calls (relative /api/search, /api/suggestions) work on the same
    origin — the reference React flow (App.jsx, SearchSuggestions.jsx)
    without the node build step."""
    for path in ("/", "/index.html"):
        with _get(server, path) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
    assert "<title>Seekr</title>" in page
    # the page must call the two endpoints with the parameter names the
    # server parses (query=/page=/size= and q=)
    assert "/api/search?query=" in page
    assert "/api/suggestions?q=" in page
    assert "totalCount" in page  # reads the reference response shape
    # same-origin round trip the page's JS performs on submit
    with _get(server, "/api/search?query=parse&page=0&size=10") as r:
        out = json.loads(r.read())
    assert out["totalCount"] > 0
    assert "<strong>" in out["results"][0]["snippet"]  # highlight contract


def test_bm25_scorer_param(server):
    """?scorer=bm25 serves the ranking surface: docId+score rows, the
    reference params untouched by default; bad scorer/mode -> 400;
    boolean queries under bm25 -> 400 (reference tf·idf semantics)."""
    with _get(server, "/api/search?query=parse&scorer=bm25&size=3") as r:
        assert r.status == 200
        out = json.loads(r.read())
    assert out["scorer"] == "bm25"
    assert out["results"] and set(out["results"][0]) == {"docId", "score"}
    # mode plumbs through (bmw_cold falls back safely on any workload)
    with _get(
        server, "/api/search?query=parse&scorer=bm25&mode=bmw_cold&size=3"
    ) as r:
        assert r.status == 200
        out2 = json.loads(r.read())
    assert [x["docId"] for x in out2["results"]] == [
        x["docId"] for x in out["results"]
    ]
    for bad in (
        "/api/search?query=parse&scorer=nope",
        "/api/search?query=parse&scorer=bm25&mode=typo",
        "/api/search?query=parse%20AND%20buffer&scorer=bm25",
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, bad)
        assert e.value.code == 400


def test_did_you_mean_on_zero_hits(server):
    """A typo'd token (edit distance 1 from a vocab term) with zero
    hits returns a didYouMean; the corrected query has results."""
    from seekr_ray.query.engine import QueryEngine

    e = QueryEngine(INDEX_DIR)
    fixes = e.suggest_correction("tokxn")  # -> "token" (stem fixpoint)
    assert fixes == {"tokxn": "token"}
    # a typo whose only vocab neighbor is NOT a stemming fixpoint gets
    # no correction rather than one that would search into zero hits
    # ("parsq" -> "pars" re-stems to the missing "par")
    assert e.suggest_correction("parsq") == {}
    with _get(server, "/api/search?query=tokxn") as r:
        out = json.loads(r.read())
    assert out["totalCount"] == 0
    assert "didYouMean" in out
    with _get(server, f"/api/search?query={out['didYouMean']}") as r:
        out2 = json.loads(r.read())
    assert out2["totalCount"] > 0
    # fully-resolving queries return no correction
    assert e.suggest_correction("parse") == {}
