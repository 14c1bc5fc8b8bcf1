"""Snippet generator (M8/M9) and query parser (M11/B4) unit tests."""

from seekr_ray.query.parser import (
    detect_operator,
    is_quoted,
    split_query,
    strip_quotes,
    tokenize_and_stem,
)
from seekr_ray.query.snippets import NO_PREVIEW, clean_html, generate_snippet


# -- parser ------------------------------------------------------------------


def test_detect_operator_precedence():
    # OR > AND > NOT by detection order (QP.java:368-373)
    assert detect_operator("a OR b AND c") == "OR"
    assert detect_operator("a AND b NOT c") == "AND"
    assert detect_operator("a NOT b") == "NOT"
    assert detect_operator("AND a") == ""  # needs surrounding spaces
    assert detect_operator("a and b") == ""  # case-sensitive


def test_split_query_limit_2():
    assert split_query("a OR b OR c") == ["a", "b OR c"]
    assert split_query("  a AND b ") == ["a", "b"]
    assert split_query("plain") == ["plain"]


def test_quotes():
    assert is_quoted('"x y"')
    assert not is_quoted('"x')
    assert strip_quotes('"x y"') == "x y"
    assert strip_quotes('"') == ""


def test_tokenize_and_stem_no_validity_filter():
    # query-side stemming has NO stopword/length filter (QP.java:379-422)
    stems, s2o = tokenize_and_stem("The RUNNING and running")
    assert stems == ["the", "run", "and"]
    # last-writer original, original case preserved
    assert s2o["run"] == "running"
    assert s2o["the"] == "The"


def test_tokenize_and_stem_quoted_single_token():
    # a still-quoted string is ONE token (QP.java:392)
    stems, _ = tokenize_and_stem('"travel connect"')
    assert len(stems) == 1


def test_tokenize_and_stem_empty():
    assert tokenize_and_stem("") == ([], {})
    assert tokenize_and_stem("   ") == ([], {})


# -- snippets ----------------------------------------------------------------


def test_clean_html_strips_tags_and_entities():
    html = "<p>Hello &amp; <b>world</b></p><script>evil()</script>"
    out = clean_html(html)
    assert "script" not in out and "evil" not in out
    assert "Hello & world" in out


def test_snippet_highlights_query_word():
    text = "alpha beta gamma. " * 20 + "the needle appears here. " + "delta " * 20
    snip = generate_snippet(text, {}, {"needle"})
    assert "<strong>needle</strong>" in snip


def test_snippet_no_match_fallback():
    assert generate_snippet("", {}, {"x"}) == NO_PREVIEW
    # no query word anywhere and no usable wordInfo position
    out = generate_snippet("short text", {}, {"zzz"})
    assert out == NO_PREVIEW


def test_snippet_wordinfo_frequency_fallback():
    # quirk: wordInfo [frequency, idf] first element used as char offset
    # (BackendManager.java:174-188)
    text = "abcdef " * 50
    out = generate_snippet(text, {"zzz": (3.0, 1.0)}, {"zzz"})
    # position 3 < len -> snippet generated (no query word highlight)
    assert out != NO_PREVIEW


def test_snippet_ellipses():
    text = "word " * 200
    snip = generate_snippet(text, {}, {"word"})
    assert snip.endswith("...")


def test_phrase_walk_vectorized_golden():
    """_phrase_walk_vectorized == _check_sequential_positions on random
    position lists (incl. the cursor-slide quirk cases)."""
    import numpy as np

    from seekr_ray.query.engine import (
        _check_sequential_positions,
        _phrase_walk_vectorized,
    )

    rng = np.random.default_rng(7)
    for trial in range(200):
        n_words = int(rng.integers(3, 6))
        n_docs = int(rng.integers(1, 8))
        gap = int(rng.integers(1, 5))
        per_doc: list[list[np.ndarray]] = []
        flats = []
        for wi in range(n_words):
            doc_lists = []
            for d in range(n_docs):
                n = int(rng.integers(0, 12))
                pos = np.unique(rng.integers(0, 30, size=n).astype(np.uint64))
                doc_lists.append(pos)
            doc_lists_arr = doc_lists
            flat = (
                np.concatenate(doc_lists_arr)
                if doc_lists_arr
                else np.empty(0, np.uint64)
            )
            offs = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum([len(x) for x in doc_lists_arr], out=offs[1:])
            flats.append((flat, offs))
            per_doc.append(doc_lists_arr)
        got = set(_phrase_walk_vectorized(flats, gap).tolist())
        want = set()
        for d in range(n_docs):
            lists = [per_doc[wi][d] for wi in range(n_words)]
            if any(x.size == 0 for x in lists):
                continue
            if _check_sequential_positions(lists, gap):
                want.add(d)
        assert got == want, (trial, got, want)
