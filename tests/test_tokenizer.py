"""Tokenizer semantics tests (reference parity: Tokenizer.java behaviors)."""

import math

from seekr_ray.text.tokenizer import (
    SECTION_WEIGHTS,
    Tokenizer,
    is_valid_word,
)


def test_validity_filter():
    # Tokenizer.java:118-123
    assert is_valid_word("hello")
    assert not is_valid_word("a")  # too short
    assert not is_valid_word("x" * 46)  # too long
    assert is_valid_word("x" * 45)
    assert not is_valid_word("don't")  # apostrophe fails ^[a-zA-Z]+$
    assert not is_valid_word("snake_case")  # underscore fails
    assert not is_valid_word("abc123")  # digits fail
    assert not is_valid_word("the")  # stopword
    assert is_valid_word("the", remove_stopwords=False)


def test_tokenize_string_filters_and_stems():
    t = Tokenizer()
    # "don't" is one regex token (apostrophe kept by \b[\w']+\b) and is then
    # dropped by the charset filter; "the" is a stopword; "running" stems.
    out = t.tokenize_string("The running don't x foo_bar Cats 42")
    assert out == ["run", "cat"]


def test_tokenize_string_mixed_case():
    t = Tokenizer()
    assert t.tokenize_string("RUNNING Running running") == ["run", "run", "run"]


def test_tokenize_document_tf_and_positions():
    t = Tokenizer()
    # valid stream after filtering: parsing->parse, jumps->jump, parsed->parse
    info, total = t.tokenize_document("the parsing jumps and parsed")
    assert total == 3
    assert set(info) == {"pars", "jump"}
    tf_pars, pos_pars = info["pars"]
    tf_jump, pos_jump = info["jump"]
    assert math.isclose(tf_pars, 2 / 3)
    assert math.isclose(tf_jump, 1 / 3)
    assert pos_pars == [0, 2]
    assert pos_jump == [1]


def test_denominator_counts_valid_stems_only():
    # Reference quirk (Tokenizer.java:255-259): denominator re-validates the
    # *stemmed* token.  "parsing" stems to "pars" (valid, non-stopword);
    # "wanted" (not a stopword) stems to "want" which IS a stopword ->
    # excluded from the denominator but still indexed with its weight.
    t = Tokenizer()
    from seekr_ray.text.porter import stem
    from seekr_ray.text.stopwords import STOPWORDS

    assert "wanted" not in STOPWORDS and stem("wanted") == "want"
    assert "want" in STOPWORDS  # precondition for this test
    info, total = t.tokenize_document("wanted parsing")
    assert total == 1  # only "pars" counts
    assert math.isclose(info["want"][0], 1.0)  # 1.0 / 1
    assert math.isclose(info["pars"][0], 1.0)


def test_empty_and_stopword_only_docs():
    t = Tokenizer()
    info, total = t.tokenize_document("")
    assert info == {} and total == 0
    # stopword-only: nothing survives
    info, total = t.tokenize_document("the and of to")
    assert info == {} and total == 0


def test_sections_weighting():
    t = Tokenizer()
    info, total = t.tokenize_sections(
        [("title", "kernel"), ("content", "kernel module")]
    )
    # kernel appears in title (w=5) and content (w=1); module in content.
    # total valid = 1 (title) + 2 (content) = 3
    assert total == 3
    tf_kernel, pos_kernel, best_kernel = info["kernel"]
    assert math.isclose(tf_kernel, 6.0 / 3)
    assert best_kernel == "title"
    assert pos_kernel == [0, 0]  # per-section indices interleaved
    tf_module, _, best_module = info["modul"]
    assert math.isclose(tf_module, 1.0 / 3)
    assert best_module == "content"


def test_section_weight_table():
    assert SECTION_WEIGHTS["title"] == 5.0
    assert SECTION_WEIGHTS["h6"] == 1.5
    assert SECTION_WEIGHTS["content"] == 1.0


def test_tokenize_batch_vectorized_golden_vs_scalar():
    """The Arrow/numpy vectorized tokenize kernel emits value-identical
    postings to the per-doc scalar kernel (order-insensitive), including
    the apostrophe/underscore/stopword/denominator edge cases."""
    import pandas as pd
    import pyarrow as pa

    from seekr_ray.stages.tokenize import (
        tokenize_batch,
        tokenize_batch_scalar,
    )

    docs = [
        "'abc' don't '' x_y the THE Parse",  # quote-strip, drops, case
        "",  # empty content
        None,  # null content
        "'''",  # all-apostrophe run
        "a " * 30,  # all below MIN_WORD_LENGTH
        "the of and",  # all stopwords (denominator 0)
        "parsing parsed parser traveling'",  # stemming + trailing quote
        "buffer buffer buffer index",  # tf normalization
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(100, 100 + len(docs)), pa.int64()),
            "content": pa.array(docs, pa.string()),
        }
    )

    def norm(tbl):
        return (
            tbl.to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(
        norm(tokenize_batch_scalar(batch, num_partitions=8)),
        norm(tokenize_batch(batch, num_partitions=8)),
    )
    # fixture corpus slab
    from seekr_ray.fixtures import cached_corpus_path
    import pyarrow.parquet as pq

    tbl = pq.read_table(cached_corpus_path(2000))
    if "doc_id" not in tbl.column_names:
        tbl = tbl.append_column(
            "doc_id", pa.array(range(tbl.num_rows), pa.int64())
        )
    tbl = tbl.slice(0, 500)
    pd.testing.assert_frame_equal(
        norm(tokenize_batch_scalar(tbl)), norm(tokenize_batch(tbl))
    )
