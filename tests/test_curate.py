"""curate_corpus composition semantics: each of the four filters
(dedup winner, min tokens, alpha ratio, language) drops exactly the
crafted offender and nothing else."""

import pandas as pd


def test_curate_corpus_filters(ray_session):
    import ray.data as rd

    from seekr_ray.extras.curate import curate_corpus

    good = (
        "the quick brown foxes jumped over the lazy dogs while "
        "rivers flowed through ancient forests and mountains"
    )
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "lang": ["en"] * 5,
            "text": [
                good,  # survives
                good,  # exact duplicate, higher id -> dropped (dedup)
                "the word",  # too few kept tokens -> dropped
                "1234 5678 !!!! ???? the numbers 9999 0000 "
                "8888 7777 6666 5555 4444",  # low alpha -> dropped
                "zebra quartz jungle vortex plasma nebula "
                "crystal phantom",  # no stopwords -> 'other' -> dropped
            ],
        }
    )
    got = (
        curate_corpus(
            rd.from_pandas(docs).repartition(3),
            min_tokens=5,
            min_alpha_ratio=0.5,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1]
    assert got["lang"].tolist() == ["en"]
    # kept tokens of the good doc: non-stopword [a-z]+ runs, len >= 2
    assert got["n_tokens"].tolist() == [11]


def test_curate_corpus_keeps_all_when_loose(ray_session):
    import ray.data as rd

    from seekr_ray.extras.curate import curate_corpus

    docs = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "lang": ["en", "en"],
            "text": [
                "the sturdy bridge crossed the widest river valley",
                "the narrow path climbed the steepest mountain ridge",
            ],
        }
    )
    got = curate_corpus(
        rd.from_pandas(docs), min_tokens=1, min_alpha_ratio=0.1
    ).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [10, 11]


def test_source_doc_cap_semantics(ray_session):
    """Per-source keep-k: the k LOWEST doc_ids per source survive with
    1-based contiguous ranks; a mega-source is capped, small sources
    pass through whole; the two-phase combiner is batch-layout
    invariant."""
    import ray.data as rd

    from seekr_ray.extras.curate import source_doc_cap

    rows = (
        [{"doc_id": i, "source": "mega"} for i in range(100, 0, -1)]
        + [{"doc_id": 1000 + i, "source": "small"} for i in range(3)]
        + [{"doc_id": 2000, "source": "single"}]
    )
    for blocks in (1, 13):
        ds = rd.from_items(rows, override_num_blocks=blocks)
        out = source_doc_cap(ds, k=5).to_pandas().sort_values(
            ["source", "source_rank"]
        )
        mega = out[out["source"] == "mega"]
        assert list(mega["doc_id"]) == [1, 2, 3, 4, 5]
        assert list(mega["source_rank"]) == [1, 2, 3, 4, 5]
        small = out[out["source"] == "small"]
        assert list(small["doc_id"]) == [1000, 1001, 1002]
        assert list(out[out["source"] == "single"]["doc_id"]) == [2000]
        assert len(out) == 9
