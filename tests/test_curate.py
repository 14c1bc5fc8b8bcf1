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
