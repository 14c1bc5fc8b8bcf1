"""Unit semantics for pivot_counts and running_sum_per_group (DuckDB
equivalence runs in test_entry_contract.py; these cover edges the
fixture lacks: out-of-domain categories, keys missing some categories,
FP order of the grouped cumsum vs a per-group sequential sum)."""

import numpy as np
import pandas as pd


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(4)


def test_pivot_counts_matches_pandas_crosstab(ray_session):
    from seekr_ray.extras.stats import pivot_counts

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 20, 300).astype(np.int64),
            "c": rng.choice(["a", "b", "c", "zz"], 300),  # zz out of domain
        }
    )
    got = (
        pivot_counts(_ds(df), key_col="k", pivot_col="c", categories=["a", "b", "c"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.crosstab(df.k, df.c)
        .reindex(columns=["a", "b", "c"], fill_value=0)
        .reset_index()
    )
    want.columns.name = None
    # EVERY key appears — one whose rows are all out-of-domain gets an
    # all-zero row, matching SQL's GROUP BY
    assert got.k.tolist() == sorted(df.k.unique().tolist())
    got_nz = got.set_index("k").reindex(want.k)
    for c in ["a", "b", "c"]:
        assert got_nz[c].tolist() == want[c].astype("int64").tolist()


def test_running_sum_matches_sequential_per_group(ray_session):
    from seekr_ray.extras.textstats import round6
    from seekr_ray.extras.windows import running_sum_per_group

    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 17, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 10**6, n), unit="s"
            ).astype("datetime64[us]"),
            "value": np.round(rng.uniform(0, 500, n), 2),
        }
    )
    got = (
        running_sum_per_group(_ds(df), num_buckets=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["running"] = want.groupby("user_id")["value"].cumsum()
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got.event_id.tolist() == want.event_id.tolist()
    assert got.user_id.tolist() == want.user_id.tolist()
    assert got.running_value.tolist() == [round6(v) for v in want.running]


def test_term_pmi_hand_computed(ray_session):
    import math

    from seekr_ray.extras.textstats import round6, term_cooccurrence_pmi

    # alpha+bravo co-occur in 2 of 4 docs; alpha df=3, bravo df=2
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha bravo",
                "alpha bravo",
                "alpha charlie",
                "charlie delta",
            ],
        }
    )
    got = (
        term_cooccurrence_pmi(_ds(docs), min_docs=2)
        .to_pandas()
        .set_index(["term_a", "term_b"])
    )
    assert got.loc[("alpha", "bravo"), "n_docs"] == 2
    want = round6(math.log10(4 * 2 / (3 * 2)))
    assert got.loc[("alpha", "bravo"), "pmi"] == want
    # pairs seen once (alpha-charlie, charlie-delta) filtered by min_docs
    assert ("alpha", "charlie") not in got.index
    assert ("charlie", "delta") not in got.index


def test_mixture_sample_thresholds_and_determinism(ray_session):
    from seekr_ray.extras.split import mixture_sample
    from seekr_ray.extras.textstats import simple_tokens

    rng = np.random.RandomState(5)
    words = ["alpha", "bravo", "delta", "omega"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "lang": rng.choice(["aa", "bb"], 300, p=[0.8, 0.2]),
            "text": [
                " ".join(rng.choice(words, size=20)) for _ in range(300)
            ],
        }
    )
    # bb's target far exceeds its supply -> keep-all; aa downsamples
    got = (
        mixture_sample(
            _ds(docs),
            token_budget=2000,
            weights_permille={"aa": 200, "bb": 800},
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_bb_in = int((docs.lang == "bb").sum())
    assert (got.lang == "bb").sum() == n_bb_in  # capped at keep-all
    n_aa_kept = int((got.lang == "aa").sum())
    assert 0 < n_aa_kept < (docs.lang == "aa").sum()  # downsampled
    # kept aa tokens land near budget*weight = 400
    aa_tokens = int(got[got.lang == "aa"].n_tokens.sum())
    assert 150 <= aa_tokens <= 800
    # determinism: identical output across partitionings
    got2 = (
        mixture_sample(
            _ds(docs).repartition(7),
            token_budget=2000,
            weights_permille={"aa": 200, "bb": 800},
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
    # token counts are the simplified-tokenizer counts
    row = got.iloc[0]
    assert row.n_tokens == len(
        simple_tokens(docs.set_index("doc_id").loc[row.doc_id, "text"])
    )


def test_prefix_join_equals_bruteforce(ray_session):
    """PPJoin prefix filtering must reproduce the brute-force block-pair
    join exactly (same pairs, same 6dp jaccard)."""
    from seekr_ray.extras.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rng = np.random.RandomState(13)
    words = ["alpha", "bravo", "delta", "omega", "sigma", "kappa"]
    base = [" ".join(rng.choice(words, size=12)) for _ in range(40)]
    # add near-dups: copy with one word changed
    texts = base + [t.replace("alpha", "kappa", 1) for t in base[:10]]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        }
    )
    brute = (
        ngram_jaccard_pairs(_ds(docs), k=3, threshold=0.3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pref = (
        ngram_jaccard_pairs_prefix(_ds(docs), k=3, threshold_mille=300)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(brute) > 0  # non-vacuous
    pd.testing.assert_frame_equal(brute, pref)


def test_prefix_join_distributed_rank_path(ray_session):
    """Forcing driver_rank_limit below the vocabulary size must route
    through the heavy-hitter (no full-vocab collect) order and still
    reproduce the brute-force pair set exactly — the prefix theorem
    holds under ANY global total order."""
    from seekr_ray.extras.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rng = np.random.RandomState(29)
    words = ["alpha", "bravo", "delta", "omega", "sigma", "kappa", "zeta"]
    base = [" ".join(rng.choice(words, size=14)) for _ in range(35)]
    texts = base + [t.replace("omega", "zeta", 1) for t in base[:12]]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        }
    )
    brute = (
        ngram_jaccard_pairs(_ds(docs), k=3, threshold=0.3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # vocab here is far above 1, so limit=1 forces the scale regime;
    # heavy_k=3 additionally exercises the truncated heavy set (most
    # shingles fall in the unranked df=0 tail)
    pref = (
        ngram_jaccard_pairs_prefix(
            _ds(docs),
            k=3,
            threshold_mille=300,
            driver_rank_limit=1,
            heavy_k=3,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(brute) > 0
    pd.testing.assert_frame_equal(brute, pref)


def test_term_pmi_top_v_caps_pair_space(ray_session):
    """top_v keeps only the V highest-df terms: the pair space is
    bounded by the capped vocabulary, surviving pairs keep their exact
    uncapped PMI (df and N stay corpus-global), and the selection is
    deterministic across partitionings."""
    from seekr_ray.extras.textstats import term_cooccurrence_pmi

    rng = np.random.RandomState(17)
    # df-ranked vocabulary: "high*" words appear everywhere, tail words
    # rarely
    texts = []
    for i in range(60):
        toks = ["higha", "highb", "highc"]
        toks += list(rng.choice(["mid%d" % j for j in range(8)], size=3))
        toks += ["rare%d" % i]
        texts.append(" ".join(toks))
    docs = pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    )
    full = (
        term_cooccurrence_pmi(_ds(docs), min_docs=2)
        .to_pandas()
        .set_index(["term_a", "term_b"])
        .sort_index()
    )
    capped = (
        term_cooccurrence_pmi(_ds(docs), min_docs=2, top_v=3)
        .to_pandas()
        .set_index(["term_a", "term_b"])
        .sort_index()
    )
    # pair space bounded: C(3,2) = 3 pairs at most, all within the
    # top-3-df terms
    assert len(capped) == 3
    assert set(capped.index) == {
        ("higha", "highb"),
        ("higha", "highc"),
        ("highb", "highc"),
    }
    # surviving pairs carry the exact uncapped values
    pd.testing.assert_frame_equal(capped, full.loc[capped.index])
    # deterministic across block layouts
    capped2 = (
        term_cooccurrence_pmi(_ds(docs).repartition(7), min_docs=2, top_v=3)
        .to_pandas()
        .set_index(["term_a", "term_b"])
        .sort_index()
    )
    pd.testing.assert_frame_equal(capped, capped2)
