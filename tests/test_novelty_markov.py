"""Unit tests for ngram_novelty, lang_unigram_kl,
event_type_transitions, and dedup_cluster_winners (driver-level
semantics on tiny handcrafted fixtures; the contract audit covers the
DuckDB bit-parity at sf0.01)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_ngram_novelty_attribution():
    from seekr_ray.extras.novelty import ngram_novelty

    # doc 1: "alpha beta gamma delta" -> trigrams {a b g, b g d}
    # doc 2 repeats doc 1's text + new tail -> shares both, adds 2 new
    # doc 3: too short for trigrams -> 0 shingles, novelty 0.0
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "alpha beta"),
    ]
    out = (
        pa.concat_tables(
            ngram_novelty(_docs(rows), k=3).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_ngrams"] == 2 and out.loc[1, "n_novel"] == 2
    assert out.loc[1, "novelty"] == 1.0
    assert out.loc[2, "n_ngrams"] == 4 and out.loc[2, "n_novel"] == 2
    assert out.loc[2, "novelty"] == 0.5
    assert out.loc[3, "n_ngrams"] == 0 and out.loc[3, "novelty"] == 0.0


def test_ngram_novelty_layout_invariant():
    from seekr_ray.extras.novelty import ngram_novelty

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(0, 12))))
        for i in range(60)
    ]
    outs = []
    for parts in (1, 5):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        ).repartition(parts)
        df = (
            pa.concat_tables(
                ngram_novelty(ds, k=3).iter_batches(batch_format="pyarrow")
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_lang_kl_matches_direct_numpy():
    from seekr_ray.extras.divergence import lang_unigram_kl
    from seekr_ray.extras.textstats import ENTROPY_SCALE, simple_tokens

    import ray.data as rd

    rows = [
        (1, "en", "alpha beta beta gamma"),
        (2, "en", "alpha gamma gamma gamma"),
        (3, "de", "beta beta delta"),
        (4, "de", "delta delta alpha"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(2)
    out = (
        pa.concat_tables(
            lang_unigram_kl(ds).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index("lang")
    )
    # direct reference
    cl: dict = {}
    for _, lang, text in rows:
        for t in simple_tokens(text):
            cl[(lang, t)] = cl.get((lang, t), 0) + 1
    cg: dict = {}
    for (lang, t), c in cl.items():
        cg[t] = cg.get(t, 0) + c
    nl: dict = {}
    for (lang, t), c in cl.items():
        nl[lang] = nl.get(lang, 0) + c
    n = float(sum(nl.values()))
    expect: dict = {}
    for (lang, t), c in cl.items():
        pl = c / nl[lang]
        pg = cg[t] / n
        q = math.floor(pl * np.log2(pl / pg) * ENTROPY_SCALE)
        expect[lang] = expect.get(lang, 0) + q
    for lang, total in nl.items():
        assert out.loc[lang, "n_tokens"] == total
        assert out.loc[lang, "kl_bits"] == expect[lang] / ENTROPY_SCALE
    # KL >= 0 up to quantization slack (each floor loses < 1e-6)
    n_terms = len(cl)
    for lang in nl:
        assert out.loc[lang, "kl_bits"] >= -(n_terms + 1) / ENTROPY_SCALE


def test_event_transitions_counts_and_prob():
    from seekr_ray.extras.markov import event_type_transitions

    import ray.data as rd

    # user 10: a->b->a ; user 20: a->b ; user 30 single event (no pair)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([10, 10, 10, 20, 20, 30], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(
                    [
                        "2025-01-01 00:00:00",
                        "2025-01-01 00:01:00",
                        "2025-01-01 00:02:00",
                        "2025-01-02 00:00:00",
                        "2025-01-02 00:01:00",
                        "2025-01-03 00:00:00",
                    ]
                ),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a", "b", "a", "a", "b", "a"]),
        }
    )
    out = (
        pa.concat_tables(
            event_type_transitions(
                rd.from_arrow(tbl).repartition(3)
            ).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["prev_type", "next_type"])
        .sort_index()
    )
    assert out.loc[("a", "b"), "n"] == 2
    assert out.loc[("b", "a"), "n"] == 1
    assert out.loc[("a", "b"), "p"] == 1.0  # a -> only b observed
    assert out.loc[("b", "a"), "p"] == 1.0
    assert len(out) == 2  # no cross-user pair, no self rows


def test_event_transitions_tie_order():
    """Equal timestamps break by event_id — the SQL ORDER BY ts,
    event_id law."""
    from seekr_ray.extras.markov import event_type_transitions

    import ray.data as rd

    same_ts = pd.to_datetime(["2025-01-01"] * 3)
    tbl = pa.table(
        {
            "event_id": pa.array([3, 1, 2], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array(same_ts, pa.timestamp("us")),
            "event_type": pa.array(["c", "a", "b"]),
        }
    )
    out = (
        pa.concat_tables(
            event_type_transitions(
                rd.from_arrow(tbl).repartition(2)
            ).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["prev_type", "next_type"])
    )
    assert set(out.index) == {("a", "b"), ("b", "c")}


def test_cluster_winners_law():
    from seekr_ray.extras.canonical import dedup_cluster_winners

    clusters = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 8, 9], pa.int64()),
            "cluster_id": pa.array([1, 1, 1, 8, 8], pa.int64()),
        }
    )
    rows = [
        (1, "alpha beta gamma"),  # 3 tokens
        (2, "alpha beta gamma delta epsilon"),  # 5 tokens -> wins c1
        (3, "alpha beta gamma delta zeta"),  # 5 tokens, higher id
        (8, "alpha beta"),  # 2 tokens -> wins c8 by id tie
        (9, "gamma beta"),  # 2 tokens
        (99, "unclustered text here"),  # not a member: ignored
    ]
    out = (
        pa.concat_tables(
            dedup_cluster_winners(_docs(rows), clusters).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    assert out.loc[1, "winner_doc_id"] == 2  # max tokens, then min id
    assert out.loc[1, "winner_tokens"] == 5 and out.loc[1, "n_docs"] == 3
    assert out.loc[8, "winner_doc_id"] == 8
    assert out.loc[8, "n_docs"] == 2
    assert len(out) == 2


def test_cluster_winners_empty():
    from seekr_ray.extras.canonical import dedup_cluster_winners

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
        }
    )
    out = dedup_cluster_winners(_docs([(1, "alpha beta")]), empty)
    assert isinstance(out, pa.Table) and out.num_rows == 0


def test_grouped_trend_known_line():
    """Points on an exact line recover its slope/intercept."""
    import ray.data as rd

    from seekr_ray.extras.stats import grouped_trend

    days = pd.to_datetime(["1970-01-01", "1970-01-02", "1970-01-03", "1970-01-04"])
    # y = 2.00 + 0.50*x dollars (x in days) for type "a"; constant for "b"
    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "a"]),
            "ts": pa.array(days, pa.timestamp("us")),
            "value": pa.array([2.0, 2.5, 3.0, 3.5], pa.float64()),
        }
    )
    out = (
        pa.concat_tables(
            grouped_trend(
                rd.from_arrow(tbl).repartition(2),
                key_col="event_type",
                ts_col="ts",
                val_col="value",
            ).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["a", "slope"] == 0.5
    assert out.loc["a", "intercept"] == 2.0
    assert out.loc["a", "n"] == 4


def test_grouped_trend_zero_variance_guard():
    import ray.data as rd

    from seekr_ray.extras.stats import grouped_trend

    same_day = pd.to_datetime(["1970-01-05 01:00", "1970-01-05 23:00"])
    tbl = pa.table(
        {
            "event_type": pa.array(["c", "c"]),
            "ts": pa.array(same_day, pa.timestamp("us")),
            "value": pa.array([1.0, 9.0], pa.float64()),
        }
    )
    out = (
        pa.concat_tables(
            grouped_trend(
                rd.from_arrow(tbl),
                key_col="event_type",
                ts_col="ts",
                val_col="value",
            ).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .iloc[0]
    )
    assert out["slope"] == 0.0 and out["intercept"] == 0.0


def test_transition_entropy_law():
    """Uniform 2-way next distribution -> 1 bit; deterministic -> 0."""
    import ray.data as rd

    from seekr_ray.extras.markov import transition_entropy

    # user 1: a->b, a->c (via two a's), so a has next {b, c} once each;
    # b->a deterministic
    ts = pd.to_datetime(
        ["2025-01-01 00:00", "2025-01-01 00:01", "2025-01-01 00:02",
         "2025-01-01 00:03", "2025-01-01 00:04"]
    )
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 1], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "a", "c", "a"]),
        }
    )
    out = (
        pa.concat_tables(
            transition_entropy(
                rd.from_arrow(tbl).repartition(2)
            ).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index("prev_type")
    )
    assert out.loc["a", "n_total"] == 2 and out.loc["a", "entropy"] == 1.0
    assert out.loc["b", "entropy"] == 0.0 and out.loc["c", "entropy"] == 0.0
