"""Unit tests for extras/fuzzy.py, extras/profile.py, extras/vecquant.py
and textstats.lexical_diversity edge cases.  Contract parity (Ray vs
DuckDB oracle) is covered by the audit sweep; these pin edge semantics
the oracle data never hits."""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seekr_ray.extras.fuzzy import _is_edit1, fuzzy_token_pairs
from seekr_ray.extras.profile import profile_columns
from seekr_ray.extras.vecquant import int8_quantize


def _lev(a, b):
    # reference DP Levenshtein
    dp = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, y in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (x != y))
    return dp[-1]


def test_is_edit1_matches_dp():
    words = ["ab", "ba", "abc", "abd", "abcd", "acd", "bc", "xy",
             "hello", "hallo", "hell", "helloo", "shell", "jello"]
    for a in words:
        for b in words:
            if a != b and abs(len(a) - len(b)) <= 2:
                assert _is_edit1(a, b) == (_lev(a, b) == 1), (a, b)


def _pairs(texts, ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    df = fuzzy_token_pairs(rd.from_arrow(tbl), num_buckets=8).to_pandas()
    return set(zip(df.tok_a, df.tok_b))


def test_fuzzy_pairs_vs_bruteforce(ray_session):
    # vocabulary with substitutions, insertions, deletions, transposes
    # (distance 2 — must NOT pair), duplicates across docs
    texts = [
        "cat cot coat goat cart act tac",
        "cat bat bats stab goat gloat",
        "parse parser sparse spars spare",
    ]
    from seekr_ray.extras.textstats import simple_tokens

    vocab = sorted({t for x in texts for t in simple_tokens(x)})
    want = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if _lev(a, b) == 1
    }
    assert _pairs(texts, None) == want
    # sanity: the fixture actually exercises all three edit kinds and
    # rejects the transpose
    assert ("cat", "cot") in want  # substitution
    assert ("cart", "cat") in want  # insertion ("cart" < "cat" lexically)
    assert ("act", "cat") not in want  # transpose, distance 2
    assert ("bat", "bats") in want


def test_profile_with_nulls(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "k": pa.array([3, 1, None, 2, 1, None], pa.int64()),
            "s": pa.array(["b", "a", "c", None, "a", "b"], pa.string()),
        }
    )
    out = profile_columns(rd.from_arrow(tbl), ["k", "s"]).to_pandas()
    out = out.set_index("col_name")
    assert out.loc["k", "n"] == 6 and out.loc["k", "n_null"] == 2
    assert out.loc["k", "n_distinct"] == 3
    # numeric min/max, not lexicographic on the stringified values
    assert out.loc["k", "min_v"] == "1" and out.loc["k", "max_v"] == "3"
    assert out.loc["s", "n_null"] == 1 and out.loc["s", "n_distinct"] == 3
    assert out.loc["s", "min_v"] == "a" and out.loc["s", "max_v"] == "c"


def test_profile_numeric_min_max_across_blocks(ray_session):
    import ray.data as rd

    # "9" > "10" lexicographically — the cross-block reduce must
    # re-compare numerically
    tbl = pa.table({"k": pa.array([9, 10, 2, 100], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(4)
    out = profile_columns(ds, ["k"]).to_pandas().set_index("col_name")
    assert out.loc["k", "min_v"] == "2" and out.loc["k", "max_v"] == "100"


def test_int8_quantize_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vecs = [rng.normal(size=5).astype(np.float32) for _ in range(40)]
    vecs[3] = np.zeros(5, np.float32)  # all-zero vector -> codes 0
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    # repartition forces sliced list arrays through the kernel
    out = (
        int8_quantize(rd.from_arrow(tbl).repartition(7))
        .to_pandas()
        .sort_values(["vec_id", "i"])
        .reset_index(drop=True)
    )
    assert len(out) == len(vecs) * 5
    for vid, v in enumerate(vecs):
        rows = out[out.vec_id == vid]
        x = v.astype(np.float64)
        amax = np.abs(x).max()
        scale = amax / 127.0
        assert np.all(rows.scale.to_numpy() == scale)
        if amax == 0:
            assert np.all(rows.code.to_numpy() == 0)
        else:
            q = x / scale
            want = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int8)
            assert np.array_equal(rows.code.to_numpy(), want)
    assert out.code.abs().max() == 127  # amax element always maps to ±127


def test_lexical_diversity(ray_session):
    import ray.data as rd

    from seekr_ray.extras.textstats import lexical_diversity

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["aa bb aa cc", "", "zz zz zz"], pa.string()
            ),
        }
    )
    out = (
        lexical_diversity(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.n_tokens) == [4, 0, 3]
    assert list(out.n_types) == [3, 0, 1]
    assert list(out.n_hapax) == [2, 0, 0]
    assert out.loc[0, "ttr"] == 0.75 and out.loc[1, "ttr"] == 0.0


def test_retention_cohorts(ray_session):
    import ray.data as rd

    from seekr_ray.extras.retention import retention_cohorts

    WEEK = 7 * 86_400_000_000
    # base: Monday 2024-01-01 00:00 UTC in us
    base = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")

    def ev(uid, week, dow=0):
        return (uid, base + week * WEEK + dow * 86_400_000_000)

    rows = [
        # cohort week 0: users 1,2,3 — u1 active w0+w1+w2, u2 w0+w2, u3 w0
        ev(1, 0), ev(1, 1), ev(1, 2), ev(1, 1, dow=3),  # dup week collapses
        ev(2, 0, dow=6), ev(2, 2),
        ev(3, 0),
        # cohort week 1: user 4 active w1 only
        ev(4, 1, dow=2),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], "datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    out = retention_cohorts(rd.from_arrow(tbl), num_buckets=4).to_pandas()
    out["cw"] = out.cohort_week.astype("int64")
    got = {
        (int((r.cw - base) // WEEK), int(r.week_offset)): (
            int(r.n_active), int(r.n_cohort), r.retention,
        )
        for r in out.itertuples()
    }
    assert got == {
        (0, 0): (3, 3, 1.0),
        (0, 1): (1, 3, 0.333333),
        (0, 2): (2, 3, 0.666667),
        (1, 0): (1, 1, 1.0),
    }
