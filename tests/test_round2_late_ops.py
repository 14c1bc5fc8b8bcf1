"""Unit semantics for the late round-2 operators (grouped_corr,
grouped_mode, grouped_zscore, rolling_mean_per_group, lag_gaps_per_group,
latest_per_key, token_entropy).  DuckDB bit-equality runs in
test_entry_contract.py; these cover edges the fixture lacks: mode
tie-breaks, latest-row ts ties, frame shorter than the window, and
parallelism invariance of the integer-sufficient-statistic paths."""

import math

import numpy as np
import pandas as pd


def _ds(df: pd.DataFrame, parts: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _events(n: int = 400, seed: int = 7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 13, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 10**6, n), unit="s"
            ).astype("datetime64[us]"),
            "value": np.round(rng.uniform(-50, 500, n), 6),
        }
    )


def test_grouped_corr_matches_pandas(ray_session):
    from seekr_ray.extras.stats import grouped_corr

    rng = np.random.RandomState(3)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "x": rng.randint(1, 51, n).astype(np.float64),
            "y": np.round(rng.uniform(0, 0.1, n), 2),
        }
    )
    got = (
        grouped_corr(_ds(df), key_col="k", x_col="x", y_col="y", y_scale=100)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for k, g in df.groupby("k"):
        assert got.loc[k, "n"] == len(g)
        assert abs(got.loc[k, "covar"] - g.x.cov(g.y)) < 1e-6
        assert abs(got.loc[k, "corr"] - g.x.corr(g.y)) < 1e-6
    # integer sufficient stats => bit-identical at any parallelism
    got2 = (
        grouped_corr(
            _ds(df, parts=9), key_col="k", x_col="x", y_col="y", y_scale=100
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got.reset_index(), got2.reset_index())


def test_grouped_corr_degenerate_groups(ray_session):
    """n==1 and zero-variance groups emit 0.0, not NaN crashes."""
    from seekr_ray.extras.stats import grouped_corr

    df = pd.DataFrame(
        {
            "k": ["solo", "const", "const", "const"],
            "x": [3.0, 5.0, 5.0, 5.0],  # const group: zero x variance
            "y": [0.02, 0.01, 0.05, 0.09],
        }
    )
    got = (
        grouped_corr(_ds(df, parts=2), key_col="k", x_col="x", y_col="y",
                     y_scale=100)
        .to_pandas()
        .set_index("k")
    )
    assert got.loc["solo", "covar"] == 0.0 and got.loc["solo", "corr"] == 0.0
    assert got.loc["const", "corr"] == 0.0  # 0/0 guarded


def test_grouped_zscore_constant_group(ray_session):
    from seekr_ray.extras.stats import grouped_zscore

    df = pd.DataFrame(
        {
            "id": np.arange(4, dtype=np.int64),
            "k": ["c", "c", "v", "v"],
            "v": [7.0, 7.0, 1.0, 3.0],
        }
    )
    got = (
        grouped_zscore(_ds(df, parts=2), key_col="k", val_col="v", id_col="id")
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert got.loc[0, "z"] == 0.0 and got.loc[1, "z"] == 0.0
    assert got.loc[2, "z"] == -1.0 and got.loc[3, "z"] == 1.0


def test_latest_per_key_ns_resolution_input(ray_session):
    """A [ns]-resolution ts column must be CAST to µs, not reinterpreted."""
    from seekr_ray.extras.topk import latest_per_key

    df = pd.DataFrame(
        {
            "k": np.array([1, 1], np.int64),
            "id": np.array([10, 11], np.int64),
            "ts": pd.to_datetime([100, 200], unit="s"),  # pandas default ns
            "p": [1.0, 2.0],
        }
    )
    got = (
        latest_per_key(
            _ds(df, parts=1), key_col="k", ts_col="ts", id_col="id",
            payload_cols=["p"],
        )
        .to_pandas()
    )
    assert str(got.loc[0, "ts"]) == "1970-01-01 00:03:20"


def test_grouped_mode_tiebreak_smallest(ray_session):
    from seekr_ray.extras.stats import grouped_mode

    df = pd.DataFrame(
        {
            "k": np.array([1, 1, 1, 1, 2, 2, 2], np.int64),
            "v": ["b", "b", "a", "a", "z", "z", "a"],
        }
    )
    got = (
        grouped_mode(_ds(df, parts=3), key_col="k", val_col="v")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert got.loc[1, "mode_v"] == "a"  # 2-2 tie -> smallest value
    assert got.loc[1, "n"] == 2
    assert got.loc[2, "mode_v"] == "z"
    assert got.loc[2, "n"] == 2


def test_grouped_zscore_matches_pandas(ray_session):
    from seekr_ray.extras.stats import grouped_zscore

    rng = np.random.RandomState(5)
    n = 300
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.choice(["p", "q"], n),
            "v": np.round(rng.uniform(100, 2000, n), 2),
        }
    )
    got = (
        grouped_zscore(_ds(df), key_col="k", val_col="v", id_col="id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.copy()
    g = want.groupby("k")["v"]
    want["z"] = (want.v - g.transform("mean")) / g.transform(
        lambda s: s.std(ddof=0)
    )
    np.testing.assert_allclose(got.z, want.z, atol=1e-6)


def test_rolling_mean_matches_pandas(ray_session):
    from seekr_ray.extras.windows import rolling_mean_per_group

    df = _events()
    got = (
        rolling_mean_per_group(_ds(df), frame=3, num_buckets=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["ra"] = want.groupby("user_id")["value"].transform(
        lambda s: s.rolling(3, min_periods=1).mean()
    )
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got.event_id.tolist() == want.event_id.tolist()
    np.testing.assert_allclose(got.rolling_avg, want.ra, atol=1e-6)


def test_lag_gaps_matches_pandas(ray_session):
    from seekr_ray.extras.windows import lag_gaps_per_group

    df = _events(seed=11)
    got = (
        lag_gaps_per_group(_ds(df), num_buckets=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["gap"] = want.groupby("user_id")["ts"].diff()
    want = want.dropna(subset=["gap"]).sort_values("event_id")
    assert got.event_id.tolist() == want.event_id.tolist()
    assert got.gap_us.tolist() == [
        int(v / np.timedelta64(1, "us")) for v in want.gap
    ]
    # one row omitted per user (the first)
    assert len(got) == len(df) - df.user_id.nunique()


def test_latest_per_key_ties_and_payload(ray_session):
    from seekr_ray.extras.topk import latest_per_key

    ts = pd.to_datetime([100, 200, 200, 50, 60], unit="s").astype(
        "datetime64[us]"
    )
    df = pd.DataFrame(
        {
            "k": np.array([1, 1, 1, 2, 2], np.int64),
            "id": np.array([10, 11, 12, 20, 21], np.int64),
            "ts": ts,
            "payload": [1.5, 2.5, 3.5, 4.5, 5.5],
        }
    )
    got = (
        latest_per_key(
            _ds(df, parts=3),
            key_col="k",
            ts_col="ts",
            id_col="id",
            payload_cols=["payload"],
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    # ts tie at 200 -> larger id wins
    assert got.loc[1, "id"] == 12 and got.loc[1, "payload"] == 3.5
    assert got.loc[2, "id"] == 21 and got.loc[2, "payload"] == 5.5
    assert str(got.loc[1, "ts"]) == "1970-01-01 00:03:20"


def test_grouped_mode_string_keys(ray_session):
    from seekr_ray.extras.stats import grouped_mode

    df = pd.DataFrame(
        {"k": ["en", "en", "en", "de"], "v": ["x", "y", "y", "z"]}
    )
    got = (
        grouped_mode(_ds(df, parts=2), key_col="k", val_col="v")
        .to_pandas()
        .set_index("k")
    )
    assert got.loc["en", "mode_v"] == "y" and got.loc["en", "n"] == 2
    assert got.loc["de", "mode_v"] == "z" and got.loc["de", "n"] == 1


def test_percent_rank_matches_pandas(ray_session):
    from seekr_ray.extras.windows import percent_rank_per_group

    df = _events(seed=23)
    # add a singleton user -> pct_rank 0.0 by SQL convention
    df = pd.concat(
        [df, pd.DataFrame({"event_id": [9999], "user_id": [777],
                           "ts": [df.ts.iloc[0]], "value": [1.0]})],
        ignore_index=True,
    )
    got = (
        percent_rank_per_group(_ds(df), num_buckets=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "value", "event_id"]).copy()
    grp = want.groupby("user_id")["value"]
    n = grp.transform("size")
    want["pr"] = np.where(
        n > 1, (grp.cumcount()) / (n - 1).clip(lower=1), 0.0
    )
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got.event_id.tolist() == want.event_id.tolist()
    np.testing.assert_allclose(got.pct_rank, want.pr, atol=1e-6)
    assert got.set_index("event_id").loc[9999, "pct_rank"] == 0.0


def test_weighted_sample_matches_bruteforce(ray_session):
    """Distributive per-block top-k must equal the single-pass brute
    force over all keys; weighting must bias toward heavy docs."""
    import hashlib

    from seekr_ray.extras.split import weighted_sample
    from seekr_ray.extras.textstats import simple_tokens

    rng = np.random.RandomState(31)
    words = ["alpha", "bravo", "delta", "omega"]
    texts = [
        " ".join(rng.choice(words, size=int(s)))
        for s in rng.choice([2, 5, 80], 200, p=[0.45, 0.45, 0.1])
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64), "text": texts}
    )
    got = (
        weighted_sample(_ds(docs, parts=6), k=20)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    nt = np.array([len(simple_tokens(t)) for t in texts], np.float64)
    h = np.array(
        [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
            for i in range(200)
        ],
        np.uint64,
    )
    key = np.log((h.astype(np.float64) + 0.5) / 2.0**64) / nt
    want = np.sort(np.argsort(-key, kind="stable")[:20])
    assert got.doc_id.tolist() == want.tolist()
    # heavy (80-token) docs are ~16x likelier than 5-token docs
    heavy_frac_in = (nt[got.doc_id] >= 80).mean()
    assert heavy_frac_in > 0.25  # vs ~0.1 base rate


def test_left_outer_count_join_zero_fill(ray_session):
    from seekr_ray.extras.joins import left_outer_count_join

    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], np.int64)})
    right = pd.DataFrame(
        {"rk": np.array([2, 2, 2, 4, 9], np.int64)}  # 9 unmatched on left
    )
    got = (
        left_outer_count_join(
            _ds(left, parts=2), _ds(right, parts=3),
            left_key="k", right_key="rk",
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert got.n_right.tolist() == [0, 3, 0, 1]  # zero-fill survives
    assert 9 not in got.index  # right-only keys don't appear


def test_cms_overestimates_and_mostly_exact(ray_session):
    """Count-Min point estimates are NEVER below the true count (min of
    sums that each include the true count) and are exact for most terms
    at this load factor (vocab << d·w)."""
    from collections import Counter

    from seekr_ray.extras.sketch import cms_estimate, cms_token_registers
    from seekr_ray.extras.textstats import simple_tokens

    rng = np.random.RandomState(41)
    words = [f"tok{chr(97 + i)}" for i in range(26)]
    texts = [
        " ".join(rng.choice(words, size=30, p=np.linspace(1, 5, 26) / sum(np.linspace(1, 5, 26))))
        for _ in range(120)
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(120, dtype=np.int64), "text": texts}
    )
    import pyarrow as pa

    reg = pa.Table.from_pandas(
        cms_token_registers(_ds(docs, parts=5)).to_pandas()
    )
    truth: Counter = Counter()
    for t in texts:
        truth.update(simple_tokens(t))
    exact = 0
    for w, n in truth.items():
        est = cms_estimate(reg, w)
        assert est >= n, w
        exact += est == n
    assert exact / len(truth) > 0.9
    # total mass per row == total token count
    df = reg.to_pandas()
    for j in range(4):
        assert df[df.j == j].c.sum() == sum(truth.values())


def test_token_entropy_hand_computed(ray_session):
    from seekr_ray.extras.textstats import ENTROPY_SCALE, token_entropy

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": [
                "alpha alpha bravo",  # p = 2/3, 1/3
                "alpha alpha alpha",  # single token -> entropy 0
                "",  # empty -> 0 tokens, entropy 0
            ],
        }
    )
    got = (
        token_entropy(_ds(docs, parts=2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = sum(
        math.floor(-(c / 3) * math.log2(c / 3) * ENTROPY_SCALE)
        for c in (2, 1)
    ) / ENTROPY_SCALE
    assert got.loc[1, "entropy"] == want
    assert abs(want - 0.918296) < 1e-5  # true H(2/3,1/3)
    assert got.loc[2, "entropy"] == 0.0 and got.loc[2, "n_tokens"] == 3
    assert got.loc[3, "entropy"] == 0.0 and got.loc[3, "n_tokens"] == 0


def test_dense_hourly_counts_zero_fills(ray_session):
    from seekr_ray.extras.windows import dense_hourly_counts

    # three types, deliberate multi-hour holes in the middle
    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:40", "2024-01-01 03:05",
         "2024-01-01 07:59", "2024-01-01 00:20", "2024-01-01 07:01"]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {"ts": ts, "event_type": ["a", "a", "a", "a", "b", "c"]}
    )
    got = dense_hourly_counts(_ds(df, 3)).to_pandas()
    # grid = 8 hours x 3 types, zero-filled
    assert len(got) == 8 * 3
    assert got["n"].sum() == len(df)
    g = got.set_index(["window", "event_type"])["n"]
    assert g[(pd.Timestamp("2024-01-01 00:00"), "a")] == 2
    assert g[(pd.Timestamp("2024-01-01 01:00"), "a")] == 0  # filled hole
    assert g[(pd.Timestamp("2024-01-01 07:00"), "c")] == 1
    assert g[(pd.Timestamp("2024-01-01 05:00"), "b")] == 0
    assert str(got["window"].dtype) == "datetime64[us]"


def test_locf_matches_pandas_carry_forward(ray_session):
    from seekr_ray.extras.windows import locf_per_group

    rng = np.random.RandomState(11)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 10**5, n), unit="s"
            ).astype("datetime64[us]"),
            "event_type": rng.choice(["click", "view", "buy"], n),
        }
    )
    got = (
        locf_per_group(_ds(df, 5), mark_type="click", num_buckets=7)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # pandas reference: running max of click-ts per user in (ts, id) order
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    marked = ref["ts"].astype("int64").where(ref["event_type"] == "click")
    # cummax keeps NaN at NaN positions — carry forward within user
    cm = marked.groupby(ref["user_id"]).cummax()
    ref["last"] = cm.groupby(ref["user_id"]).ffill()
    ref = ref.dropna(subset=["last"]).sort_values("event_id")
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["last_mark_us"].tolist() == [int(v) for v in ref["last"]]
    # a click event carries its own timestamp (inclusive frame)
    first_click = df[df["event_type"] == "click"].iloc[0]
    row = got[got["event_id"] == first_click["event_id"]]
    # Timestamp.value is ns; the kernel emits µs
    assert int(row["last_mark_us"].iloc[0]) == first_click["ts"].value // 1000


def test_sliding_distinct_users_matches_bruteforce(ray_session):
    from seekr_ray.extras.windows import sliding_distinct_users

    rng = np.random.RandomState(13)
    n = 800
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 25, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 14 * 86400, n), unit="s"
            ).astype("datetime64[us]"),
        }
    )
    got = (
        sliding_distinct_users(_ds(df, 5), window_hours=24)
        .to_pandas()
        .reset_index(drop=True)
    )
    # brute force: for every grid hour, distinct users in (h-24h, h]
    hours = df["ts"].dt.floor("h")
    lo, hi = hours.min(), hours.max()
    grid = pd.date_range(lo, hi, freq="h")
    ref = []
    for g in grid:
        mask = (hours > g - pd.Timedelta(hours=24)) & (hours <= g)
        ref.append(df.loc[mask, "user_id"].nunique())
    assert got["window"].tolist() == list(grid)
    assert got["n_users"].tolist() == ref
    # windows where nobody was active in the trailing day exist & are 0
    assert (np.array(ref) == got["n_users"].to_numpy()).all()
