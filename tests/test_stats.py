"""Unit semantics for extras/stats.py, the semi/anti join, and
duplicate_ngram_spans — each operator checked against a direct
pandas/numpy reference on small synthetic data (the DuckDB oracle equivalence is
covered by tests/test_entry_contract.py via the driver contract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(4)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_grouped_quantiles_matches_numpy(ray_session, rng):
    from seekr_ray.extras.stats import grouped_quantiles, quantile_cont
    from seekr_ray.extras.textstats import round6

    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=5000),
            "v": rng.normal(100.0, 15.0, size=5000),
        }
    )
    qs = [0.1, 0.5, 0.95]
    got = (
        grouped_quantiles(_ds(df), key_col="g", val_col="v", qs=qs)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        for q in qs:
            rows.append((g, q, round6(quantile_cont(v, q))))
    want = pd.DataFrame(rows, columns=["g", "q", "value"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the interpolation agrees with numpy's linear method to FP noise
    for _, r in got.iterrows():
        ref = np.quantile(
            df.loc[df["g"] == r["g"], "v"].to_numpy(), r["q"], method="linear"
        )
        assert abs(r["value"] - ref) < 1e-6


def test_histogram_quantiles_within_bin_width(ray_session, rng):
    from seekr_ray.extras.stats import histogram_quantiles

    v = rng.normal(0.0, 1.0, size=20000)
    df = pd.DataFrame({"v": v})
    got = histogram_quantiles(
        _ds(df), val_col="v", qs=[0.25, 0.5, 0.9], num_bins=2048
    ).to_pandas()
    width = (v.max() - v.min()) / 2048
    for _, r in got.iterrows():
        exact = np.quantile(v, r["q"])
        assert abs(r["value"] - exact) <= 2 * width + 1e-9


def test_grouped_stats_matches_pandas(ray_session, rng):
    from seekr_ray.extras.stats import grouped_stats

    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], size=3000),
            "v": rng.uniform(10.0, 500.0, size=3000),
        }
    )
    got = (
        grouped_stats(_ds(df), key_col="g", val_col="v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    ref = df.groupby("g")["v"]
    assert got["n"].tolist() == ref.count().tolist()
    assert got["vmin"].tolist() == ref.min().tolist()
    assert got["vmax"].tolist() == ref.max().tolist()
    # outputs are 6dp-rounded → compare at the quantization step
    np.testing.assert_allclose(got["mean"], ref.mean(), atol=5.1e-7)
    np.testing.assert_allclose(got["std_pop"], ref.std(ddof=0), atol=5.1e-7)


def test_rollup_levels_consistent(ray_session, rng):
    from seekr_ray.extras.stats import rollup_agg

    df = pd.DataFrame(
        {
            "a": rng.choice(["p", "q"], size=2000),
            "b": rng.choice(["s", "t", "u"], size=2000),
            "v": rng.uniform(0.0, 10.0, size=2000),
        }
    )
    got = rollup_agg(
        _ds(df), key_cols=["a", "b"], val_col="v"
    ).to_pandas()
    detail = got[(got["a"] != "ALL") & (got["b"] != "ALL")]
    sub = got[(got["a"] != "ALL") & (got["b"] == "ALL")]
    grand = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    assert len(detail) == 6 and len(sub) == 2 and len(grand) == 1
    assert detail["n"].sum() == len(df) == int(grand["n"].iloc[0])
    for a, s in sub.set_index("a")["n"].items():
        assert s == (df["a"] == a).sum()
    ref = df.groupby(["a", "b"])["v"].sum()
    for _, r in detail.iterrows():
        assert abs(r["total"] - ref[(r["a"], r["b"])]) < 1e-5


def test_hash_ksample_deterministic_and_uniformly_keyed(ray_session):
    import hashlib

    from seekr_ray.extras.stats import hash_ksample

    ids = list(range(1, 4001))
    df = pd.DataFrame({"id": ids})
    got1 = hash_ksample(_ds(df), id_col="id", k=100).to_pandas()["id"].tolist()
    got2 = hash_ksample(
        _ds(df.sample(frac=1.0, random_state=3)), id_col="id", k=100
    ).to_pandas()["id"].tolist()
    # same sample regardless of row order / partitioning
    assert got1 == got2
    # equals the brute-force smallest-k md5 keys
    def key(v):
        return int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")

    want = sorted(ids, key=lambda v: (key(v), v))[:100]
    assert sorted(got1) == sorted(want)


def test_key_filter_join_semi_and_anti(ray_session, rng):
    from seekr_ray.extras.joins import key_filter_join

    left = pd.DataFrame({"k": np.arange(1000), "x": rng.normal(size=1000)})
    right = pd.DataFrame({"rk": rng.choice(np.arange(0, 1000, 3), size=5000)})
    present = set(right["rk"].tolist())
    semi = key_filter_join(
        _ds(left), _ds(right), left_key="k", right_key="rk"
    ).to_pandas()
    anti = key_filter_join(
        _ds(left), _ds(right), left_key="k", right_key="rk", anti=True
    ).to_pandas()
    assert set(semi["k"]) == {k for k in left["k"] if k in present}
    assert set(anti["k"]) == {k for k in left["k"] if k not in present}
    assert len(semi) + len(anti) == len(left)


def test_duplicate_ngram_spans_golden(ray_session):
    from seekr_ray.extras.dedup import duplicate_ngram_spans

    boiler = "alpha bravo charlie delta echo"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{boiler} unique1 text here",
                f"prefix words {boiler} trailing",
                "totally different content with no shared spans present",
                f"{boiler} {boiler}",  # span repeated twice in one doc
            ],
        }
    )
    got = (
        duplicate_ngram_spans(_ds(docs), k=5, min_docs=2)
        .to_pandas()
        .set_index("shingle")
    )
    assert boiler in got.index
    row = got.loc[boiler]
    assert row["n_docs"] == 3  # docs 1, 2, 4 (distinct docs, not occurrences)
    assert row["n_occ"] == 4  # doc 4 contains it twice
    assert row["keep_doc_id"] == 1
    # spans inside only one doc never appear
    assert all(got["n_docs"] >= 2)


def test_distinct_count_per_group(ray_session, rng):
    from seekr_ray.extras.stats import distinct_count_per_group

    df = pd.DataFrame(
        {
            "g": rng.choice(["m", "n", "o"], size=8000),
            "u": rng.integers(0, 300, size=8000),
        }
    )
    got = (
        distinct_count_per_group(_ds(df), key_col="g", val_col="u")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = df.groupby("g")["u"].nunique()
    assert got["n_distinct"].tolist() == want.tolist()


def test_winsorize_grouped_matches_reference(ray_session, rng):
    from seekr_ray.extras.stats import quantile_cont, winsorize_grouped
    from seekr_ray.extras.textstats import round6

    df = pd.DataFrame(
        {
            "rid": np.arange(4000, dtype=np.int64),
            "g": rng.choice(["a", "b"], size=4000),
            "v": rng.lognormal(3.0, 1.0, size=4000),
        }
    )
    got = (
        winsorize_grouped(
            _ds(df), key_col="g", val_col="v", id_cols=["rid"],
            q_lo=0.05, q_hi=0.95,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    bounds = {}
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        bounds[g] = (round6(quantile_cont(v, 0.05)), round6(quantile_cont(v, 0.95)))
    lo = df["g"].map(lambda g: bounds[g][0]).to_numpy()
    hi = df["g"].map(lambda g: bounds[g][1]).to_numpy()
    want = np.minimum(np.maximum(df["v"].to_numpy(), lo), hi)
    assert got["rid"].tolist() == df["rid"].tolist()
    assert got["value_w"].tolist() == [round6(x) for x in want]
    # clipping is idempotent and stays inside the bounds
    for g, sub in got.groupby("g"):
        b = bounds[g]
        assert sub["value_w"].min() >= b[0] - 1e-9
        assert sub["value_w"].max() <= b[1] + 1e-9


def test_global_shuffle_exact_permutation(ray_session):
    import hashlib

    from seekr_ray.extras.split import global_shuffle

    ids = np.arange(0, 3000, dtype=np.int64) * 7 + 3  # gappy ids
    df = pd.DataFrame({"doc_id": ids})

    def ref_rank(salt):
        keyed = sorted(
            (int.from_bytes(hashlib.md5((salt + str(i)).encode()).digest()[:8],
                            "little"), int(i))
            for i in ids
        )
        return {i: r for r, (_, i) in enumerate(keyed)}

    got = (
        global_shuffle(_ds(df), id_col="doc_id", salt="s1", num_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = ref_rank("s1")
    assert got["shuffle_rank"].tolist() == [want[i] for i in got["doc_id"]]
    # ranks form an exact permutation of 0..n-1
    assert sorted(got["shuffle_rank"]) == list(range(len(ids)))
    # a different salt yields a different permutation, same rank set
    got2 = (
        global_shuffle(_ds(df), id_col="doc_id", salt="s2", num_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got2["shuffle_rank"].tolist() != got["shuffle_rank"].tolist()
    assert sorted(got2["shuffle_rank"]) == list(range(len(ids)))
    # parallelism-invariant: a different partitioning gives identical ranks
    import ray.data as rd

    got3 = (
        global_shuffle(
            rd.from_pandas(df).repartition(13), id_col="doc_id",
            salt="s1", num_buckets=64,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got3["shuffle_rank"].tolist() == got["shuffle_rank"].tolist()


def test_global_value_rank_and_ntile(ray_session, rng):
    from seekr_ray.extras.stats import global_value_rank

    n = 5000
    vals = np.round(rng.normal(0.0, 10.0, size=n), 1)  # plenty of ties
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"id": ids, "v": vals})
    k = 7
    got = (
        global_value_rank(_ds(df), val_col="v", id_col="id", ntile=k)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
    want_rank = np.empty(n, np.int64)
    want_rank[order] = np.arange(n)
    want = df.assign(r=want_rank).sort_values("id").reset_index(drop=True)
    assert got["value_rank"].tolist() == want["r"].tolist()
    # NTILE: first n%k tiles get the extra row, 1-based
    q, r = divmod(n, k)
    sizes = got.groupby("tile").size()
    assert sizes.index.tolist() == list(range(1, k + 1))
    assert sizes.tolist() == [q + 1] * r + [q] * (k - r)
    # tiles respect the rank order
    by_rank = got.sort_values("value_rank")
    assert (np.diff(by_rank["tile"].to_numpy()) >= 0).all()
    # parallelism invariance
    import ray.data as rd

    got2 = (
        global_value_rank(
            rd.from_pandas(df).repartition(11), val_col="v", id_col="id", ntile=k
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got2["value_rank"].tolist() == got["value_rank"].tolist()


def test_label_centroids_exact(ray_session, rng):
    from seekr_ray.extras.similarity import label_centroids
    from seekr_ray.extras.textstats import round6

    n, dim = 600, 8
    mat = rng.normal(0.0, 1.0, size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    import ray.data as rd

    tbl = pa.table(
        {
            "label": pa.array(labels, pa.int32()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        label_centroids(
            rd.from_arrow(tbl).repartition(4),
            label_col="label",
            vec_col="embedding",
        )
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    qi = np.floor(mat.astype(np.float64) * 1_000_000).astype(np.int64)
    rows = []
    for lab in sorted(set(labels.tolist())):
        sub = qi[labels == lab]
        for d in range(dim):
            s = int(sub[:, d].sum())
            rows.append(
                (lab, d, len(sub), round6((float(s) / 1_000_000.0) / len(sub)))
            )
    want = pd.DataFrame(rows, columns=["label", "dim", "n", "centroid"])
    assert got["n"].tolist() == want["n"].tolist()
    assert got["centroid"].tolist() == want["centroid"].tolist()
    assert str(got["label"].dtype) == "int32"  # input key dtype preserved


def test_kmeans_fit_matches_numpy_mirror(ray_session, rng):
    import ray.data as rd

    from seekr_ray.extras.similarity import (
        _cosine,
        _round6_arr,
        kmeans_fit,
        kmeans_step,
    )
    from seekr_ray.extras.textstats import round6

    n, dim, k, iters = 400, 12, 5, 3
    mat = rng.normal(0.0, 1.0, size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float32())
            ),
        }
    )
    init = mat[:k].astype(np.float64)
    got = kmeans_fit(
        rd.from_arrow(tbl).repartition(4), init, iters=iters
    )

    # pure-numpy driver mirror of the same deterministic step
    m64 = mat.astype(np.float64)
    cents = init.copy()
    for _ in range(iters):
        r = _round6_arr(_cosine(m64, cents))
        cid = np.argmax(r, axis=1)
        for c in range(k):
            mem = m64[cid == c]
            if len(mem):
                qs = np.floor(mem * 1_000_000).astype(np.int64).sum(axis=0)
                cents[c] = np.array(
                    [round6((float(s) / 1_000_000.0) / len(mem)) for s in qs]
                )
    assert np.array_equal(got, cents)  # exact, not approximate

    # single step output shape/semantics: every cluster's n sums to n
    step = kmeans_step(rd.from_arrow(tbl), init).to_pandas()
    per_cid = step.groupby("cid")["n"].first()
    assert per_cid.sum() == n
    assert set(step["dim"]) == set(range(dim))


def test_cube_levels_consistent(ray_session, rng):
    from seekr_ray.extras.stats import cube_agg

    df = pd.DataFrame(
        {
            "a": rng.choice(["p", "q"], size=2000),
            "b": rng.choice(["s", "t", "u"], size=2000),
            "v": rng.uniform(0.0, 10.0, size=2000),
        }
    )
    got = cube_agg(_ds(df), key_cols=["a", "b"], val_col="v").to_pandas()
    detail = got[(got["a"] != "ALL") & (got["b"] != "ALL")]
    sub_a = got[(got["a"] != "ALL") & (got["b"] == "ALL")]
    sub_b = got[(got["a"] == "ALL") & (got["b"] != "ALL")]
    grand = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    # full 2-key lattice: 6 detail + 2 a-subtotals + 3 b-subtotals + grand
    assert (len(detail), len(sub_a), len(sub_b), len(grand)) == (6, 2, 3, 1)
    assert detail["n"].sum() == len(df) == int(grand["n"].iloc[0])
    for b, s in sub_b.set_index("b")["n"].items():
        assert s == (df["b"] == b).sum()
    ref = df.groupby(["a", "b"])["v"].sum()
    for _, r in detail.iterrows():
        assert abs(r["total"] - ref[(r["a"], r["b"])]) < 1e-5
    for b, s in sub_b.set_index("b")["total"].items():
        assert abs(s - df.loc[df["b"] == b, "v"].sum()) < 1e-5


def test_grouped_spearman_matches_pandas(ray_session, rng):
    from seekr_ray.extras.stats import grouped_spearman

    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], size=3000),
            # heavy ties on both axes (the average-rank path); integral
            # floats so pandas and the quantized kernel tie identically
            "x": rng.integers(0, 12, size=3000).astype(float),
            "y": rng.integers(0, 40, size=3000).astype(float),
        }
    )
    # inject monotone association so rho is far from 0
    df.loc[df["g"] == "a", "y"] += 2.0 * df.loc[df["g"] == "a", "x"]
    got = (
        grouped_spearman(
            _ds(df), key_col="g", x_col="x", y_col="y", x_scale=1, y_scale=1
        )
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        # spearman == pearson over average ranks (no scipy dependency)
        ref = (
            sub["x"].rank(method="average").corr(sub["y"].rank(method="average"))
        )
        assert got.loc[g, "n"] == len(sub)
        assert abs(got.loc[g, "spearman"] - ref) < 5.1e-7


def test_grouped_spearman_parallelism_invariant(ray_session, rng):
    import ray.data as rd

    from seekr_ray.extras.stats import grouped_spearman

    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=2000),
            "x": rng.integers(0, 8, size=2000).astype(float),
            "y": 0.01 * rng.integers(0, 25, size=2000),
        }
    )
    outs = []
    for parts in (1, 7):
        t = grouped_spearman(
            rd.from_pandas(df).repartition(parts),
            key_col="g",
            x_col="x",
            y_col="y",
            x_scale=1,
            y_scale=100,
        ).to_pandas()
        outs.append(t.sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bit-identical


def test_round6_matches_duckdb_double_round():
    """round6/round6_arr replicate DuckDB ROUND(x, 6) on DOUBLE exactly —
    including the >= 2^52-product identity grid and the near-tie cases
    the old floor(+0.5) formula got wrong (ties-to-even on the add)."""
    import duckdb

    from seekr_ray.extras.textstats import round6, round6_arr

    rng2 = np.random.default_rng(17)
    vals = []
    for mag in (1e-4, 1.0, 1e4, 1e8, 5e8, 2e9, 8e9, 1e10, 1e12, 1e15):
        v = rng2.uniform(mag / 2, mag, 40)
        vals.extend(v.tolist())
        vals.extend((np.round(v * 100) / 100).tolist())
        vals.extend((-v[:10]).tolist())
    vals.extend([0.8203125, -0.8203125, 2.5e-6, -2.5e-6, 0.0])
    con = duckdb.connect()
    q = "SELECT " + ", ".join(f"round('{v!r}'::DOUBLE, 6)" for v in vals)
    duck = [float(g) for g in con.execute(q).fetchone()]
    got_scalar = [round6(float(v)) for v in vals]
    got_arr = round6_arr(np.asarray(vals, np.float64)).tolist()
    assert duck == got_scalar
    assert duck == got_arr


def test_chi2_lang_source_hand_computed(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from seekr_ray.entry_queries import q_chi2_lang_source

    # 2x2 contingency with known chi2: [[10, 20], [30, 40]]
    rows = (
        [("en", "s1")] * 10 + [("en", "s2")] * 20
        + [("de", "s1")] * 30 + [("de", "s2")] * 40
    )
    df = pd.DataFrame(rows, columns=["lang", "source"])
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    df["text"] = "x"
    df["n_chars"] = 1
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = q_chi2_lang_source(str(tmp_path)).to_pandas()
    assert int(got["n"].iloc[0]) == 100
    assert int(got["dof"].iloc[0]) == 1
    # hand: e = [[28,42],[12,18]] for de/en rows... compute directly
    o = np.array([[10.0, 20.0], [30.0, 40.0]])
    r = o.sum(1, keepdims=True)
    c = o.sum(0, keepdims=True)
    e = r * c / o.sum()
    ref = ((o - e) ** 2 / e).sum()
    assert abs(got["chi2"].iloc[0] - ref) < 5e-6


def test_pricing_summary_parallelism_invariant(ray_session):
    from seekr_ray.entry_queries import q_pricing_summary

    sf = "/root/testdata/sf0.001"
    a = (
        q_pricing_summary(sf)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    b = (
        q_pricing_summary(sf)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)  # bit-identical across runs
    # charge decomposes: sum_charge <= sum_base_price * 1.1 etc. sanity
    assert (a["sum_disc_price"] <= a["sum_base_price"]).all()
    assert (a["sum_charge"] >= a["sum_disc_price"]).all()


def test_interleave_order_balanced_and_invariant(ray_session):
    import ray.data as rd

    from seekr_ray.extras.split import interleave_order

    rng2 = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(900, dtype=np.int64),
            "source": rng2.choice(["s_a", "s_b", "s_c"], size=900,
                                  p=[0.5, 0.3, 0.2]),
        }
    )
    outs = []
    for parts in (2, 9):
        t = (
            interleave_order(
                rd.from_pandas(df).repartition(parts),
                key_col="source",
                id_col="doc_id",
                num_buckets=16,
            )
            .to_pandas()
            .sort_values("global_pos")
            .reset_index(drop=True)
        )
        outs.append(t)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # layout-invariant
    got = outs[0]
    # positions are a permutation of 0..n-1
    assert got["global_pos"].tolist() == list(range(len(df)))
    # round-robin while every source has rows: in any prefix ending on a
    # full rank boundary, per-source counts differ by at most 1 until a
    # source is exhausted
    sizes = df["source"].value_counts()
    n_min = int(sizes.min())
    k = len(sizes)
    prefix = got.head(n_min * k)
    counts = prefix["source"].value_counts()
    assert counts.max() - counts.min() <= 1
    # per-source ranks are dense 0..n_s-1
    for s, sub in got.groupby("source"):
        assert sorted(sub["src_rank"]) == list(range(int(sizes[s])))


def test_gini_coefficient_known_values(ray_session):
    import ray.data as rd

    from seekr_ray.extras.stats import gini_coefficient

    # perfectly equal values -> gini == 0 (up to the (n+1)/n finite form)
    eq = pd.DataFrame(
        {"id": np.arange(100, dtype=np.int64),
         "v": np.full(100, 7, np.int64)}
    )
    g0 = gini_coefficient(
        rd.from_pandas(eq).repartition(4), val_col="v", id_col="id"
    ).to_pandas()
    assert abs(g0["gini"].iloc[0]) < 1e-9
    # one owner holds everything -> gini -> (n-1)/n
    one = pd.DataFrame(
        {"id": np.arange(50, dtype=np.int64),
         "v": np.concatenate([np.zeros(49, np.int64), [1000]])}
    )
    g1 = gini_coefficient(
        rd.from_pandas(one).repartition(3), val_col="v", id_col="id"
    ).to_pandas()
    assert abs(g1["gini"].iloc[0] - 49 / 50) < 1e-9
    # random values: match the direct sorted-rank formula
    rng2 = np.random.default_rng(21)
    v = rng2.integers(0, 10_000, 600)
    df = pd.DataFrame({"id": np.arange(600, dtype=np.int64), "v": v})
    got = gini_coefficient(
        rd.from_pandas(df).repartition(5), val_col="v", id_col="id"
    ).to_pandas()
    sv = np.sort(v)
    ref = 2 * np.sum(np.arange(1, 601) * sv) / (600 * sv.sum()) - 601 / 600
    assert abs(got["gini"].iloc[0] - ref) < 5.1e-7


def test_grouped_fano_matches_reference(ray_session):
    import ray.data as rd

    from seekr_ray.extras.stats import grouped_fano

    rng2 = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "k": rng2.choice(["a", "b"], 5000),
            "bucket": rng2.integers(0, 40, 5000),
        }
    )
    got = (
        grouped_fano(
            rd.from_pandas(df).repartition(6), key_col="k", bucket_col="bucket"
        )
        .to_pandas()
        .set_index("k")
    )
    for k, sub in df.groupby("k"):
        c = sub.groupby("bucket").size().to_numpy().astype(float)
        ref = c.var() / c.mean()  # var_pop (ddof=0 default in numpy)
        assert got.loc[k, "n_buckets"] == len(c)
        assert abs(got.loc[k, "fano"] - ref) < 5.1e-7


def test_corr_matrix_and_benford_and_seasonality(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from seekr_ray.entry_queries import (
        q_benford_price,
        q_corr_matrix,
        q_seasonality_strength,
    )

    sf = "/root/testdata/sf0.001"
    cm = q_corr_matrix(sf).to_pandas()
    assert len(cm) == 6 and (cm["corr"].abs() <= 1.0).all()
    # pandas reference for one pair (quantized like the kernel)
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    ref = (
        np.rint(li["l_quantity"]).corr(np.rint(li["l_extendedprice"] * 100))
    )
    got = cm.set_index(["col_a", "col_b"]).loc[
        ("quantity", "extendedprice"), "corr"
    ]
    assert abs(got - ref) < 5.1e-7

    bf = q_benford_price(sf).to_pandas()
    assert set(bf["digit"]) <= set(range(1, 10))
    assert bf["n"].sum() == len(pd.read_parquet(f"{sf}/orders.parquet"))
    # expected counts follow log10(1 + 1/d) shares of the total
    tot = bf["n"].sum()
    for _, r in bf.iterrows():
        assert abs(r["expected"] - tot * np.log10(1 + 1 / r["digit"])) < 1e-3

    ss = q_seasonality_strength(sf).to_pandas()
    assert (ss["eta2"] >= 0).all() and (ss["eta2"] <= 1.0).all()
    assert len(ss) == 5
