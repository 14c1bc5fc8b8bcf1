"""HLL sketch (extras/sketch.py) and per-group top-k (extras/topk.py)."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seekr_ray.extras.sketch import (
    HLL_M,
    _bit_length,
    hll_estimate,
    hll_token_registers,
)
from seekr_ray.extras.textstats import simple_tokens
from seekr_ray.extras.topk import _topk_kernel, topk_per_group

SF_DIR = "/root/testdata/sf0.001"


def test_bit_length_matches_python():
    vals = np.array(
        [0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 51, 12345678901234], np.uint64
    )
    got = _bit_length(vals)
    want = [int(v).bit_length() for v in vals]
    assert got.tolist() == want


def test_hll_estimate_accuracy(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    reg = hll_token_registers(ds)
    tbl = pa.concat_tables(list(reg.iter_batches(batch_format="pyarrow")))
    assert tbl.num_rows <= HLL_M
    est = hll_estimate(tbl)
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    )
    truth = len(
        {t for x in docs["text"].to_pylist() for t in simple_tokens(x or "")}
    )
    assert truth > 0
    assert abs(est - truth) / truth < 0.08  # 5 sigma at m=4096


def test_topk_kernel_golden():
    key = np.array([1, 1, 1, 2, 2], np.int64)
    val = np.array([5.0, 9.0, 9.0, 1.0, 2.0])
    idc = np.array([10, 11, 12, 13, 14], np.int64)
    keep = _topk_kernel(key, val, idc, 2)
    # key 1: (9.0, id 11), (9.0, id 12); key 2: (2.0,14), (1.0,13)
    assert sorted(idc[keep].tolist()) == [11, 12, 13, 14]


def test_topk_two_phase_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 5000
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": pa.array(rng.random(n).round(3)),  # forces value ties
        }
    )
    # many small blocks so the partial phase actually prunes
    ds = rd.from_arrow(tbl).repartition(16)
    out = (
        topk_per_group(ds, key="user_id", value="value", id_col="event_id", k=3)
        .to_pandas()
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)
    )
    # reference: plain pandas
    import pandas as pd

    df = tbl.to_pandas()
    df = df.sort_values(
        ["user_id", "value", "event_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("user_id").cumcount() + 1
    want = (
        df[df["rank"] <= 3]
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)[["user_id", "event_id", "value", "rank"]]
    )
    pd.testing.assert_frame_equal(
        out[["user_id", "event_id", "value", "rank"]], want, check_dtype=False
    )


def test_hopping_agg_golden(ray_session):
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.windows import hopping_agg

    h = 3_600 * 1_000_000
    tbl = pa.table(
        {
            "ts": pa.array(
                np.array([0, h // 2, h, 3 * h], "int64"), pa.timestamp("us")
            ),
            "event_type": pa.array(["a", "a", "a", "a"]),
            "value": pa.array([1.0, 2.0, 4.0, 8.0]),
        }
    )
    out = (
        hopping_agg(rd.from_arrow(tbl), window_us=2 * h, hop_us=h)
        .to_pandas()
        .sort_values("window")
        .reset_index(drop=True)
    )
    # windows (start, members): -1h:{0,.5h}, 0h:{0,.5h,1h}, 1h:{1h}, 2h:{3h}, 3h:{3h}
    starts = (
        pd.to_datetime(out["window"]).astype("datetime64[us]").astype("int64")
        // h
    )
    assert starts.tolist() == [-1, 0, 1, 2, 3]
    assert out["n"].tolist() == [2, 3, 1, 1, 1]
    assert out["value_sum"].tolist() == [3.0, 7.0, 4.0, 8.0, 8.0]


def test_stratified_sample_rates(ray_session):
    import ray.data as rd

    from seekr_ray.extras.split import stratified_sample

    n = 4000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "event_type": pa.array(["click", "view"] * (n // 2)),
        }
    )
    out = stratified_sample(
        rd.from_arrow(tbl),
        id_col="event_id",
        group_col="event_type",
        rates={"click": 0.25, "view": 1.0},
    ).to_pandas()
    counts = out["event_type"].value_counts()
    assert counts["view"] == n // 2  # rate 1.0 keeps everything
    assert abs(counts["click"] / (n // 2) - 0.25) < 0.05
    # deterministic: same call yields identical rows
    out2 = stratified_sample(
        rd.from_arrow(tbl),
        id_col="event_id",
        group_col="event_type",
        rates={"click": 0.25, "view": 1.0},
    ).to_pandas()
    assert sorted(out["event_id"]) == sorted(out2["event_id"])


def test_hll_event_ids_estimate(ray_session):
    import ray.data as rd

    from seekr_ray.extras.sketch import hll_estimate, hll_registers

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet")
    reg = hll_registers(ds, "event_id")
    tbl = pa.concat_tables(list(reg.iter_batches(batch_format="pyarrow")))
    est = hll_estimate(tbl)
    assert abs(est - 10_000) / 10_000 < 0.08  # 5 sigma at m=4096


# -- exact heavy hitters ------------------------------------------------------


def _hh_truth(phi_ppm: int):
    from collections import Counter

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    )
    c = Counter()
    for x in docs["text"].to_pylist():
        c.update(simple_tokens(x or ""))
    n = sum(c.values())
    return sorted(
        (t, k) for t, k in c.items() if k * 1_000_000 >= phi_ppm * n
    )


def test_heavy_hitters_exact_matches_counter(ray_session):
    import ray.data as rd

    from seekr_ray.extras.sketch import heavy_hitters_exact

    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = heavy_hitters_exact(ds, phi_ppm=5000)
    want = _hh_truth(5000)
    assert want, "fixture must produce non-trivial heavy hitters"
    assert list(zip(got["term"].to_pylist(), got["n_occurrences"].to_pylist())) == want


def test_heavy_hitters_parallelism_invariant(ray_session):
    """The local-threshold prune varies the candidate SUPERSET with block
    layout, but the recount makes the final answer layout-independent."""
    import ray.data as rd

    from seekr_ray.extras.sketch import heavy_hitters_exact

    base = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    a = heavy_hitters_exact(base, phi_ppm=5000)
    b = heavy_hitters_exact(
        rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
        .repartition(7),
        phi_ppm=5000,
    )
    assert a.equals(b)


def test_heavy_hitters_skewed_spread(ray_session):
    """A term spread thin across blocks (locally frequent in only some)
    still surfaces exactly — the superset guarantee at work — and a term
    just UNDER the global threshold is excluded even where it is locally
    frequent."""
    import ray.data as rd

    from seekr_ray.extras.sketch import heavy_hitters_exact

    # 10 one-doc blocks; "aa" appears 3x per doc (30/300 = 10%),
    # "bb" is locally frequent in one block only (4/300 < 2%)
    rows = []
    filler = [f"tok{i:03d}" for i in range(23)]
    for b in range(10):
        words = ["aa", "aa", "aa"] + ([] if b else ["bb", "bb", "bb", "bb"])
        words += [filler[(b * 7 + j) % 23] for j in range(27 - len(words) + 3)]
        rows.append(" ".join(words))
    tbl = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array(rows, pa.string())})
    ds = rd.from_arrow(tbl).repartition(10)
    got = heavy_hitters_exact(ds, phi_ppm=50_000, text_col="text")  # 5%
    pairs = dict(zip(got["term"].to_pylist(), got["n_occurrences"].to_pylist()))
    assert pairs.get("aa") == 30
    assert "bb" not in pairs


def test_heavy_hitters_empty(ray_session):
    import ray.data as rd

    from seekr_ray.extras.sketch import heavy_hitters_exact

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    got = heavy_hitters_exact(ds, phi_ppm=5000)
    assert got.num_rows == 0
    assert got.column_names == ["term", "n_occurrences"]


def test_cap_per_key_quota_and_determinism(ray_session):
    """cap_per_key keeps exactly min(cap, group size) rows per key, the
    SAME rows across block layouts (stateless md5 order), and never
    invents rows."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.split import cap_per_key

    df = pd.DataFrame(
        {
            "doc_id": range(100),
            "lang": ["aa"] * 60 + ["bb"] * 35 + ["cc"] * 5,
        }
    )

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        out = cap_per_key(ds, key_col="lang", id_col="doc_id", cap=10)
        return sorted(
            zip(*(lambda d: (d["lang"], d["doc_id"]))(out.to_pandas()))
        )

    a, b = run(1), run(7)
    assert a == b  # layout-independent
    counts = pd.Series([l for l, _ in a]).value_counts().to_dict()
    assert counts == {"aa": 10, "bb": 10, "cc": 5}
    # matches the md5 order definition exactly
    want = []
    for lang, grp in df.groupby("lang"):
        h = [
            (
                int.from_bytes(
                    hashlib.md5(str(d).encode()).digest()[:8], "little"
                ),
                d,
            )
            for d in grp["doc_id"]
        ]
        want += [(lang, d) for _, d in sorted(h)[:10]]
    assert a == sorted(want)


def test_hll_registers_by_key_merge_and_estimate(ray_session):
    """Per-key registers are layout-invariant (register max merges), and
    each key's estimate tracks its true distinct count."""
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.sketch import hll_estimate, hll_registers_by_key

    rng = np.random.default_rng(11)
    n = 6000
    df = pd.DataFrame(
        {
            "event_type": np.where(rng.random(n) < 0.5, "click", "view"),
            "user_id": rng.integers(0, 800, n),
        }
    )

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        out = hll_registers_by_key(
            ds, key_col="event_type", col="user_id"
        ).to_pandas()
        return out.sort_values(["event_type", "bucket"]).reset_index(drop=True)

    a, b = run(2), run(9)
    pd.testing.assert_frame_equal(a, b)
    import pyarrow as pa

    for key, sub in a.groupby("event_type"):
        truth = df.loc[df.event_type == key, "user_id"].nunique()
        est = hll_estimate(
            pa.table(
                {
                    "bucket": pa.array(sub["bucket"], pa.int64()),
                    "rho": pa.array(sub["rho"], pa.int64()),
                }
            )
        )
        assert abs(est - truth) / truth < 0.08, (key, est, truth)


def test_negative_samples_uniform_and_self_free(ray_session):
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.split import negative_samples

    n = 50
    df = pd.DataFrame({"vec_id": range(n)})

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        out = negative_samples(ds, id_col="vec_id", n_rows=n, k=3).to_pandas()
        return out.sort_values(["vec_id", "j"]).reset_index(drop=True)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == n * 3
    assert (a["vec_id"] != a["neg_id"]).all()  # never the anchor
    assert a["neg_id"].between(0, n - 1).all()
    # salt changes the draw
    ds = rd.from_pandas(df)
    alt = (
        negative_samples(ds, id_col="vec_id", n_rows=n, k=3, salt="x")
        .to_pandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    assert not alt["neg_id"].equals(a["neg_id"])
