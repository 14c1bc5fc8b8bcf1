"""Unit tests for mad_outlier_rows, global_quantile_filter, and
source_stats (semantics on handcrafted fixtures; DuckDB bit-parity is
covered by the contract audit)."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def test_mad_outlier_rows_flags_far_points():
    import ray.data as rd

    from seekr_ray.extras.stats import mad_outlier_rows

    # group "a": tight cluster around 10 with one wild point;
    # group "b": all identical (mad 0 -> any deviation is an outlier)
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 500.0, 7.0, 7.0, 7.0, 7.1]
    types = ["a"] * 6 + ["b"] * 4
    tbl = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out = _collect(
        mad_outlier_rows(
            rd.from_arrow(tbl).repartition(3),
            key_col="event_type",
            val_col="value",
            id_col="event_id",
            k=3.0,
        )
    ).to_pandas()
    assert set(out["event_id"]) == {5, 9}  # 500.0 in a; 7.1 in b


def test_mad_outlier_rows_layout_invariant():
    import ray.data as rd

    from seekr_ray.extras.stats import mad_outlier_rows

    rng = np.random.default_rng(11)
    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(
                [["x", "y"][i % 2] for i in range(n)]
            ),
            "value": pa.array(rng.standard_normal(n) * 10, pa.float64()),
        }
    )
    outs = []
    for parts in (1, 7):
        out = (
            _collect(
                mad_outlier_rows(
                    rd.from_arrow(tbl).repartition(parts),
                    key_col="event_type",
                    val_col="value",
                    id_col="event_id",
                )
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])


def test_global_quantile_filter_threshold_law():
    import ray.data as rd

    from seekr_ray.extras.stats import global_quantile_filter, quantile_cont
    from seekr_ray.extras.textstats import round6

    rng = np.random.default_rng(3)
    v = rng.integers(0, 50, size=200)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "n_tokens": pa.array(v, pa.int64()),
        }
    )
    out = _collect(
        global_quantile_filter(
            rd.from_arrow(tbl).repartition(5),
            id_col="doc_id",
            val_col="n_tokens",
            q=0.25,
        )
    ).to_pandas()
    thr = round6(quantile_cont(np.sort(v.astype(np.float64)), 0.25))
    expect = {i for i, x in enumerate(v) if float(x) > thr}
    assert set(out["doc_id"]) == expect
    assert len(expect) > 0 and len(expect) < 200  # non-vacuous


def test_source_stats_exact():
    import ray.data as rd

    from seekr_ray.extras.curate import source_stats
    from seekr_ray.extras.textstats import round6

    tbl = pa.table(
        {
            "source": pa.array(["s1", "s1", "s2"]),
            "text": pa.array(
                [
                    "alpha beta gamma",  # 3 tokens
                    "alpha beta",  # 2
                    "gamma delta epsilon zeta",  # 4
                ]
            ),
        }
    )
    out = (
        _collect(source_stats(rd.from_arrow(tbl).repartition(2)))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert out.loc["s1", "n_docs"] == 2 and out.loc["s1", "n_tokens"] == 5
    assert out.loc["s1", "mean_tokens"] == round6(5 / 2)
    assert out.loc["s1", "doc_share"] == round6(2 / 3)
    assert out.loc["s2", "n_docs"] == 1 and out.loc["s2", "n_tokens"] == 4


def test_copurchase_lift_law():
    import ray.data as rd

    from seekr_ray.extras.basket import copurchase_lift
    from seekr_ray.extras.textstats import round6

    # orders: {1,2} x2 (support 2), {1,3} x1 (below min_support),
    # duplicate line of item 1 in order 10 (distinct-order counting)
    tbl = pa.table(
        {
            "l_orderkey": pa.array(
                [10, 10, 10, 20, 20, 30, 30, 40], pa.int64()
            ),
            "l_partkey": pa.array([1, 1, 2, 1, 2, 1, 3, 3], pa.int64()),
        }
    )
    out = copurchase_lift(
        rd.from_arrow(tbl).repartition(3), min_support=2
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["item_a"], row["item_b"]) == (1, 2)
    assert row["n_ab"] == 2 and row["n_a"] == 3 and row["n_b"] == 2
    # 4 distinct orders total
    assert row["lift"] == round6(2 * 4 / (3 * 2))


def test_grouped_quantile_filter_per_group_thresholds():
    import ray.data as rd

    from seekr_ray.extras.stats import (
        grouped_quantile_filter,
        quantile_cont,
    )
    from seekr_ray.extras.textstats import round6

    rng = np.random.default_rng(13)
    # group "x" long docs, group "y" short docs: a per-group gate keeps
    # y's top slice that a global p25 would have dropped entirely
    vx = rng.integers(100, 200, 80)
    vy = rng.integers(1, 20, 80)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(160), pa.int64()),
            "lang": pa.array(["x"] * 80 + ["y"] * 80),
            "n_tokens": pa.array(
                np.concatenate([vx, vy]), pa.int64()
            ),
        }
    )
    out = _collect(
        grouped_quantile_filter(
            rd.from_arrow(tbl).repartition(5),
            key_col="lang",
            id_col="doc_id",
            val_col="n_tokens",
            q=0.25,
        )
    ).to_pandas()
    tx = round6(quantile_cont(np.sort(vx.astype(np.float64)), 0.25))
    ty = round6(quantile_cont(np.sort(vy.astype(np.float64)), 0.25))
    expect = {i for i, v in enumerate(vx) if float(v) > tx} | {
        80 + i for i, v in enumerate(vy) if float(v) > ty
    }
    assert set(out["doc_id"]) == expect
    assert (out["lang"] == "y").sum() > 0  # low-resource slice survives
