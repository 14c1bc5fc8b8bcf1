"""Unit tests for cumulative_users_by_day and compression_ratio."""

import zlib

import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _collect(ds):
    if isinstance(ds, pa.Table):
        return ds
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def test_cumulative_users_by_day():
    import ray.data as rd

    from seekr_ray.extras.cumulative import cumulative_users_by_day

    ts = pd.to_datetime(
        [
            "2025-01-01 09:00",  # u1 first day
            "2025-01-01 10:00",  # u2 first day
            "2025-01-02 09:00",  # u1 again (not new)
            "2025-01-03 09:00",  # u3 first day
            "2025-01-03 09:30",  # u1 again
        ]
    )
    tbl = pa.table(
        {
            "user_id": pa.array([1, 2, 1, 3, 1], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    out = (
        _collect(
            cumulative_users_by_day(rd.from_arrow(tbl).repartition(3))
        )
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    assert list(out["n_new"]) == [2, 1]  # Jan 1: u1+u2; Jan 3: u3
    assert list(out["n_cumulative"]) == [2, 3]
    assert pd.Timestamp("2025-01-02") not in out.index  # no new users


def test_compression_ratio_signal():
    import ray.data as rd

    from seekr_ray.extras.compressq import ZLIB_LEVEL, compression_ratio
    from seekr_ray.extras.textstats import round6

    repetitive = "spam ham " * 200
    import numpy as np

    rng = np.random.default_rng(9)
    noise = "".join(chr(33 + int(x)) for x in rng.integers(0, 90, 1500))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([repetitive, noise, ""]),
        }
    )
    out = (
        _collect(compression_ratio(rd.from_arrow(tbl).repartition(2)))
        .to_pandas()
        .set_index("doc_id")
    )
    # exact zlib mirror
    for doc_id, text in [(1, repetitive), (2, noise)]:
        raw = text.encode()
        comp = zlib.compress(raw, ZLIB_LEVEL)
        assert out.loc[doc_id, "n_bytes"] == len(raw)
        assert out.loc[doc_id, "n_compressed"] == len(comp)
        assert out.loc[doc_id, "ratio"] == round6(len(comp) / len(raw))
    assert out.loc[1, "ratio"] < 0.1  # repetitive compresses hard
    assert out.loc[2, "ratio"] > 0.5  # noise barely compresses
    assert out.loc[3, "ratio"] == 0.0 and out.loc[3, "n_bytes"] == 0


def test_conversion_lag_law():
    import ray.data as rd

    from seekr_ray.extras.funnel import conversion_lag

    ts = pd.to_datetime(
        [
            "2025-01-01 00:00",  # u1 first (view)
            "2025-01-01 01:00",  # u1 purchase -> lag 1h
            "2025-01-02 00:00",  # u2 purchase immediately -> lag 0
            "2025-01-03 00:00",  # u3 never converts -> omitted
        ]
    )
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["view", "purchase", "purchase", "view"]),
        }
    )
    out = (
        _collect(
            conversion_lag(
                rd.from_arrow(tbl).repartition(2), target_type="purchase"
            )
        )
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "lag_us"] == 3_600_000_000
    assert out.loc[2, "lag_us"] == 0


def test_basket_size_histogram():
    import ray.data as rd

    from seekr_ray.extras.basket import basket_size_histogram

    tbl = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
            "l_partkey": pa.array([7, 8, 8, 7, 9, 5, 5], pa.int64()),
        }
    )
    out = (
        _collect(basket_size_histogram(rd.from_arrow(tbl).repartition(3)))
        .to_pandas()
        .set_index("n_items")
        .sort_index()
    )
    # order 1: {7,8} -> 2 items (dup line collapses); order 2: 2; order 3: 1
    assert out.loc[1, "n_orders"] == 1
    assert out.loc[2, "n_orders"] == 2
