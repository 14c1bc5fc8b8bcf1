"""bucketed_group_agg must be row-for-row identical to Ray's native
groupby (up to row order) for every supported agg and key dtype."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from seekr_ray.bucket_agg import bucketed_group_agg


def _cmp(native_df: pd.DataFrame, bucketed_df: pd.DataFrame, keys):
    a = native_df.sort_values(keys).reset_index(drop=True)
    b = (
        bucketed_df[a.columns.tolist()]
        .sort_values(keys)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture()
def events(ray_session):
    rng = np.random.RandomState(11)
    n = 5000
    df = pd.DataFrame(
        {
            "ik": rng.randint(0, 700, n).astype(np.int64),
            "sk": ["u%03d" % v for v in rng.randint(0, 400, n)],
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    return df, rd.from_pandas(df).repartition(6).materialize()


def test_int_key_sum_min_max(events):
    df, ds = events
    from ray.data.aggregate import Max, Min, Sum

    native = (
        ds.groupby("ik").aggregate(Sum("v"), Min("v"), Max("v")).to_pandas()
    )
    got = bucketed_group_agg(
        ds, "ik", [("v", "sum"), ("v", "min"), ("v", "max")]
    ).to_pandas()
    _cmp(native, got, ["ik"])


def test_string_key_sum_count(events):
    df, ds = events
    native = ds.groupby("sk").sum("v").to_pandas()
    got = bucketed_group_agg(ds, "sk", [("v", "sum")]).to_pandas()
    _cmp(native, got, ["sk"])
    native_c = ds.groupby("sk").count().to_pandas()
    got_c = bucketed_group_agg(ds, "sk", [("v", "count")]).to_pandas()
    _cmp(native_c, got_c, ["sk"])


def test_multi_key_mixed_dtypes(events):
    df, ds = events
    native = ds.groupby(["sk", "ik"]).sum("v").to_pandas()
    got = bucketed_group_agg(ds, ["sk", "ik"], [("v", "sum")]).to_pandas()
    _cmp(native, got, ["sk", "ik"])


def test_deterministic_across_partitionings(events):
    df, ds = events
    a = (
        bucketed_group_agg(ds, "ik", [("v", "sum")])
        .to_pandas()
        .sort_values("ik")
        .reset_index(drop=True)
    )
    ds2 = rd.from_pandas(df).repartition(13).materialize()
    b = (
        bucketed_group_agg(ds2, "ik", [("v", "sum")])
        .to_pandas()
        .sort_values("ik")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_rejects_unknown_fn(events):
    _, ds = events
    with pytest.raises(ValueError):
        bucketed_group_agg(ds, "ik", [("v", "mean")])
