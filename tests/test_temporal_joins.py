"""Temporal joins (extras/joins.py): golden semantics, tie-breaks, and
broadcast ≡ bucketed path equality."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seekr_ray.extras.joins import (
    _asof_kernel,
    _lookback_kernel,
    _sort_build_asof,
    asof_join_prev,
    range_lookback_agg,
)

US = 1_000_000


def _ts(sec):
    return np.asarray(sec, np.int64) * US


def test_asof_kernel_golden_and_ties():
    # build: key 1 at t=10 (ids 5, 9 — tie on ts), t=20 (id 2); key 2 at t=15
    bk = np.array([1, 1, 1, 2], np.int64)
    bt = _ts([10, 10, 20, 15])
    bi = np.array([5, 9, 2, 7], np.int64)
    bk, bt, bi = _sort_build_asof(bk, bt, bi)
    pk = np.array([1, 1, 1, 2, 3], np.int64)
    pt = _ts([10, 11, 25, 16, 99])
    found, cand = _asof_kernel(pk, pt, bk, bt, bi)
    # probe(1, t=10): strict < → nothing at t<10 → not found
    assert not found[0]
    # probe(1, t=11): ties at t=10 → max id (9) wins
    assert found[1] and bi[cand[1]] == 9
    # probe(1, t=25): latest is t=20 id 2
    assert found[2] and bi[cand[2]] == 2
    # probe(2, t=16): key 2's t=15 id 7
    assert found[3] and bi[cand[3]] == 7
    # probe(3,...): key absent
    assert not found[4]


def test_lookback_kernel_golden():
    bk = np.array([1, 1, 1, 2], np.int64)
    bt = _ts([5, 8, 12, 8])
    bv = np.array([1.0, 2.0, 4.0, 8.0])
    order = np.lexsort((bt, bk))
    bk, bt, bv = bk[order], bt[order], bv[order]
    pk = np.array([1, 1, 2, 3], np.int64)
    pt = _ts([12, 20, 9, 9])
    # window 5s: [7,12) for probe0 → t=8 only; [15,20) → none;
    # key2 [4,9) → t=8 val 8; key3 absent
    counts, sums = _lookback_kernel(pk, pt, 5 * US, bk, bt, bv)
    assert counts.tolist() == [1, 0, 1, 0]
    assert sums[0] == 2.0 and sums[2] == 8.0


def test_lookback_boundary_inclusive_exclusive():
    bk = np.array([1, 1], np.int64)
    bt = _ts([10, 15])
    bv = np.array([1.0, 2.0])
    pk = np.array([1], np.int64)
    pt = _ts([15])
    # [10, 15): t=10 included (lo inclusive), t=15 excluded (hi exclusive)
    counts, sums = _lookback_kernel(pk, pt, 5 * US, bk, bt, bv)
    assert counts.tolist() == [1] and sums[0] == 1.0


SF_DIR = "/root/testdata/sf0.001"


def _events(columns):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(SF_DIR, "events.parquet"), columns=columns
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_asof_broadcast_equals_bucketed(ray_session):
    import pyarrow.compute as pc

    left = _events(["event_id", "user_id", "ts"])
    build = _events(["event_id", "user_id", "ts", "event_type"]).map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    bc = asof_join_prev(left, build).to_pandas()
    bk = asof_join_prev(left, build, broadcast_limit=0, num_buckets=7).to_pandas()
    assert len(bc) > 0
    pd.testing.assert_frame_equal(_norm(bc), _norm(bk))


def test_lookback_broadcast_equals_bucketed(ray_session):
    import pyarrow.compute as pc

    build = _events(["event_id", "user_id", "ts", "value"])
    labels = _events(["event_id", "user_id", "ts", "event_type"]).map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    w = 24 * 3_600 * US
    bc = range_lookback_agg(labels, build, window_us=w).to_pandas()
    bk = range_lookback_agg(
        labels, build, window_us=w, broadcast_limit=0, num_buckets=7
    ).to_pandas()
    assert len(bc) > 0
    pd.testing.assert_frame_equal(_norm(bc), _norm(bk))


def test_sessionize_golden(ray_session):
    import ray.data as rd

    from seekr_ray.extras.windows import sessionize

    # user 1: t=0,1h,2h | gap 10h | 12h,13h ; user 2: t=5h
    h = 3_600 * US
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                np.array([0, 1, 2, 12, 13, 5], "int64") * h,
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    out = (
        sessionize(rd.from_arrow(tbl), gap_us=6 * h)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_id"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [3, 2, 1]
    assert out["value_sum"].tolist() == [6.0, 9.0, 6.0]
