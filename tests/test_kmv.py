"""KMV sketch family: merge-order invariance and estimator accuracy."""

import numpy as np
import pyarrow as pa
import pytest


def _events_table(n_users=3000, overlap=1000, seed=3):
    """Two event types whose user sets overlap in exactly ``overlap``
    users; rows duplicated and shuffled to exercise distinct handling."""
    rng = np.random.default_rng(seed)
    a_users = np.arange(n_users)
    b_users = np.arange(n_users - overlap, 2 * n_users - overlap)
    rows_t, rows_u = [], []
    for t, users in (("view", a_users), ("purchase", b_users)):
        # every user at least once (the true distinct sets are exactly
        # a_users/b_users) plus random duplicates to exercise dedup
        picks = np.concatenate(
            [users, rng.choice(users, size=len(users), replace=True)]
        )
        rows_t.extend([t] * len(picks))
        rows_u.extend(picks.tolist())
    perm = rng.permutation(len(rows_u))
    return pa.table(
        {
            "event_type": pa.array(
                np.asarray(rows_t, dtype=object)[perm], pa.string()
            ),
            "user_id": pa.array(np.asarray(rows_u)[perm], pa.int64()),
        }
    )


def test_kmv_overlap_accuracy(ray_session):
    import ray.data as rd

    from seekr_ray.extras.kmv import kmv_user_overlap

    tbl = _events_table()
    out = kmv_user_overlap(rd.from_arrow(tbl), k=256)
    assert out.num_rows == 1
    est = out["est_common_users"][0].as_py()
    # true intersection = 1000 of 3000/3000 users; k=256 KMV has
    # ~1/sqrt(k) ≈ 6% relative error — allow 25%
    assert 750 <= est <= 1250, est


def test_kmv_block_arrangement_invariance(ray_session):
    import ray.data as rd

    from seekr_ray.extras.kmv import kmv_user_overlap

    tbl = _events_table(n_users=800, overlap=300, seed=9)
    a = kmv_user_overlap(rd.from_arrow(tbl), k=128)
    b = kmv_user_overlap(
        rd.from_arrow(tbl).repartition(13), k=128
    )
    assert a.to_pydict() == b.to_pydict()


def test_bottomk_quantiles_close_to_exact(ray_session):
    import ray.data as rd

    from seekr_ray.extras.kmv import bottomk_quantiles

    rng = np.random.default_rng(1)
    vals = rng.gamma(4.0, 25.0, size=50_000)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(len(vals)), pa.int64()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    out = bottomk_quantiles(
        rd.from_arrow(tbl), id_col="id", val_col="v", k=2048
    ).to_pandas()
    for q, est in zip(out["q"], out["value"]):
        exact = np.quantile(vals, q)
        assert abs(est - exact) / exact < 0.10, (q, est, exact)


def test_bottomk_quantiles_small_input_is_exact(ray_session):
    import ray.data as rd

    from seekr_ray.extras.kmv import bottomk_quantiles

    vals = np.arange(100, dtype=np.float64)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(100), pa.int64()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    out = bottomk_quantiles(
        rd.from_arrow(tbl), id_col="id", val_col="v", k=1024, qs=(0.5,)
    ).to_pandas()
    # sample == population when n < k: the estimate is the exact quantile
    assert out["value"][0] == pytest.approx(np.quantile(vals, 0.5), abs=1e-6)


# ---------------------------------------------------------------------------
# EWMA / SCD2 kernel properties (contract-level equality is oracle-pinned;
# these pin the semantics directly)
# ---------------------------------------------------------------------------


def _stream_table(seed=11, n_users=40, n_events=2000):
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, n_users, n_events)
    ts = rng.permutation(n_events).astype("datetime64[us]")
    val = np.round(rng.uniform(0.01, 490.0, n_events), 2)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(uid, pa.int64()),
            "value": pa.array(val, pa.float64()),
        }
    )


def test_ewma_matches_reference_scan_and_is_bucket_invariant(ray_session):
    import ray.data as rd

    from seekr_ray.extras.windows import ewma_per_group

    tbl = _stream_table()
    out = ewma_per_group(rd.from_arrow(tbl)).to_pandas()
    out2 = ewma_per_group(
        rd.from_arrow(tbl).repartition(7), num_buckets=5
    ).to_pandas()
    a = out.sort_values("user_id").reset_index(drop=True)
    b = out2.sort_values("user_id").reset_index(drop=True)
    assert (a["user_id"] == b["user_id"]).all()
    assert (a["ewma_value"] == b["ewma_value"]).all()  # bit-equal

    # per-user reference recursion over the trailing 32
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    for uid, g in df.groupby("user_id"):
        cents = np.rint(g["value"].to_numpy() * 100.0).astype(np.int64)
        w = cents[-32:]
        s = float(w[0])
        for x in w[1:]:
            s = 0.5 * float(x) + 0.5 * s
        got = float(a.loc[a["user_id"] == uid, "ewma_value"].iloc[0])
        assert got == s / 100.0, uid


def test_scd2_intervals_properties(ray_session):
    import ray.data as rd

    from seekr_ray.extras.windows import SCD2_OPEN_END_US, scd2_intervals

    # crafted stream: user 1 value changes A A B B A; user 2 constant
    rows = [
        (1, 1, 10.0), (2, 1, 10.0), (3, 1, 20.0), (4, 1, 20.0), (5, 1, 10.0),
        (6, 2, 7.0), (7, 2, 7.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.asarray([r[0] * 1000 for r in rows], "datetime64[us]")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    out = (
        scd2_intervals(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    # user 1: three change rows (10, 20, 10); user 2: one
    assert out["user_id"].tolist() == [1, 1, 1, 2]
    assert out["v_cents"].tolist() == [1000, 2000, 1000, 700]
    assert out["valid_from_us"].tolist() == [1000, 3000, 5000, 6000]
    assert out["valid_to_us"].tolist() == [
        3000,
        5000,
        SCD2_OPEN_END_US,
        SCD2_OPEN_END_US,
    ]
