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
