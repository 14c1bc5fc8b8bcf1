"""Unit tests for user_activity_features, degree_stats, and
simhash_near_pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def test_user_activity_features_exact():
    import ray.data as rd

    from seekr_ray.extras.features import user_activity_features

    ts = pd.to_datetime(
        [
            "2025-03-01 10:00:00",
            "2025-03-01 23:59:00",
            "2025-03-02 00:01:00",
            "2025-03-05 12:00:00",
        ]
    )
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "b", "c"]),
            "value": pa.array([1.25, 2.50, 3.25, 10.0], pa.float64()),
        }
    )
    out = (
        _collect(user_activity_features(rd.from_arrow(tbl).repartition(2)))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "n_active_days"] == 2
    assert out.loc[1, "n_types"] == 2
    assert out.loc[1, "value_sum"] == 7.0
    assert out.loc[1, "value_mean"] == round(7.0 / 3, 6)
    assert out.loc[1, "first_ts"] == ts[0]
    assert out.loc[1, "last_ts"] == ts[2]
    assert out.loc[2, "n_events"] == 1 and out.loc[2, "value_mean"] == 10.0


def test_degree_stats_counts():
    import ray.data as rd

    from seekr_ray.extras.features import degree_stats

    # duplicate edge (1->10) must count once
    tbl = pa.table(
        {
            "src": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "dst": pa.array([10, 10, 11, 10, 1], pa.int64()),
        }
    )
    out = (
        _collect(degree_stats(rd.from_arrow(tbl).repartition(3)))
        .to_pandas()
        .set_index("node_id")
        .sort_index()
    )
    assert out.loc[1, "out_deg"] == 2 and out.loc[1, "in_deg"] == 1
    assert out.loc[2, "out_deg"] == 2 and out.loc[2, "in_deg"] == 0
    assert out.loc[10, "out_deg"] == 0 and out.loc[10, "in_deg"] == 2
    assert out.loc[11, "in_deg"] == 1


def test_simhash_pairs_vs_bruteforce():
    import ray.data as rd

    from seekr_ray.extras.dedup import simhash_near_pairs, simhash_fingerprints

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(40)]
    texts = []
    base = " ".join(rng.choice(vocab, 25))
    for i in range(30):
        if i % 3 == 0:
            texts.append(base + f" extra{i % 5}")  # near-dup family
        else:
            texts.append(" ".join(rng.choice(vocab, 25)))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    out = (
        _collect(simhash_near_pairs(ds, max_hamming=3))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # brute force over the fingerprints
    fp = (
        _collect(simhash_fingerprints(ds))
        .to_pandas()
        .sort_values("doc_id")
    )
    u = fp["simhash"].to_numpy().view(np.uint64)
    ids = fp["doc_id"].to_numpy()
    expect = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = int(bin(int(u[i] ^ u[j])).count("1"))
            if h <= 3:
                expect.append((ids[i], ids[j], h))
    got = list(zip(out["a"], out["b"], out["hamming"]))
    assert sorted(got) == sorted(expect)
    assert len(expect) > 0  # non-vacuous: the family must collide


def test_simhash_pairs_guards():
    import ray.data as rd

    from seekr_ray.extras.dedup import simhash_near_pairs

    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x y"])}
        )
    )
    with pytest.raises(ValueError):
        simhash_near_pairs(ds, max_hamming=4, num_bands=4)
    with pytest.raises(ValueError):
        simhash_near_pairs(ds, num_bands=8)
