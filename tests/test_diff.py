"""Snapshot diff: classification vs brute force, invariance, dup guard."""

import pyarrow as pa
import pytest

from seekr_ray.extras.diff import diff_counts, snapshot_diff


def _sides():
    old = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "content_hash": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([2, 3, 4, 6, 7], pa.int64()),
            "content_hash": pa.array(["b", "C", "d", "f", "g"], pa.string()),
        }
    )
    return old, new


EXPECT = {
    1: "removed",
    5: "removed",
    2: "unchanged",
    4: "unchanged",
    3: "changed",
    6: "added",
    7: "added",
}


def test_classification(ray_session):
    import ray.data as rd

    old, new = _sides()
    out = snapshot_diff(rd.from_arrow(old), rd.from_arrow(new)).to_pandas()
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == EXPECT


def test_exclude_unchanged_and_counts(ray_session):
    import ray.data as rd

    old, new = _sides()
    d = snapshot_diff(
        rd.from_arrow(old), rd.from_arrow(new), include_unchanged=False
    )
    out = d.to_pandas()
    assert set(out["status"]) == {"added", "removed", "changed"}
    c = diff_counts(
        snapshot_diff(rd.from_arrow(old), rd.from_arrow(new))
    ).to_pandas()
    assert dict(zip(c["status"], c["n"])) == {
        "added": 2,
        "removed": 2,
        "changed": 1,
        "unchanged": 2,
    }


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    old, new = _sides()
    one = snapshot_diff(rd.from_arrow(old), rd.from_arrow(new)).to_pandas()
    many = snapshot_diff(
        rd.from_arrow(old).repartition(3),
        rd.from_arrow(new).repartition(4),
        num_buckets=7,
    ).to_pandas()
    assert dict(zip(one["doc_id"], one["status"])) == dict(
        zip(many["doc_id"], many["status"])
    )


def test_duplicate_keys_rejected(ray_session):
    import ray.data as rd

    dup = pa.table(
        {
            "doc_id": pa.array([1, 1], pa.int64()),
            "content_hash": pa.array(["a", "b"], pa.string()),
        }
    )
    old, _ = _sides()
    with pytest.raises(Exception):
        snapshot_diff(rd.from_arrow(dup), rd.from_arrow(old)).to_pandas()


def test_one_side_empty(ray_session):
    import ray.data as rd

    old, _ = _sides()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "content_hash": pa.array([], pa.string()),
        }
    )
    out = snapshot_diff(rd.from_arrow(old), rd.from_arrow(empty)).to_pandas()
    assert set(out["status"]) == {"removed"} and len(out) == 5
