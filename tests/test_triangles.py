"""Triangle counting: driver path == distributed path == brute force."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.extras.triangles import (
    _count_driver,
    cooccurrence_edges,
    triangle_count,
)


def _random_edges(n_nodes=60, p=0.15, seed=3):
    rng = np.random.default_rng(seed)
    a, b = [], []
    for x, y in itertools.combinations(range(n_nodes), 2):
        if rng.random() < p:
            a.append(x)
            b.append(y)
    return np.asarray(a, np.int64), np.asarray(b, np.int64)


def _brute(a, b):
    adj = set(zip(a.tolist(), b.tolist()))
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    n = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            n += 1
    return n


def test_driver_matches_brute_force():
    a, b = _random_edges()
    assert _count_driver(a, b) == _brute(a, b)


def test_driver_known_graphs():
    # one triangle + a pendant edge
    a = np.array([0, 0, 1, 2], np.int64)
    b = np.array([1, 2, 2, 3], np.int64)
    assert _count_driver(a, b) == 1
    # K4 has 4 triangles
    a4, b4 = map(
        np.asarray, zip(*itertools.combinations(range(4), 2))
    )
    assert _count_driver(a4.astype(np.int64), b4.astype(np.int64)) == 4
    # star has none
    assert _count_driver(
        np.zeros(5, np.int64), np.arange(1, 6, dtype=np.int64)
    ) == 0


def test_distributed_path_equals_driver(ray_session):
    import ray.data as rd

    a, b = _random_edges(n_nodes=80, p=0.12, seed=9)
    ds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    want = triangle_count(ds)  # driver path (small)
    got = triangle_count(ds, driver_edge_limit=0)  # force distributed
    assert want["n_triangles"].to_pylist() == got["n_triangles"].to_pylist()
    assert want["n_edges"].to_pylist() == got["n_edges"].to_pylist()
    assert want["n_triangles"][0].as_py() == _brute(a, b)


def test_cooccurrence_edges_distinct_and_canonical(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2, 2, 2, 3], pa.int64()),
            "i": pa.array([5, 3, 5, 7, 3, 5, 7, 9], pa.int64()),
        }
    )
    out = cooccurrence_edges(
        rd.from_arrow(tbl), group_col="g", item_col="i"
    ).to_pandas()
    got = sorted(zip(out["a"], out["b"]))
    # group1 items {3,5} -> (3,5); group2 items {3,5,7} -> 3 pairs
    assert got == [(3, 5), (3, 7), (5, 7)]


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    a, b = _random_edges(n_nodes=50, p=0.2, seed=11)
    tbl = pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
    )
    one = triangle_count(rd.from_arrow(tbl), driver_edge_limit=0)
    many = triangle_count(
        rd.from_arrow(tbl).repartition(7), driver_edge_limit=0
    )
    assert one.equals(many)
