"""k-core: driver path == distributed path == set-based brute force."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.extras.kcore import _peel_driver, k_core


def _random_edges(n_nodes=70, p=0.08, seed=5):
    rng = np.random.default_rng(seed)
    a, b = [], []
    for x, y in itertools.combinations(range(n_nodes), 2):
        if rng.random() < p:
            a.append(x)
            b.append(y)
    return np.asarray(a, np.int64), np.asarray(b, np.int64)


def _brute(a, b, k):
    adj: dict[int, set[int]] = {}
    for x, y in zip(a.tolist(), b.tolist()):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(s) for n, s in adj.items() if s}


def test_driver_matches_brute_force():
    a, b = _random_edges()
    for k in (2, 3, 4):
        nodes, deg = _peel_driver(a.copy(), b.copy(), k)
        assert dict(zip(nodes.tolist(), deg.tolist())) == _brute(a, b, k)


def test_known_graphs():
    # triangle + pendant: 2-core is the triangle
    a = np.array([0, 0, 1, 2], np.int64)
    b = np.array([1, 2, 2, 3], np.int64)
    nodes, deg = _peel_driver(a, b, 2)
    assert dict(zip(nodes.tolist(), deg.tolist())) == {0: 2, 1: 2, 2: 2}
    # K5 is its own 4-core; its 5-core is empty
    a5, b5 = map(
        lambda x: np.asarray(x, np.int64),
        zip(*itertools.combinations(range(5), 2)),
    )
    nodes, deg = _peel_driver(a5, b5, 4)
    assert deg.tolist() == [4] * 5
    nodes, deg = _peel_driver(a5, b5, 5)
    assert len(nodes) == 0


def test_distributed_equals_driver(ray_session):
    import ray.data as rd

    a, b = _random_edges(n_nodes=60, p=0.1, seed=8)
    tbl = pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
    )
    for k in (2, 3):
        want = k_core(rd.from_arrow(tbl), k=k).to_pandas()
        got = k_core(
            rd.from_arrow(tbl), k=k, driver_edge_limit=0
        ).to_pandas()
        assert dict(zip(want["node"], want["deg"])) == dict(
            zip(got["node"], got["deg"])
        )
        assert dict(zip(want["node"], want["deg"])) == _brute(a, b, k)


def test_distributed_empty_core(ray_session):
    import ray.data as rd

    # a path graph has no 2-core
    a = np.arange(0, 5, dtype=np.int64)
    b = a + 1
    tbl = pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
    )
    out = k_core(rd.from_arrow(tbl), k=2, driver_edge_limit=0)
    assert out.num_rows == 0


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    a, b = _random_edges(n_nodes=50, p=0.15, seed=13)
    tbl = pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
    )
    one = k_core(rd.from_arrow(tbl), k=3, driver_edge_limit=0).to_pandas()
    many = k_core(
        rd.from_arrow(tbl).repartition(6),
        k=3,
        driver_edge_limit=0,
        num_buckets=7,
    ).to_pandas()
    assert dict(zip(one["node"], one["deg"])) == dict(
        zip(many["node"], many["deg"])
    )


def test_k_validation(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {"a": pa.array([0], pa.int64()), "b": pa.array([1], pa.int64())}
    )
    with pytest.raises(ValueError):
        k_core(rd.from_arrow(tbl), k=0)
