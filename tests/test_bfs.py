"""BFS hops: numpy vs dict brute force; distributed == driver."""

import collections
import itertools

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.graph.bfs import _bfs_numpy, bfs_hops


def _random_edges(n_nodes=60, p=0.06, seed=17):
    rng = np.random.default_rng(seed)
    a, b = [], []
    for x, y in itertools.combinations(range(n_nodes), 2):
        if rng.random() < p:
            a.append(x)
            b.append(y)
    return np.asarray(a, np.int64), np.asarray(b, np.int64)


def _brute(a, b, sources):
    adj = collections.defaultdict(set)
    for x, y in zip(a.tolist(), b.tolist()):
        adj[x].add(y)
        adj[y].add(x)
    dist = {}
    q = collections.deque()
    for s in sources:
        if s in adj:
            dist[s] = 0
            q.append(s)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_numpy_matches_brute():
    a, b = _random_edges()
    for srcs in ([0], [0, 7], [3, 50]):
        nodes, dist = _bfs_numpy(a, b, np.asarray(srcs, np.int64))
        assert dict(zip(nodes.tolist(), dist.tolist())) == _brute(a, b, srcs)


def test_chain_and_disconnected():
    # 0-1-2-3 chain plus separate 10-11 edge
    a = np.array([0, 1, 2, 10], np.int64)
    b = np.array([1, 2, 3, 11], np.int64)
    nodes, dist = _bfs_numpy(a, b, np.array([0], np.int64))
    assert dict(zip(nodes.tolist(), dist.tolist())) == {0: 0, 1: 1, 2: 2, 3: 3}
    # source not in the graph -> empty
    nodes, dist = _bfs_numpy(a, b, np.array([99], np.int64))
    assert len(nodes) == 0


def test_distributed_equals_driver(ray_session):
    import ray.data as rd

    a, b = _random_edges(n_nodes=50, p=0.08, seed=23)
    ds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    want = bfs_hops(ds, sources=[1, 4]).to_pandas()
    got = bfs_hops(ds, sources=[1, 4], driver_edge_limit=0).to_pandas()
    assert dict(zip(want["node"], want["dist"])) == dict(
        zip(got["node"], got["dist"])
    )
    assert dict(zip(want["node"], want["dist"])) == _brute(a, b, [1, 4])


def test_validation(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"a": pa.array([0], pa.int64()), "b": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError):
        bfs_hops(ds, sources=[])
