"""LPA: numpy vs per-round dict reference; distributed == driver."""

import collections
import itertools

import numpy as np
import pyarrow as pa

from seekr_ray.graph.lpa import _lpa_numpy, lpa_communities


def _reference(edges, n_iters):
    adj = collections.defaultdict(list)
    for x, y in edges:
        adj[x].append(y)
        adj[y].append(x)
    lab = {n: n for n in adj}
    for _ in range(n_iters):
        new = {}
        for n in adj:
            cnt = collections.Counter(lab[m] for m in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    return lab


def _random_edges(n_nodes=40, p=0.08, seed=31):
    rng = np.random.default_rng(seed)
    out = []
    for x, y in itertools.combinations(range(n_nodes), 2):
        if rng.random() < p:
            out.append((x, y))
    return out


def test_numpy_matches_reference():
    edges = _random_edges()
    a = np.array([x for x, _ in edges], np.int64)
    b = np.array([y for _, y in edges], np.int64)
    for k in (1, 3, 5):
        nodes, lab = _lpa_numpy(a, b, k)
        assert dict(zip(nodes.tolist(), lab.tolist())) == _reference(edges, k)


def test_two_cliques_bridge():
    # two triangles joined by one bridge edge: labels converge within
    # each clique to its min node
    edges = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    a = np.array([x for x, _ in edges], np.int64)
    b = np.array([y for _, y in edges], np.int64)
    nodes, lab = _lpa_numpy(a, b, 4)
    got = dict(zip(nodes.tolist(), lab.tolist()))
    assert got == _reference(edges, 4)
    assert got[0] == got[1] == 0  # clique A coalesces to min label


def test_distributed_equals_driver(ray_session):
    import ray.data as rd

    edges = _random_edges(n_nodes=35, p=0.1, seed=7)
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([x for x, _ in edges], pa.int64()),
                "b": pa.array([y for _, y in edges], pa.int64()),
            }
        )
    )
    want = lpa_communities(ds, n_iters=3).to_pandas()
    got = lpa_communities(
        ds, n_iters=3, driver_edge_limit=0, num_buckets=7
    ).to_pandas()
    assert dict(zip(want["node"], want["label"])) == dict(
        zip(got["node"], got["label"])
    )
