"""Bounded-cost SSSP: hand-checked distances, budget semantics, and
driver == distributed path equality (the graph-suite convention)."""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([r[0] for r in rows], pa.int64()),
                "b": pa.array([r[1] for r in rows], pa.int64()),
                "w": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def _as_dict(tbl):
    if hasattr(tbl, "iter_batches"):
        tbl = pa.concat_tables(list(tbl.iter_batches(batch_format="pyarrow")))
    return dict(zip(tbl["node"].to_pylist(), tbl["dist"].to_pylist()))


def test_sssp_hand_graph(ray_session):
    from seekr_ray.graph.sssp import sssp_bounded

    # 1 -2- 2 -2- 3, plus a costly shortcut 1 -5- 3 and a spur 3 -1- 4
    rows = [(1, 2, 2), (2, 3, 2), (1, 3, 5), (3, 4, 1)]
    out = _as_dict(sssp_bounded(_edges_ds(rows), source=1, max_cost=10))
    assert out == {1: 0, 2: 2, 3: 4, 4: 5}
    # tight budget cuts the spur but keeps the shortcut comparison
    out = _as_dict(sssp_bounded(_edges_ds(rows), source=1, max_cost=4))
    assert out == {1: 0, 2: 2, 3: 4}


def test_sssp_source_absent(ray_session):
    from seekr_ray.graph.sssp import sssp_bounded

    out = _as_dict(sssp_bounded(_edges_ds([(1, 2, 1)]), source=99, max_cost=5))
    assert out == {}


def test_sssp_paths_equal(ray_session):
    from seekr_ray.graph.sssp import _sssp_distributed, sssp_bounded

    rng = np.random.default_rng(23)
    n = 300
    a = rng.integers(0, n, 1500)
    b = rng.integers(0, n, 1500)
    keep = a != b
    rows = list(
        zip(
            np.minimum(a, b)[keep].tolist(),
            np.maximum(a, b)[keep].tolist(),
            rng.integers(1, 5, int(keep.sum())).tolist(),
        )
    )
    ds = _edges_ds(rows)
    driver = _as_dict(sssp_bounded(ds, source=int(min(r[0] for r in rows)), max_cost=8))
    dist = _as_dict(
        _sssp_distributed(ds, source=int(min(r[0] for r in rows)), max_cost=8)
    )
    assert driver == dist
    # sanity vs scipy-free reference: Dijkstra by repeated relaxation
    import heapq

    adj = {}
    for x, y, w in rows:
        adj.setdefault(x, []).append((y, w))
        adj.setdefault(y, []).append((x, w))
    src = int(min(r[0] for r in rows))
    ref = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > ref.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd <= 8 and nd < ref.get(v, 1 << 62):
                ref[v] = nd
                heapq.heappush(pq, (nd, v))
    assert driver == ref
