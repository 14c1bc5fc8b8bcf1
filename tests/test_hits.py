"""HITS: numpy matches a naive per-step reference; distributed path
equals driver path; bipartite structure properties hold."""

import numpy as np
import pyarrow as pa

from seekr_ray.graph.hits import _hits_numpy, hits_fixed_iters


def _edges():
    # two hubs sharing an authority, a chain, a popular authority
    return [
        (1, 10), (1, 11), (2, 10), (2, 12), (3, 10), (4, 13), (13, 10),
    ]


def _reference(edges, n_iters):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = [1.0 / n] * n
    a = [1.0 / n] * n
    for _ in range(n_iters):
        a_raw = [0.0] * n
        for s, d in edges:
            a_raw[idx[d]] += h[idx[s]]
        tot = sum(a_raw)
        a = [x / tot for x in a_raw] if tot else a_raw
        h_raw = [0.0] * n
        for s, d in edges:
            h_raw[idx[s]] += a[idx[d]]
        tot = sum(h_raw)
        h = [x / tot for x in h_raw] if tot else h_raw
    return nodes, h, a


def test_numpy_matches_reference():
    edges = _edges()
    src = np.array([s for s, _ in edges], np.int64)
    dst = np.array([d for _, d in edges], np.int64)
    for k in (1, 4, 8):
        nodes, h, a = _hits_numpy(src, dst, k)
        rn, rh, ra = _reference(edges, k)
        assert nodes.tolist() == rn
        np.testing.assert_allclose(h, rh, rtol=0, atol=1e-12)
        np.testing.assert_allclose(a, ra, rtol=0, atol=1e-12)


def test_structure_properties():
    edges = _edges()
    src = np.array([s for s, _ in edges], np.int64)
    dst = np.array([d for _, d in edges], np.int64)
    nodes, h, a = _hits_numpy(src, dst, 6)
    by = dict(zip(nodes.tolist(), zip(h.tolist(), a.tolist())))
    # pure sources have authority 0; pure sinks have hub 0
    assert by[1][1] == 0.0 and by[2][1] == 0.0
    assert by[10][0] == 0.0 and by[11][0] == 0.0
    # node 10 (most in-links from strong hubs) is the top authority
    assert max(by, key=lambda n: by[n][1]) == 10
    # L1 normalization
    assert abs(sum(x for x, _ in by.values()) - 1.0) < 1e-9
    assert abs(sum(x for _, x in by.values()) - 1.0) < 1e-9


def test_distributed_equals_driver(ray_session):
    import ray.data as rd

    edges = _edges()
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    want = hits_fixed_iters(ds, n_iters=4).to_pandas()
    got = hits_fixed_iters(ds, n_iters=4, driver_edge_limit=0).to_pandas()
    want = want.sort_values("node").reset_index(drop=True)
    got = got.sort_values("node").reset_index(drop=True)
    assert want["node"].tolist() == got["node"].tolist()
    np.testing.assert_allclose(want["hub"], got["hub"], atol=1e-12)
    np.testing.assert_allclose(
        want["authority"], got["authority"], atol=1e-12
    )


def test_empty_graph(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    out = hits_fixed_iters(ds, n_iters=3)
    assert out.num_rows == 0
