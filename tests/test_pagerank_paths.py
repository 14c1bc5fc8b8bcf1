"""The distributed PageRank path equals the driver-numpy path, and both
equal the naive reference-math oracle."""

import math

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.config import IndexConfig
from seekr_ray.graph.pagerank import _pagerank_distributed, _pagerank_numpy
from seekr_ray.oracle.reference import reference_pagerank


def _edges():
    # hubs, a 2-cycle, a clique, dangling nodes
    e = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (6, 7), (7, 6),
        (8, 9), (9, 10), (10, 8), (11, 3),
    ]
    return sorted(set(e))


def test_numpy_matches_reference_oracle():
    edges = _edges()
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    nodes, ranks = _pagerank_numpy(src, dst, 0.85, 1e-5)
    want = reference_pagerank(edges)
    assert set(nodes.tolist()) == set(want)
    for n, r in zip(nodes.tolist(), ranks.tolist()):
        assert math.isclose(r, want[n], abs_tol=1e-12), n
    assert math.isclose(sum(ranks), 1.0, abs_tol=1e-3)


def test_over_limit_graph_routes_to_distributed_path(ray_session, monkeypatch):
    """pagerank_from_edges gates on count() BEFORE any collect: with the
    driver limit forced below the edge count, the distributed path runs
    and produces the same ranks."""
    import ray.data as rd

    from seekr_ray.graph import pagerank as pr_mod

    edges = _edges()
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    calls = {"driver": 0}
    real_numpy = pr_mod._pagerank_numpy

    def spy(*a, **k):
        calls["driver"] += 1
        return real_numpy(*a, **k)

    monkeypatch.setattr(pr_mod, "_pagerank_numpy", spy)
    cfg = IndexConfig(pagerank_driver_edge_limit=len(edges) - 1)
    got = pr_mod.pagerank_from_edges(edges_ds, cfg)
    assert calls["driver"] == 0, "driver path ran despite count > limit"
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    nodes, ranks = real_numpy(src, dst, 0.85, 1e-5)
    got_map = dict(zip(got["doc_id"].to_pylist(), got["page_rank"].to_pylist()))
    assert set(got_map) == set(nodes.tolist())
    for n, r in zip(nodes.tolist(), ranks.tolist()):
        assert math.isclose(got_map[n], r, abs_tol=1e-9), n


def test_distributed_matches_numpy(ray_session):
    import ray.data as rd

    edges = _edges()
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = _pagerank_distributed(edges_ds, 0.85, 1e-5)
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    nodes, ranks = _pagerank_numpy(src, dst, 0.85, 1e-5)
    got_map = dict(zip(got["doc_id"].to_pylist(), got["page_rank"].to_pylist()))
    assert set(got_map) == set(nodes.tolist())
    for n, r in zip(nodes.tolist(), ranks.tolist()):
        # the distributed path applies identical synchronous updates; only
        # FP summation order differs (groupby sum vs np.add.at)
        assert math.isclose(got_map[n], r, abs_tol=1e-9), n


def test_fixed_iters_paths_agree(ray_session):
    import ray.data as rd

    from seekr_ray.graph.pagerank import pagerank_fixed_iters

    edges = _edges()
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    via_driver = pagerank_fixed_iters(edges_ds, n_iters=4)
    # driver_edge_limit below the edge count forces the distributed path
    via_dist = pagerank_fixed_iters(edges_ds, n_iters=4, driver_edge_limit=1)
    d1 = dict(zip(via_driver["node"].to_pylist(), via_driver["page_rank"].to_pylist()))
    d2 = dict(zip(via_dist["node"].to_pylist(), via_dist["page_rank"].to_pylist()))
    assert set(d1) == set(d2)
    for n in d1:
        assert math.isclose(d1[n], d2[n], abs_tol=1e-9), n
    # exactly K iterations: one fewer step gives a different vector
    via_3 = pagerank_fixed_iters(edges_ds, n_iters=3)
    d3 = dict(zip(via_3["node"].to_pylist(), via_3["page_rank"].to_pylist()))
    assert any(not math.isclose(d1[n], d3[n], abs_tol=1e-12) for n in d1)


def test_ppr_numpy_vs_distributed_equal(ray_session):
    """Personalized PageRank: the seeded distributed iteration equals
    the seeded driver-numpy iteration bit-for-bit at 6dp, mass stays
    ~1, and non-seed-reachable nodes score 0."""
    import ray.data as rd

    from seekr_ray.graph.pagerank import personalized_pagerank_fixed_iters

    edges = _edges()
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    drv = (
        personalized_pagerank_fixed_iters(ds, seeds_mod=2, n_iters=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        personalized_pagerank_fixed_iters(
            ds, seeds_mod=2, n_iters=4, driver_edge_limit=1
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(drv["node"]) == list(dist["node"])
    assert np.allclose(drv["ppr"], dist["ppr"], atol=1e-12)
    assert abs(drv["ppr"].sum() - 1.0) < 1e-6
    # seeds (odd nodes) hold teleport mass; everything is >= 0
    assert (drv["ppr"] >= 0).all()
    seeds = drv[drv["node"] % 2 == 1]
    assert (seeds["ppr"] > 0).all()
