"""Weighted PageRank: hand-computed reference on a small graph, the
weight-degenerate case (all w equal == unweighted), and forced
driver/distributed path equality at 6dp."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _edges_ds(df, parts=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _r6(a):
    return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6


def test_wpagerank_hand_math(ray_session):
    from seekr_ray.graph.wpagerank import wpagerank_fixed_iters

    # 1 -> 2 (w=3), 1 -> 3 (w=1): node 1 sends 3/4 of its mass to 2
    df = pd.DataFrame({"src": [1, 1], "dst": [2, 3], "w": [3, 1]})
    got = (
        wpagerank_fixed_iters(_edges_ds(df), damping=0.85, n_iters=1)
        .to_pandas()
        .set_index("node")["page_rank"]
    )
    n = 3
    base = (1 - 0.85) / n
    dangling = 2 / 3  # nodes 2 and 3 have no out-edges
    ref1 = base + 0.85 * dangling / n
    ref2 = base + 0.85 * ((1 / 3) * 0.75) + 0.85 * dangling / n
    ref3 = base + 0.85 * ((1 / 3) * 0.25) + 0.85 * dangling / n
    assert abs(got[1] - ref1) < 1e-12
    assert abs(got[2] - ref2) < 1e-12
    assert abs(got[3] - ref3) < 1e-12


def test_wpagerank_uniform_weights_equal_unweighted(ray_session):
    from seekr_ray.graph.pagerank import pagerank_fixed_iters
    from seekr_ray.graph.wpagerank import wpagerank_fixed_iters

    rng = np.random.RandomState(3)
    src = rng.randint(0, 40, 300)
    dst = rng.randint(40, 80, 300)
    pairs = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    w = pd.DataFrame({"src": pairs["src"], "dst": pairs["dst"], "w": 7})
    a = (
        wpagerank_fixed_iters(_edges_ds(w), n_iters=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        pagerank_fixed_iters(_edges_ds(pairs), n_iters=4)
        .to_pandas()
        .rename(columns={"doc_id": "node"})
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert a["node"].tolist() == b["node"].tolist()
    np.testing.assert_allclose(
        a["page_rank"], b["page_rank"], rtol=0, atol=1e-12
    )


def test_wpagerank_driver_equals_distributed(ray_session):
    from seekr_ray.graph.wpagerank import wpagerank_fixed_iters

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "src": rng.randint(0, 60, 500),
            "dst": rng.randint(30, 120, 500),
            "w": rng.randint(1, 9, 500),
        }
    ).groupby(["src", "dst"], as_index=False)["w"].sum()
    drv = (
        wpagerank_fixed_iters(_edges_ds(df), n_iters=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        wpagerank_fixed_iters(_edges_ds(df, 5), n_iters=4, driver_edge_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert drv["node"].tolist() == dist["node"].tolist()
    assert _r6(drv["page_rank"].to_numpy()).tolist() == _r6(
        dist["page_rank"].to_numpy()
    ).tolist()
