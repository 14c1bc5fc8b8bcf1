"""Local clustering coefficient: brute-force reference on random graphs,
known closed forms (clique = 1, star center = 0), and forced
driver/distributed path equality."""

import numpy as np
import pandas as pd


def _edges_ds(df, parts=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _brute_lcc(edges: pd.DataFrame) -> dict:
    adj: dict = {}
    for a, b in edges.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            out[v] = (d, 0, 0.0)
            continue
        t = sum(
            1
            for x in nb
            for y in nb
            if x < y and y in adj.get(x, ())
        )
        out[v] = (d, t, round(2.0 * t / (d * (d - 1)), 6))
    return out


def test_lcc_clique_and_star(ray_session):
    from seekr_ray.extras.lcc import local_clustering

    # K4 clique: every node lcc == 1; plus a star center with 3 leaves
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    star = [(10, 11), (10, 12), (10, 13)]
    df = pd.DataFrame(k4 + star, columns=["a", "b"])
    got = (
        local_clustering(_edges_ds(df))
        .to_pandas()
        .set_index("node")
    )
    for v in (1, 2, 3, 4):
        assert got.loc[v, "lcc"] == 1.0 and got.loc[v, "n_tri"] == 3
    assert got.loc[10, "lcc"] == 0.0 and got.loc[10, "degree"] == 3
    assert got.loc[11, "lcc"] == 0.0  # degree-1 leaf

def test_lcc_matches_bruteforce_and_paths_agree(ray_session):
    from seekr_ray.extras.lcc import local_clustering

    rng = np.random.RandomState(7)
    a = rng.randint(0, 40, 400)
    b = rng.randint(0, 40, 400)
    m = a < b
    df = pd.DataFrame({"a": a[m], "b": b[m]}).drop_duplicates()
    drv = (
        local_clustering(_edges_ds(df))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    ref = _brute_lcc(df)
    for _, r in drv.iterrows():
        d, t, l = ref[r["node"]]
        assert (r["degree"], r["n_tri"]) == (d, t)
        assert abs(r["lcc"] - l) < 1e-9
    dist = (
        local_clustering(_edges_ds(df, 5), driver_edge_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist)
