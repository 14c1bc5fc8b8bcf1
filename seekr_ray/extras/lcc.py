"""Per-node local clustering coefficient: lcc(v) = 2·T(v) / (d(v)·(d(v)−1))
— how close each node's neighborhood is to a clique, the standard
community-structure feature next to the GLOBAL triangle count
(extras/triangles.py, whose orientation/wedge-probe machinery this
module extends with per-node attribution).

The distributed path cannot reuse the triangle counter's wedge DEDUP
(multiplicity per (x, y) key): LCC must credit each matched wedge's
SOURCE as well as its endpoints, so wedge rows carry (u, x, y) and the
exchange is O(wedges) — exactly the bound the module docstring of
triangles.py already states for the probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .triangles import DRIVER_EDGE_LIMIT, _pack

_MIN_DEG = 2


def _wedges_with_sources(sources: np.ndarray, targets: np.ndarray):
    """(src, min, max) wedge triples, vectorized by run-length class —
    pairs_within_runs with the per-run source carried along (that
    kernel orders output by LENGTH class, so a post-hoc repeat of run
    sources would misalign)."""
    order = np.lexsort((targets, sources))
    u, v = sources[order], targets[order]
    starts = np.flatnonzero(
        np.concatenate(([True], u[1:] != u[:-1])) if len(u) else []
    )
    ends = np.append(starts[1:], len(u))
    d = ends - starts
    total = int((d * (d - 1) // 2).sum())
    out_s = np.empty(total, u.dtype)
    out_x = np.empty(total, v.dtype)
    out_y = np.empty(total, v.dtype)
    off = 0
    for length in np.unique(d):
        if length < 2:
            continue
        s = starts[d == length]
        xi, yi = np.triu_indices(int(length), k=1)
        n = len(s) * len(xi)
        np.take(v, (s[:, None] + xi[None, :]).ravel(),
                out=out_x[off: off + n])
        np.take(v, (s[:, None] + yi[None, :]).ravel(),
                out=out_y[off: off + n])
        out_s[off: off + n] = np.repeat(u[s], len(xi))
        off += n
    return out_s, np.minimum(out_x, out_y), np.maximum(out_x, out_y)


def _lcc_finish(nodes, deg, tri):
    d = deg.astype(np.float64)
    t = tri.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        lcc = np.where(
            deg >= _MIN_DEG, 2.0 * t / (d * (d - 1.0)), 0.0
        )
    from .textstats import round6_arr

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "degree": pa.array(deg.astype(np.int64), pa.int64()),
            "n_tri": pa.array(tri.astype(np.int64), pa.int64()),
            "lcc": pa.array(round6_arr(lcc), pa.float64()),
        }
    )


def _lcc_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    ia, ib = inv[: len(a)], inv[len(a):]
    a_first = (deg[ia] < deg[ib]) | ((deg[ia] == deg[ib]) & (ia < ib))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    ws, wx, wy = _wedges_with_sources(u, v)
    tri = np.zeros(len(nodes), np.int64)
    if len(ws):
        ek = np.sort(_pack(a, b))
        wk = _pack(wx, wy)
        pos = np.searchsorted(ek, wk)
        matched = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        for arr in (ws[matched], wx[matched], wy[matched]):
            np.add.at(tri, np.searchsorted(nodes, arr), 1)
    return _lcc_finish(nodes, deg, tri)


def local_clustering(
    edges_ds,
    *,
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
):
    """(node, degree, n_tri, lcc) over distinct canonical edges
    (a < b).  count()-gated driver numpy below the limit; bucketed
    distributed wedge-probe with per-source attribution above it —
    both identical math, asserted equal by test."""
    edges = edges_ds.select_columns([a_col, b_col]).materialize()
    m = edges.count()
    if m == 0:
        return _lcc_finish(
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
        )
    if m <= driver_edge_limit:
        a_parts, b_parts = [], []
        for bt in edges.iter_batches(batch_format="pyarrow"):
            a_parts.append(bt[a_col].to_numpy(zero_copy_only=False))
            b_parts.append(bt[b_col].to_numpy(zero_copy_only=False))
        return _lcc_driver(
            np.concatenate(a_parts).astype(np.int64),
            np.concatenate(b_parts).astype(np.int64),
        )
    return _lcc_distributed(edges, a_col, b_col, num_buckets)


def _lcc_distributed(edges, a_col, b_col, num_buckets) -> pa.Table:
    from .copart import attach_value

    def node_rows(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.concatenate([a, b])
        return pa.table(
            {
                "_nb": pa.array(n % num_buckets, pa.int64()),
                "node": pa.array(n, pa.int64()),
            }
        )

    def deg_bucket(group: pa.Table) -> pa.Table:
        n = group["node"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    degrees = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("_nb")
        .map_groups(deg_bucket, batch_format="pyarrow")
        .materialize()
    )
    ed = edges.map_batches(
        lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
    )
    with_da = attach_value(
        ed, degrees, key_col="a", out_col="deg_a", carry=["b"],
        num_buckets=num_buckets, lookup_value="deg",
    )
    with_both = attach_value(
        with_da, degrees, key_col="b", out_col="deg_b", carry=["a", "deg_a"],
        num_buckets=num_buckets, lookup_value="deg",
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = batch["deg_a"].to_numpy(zero_copy_only=False)
        db = batch["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table(
            {
                "_ub": pa.array(u % num_buckets, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def wedge_bucket(group: pa.Table) -> pa.Table:
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        ws, wx, wy = _wedges_with_sources(u, v)
        k = _pack(wx, wy)
        return pa.table(
            {
                "_kb": pa.array(
                    (k % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.uint64()),
                "s": pa.array(ws, pa.int64()),
                "x": pa.array(wx, pa.int64()),
                "y": pa.array(wy, pa.int64()),
                "is_edge": pa.array(np.zeros(len(k), np.int8), pa.int8()),
            }
        )

    wedges = (
        with_both.map_batches(orient, batch_format="pyarrow")
        .groupby("_ub")
        .map_groups(wedge_bucket, batch_format="pyarrow")
    )

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        k = _pack(a, b)
        z = np.zeros(len(k), np.int64)
        return pa.table(
            {
                "_kb": pa.array(
                    (k % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.uint64()),
                "s": pa.array(z, pa.int64()),
                "x": pa.array(z, pa.int64()),
                "y": pa.array(z, pa.int64()),
                "is_edge": pa.array(np.ones(len(k), np.int8), pa.int8()),
            }
        )

    def match_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        is_e = group["is_edge"].to_numpy(zero_copy_only=False).astype(bool)
        ek = np.sort(k[is_e])
        wk = k[~is_e]
        if not len(ek) or not len(wk):
            return pa.table({"node": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        nodes = np.concatenate(
            [
                group["s"].to_numpy(zero_copy_only=False)[~is_e][hit],
                group["x"].to_numpy(zero_copy_only=False)[~is_e][hit],
                group["y"].to_numpy(zero_copy_only=False)[~is_e][hit],
            ]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "t": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tri = (
        wedges.union(edges.map_batches(edge_keys, batch_format="pyarrow"))
        .groupby("_kb")
        .map_groups(match_bucket, batch_format="pyarrow")
        .groupby("node")
        .sum("t")
    )
    # final assembly: nodes with zero triangles come from the degree table
    tri_pd = tri.to_pandas().rename(columns={"sum(t)": "t"})
    deg_pd = degrees.to_pandas()[["node", "deg"]].sort_values("node")
    merged = deg_pd.merge(tri_pd, on="node", how="left").fillna({"t": 0})
    return _lcc_finish(
        merged["node"].to_numpy().astype(np.int64),
        merged["deg"].to_numpy().astype(np.int64),
        merged["t"].to_numpy().astype(np.int64),
    )
