"""Bounded-cost single-source shortest paths over a weighted undirected
edge set — the weighted companion of graph/bfs.py.

Semantics: minimum path cost from the source to every node reachable
within ``max_cost`` (integer weights >= 1), i.e. bounded-cost
reachability.  The explicit budget is what makes the operator both
SQL-replicable (the recursive-walk oracle's row space is bounded by
V x max_cost) and scale-honest: unbounded SSSP on a 10^12-edge graph is
a different algorithm class (delta-stepping); the budgeted form needs
exactly ``max_cost`` synchronous relaxation rounds, because every edge
weight is >= 1 so a within-budget shortest path has <= max_cost edges.

Paths (count()-gated, the graph-suite convention):

* driver numpy below ``DRIVER_EDGE_LIMIT`` — ``max_cost`` vectorized
  Bellman-Ford rounds over the symmetric edge arrays
  (``np.minimum.at`` scatter-relaxation);
* distributed — the driver holds one O(V) distance array (the
  _pagerank_distributed discipline); each round broadcasts it via
  ``ray.put`` and one ``map_batches`` over the edge Dataset emits
  per-block candidate minima (partial min per destination BEFORE the
  exchange), one groupby-min, then a driver update.  Fixed
  ``max_cost`` rounds — no convergence probe needed, extra rounds
  are no-ops.

Output: (node, dist) for nodes with dist <= max_cost.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DRIVER_EDGE_LIMIT = 50_000_000


def _sssp_numpy(
    a: np.ndarray,
    b: np.ndarray,
    w: np.ndarray,
    source: int,
    max_cost: int,
) -> tuple[np.ndarray, np.ndarray]:
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    ww = np.concatenate([w, w])
    dist = np.full(len(nodes), np.iinfo(np.int64).max, np.int64)
    si = int(np.searchsorted(nodes, source))
    if si >= len(nodes) or nodes[si] != source:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    dist[si] = 0
    for _ in range(max_cost):
        has = dist[src] <= max_cost  # finite and within budget
        cand = dist[src[has]] + ww[has]
        np.minimum.at(dist, dst[has], cand)
    keep = dist <= max_cost
    return nodes[keep], dist[keep]


def sssp_bounded(
    edges,
    source: int,
    max_cost: int,
    *,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
):
    """``edges``: Dataset of (a, b, w) undirected weighted edges,
    integer w >= 1.  Returns a Dataset/Table of (node, dist)."""
    n_edges = edges.count()
    if n_edges <= driver_edge_limit:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        )
        nodes, dist = _sssp_numpy(
            tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            tbl["w"].to_numpy(zero_copy_only=False).astype(np.int64),
            source,
            max_cost,
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )
    return _sssp_distributed(edges, source, max_cost)


def _sssp_distributed(edges, source: int, max_cost: int):
    import ray

    # node universe (sorted) once; the driver dist array is O(V) — the
    # same state discipline as the distributed pagerank/BFS paths
    def nodes_of(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False),
                    batch["b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"n": pa.array(u, pa.int64())})

    parts = [
        t["n"].to_numpy(zero_copy_only=False)
        for t in edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("n")
        .count()
        .iter_batches(batch_format="pyarrow")
    ]
    nodes = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    dist = np.full(len(nodes), np.iinfo(np.int64).max, np.int64)
    si = int(np.searchsorted(nodes, source))
    if si >= len(nodes) or nodes[si] != source:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
    dist[si] = 0
    nodes_ref = ray.put(nodes)
    for _ in range(max_cost):
        dist_ref = ray.put(dist)

        def relax(batch: pa.Table, _n=nodes_ref, _d=dist_ref) -> pa.Table:
            nd = ray.get(_n) if not isinstance(_n, np.ndarray) else _n
            dd = ray.get(_d) if not isinstance(_d, np.ndarray) else _d
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            src = np.concatenate([a, b])
            dst = np.concatenate([b, a])
            ww = np.concatenate([w, w])
            ds = dd[np.searchsorted(nd, src)]
            ok = ds <= max_cost
            if not ok.any():
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "_c": pa.array([], pa.int64()),
                    }
                )
            cand_dst = dst[ok]
            cand = ds[ok] + ww[ok]
            # per-block partial min per destination before the exchange
            u, inv = np.unique(cand_dst, return_inverse=True)
            best = np.full(len(u), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, inv, cand)
            return pa.table(
                {
                    "node": pa.array(u, pa.int64()),
                    "_c": pa.array(best, pa.int64()),
                }
            )

        agg = (
            edges.map_batches(relax, batch_format="pyarrow")
            .groupby("node")
            .min("_c")
        )
        for t in agg.iter_batches(batch_format="pyarrow"):
            nn = t["node"].to_numpy(zero_copy_only=False)
            cc = t["min(_c)"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nodes, nn)
            np.minimum.at(dist, pos, cc)
    keep = dist <= max_cost
    return pa.table(
        {
            "node": pa.array(nodes[keep], pa.int64()),
            "dist": pa.array(dist[keep], pa.int64()),
        }
    )
