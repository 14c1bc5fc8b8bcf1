"""k-core decomposition — iterative degree peel to a fixpoint.

The maximal subgraph in which every node has degree >= k: the standard
community/spam-farm density primitive over the same co-occurrence
graphs the triangle counter serves (extras/triangles.py).  Peeling
removes all nodes of degree < k simultaneously each round; the
fixpoint is reached in at most O(peel-depth) rounds (bounded by the
graph's degeneracy ordering depth, typically << n; each round strictly
shrinks the edge set or terminates).

Two paths, equal by test (the repo's count()-gated convention):

* driver numpy below ``driver_edge_limit`` — vectorized whole-graph
  peel per round;
* distributed otherwise — per round: hash(node)-bucketed degree
  counts, two co-partition passes (extras/copart.attach_value) stamp
  deg(a) / deg(b) onto every edge, a vectorized filter drops edges
  with a sub-k endpoint, and a ``count()`` gates convergence — the
  PageRank iteration discipline (graph/pagerank.py).  Every round is
  O(edges) exchange; nothing is broadcast or driver-resident.

Output: (node, deg) for nodes in the k-core, deg measured inside the
core.  Input edges must be distinct canonical pairs (a < b).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .copart import attach_value

DRIVER_EDGE_LIMIT = 5_000_000


def _degrees_ds(edges, num_buckets: int):
    """(node, deg) — hash(node)-bucketed exact counts."""

    def node_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
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

    return (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("_nb")
        .map_groups(deg_bucket, batch_format="pyarrow")
    )


def _peel_driver(a: np.ndarray, b: np.ndarray, k: int):
    while len(a):
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        deg = np.bincount(inv, minlength=len(nodes))
        ia, ib = inv[: len(a)], inv[len(a):]
        keep = (deg[ia] >= k) & (deg[ib] >= k)
        if keep.all():
            return nodes, deg
        a, b = a[keep], b[keep]
    return np.empty(0, np.int64), np.empty(0, np.int64)


def k_core(
    edges_ds,
    *,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
):
    """Nodes of the k-core with their in-core degrees: (node, deg)."""
    if k < 1:
        raise ValueError("k_core requires k >= 1")
    edges = (
        edges_ds.select_columns([a_col, b_col])
        .map_batches(
            lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
        )
        .materialize()
    )
    m = edges.count()
    if m <= driver_edge_limit:
        a_parts, b_parts = [], []
        for bt in edges.iter_batches(batch_format="pyarrow"):
            a_parts.append(
                bt["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            b_parts.append(
                bt["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
        b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
        nodes, deg = _peel_driver(a, b, k)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "deg": pa.array(deg.astype(np.int64), pa.int64()),
            }
        )
    return _k_core_distributed(edges, k, num_buckets, m)


def _k_core_distributed(edges, k: int, num_buckets: int, n_edges: int):
    def drop_subk(batch: pa.Table) -> pa.Table:
        da = batch["deg_a"].to_numpy(zero_copy_only=False)
        db = batch["deg_b"].to_numpy(zero_copy_only=False)
        keep = pa.array((da >= k) & (db >= k))
        return batch.filter(keep).select(["a", "b"])

    cur = edges
    while n_edges:
        # two consumers (both attach passes) — materialize once
        degs = _degrees_ds(cur, num_buckets).materialize()
        w1 = attach_value(
            cur,
            degs,
            key_col="a",
            out_col="deg_a",
            carry=["b"],
            num_buckets=num_buckets,
            lookup_value="deg",
        )
        w2 = attach_value(
            w1,
            degs,
            key_col="b",
            out_col="deg_b",
            carry=["a", "deg_a"],
            num_buckets=num_buckets,
            lookup_value="deg",
        )
        nxt = w2.map_batches(drop_subk, batch_format="pyarrow").materialize()
        n2 = nxt.count()
        cur = nxt
        if n2 == n_edges:  # fixpoint
            break
        n_edges = n2
    if not n_edges:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64()),
            }
        )
    return _degrees_ds(cur, num_buckets)
