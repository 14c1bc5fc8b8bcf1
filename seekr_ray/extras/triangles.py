"""Distributed triangle counting — degree-oriented compact-forward.

The graph-motif class the engine's graph suite (PageRank, personalized
PageRank, degree stats, connected components) previously lacked: a
2-hop self-join.  Triangles drive clustering-coefficient / community
features over co-occurrence graphs (co-purchase, co-citation, shared-
session), and the algorithm shape — orient every edge from its lower-
(degree, id) endpoint to the higher one, enumerate wedges at each
source, probe the wedge pairs against the edge set — is the standard
O(m^{3/2}) bound: orientation caps every out-degree at ~sqrt(2m), so no
hub ever enumerates a quadratic neighbor set (the skew story).

Two paths, equal by test (the repo's count()-gated convention,
graph/pagerank.py):

* driver numpy below ``driver_edge_limit`` — one vectorized pass;
* distributed otherwise — degrees by hash(node)-bucketed counts,
  degree attach by two hash(endpoint)-bucketed co-partition passes
  (the extras/joins.py union+groupby pattern — NOT ``Dataset.join``,
  whose hash-shuffle actors stall chained two-join plans at low
  parallelism), wedges per source in hash(u)-bucketed groups,
  membership by hash(pair)-bucketed co-partition of wedges with edges
  + searchsorted.  Every exchange is O(edges) or O(wedges); nothing
  is broadcast.

Edge keys pack as ``a << 32 | b`` (node ids must fit uint32 — asserted;
wider graphs would switch the key to the same 128-bit md5 pairing the
dedup modules use).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DRIVER_EDGE_LIMIT = 5_000_000


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) and (a.max() >= (1 << 32) or b.max() >= (1 << 32)):
        raise ValueError("triangle_count packs node ids into uint32 halves")
    return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)


def cooccurrence_edges(
    ds,
    *,
    group_col: str,
    item_col: str,
    num_buckets: int = 64,
):
    """Distinct undirected item pairs (a < b) co-occurring in a group
    (order basket, session, document) — hash(group)-bucketed pair
    emission, then hash(pair)-bucketed global dedup.  Output: (a, b)."""

    def tag(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((g % num_buckets), pa.int64()),
                "g": pa.array(g, pa.int64()),
                "i": pa.array(
                    batch[item_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def pairs_per_bucket(group: pa.Table) -> pa.Table:
        g = group["g"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        keep = np.ones(len(g), bool)
        if len(g) > 1:
            keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])) if len(g) else []
        )
        ends = np.append(starts[1:], len(g))
        from .copart import pairs_within_runs

        a, b = pairs_within_runs(i, starts, ends)
        if len(a):
            # local dedup shrinks the exchange
            k = np.unique(_pack(a, b))
            a = (k >> np.uint64(32)).astype(np.int64)
            b = (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            a = b = np.empty(0, np.int64)
        return pa.table(
            {
                "_pb": pa.array(
                    (_pack(a.astype(np.uint64), b.astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int64),
                    pa.int64(),
                ),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
            }
        )

    def dedup_bucket(group: pa.Table) -> pa.Table:
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        k = np.unique(_pack(a, b))
        return pa.table(
            {
                "a": pa.array((k >> np.uint64(32)).astype(np.int64), pa.int64()),
                "b": pa.array(
                    (k & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(pairs_per_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


def _wedges_of(sources: np.ndarray, targets: np.ndarray):
    """Per-source all-pairs over oriented adjacency (sorted by source):
    canonical (min, max) wedge endpoints, vectorized by run-length
    class (copart.pairs_within_runs)."""
    from .copart import pairs_within_runs

    order = np.lexsort((targets, sources))
    u, v = sources[order], targets[order]
    starts = np.flatnonzero(
        np.concatenate(([True], u[1:] != u[:-1])) if len(u) else []
    )
    ends = np.append(starts[1:], len(u))
    x, y = pairs_within_runs(v, starts, ends)
    return np.minimum(x, y), np.maximum(x, y)


def _count_driver(a: np.ndarray, b: np.ndarray) -> int:
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    ia, ib = inv[: len(a)], inv[len(a):]
    # orient low (deg, id) -> high; nodes are unique-sorted so the id
    # tiebreak is the index order
    a_first = (deg[ia] < deg[ib]) | ((deg[ia] == deg[ib]) & (ia < ib))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    wa, wb = _wedges_of(u, v)
    if not len(wa):
        return 0
    # count probes edge-side: sort the wedge keys once, then each edge
    # key contributes its (hi - lo) occurrence count — two searchsorted
    # calls over E probes instead of a W-sized gather+compare
    wk = np.sort(_pack(wa, wb))
    ek = _pack(a, b)
    lo = np.searchsorted(wk, ek, side="left")
    hi = np.searchsorted(wk, ek, side="right")
    return int((hi - lo).sum())


def triangle_count(
    edges_ds,
    *,
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
) -> pa.Table:
    """Count triangles in an undirected simple graph given as distinct
    canonical edges (``a_col`` < ``b_col``).  Returns one row:
    (n_edges, n_triangles)."""
    edges = edges_ds.select_columns([a_col, b_col]).materialize()
    m = edges.count()
    if m <= driver_edge_limit:
        a_parts, b_parts = [], []
        for bt in edges.iter_batches(batch_format="pyarrow"):
            a_parts.append(bt[a_col].to_numpy(zero_copy_only=False))
            b_parts.append(bt[b_col].to_numpy(zero_copy_only=False))
        a = (
            np.concatenate(a_parts).astype(np.int64)
            if a_parts
            else np.empty(0, np.int64)
        )
        b = (
            np.concatenate(b_parts).astype(np.int64)
            if b_parts
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "n_edges": pa.array([m], pa.int64()),
                "n_triangles": pa.array([_count_driver(a, b)], pa.int64()),
            }
        )
    return _count_distributed(edges, a_col, b_col, num_buckets, m)


def _count_distributed(edges, a_col, b_col, num_buckets, m) -> pa.Table:
    """Bucketed form — same math, nothing driver-resident but the
    per-bucket partial counts (O(num_buckets) rows).

    Degree attach uses the union+groupby co-partition kernel from
    extras/joins.py: degree rows and edge rows tagged with the same
    hash(endpoint) bucket land in one group, where a searchsorted
    lookup stamps the degree — one groupby exchange per endpoint."""

    # degrees: hash(node)-bucketed counts
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
        .materialize()  # consumed by both attach passes below
    )

    ed = edges.map_batches(
        lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
    )

    from .copart import attach_value

    with_da = attach_value(
        ed,
        degrees,
        key_col="a",
        out_col="deg_a",
        carry=["b"],
        num_buckets=num_buckets,
        lookup_value="deg",
    )
    with_both = attach_value(
        with_da,
        degrees,
        key_col="b",
        out_col="deg_b",
        carry=["a", "deg_a"],
        num_buckets=num_buckets,
        lookup_value="deg",
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
        wa, wb = _wedges_of(u, v)
        k, cnt = np.unique(_pack(wa, wb), return_counts=True)
        # local combine: the same wedge pair from many sources in this
        # bucket ships once with its multiplicity, not once per source
        return pa.table(
            {
                "_kb": pa.array(
                    (k % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.uint64()),
                "w": pa.array(cnt.astype(np.int64), pa.int64()),
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
        return pa.table(
            {
                "_kb": pa.array(
                    (k % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.uint64()),
                "w": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(len(k), np.int8), pa.int8()),
            }
        )

    keyed_edges = ed.map_batches(edge_keys, batch_format="pyarrow")

    def match_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        is_e = group["is_edge"].to_numpy(zero_copy_only=False).astype(bool)
        ek = k[is_e]
        order = np.argsort(k[~is_e])
        wk = k[~is_e][order]
        ww = w[~is_e][order]
        if not len(ek) or not len(wk):
            n = 0
        else:
            cw = np.concatenate(([0], np.cumsum(ww)))
            lo = np.searchsorted(wk, ek, side="left")
            hi = np.searchsorted(wk, ek, side="right")
            n = int((cw[hi] - cw[lo]).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    partials = (
        wedges.union(keyed_edges)
        .groupby("_kb")
        .map_groups(match_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {
            "n_edges": pa.array([m], pa.int64()),
            "n_triangles": pa.array([int(partials["n"].sum())], pa.int64()),
        }
    )
