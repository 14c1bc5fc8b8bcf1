"""Synchronous label-propagation communities (LPA), fixed-K.

Community detection between connected components (extras/dedup.py
min-label closure — too coarse: one label per component) and k-core
(density, not membership): each node adopts the MODE of its
neighbors' labels each round, ties broken by the minimum label, all
nodes updating simultaneously.  Synchronous + deterministic tie-break
makes the result a pure function of the edge set — no RNG, no visit
order — which is what makes a SQL oracle possible (the classic
asynchronous LPA is order-dependent by construction).  A fixed K
replaces convergence detection for the same reason fixed-K PageRank
exists (graph/pagerank.py): an unrolled K-step recursion is
SQL-expressible, ε-convergence is not.

Labels start as the node's own id.  Node ids and labels pack into
uint64 halves for the vectorized (node, label) count — ids must fit
uint32 (asserted, the triangles/apss convention).

Paths (count()-gated, the graph-suite convention):

* driver numpy below ``driver_edge_limit``;
* distributed — per round: copart.attach_value stamps the source
  endpoint's label onto each directed edge of the symmetrized set
  (one co-partition exchange), then a hash(node)-bucketed groupby
  computes the per-node mode locally (all (node, label) pairs of a
  node share its bucket).  2 exchanges per round, O(E) rows each.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..extras.copart import attach_value

DRIVER_EDGE_LIMIT = 50_000_000


def _pack(v: np.ndarray, l: np.ndarray) -> np.ndarray:
    if len(v) and (v.max() >= (1 << 32) or l.max() >= (1 << 32)):
        raise ValueError("lpa packs node ids / labels into uint32 halves")
    return (v.astype(np.uint64) << np.uint64(32)) | l.astype(np.uint64)


def _mode_per_node(
    v: np.ndarray, labels: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """For (node, neighbor-label) pairs: per node, the label with the
    highest count, ties to the minimum label.  Returns (nodes, mode)."""
    uk, cnt = np.unique(_pack(v, labels), return_counts=True)
    nv = (uk >> np.uint64(32)).astype(np.int64)
    nl = (uk & np.uint64(0xFFFFFFFF)).astype(np.int64)
    order = np.lexsort((nl, -cnt, nv))
    nv, nl = nv[order], nl[order]
    first = (
        np.concatenate(([True], nv[1:] != nv[:-1]))
        if len(nv)
        else np.zeros(0, bool)
    )
    return nv[first], nl[first]


def _lpa_numpy(
    a: np.ndarray, b: np.ndarray, n_iters: int
) -> tuple[np.ndarray, np.ndarray]:
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    su = np.concatenate([ia, ib])
    sv = np.concatenate([ib, ia])
    lab = nodes.copy()
    for _ in range(n_iters):
        mv, ml = _mode_per_node(sv.astype(np.int64), lab[su])
        new = lab.copy()
        new[mv] = ml  # mv indexes into nodes (sv carries node indices)
        lab = new
    return nodes, lab


def lpa_communities(
    edges_ds,
    *,
    n_iters: int = 4,
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
):
    """(node, label) after exactly ``n_iters`` synchronous LPA rounds
    over undirected distinct edges."""
    edges = (
        edges_ds.select_columns([a_col, b_col])
        .map_batches(
            lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
        )
        .materialize()
    )
    m = edges.count()
    if m == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    if m <= driver_edge_limit:
        head = edges.to_pandas(limit=None)
        nodes, lab = _lpa_numpy(
            head["a"].to_numpy().astype(np.int64),
            head["b"].to_numpy().astype(np.int64),
            n_iters,
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(lab, pa.int64()),
            }
        )
    return _lpa_distributed(edges, n_iters, num_buckets)


def _lpa_distributed(edges, n_iters: int, num_buckets: int):
    import ray.data as rd

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["u"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "_nb": pa.array(u % num_buckets, pa.int64()),
                "node": pa.array(u, pa.int64()),
            }
        )

    def dedup_nodes(group: pa.Table) -> pa.Table:
        n = np.unique(group["node"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "label": pa.array(n, pa.int64()),
            }
        )

    labels = (
        sym.map_batches(init_labels, batch_format="pyarrow")
        .groupby("_nb")
        .map_groups(dedup_nodes, batch_format="pyarrow")
        .materialize()
    )

    def mode_bucket(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        l = group["u_label"].to_numpy(zero_copy_only=False)
        mv, ml = _mode_per_node(v, l)
        return pa.table(
            {
                "node": pa.array(mv, pa.int64()),
                "label": pa.array(ml, pa.int64()),
            }
        )

    for _ in range(n_iters):
        with_l = attach_value(
            sym,
            labels,
            key_col="u",
            out_col="u_label",
            carry=["v"],
            num_buckets=num_buckets,
            lookup_key="node",
            lookup_value="label",
        )

        def bucket_v(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "_vb", pa.array(v % num_buckets, pa.int64())
            )

        labels = (
            with_l.map_batches(bucket_v, batch_format="pyarrow")
            .groupby("_vb")
            .map_groups(mode_bucket, batch_format="pyarrow")
            .materialize()
        )
    return labels
