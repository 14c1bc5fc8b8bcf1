"""Edge-weighted PageRank: transition probability proportional to edge
weight (w_e / W_src) instead of 1/outdeg — the citation/traffic-mass
variant (reference scope analog: the same A5 iteration discipline as
graph/pagerank.py, generalized to weighted links).

Kept separate from graph/pagerank.py on purpose: the unweighted paths
there are oracle-pinned bit-for-bit, and threading an optional weight
through them would put that equality at the mercy of every future
refactor.  The path-selection discipline matches: ``count()``-gated
driver numpy below the edge limit, broadcast-arrays distributed power
iteration above it, both running the identical formula (incl. dangling
mass), asserted equal by test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _wpagerank_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    damping: float,
    n_iters: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact reference math: contrib_e = pr[src] * (w_e * (1 / W_src));
    dangling nodes (zero out-weight) spread uniformly.  The float op
    order is mirrored by the SQL oracle (r.pr * (e.w / o.wsum) — the
    1-ulp divide-vs-inverse difference sits far below 6dp rounding, the
    same tolerance the unweighted oracle has relied on since round 1).
    """
    nodes = np.union1d(src, dst)
    n = len(nodes)
    if n == 0:
        return nodes, np.empty(0)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    wf = w.astype(np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, si, wf)
    inv_out = np.zeros(n)
    nz = out_w > 0
    inv_out[nz] = 1.0 / out_w[nz]
    dangling_nodes = ~nz
    p = np.full(n, 1.0 / n)
    share = wf * inv_out[si]  # w_e / W_src, fixed across iterations
    for _ in range(n_iters):
        dangling = p[dangling_nodes].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, di, p[si] * share)
        p = (1 - damping) / n + damping * contrib + damping * dangling / n
    return nodes, p


def _wgraph_metadata(edges_ds) -> tuple[np.ndarray, np.ndarray]:
    """(sorted node ids, aligned out-WEIGHT) — per-batch partial sums +
    one bucketed groupby; edges never reach the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        usrc, inv = np.unique(src, return_inverse=True)
        wsum = np.zeros(len(usrc), np.int64)
        np.add.at(wsum, inv, w)
        udst = np.unique(dst)
        nodes = np.concatenate([usrc, udst])
        agg = np.concatenate([wsum, np.zeros(len(udst), np.int64)])
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "wsum": pa.array(agg, pa.int64()),
            }
        )

    summed = (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("node")
        .sum("wsum")
    )
    nodes_list = []
    w_list = []
    for b in summed.iter_batches(batch_format="pyarrow"):
        nodes_list.append(b["node"].to_numpy(zero_copy_only=False))
        w_list.append(b["sum(wsum)"].to_numpy(zero_copy_only=False))
    nodes = np.concatenate(nodes_list) if nodes_list else np.empty(0, np.int64)
    wsum = np.concatenate(w_list) if w_list else np.empty(0, np.int64)
    order = np.argsort(nodes)
    return nodes[order], wsum[order]


def _wpagerank_distributed(edges_ds, damping: float, n_iters: int):
    """O(V) driver arrays, one broadcast per iteration, per-batch partial
    sums before the groupby(dst) exchange — the pagerank.py discipline
    with weight-scaled contributions."""
    import ray

    nodes_arr, out_w = _wgraph_metadata(edges_ds)
    n = len(nodes_arr)
    if n == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "page_rank": pa.array([], pa.float64()),
            }
        )
    inv_out = np.zeros(n)
    nz = out_w > 0
    inv_out[nz] = 1.0 / out_w[nz].astype(np.float64)
    dangling_mask = ~nz
    ranks = np.full(n, 1.0 / n)
    edges = edges_ds.materialize()

    for _ in range(n_iters):
        bcast = ray.put((nodes_arr, ranks, inv_out))

        def contribs(batch: pa.Table) -> pa.Table:
            bnodes, branks, binv = ray.get(bcast)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
            si = np.searchsorted(bnodes, src)
            c = branks[si] * (w * binv[si])
            udst, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(udst))
            np.add.at(sums, inv, c)
            return pa.table(
                {
                    "dst": pa.array(udst, pa.int64()),
                    "c": pa.array(sums, pa.float64()),
                }
            )

        summed = (
            edges.map_batches(contribs, batch_format="pyarrow", batch_size=None)
            .groupby("dst")
            .sum("c")
        )
        contrib = np.zeros(n)
        for b in summed.iter_batches(batch_format="pyarrow"):
            di = np.searchsorted(
                nodes_arr, b["dst"].to_numpy(zero_copy_only=False)
            )
            contrib[di] = b["sum(c)"].to_numpy(zero_copy_only=False)
        dangling = ranks[dangling_mask].sum()
        ranks = (
            (1 - damping) / n + damping * contrib + damping * dangling / n
        )
    return pa.table(
        {
            "node": pa.array(nodes_arr, pa.int64()),
            "page_rank": pa.array(ranks, pa.float64()),
        }
    )


def wpagerank_fixed_iters(
    edges_ds,
    damping: float = 0.85,
    n_iters: int = 4,
    driver_edge_limit: int = 50_000_000,
):
    """Exactly ``n_iters`` synchronous weighted power iterations over a
    (src, dst, w) edge Dataset -> (node, page_rank).  Path selection by
    ``count()`` before any collect, like pagerank_fixed_iters."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "page_rank": pa.array([], pa.float64()),
            }
        )
    if n_edges <= driver_edge_limit:
        head = edges_ds.to_pandas(limit=None)
        nodes, ranks = _wpagerank_numpy(
            head["src"].to_numpy(),
            head["dst"].to_numpy(),
            head["w"].to_numpy(),
            damping,
            n_iters,
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "page_rank": pa.array(ranks, pa.float64()),
            }
        )
    return _wpagerank_distributed(edges_ds, damping, n_iters)
