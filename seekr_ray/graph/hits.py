"""HITS (hubs & authorities) — fixed-iteration, L1-normalized.

Completes the link-analysis suite next to PageRank / personalized
PageRank (graph/pagerank.py): hub scores reward nodes that point at
good authorities, authority scores reward nodes pointed at by good
hubs.  Kleinberg's original normalizes by L2; this implementation
normalizes each half-step by the L1 sum — the variant whose unrolled
K-step recursion is expressible in plain SQL (the
pagerank_fixed_iters discipline: ε-convergence is not
oracle-comparable, a fixed synchronous K is), and scale-invariant
ranking-wise (normalization choice rescales scores, never reorders).

Update, per iteration t = 1..K over directed edges (src, dst):

    a'[i] = Σ_{(j,i)} h[t-1][j];   a[t] = a' / Σ a'
    h'[j] = Σ_{(j,i)} a[t][i];     h[t] = h' / Σ h'

with h[0] = 1/|V|.  Nodes with no in-edges keep authority 0 (and
symmetrically for hubs) — the LEFT JOIN zeros of the SQL mirror.

Paths (count()-gated, the graph-suite convention):

* driver numpy below ``driver_edge_limit`` — np.add.at over unique
  node codes;
* distributed — the _pagerank_distributed shape: the driver holds
  only O(V) score arrays, broadcast once per half-step via
  ``ray.put``; per-batch searchsorted gathers + per-block partial
  sums shrink the ``groupby.sum`` exchange to one row per distinct
  endpoint per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DRIVER_EDGE_LIMIT = 50_000_000


def _hits_numpy(
    src: np.ndarray, dst: np.ndarray, n_iters: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    isrc, idst = inv[: len(src)], inv[len(src):]
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        a_raw = np.zeros(n)
        np.add.at(a_raw, idst, h[isrc])
        s = a_raw.sum()
        a = a_raw / s if s > 0 else a_raw
        h_raw = np.zeros(n)
        np.add.at(h_raw, isrc, a[idst])
        s = h_raw.sum()
        h = h_raw / s if s > 0 else h_raw
    return nodes, h, a


def hits_fixed_iters(
    edges_ds,
    *,
    n_iters: int = 8,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
):
    """(node, hub, authority) after exactly ``n_iters`` synchronous
    L1-normalized HITS steps over a deduped (src, dst) edge Dataset."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "hub": pa.array([], pa.float64()),
                "authority": pa.array([], pa.float64()),
            }
        )
    if n_edges <= driver_edge_limit:
        head = edges_ds.to_pandas(limit=None)
        nodes, h, a = _hits_numpy(
            head["src"].to_numpy(), head["dst"].to_numpy(), n_iters
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "hub": pa.array(h, pa.float64()),
                "authority": pa.array(a, pa.float64()),
            }
        )
    return _hits_distributed(edges_ds, n_iters)


def _hits_distributed(edges, n_iters: int):
    """Driver holds O(V) arrays; each half-step is one broadcast + one
    partial-aggregated groupby exchange over the edge Dataset."""
    import ray

    from .pagerank import _graph_metadata

    nodes_arr, _ = _graph_metadata(edges)
    n = len(nodes_arr)
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)

    def half_step(score_on: str, gather_to: str, scores: np.ndarray):
        bcast = ray.put((nodes_arr, scores))

        def contribs(batch: pa.Table) -> pa.Table:
            bnodes, bval = ray.get(bcast)
            s = batch[score_on].to_numpy(zero_copy_only=False)
            g = batch[gather_to].to_numpy(zero_copy_only=False)
            c = bval[np.searchsorted(bnodes, s)]
            ug, inv = np.unique(g, return_inverse=True)
            sums = np.zeros(len(ug))
            np.add.at(sums, inv, c)
            return pa.table(
                {
                    "node": pa.array(ug, pa.int64()),
                    "c": pa.array(sums, pa.float64()),
                }
            )

        summed = (
            edges.map_batches(
                contribs, batch_format="pyarrow", batch_size=None
            )
            .groupby("node")
            .sum("c")
        )
        raw = np.zeros(n)
        for b in summed.iter_batches(batch_format="pyarrow"):
            di = np.searchsorted(
                nodes_arr, b["node"].to_numpy(zero_copy_only=False)
            )
            raw[di] = b["sum(c)"].to_numpy(zero_copy_only=False)
        s = raw.sum()
        return raw / s if s > 0 else raw

    for _ in range(n_iters):
        a = half_step("src", "dst", h)
        h = half_step("dst", "src", a)
    return pa.table(
        {
            "node": pa.array(nodes_arr, pa.int64()),
            "hub": pa.array(h, pa.float64()),
            "authority": pa.array(a, pa.float64()),
        }
    )
