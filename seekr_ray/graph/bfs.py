"""BFS hop distances over an undirected edge set.

The reachability/radius primitive the graph suite (PageRank, HITS,
triangles, k-core, components) was missing: minimum hop count from a
seed set to every reachable node — link-distance features, crawl-depth
analysis, component radius probes.

Paths (count()-gated, the graph-suite convention):

* driver numpy below ``driver_edge_limit`` — CSR adjacency
  (lexsorted symmetric edge list + searchsorted row starts), frontier
  sweep per level;
* distributed — the driver holds one O(V) distance array (the
  _pagerank_distributed discipline); each level broadcasts the
  frontier membership via ``ray.put`` and expands it with one
  map_batches over the symmetric edge Dataset (per-block distinct
  before the exchange), one groupby-dedup, and a count()-gated
  update.  Rounds = eccentricity of the seed set, work per round
  O(edges touched).

Output: (node, dist) for REACHABLE nodes only (the SQL mirror is a
recursive walk — unreachable nodes never enter it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DRIVER_EDGE_LIMIT = 50_000_000


def _bfs_numpy(
    a: np.ndarray, b: np.ndarray, sources: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.arange(len(nodes) + 1))
    dist = np.full(len(nodes), -1, np.int64)
    seed_idx = np.searchsorted(nodes, sources)
    seed_idx = seed_idx[
        (seed_idx < len(nodes)) & (nodes[np.minimum(seed_idx, len(nodes) - 1)] == sources)
    ]
    dist[seed_idx] = 0
    frontier = seed_idx
    d = 0
    while len(frontier):
        d += 1
        neigh_parts = [
            dst[starts[f]: starts[f + 1]] for f in frontier.tolist()
        ]
        if not neigh_parts:
            break
        neigh = np.unique(np.concatenate(neigh_parts))
        fresh = neigh[dist[neigh] < 0]
        dist[fresh] = d
        frontier = fresh
    m = dist >= 0
    return nodes[m], dist[m]


def bfs_hops(
    edges_ds,
    *,
    sources: list[int],
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
):
    """Minimum hop distance from ``sources`` over undirected distinct
    edges.  Returns (node, dist) for reachable nodes."""
    if not sources:
        raise ValueError("bfs_hops requires at least one source")
    edges = (
        edges_ds.select_columns([a_col, b_col])
        .map_batches(
            lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
        )
        .materialize()
    )
    m = edges.count()
    src_arr = np.unique(np.asarray(sources, np.int64))
    if m == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
        )
    if m <= driver_edge_limit:
        head = edges.to_pandas(limit=None)
        nodes, dist = _bfs_numpy(
            head["a"].to_numpy().astype(np.int64),
            head["b"].to_numpy().astype(np.int64),
            src_arr,
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )
    return _bfs_distributed(edges, src_arr)


def _bfs_distributed(edges, sources: np.ndarray):
    """O(V) distance array on the driver; one broadcast + one
    partial-deduped exchange per level."""
    import ray

    from .pagerank import _graph_metadata

    nodes_arr, _ = _graph_metadata(
        edges.map_batches(
            lambda t: t.rename_columns(["src", "dst"]),
            batch_format="pyarrow",
        )
    )
    n = len(nodes_arr)
    dist = np.full(n, -1, np.int64)
    pos = np.searchsorted(nodes_arr, sources)
    pos = pos[
        (pos < n) & (nodes_arr[np.minimum(pos, n - 1)] == sources)
    ]
    dist[pos] = 0
    frontier_mask = np.zeros(n, bool)
    frontier_mask[pos] = True
    d = 0
    while frontier_mask.any():
        d += 1
        bcast = ray.put((nodes_arr, frontier_mask))

        def expand(batch: pa.Table) -> pa.Table:
            bnodes, fmask = ray.get(bcast)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(bnodes, a)
            ib = np.searchsorted(bnodes, b)
            out = np.concatenate([b[fmask[ia]], a[fmask[ib]]])
            return pa.table({"node": pa.array(np.unique(out), pa.int64())})

        reached = (
            edges.map_batches(expand, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .count()
        )
        new_mask = np.zeros(n, bool)
        for bt in reached.iter_batches(batch_format="pyarrow"):
            ridx = np.searchsorted(
                nodes_arr, bt["node"].to_numpy(zero_copy_only=False)
            )
            new_mask[ridx] = True
        fresh = new_mask & (dist < 0)
        dist[fresh] = d
        frontier_mask = fresh
    m = dist >= 0
    return pa.table(
        {
            "node": pa.array(nodes_arr[m], pa.int64()),
            "dist": pa.array(dist[m], pa.int64()),
        }
    )
