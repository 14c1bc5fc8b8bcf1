"""Link-graph resolution + PageRank (SURVEY.md §2.4 A5, §2.6 J1).

Reference semantics reproduced exactly (``Ranker/PageRank.java:12-105``,
``Data/DataBaseManager.java:37-57``):

* graph nodes = every endpoint of a *resolved* edge (inner join of
  ``extracted_links.extracted_link`` onto ``DocumentMetaData.url`` — the
  join drops dangling URLs; both src and dst become nodes);
* edges deduped per (src, dst);
* damping d = 0.85, epsilon = 1e-5, init 1/n, synchronous updates:
  ``r'(i) = (1-d)/n + d * Σ_{j→i} r(j)/outdeg(j) + d * dangling_mass/n``
  with ``dangling_mass = Σ r(j) over j with outdeg 0``;
* stop when no |Δ| exceeds epsilon;
* documents outside the graph keep page_rank 0.0 (default column value,
  ``Crawler.java:400``).

Two execution paths, equal-by-test on the fixture graph:

* ``_pagerank_numpy`` — edge arrays on the driver (vectorized
  ``np.add.at`` scatter), used when the resolved edge count is modest.
  This replaces the reference's O(V^2) "who links to i" inner scan
  (``PageRank.java:79-84``) with O(E) per iteration.
* ``_pagerank_distributed`` — per-iteration ``edges ⋈ ranks`` hash join +
  ``groupby(dst).sum()`` over Ray Datasets, for graphs whose edge list
  cannot sit on one node.  The rank table is the only per-iteration
  materialization (it is O(V) rows of 16 bytes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig

_DRIVER_EDGE_LIMIT = 2_000_000


def resolve_links(links_ds, docs_ds):
    """links (src_repo, src_path, src_commit, dst_url | src_doc_id, dst_url)
    -> deduped edge Dataset (src: int64, dst: int64).

    The url->doc_id map is broadcast via ``ray.put`` and applied inside
    ``map_batches`` — a broadcast hash join (SURVEY.md §2.6 J1).  Scale
    note: when the doc table outgrows a broadcast (10^12 files) this
    becomes ``links.join(docs, on="url")`` on the same key; the broadcast
    form is chosen because the url→id side of a crawl graph is orders of
    magnitude smaller than the postings data."""
    import ray

    url_to_id = {}
    for batch in docs_ds.select_columns(["url", "doc_id"]).iter_batches(
        batch_format="pyarrow"
    ):
        for u, d in zip(batch["url"].to_pylist(), batch["doc_id"].to_pylist()):
            url_to_id[u] = d
    ref = ray.put(url_to_id)

    def resolve(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        has_src_id = "src_doc_id" in batch.column_names
        if has_src_id:
            src_ids = batch["src_doc_id"].to_pylist()
        else:
            src_ids = [
                lookup.get(f"repo://{r}/{p}")
                for r, p in zip(
                    batch["src_repo"].to_pylist(), batch["src_path"].to_pylist()
                )
            ]
        dst_ids = [lookup.get(u) for u in batch["dst_url"].to_pylist()]
        src_out, dst_out = [], []
        for s, d in zip(src_ids, dst_ids):
            if s is not None and d is not None:
                src_out.append(s)
                dst_out.append(d)
        return pa.table(
            {
                "src": pa.array(src_out, pa.int64()),
                "dst": pa.array(dst_out, pa.int64()),
            }
        )

    edges = links_ds.map_batches(resolve, batch_format="pyarrow", batch_size=None)

    # dedup per (src, dst) — DataBaseManager.java:51-53.  Bucketed by src
    # hash with a vectorized unique inside each bucket group (a per-pair
    # map_groups would pay Python overhead per edge).
    def add_bucket(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_b", pa.array((src % 64).astype(np.int64), pa.int64())
        )

    def dedup_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("src", "ascending"), ("dst", "ascending")]
        )
        tbl = group.take(order)
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(src), dtype=bool)
        if len(src):
            keep[0] = True
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        return tbl.filter(pa.array(keep)).drop_columns(["_b"])

    return (
        edges.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


def _pagerank_numpy(
    src: np.ndarray, dst: np.ndarray, damping: float, epsilon: float
) -> tuple[np.ndarray, np.ndarray]:
    """Exact reference math over edge arrays.  Returns (node_ids, ranks)."""
    nodes = np.union1d(src, dst)
    n = len(nodes)
    if n == 0:
        return nodes, np.empty(0)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, si, 1)
    p = np.full(n, 1.0 / n)
    dangling_nodes = outdeg == 0
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]
    while True:
        dangling = p[dangling_nodes].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, di, p[si] * inv_out[si])
        new_p = (1 - damping) / n + damping * contrib + damping * dangling / n
        if np.max(np.abs(new_p - p)) <= epsilon:
            p = new_p
            break
        p = new_p
    return nodes, p


def _pagerank_distributed(edges_ds, damping: float, epsilon: float):
    """Join+groupby power iteration over Datasets.

    Per iteration: contribs = edges ⋈ ranks (hash join on src) →
    groupby(dst).sum → apply damping + dangling.  The driver only sees the
    per-iteration max-delta scalar and the O(V) rank table boundaries."""
    import ray.data as rd

    # node table + outdeg
    srcs = edges_ds.select_columns(["src"]).rename_columns({"src": "node"})
    dsts = edges_ds.select_columns(["dst"]).rename_columns({"dst": "node"})
    node_list = sorted(srcs.union(dsts).unique("node"))
    outdeg_pdf = (
        edges_ds.groupby("src").count().to_pandas()
    )  # columns: src, count()
    outdeg_map = dict(zip(outdeg_pdf["src"], outdeg_pdf[outdeg_pdf.columns[1]]))
    n = len(node_list)
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()), "page_rank": pa.array([], pa.float64())})

    nodes_arr = np.array(node_list, dtype=np.int64)
    outdeg_arr = np.array([outdeg_map.get(x, 0) for x in node_list], dtype=np.int64)
    ranks = np.full(n, 1.0 / n)

    edges = edges_ds.materialize()

    while True:
        import ray

        rank_ref = ray.put({int(x): float(r) for x, r in zip(nodes_arr, ranks)})
        deg_ref = ray.put({int(x): int(d) for x, d in zip(nodes_arr, outdeg_arr)})

        def contribs(batch: pa.Table) -> pa.Table:
            rmap = ray.get(rank_ref)
            dmap = ray.get(deg_ref)
            src = batch["src"].to_pylist()
            dst = batch["dst"].to_pylist()
            return pa.table(
                {
                    "dst": pa.array(dst, pa.int64()),
                    "c": pa.array(
                        [rmap[s] / dmap[s] for s in src], pa.float64()
                    ),
                }
            )

        summed = (
            edges.map_batches(contribs, batch_format="pyarrow")
            .groupby("dst")
            .sum("c")
            .to_pandas()
        )
        cmap = dict(zip(summed["dst"], summed["sum(c)"]))
        dangling = ranks[outdeg_arr == 0].sum()
        new_ranks = (
            (1 - damping) / n
            + damping * np.array([cmap.get(int(x), 0.0) for x in nodes_arr])
            + damping * dangling / n
        )
        delta = np.max(np.abs(new_ranks - ranks))
        ranks = new_ranks
        if delta <= epsilon:
            break
    return pa.table(
        {
            "doc_id": pa.array(nodes_arr, pa.int64()),
            "page_rank": pa.array(ranks, pa.float64()),
        }
    )


def pagerank_from_edges(edges_ds, cfg: IndexConfig):
    """Edge Dataset -> (doc_id, page_rank) pyarrow Table.

    One consuming execution: materialize up to the driver limit; if the
    graph exceeds it, fall through to the distributed join+groupby path."""
    head = edges_ds.to_pandas(limit=None)  # crawl graphs are edge-sparse
    if len(head) == 0 or "src" not in head.columns:
        # every link dangled: no graph, all docs keep page_rank 0.0
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "page_rank": pa.array([], pa.float64()),
            }
        )
    if len(head) <= _DRIVER_EDGE_LIMIT:
        nodes, ranks = _pagerank_numpy(
            head["src"].to_numpy(),
            head["dst"].to_numpy(),
            cfg.pagerank_damping,
            cfg.pagerank_epsilon,
        )
        return pa.table(
            {
                "doc_id": pa.array(nodes, pa.int64()),
                "page_rank": pa.array(ranks, pa.float64()),
            }
        )
    return _pagerank_distributed(
        edges_ds, cfg.pagerank_damping, cfg.pagerank_epsilon
    )


def build_pagerank_table(links_ds, docs_ds, cfg: IndexConfig):
    """links + docs -> pagerank Dataset (build stage 5)."""
    import ray.data as rd

    edges = resolve_links(links_ds, docs_ds)
    table = pagerank_from_edges(edges, cfg)
    return rd.from_arrow(table)
