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

Path selection is gated on CHEAP COUNTS (never a collect-then-check):

* driver path — when both the edge count and the doc count fit
  ``cfg.pagerank_driver_edge_limit``, everything (resolve, dedup, power
  iteration) runs as numpy on the driver with ZERO Ray executions beyond
  materializing the two small inputs.  O(E) per iteration via
  ``np.add.at`` scatter (the reference's inner loop is O(V^2),
  ``PageRank.java:79-84``).
* distributed path — edges stay a materialized Dataset.  Per iteration
  ONE broadcast of three sorted numpy arrays (nodes, rank/outdeg value,
  nothing per-row-Python), a vectorized ``searchsorted``+``take`` contrib
  kernel with per-batch partial aggregation, and a ``groupby(dst).sum``
  whose output is the O(V) aggregated rank table — the only per-iteration
  driver materialization (16 B/node; the edge set never returns to the
  driver).  Both paths are equal-by-test on the same graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig


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

    # dedup per (src, dst) — DataBaseManager.java:51-53.
    return dedup_edges(edges)


def dedup_edges(edges_ds):
    """Distinct (src, dst) over an edge Dataset — bucketed by src hash
    with a vectorized unique inside each bucket group (a per-pair
    map_groups would pay Python overhead per edge)."""

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
        edges_ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


def resolve_links_join(links_ds, docs_ds, num_partitions: int = 32):
    """Join-form of ``resolve_links`` for doc tables that outgrow a
    broadcast url->id map (the reference's J1 is literally this SQL
    inner join, ``DataBaseManager.java:39-42``): two ``Dataset.join``s
    on the url key — src side then dst side — followed by the same
    bucketed (src, dst) dedup.  Identical edge set (equal-by-test)."""

    def add_src_url(batch: pa.Table) -> pa.Table:
        if "src_doc_id" in batch.column_names:
            return pa.table(
                {
                    "src": pc.cast(batch["src_doc_id"], pa.int64()),
                    "dst_url": batch["dst_url"],
                }
            )
        urls = [
            f"repo://{r}/{p}"
            for r, p in zip(
                batch["src_repo"].to_pylist(), batch["src_path"].to_pylist()
            )
        ]
        return pa.table(
            {
                "src_url": pa.array(urls, pa.string()),
                "dst_url": batch["dst_url"],
            }
        )

    links2 = links_ds.map_batches(
        add_src_url, batch_format="pyarrow", batch_size=None
    )
    url_ids = docs_ds.select_columns(["url", "doc_id"])
    schema_names = links2.schema().names
    if "src" not in schema_names:
        src_side = url_ids.map_batches(
            lambda b: b.rename_columns(["src_url", "src"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        links2 = links2.join(
            src_side,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src_url",),
        )
    dst_side = url_ids.map_batches(
        lambda b: b.rename_columns(["dst_url", "dst"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    edges = links2.join(
        dst_side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst_url",),
    ).select_columns(["src", "dst"])
    return dedup_edges(edges)


def resolve_links_driver(links_tbl: pa.Table, docs_tbl: pa.Table):
    """Driver-side resolve + dedup over pyarrow tables (small-graph fast
    path; same inner-join + per-(src,dst)-dedup semantics as
    ``resolve_links``).  Returns (src, dst) int64 arrays."""
    urls = docs_tbl["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ids = docs_tbl["doc_id"].to_numpy(zero_copy_only=False)

    def _lookup(url_arr) -> tuple[np.ndarray, np.ndarray]:
        # hash join at C++ speed: position into the docs url array
        pos = pc.index_in(url_arr, value_set=urls)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        posn = (
            pc.fill_null(pos, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return ids[posn], valid

    if "src_doc_id" in links_tbl.column_names:
        col = links_tbl["src_doc_id"]
        src_valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        src_ids = (
            pc.fill_null(pc.cast(col, pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    else:
        src_url = pc.binary_join_element_wise(
            "repo://", links_tbl["src_repo"], "/", links_tbl["src_path"], ""
        )
        src_ids, src_valid = _lookup(src_url)
    dst_ids, dst_valid = _lookup(links_tbl["dst_url"])
    m = src_valid & dst_valid
    pairs = np.stack([src_ids[m], dst_ids[m]], axis=1)
    if len(pairs):
        pairs = np.unique(pairs, axis=0)
    else:
        pairs = pairs.reshape(-1, 2)
    return pairs[:, 0], pairs[:, 1]


def _pagerank_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    damping: float,
    epsilon: float,
    n_iters: int | None = None,
    seeds_mod: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact reference math over edge arrays.  Returns (node_ids, ranks).
    ``n_iters`` switches from ε-convergence to exactly that many
    synchronous iterations (the SQL-oracle-comparable form).

    ``seeds_mod``: when set, runs PERSONALIZED PageRank — the teleport
    mass restarts on the seed set ``{node % seeds_mod == 1}`` instead of
    uniformly (the recommendation / local-relevance variant); None keeps
    the classic update bit-identical to before the parameter existed."""
    nodes = np.union1d(src, dst)
    n = len(nodes)
    if n == 0:
        return nodes, np.empty(0)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, si, 1)
    if seeds_mod is None:
        seed_mask = None
        p = np.full(n, 1.0 / n)
    else:
        seed_mask = nodes % seeds_mod == 1
        s = int(seed_mask.sum())
        if s == 0:
            raise ValueError("empty personalization seed set")
        p = np.zeros(n)
        p[seed_mask] = 1.0 / s
    dangling_nodes = outdeg == 0
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]
    done = 0
    while True:
        dangling = p[dangling_nodes].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, di, p[si] * inv_out[si])
        if seed_mask is None:
            new_p = (
                (1 - damping) / n + damping * contrib + damping * dangling / n
            )
        else:
            new_p = damping * contrib
            new_p[seed_mask] = new_p[seed_mask] + (
                (1 - damping) / s + damping * dangling / s
            )
        converged = (
            done + 1 >= n_iters
            if n_iters is not None
            else np.max(np.abs(new_p - p)) <= epsilon
        )
        p = new_p
        done += 1
        if converged:
            break
    return nodes, p


def _graph_metadata(edges_ds) -> tuple[np.ndarray, np.ndarray]:
    """(sorted node ids, aligned outdeg) from the edge Dataset via
    per-batch partials + one small bucketed groupby — the edge set itself
    never reaches the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        usrc, counts = np.unique(src, return_counts=True)
        udst = np.unique(dst)
        nodes = np.concatenate([usrc, udst])
        deg = np.concatenate([counts, np.zeros(len(udst), dtype=np.int64)])
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
                "_b": pa.array((nodes % 64).astype(np.int64), pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        nodes = group["node"].to_numpy(zero_copy_only=False)
        deg = group["deg"].to_numpy(zero_copy_only=False)
        unodes, inv = np.unique(nodes, return_inverse=True)
        udeg = np.zeros(len(unodes), dtype=np.int64)
        np.add.at(udeg, inv, deg)
        return pa.table(
            {
                "node": pa.array(unodes, pa.int64()),
                "deg": pa.array(udeg, pa.int64()),
            }
        )

    parts_n, parts_d = [], []
    combined = (
        edges_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(combine, batch_format="pyarrow")
    )
    for b in combined.iter_batches(batch_format="pyarrow"):
        parts_n.append(b["node"].to_numpy(zero_copy_only=False))
        parts_d.append(b["deg"].to_numpy(zero_copy_only=False))
    if not parts_n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    nodes = np.concatenate(parts_n)
    deg = np.concatenate(parts_d)
    order = np.argsort(nodes)
    return nodes[order], deg[order]


def _pagerank_distributed(
    edges_ds,
    damping: float,
    epsilon: float,
    n_iters: int | None = None,
    seeds_mod: int | None = None,
):
    """Distributed power iteration: edges stay a Dataset; the driver holds
    only O(V) numpy arrays (8 B/node — ranks), broadcast once per
    iteration; contribs are vectorized searchsorted+take with per-batch
    partial sums before the ``groupby(dst).sum`` exchange.
    ``seeds_mod``: personalized-restart variant (see _pagerank_numpy)."""
    import ray
    import ray.data as rd

    nodes_arr, outdeg_arr = _graph_metadata(edges_ds)
    n = len(nodes_arr)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "page_rank": pa.array([], pa.float64()),
            }
        )
    inv_out = np.zeros(n)
    nz = outdeg_arr > 0
    inv_out[nz] = 1.0 / outdeg_arr[nz]
    dangling_mask = ~nz
    if seeds_mod is None:
        seed_mask = None
        ranks = np.full(n, 1.0 / n)
    else:
        seed_mask = nodes_arr % seeds_mod == 1
        s = int(seed_mask.sum())
        if s == 0:
            raise ValueError("empty personalization seed set")
        ranks = np.zeros(n)
        ranks[seed_mask] = 1.0 / s

    edges = edges_ds.materialize()

    done = 0
    while True:
        # one object per iteration: (sorted nodes, rank/outdeg per node)
        bcast = ray.put((nodes_arr, ranks * inv_out))

        def contribs(batch: pa.Table) -> pa.Table:
            bnodes, bval = ray.get(bcast)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            c = bval[np.searchsorted(bnodes, src)]
            # partial-aggregate inside the batch: the exchange moves one
            # row per distinct dst per block, not one per edge
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
            di = np.searchsorted(nodes_arr, b["dst"].to_numpy(zero_copy_only=False))
            contrib[di] = b["sum(c)"].to_numpy(zero_copy_only=False)
        dangling = ranks[dangling_mask].sum()
        if seed_mask is None:
            new_ranks = (
                (1 - damping) / n + damping * contrib + damping * dangling / n
            )
        else:
            new_ranks = damping * contrib
            new_ranks[seed_mask] = new_ranks[seed_mask] + (
                (1 - damping) / s + damping * dangling / s
            )
        delta = np.max(np.abs(new_ranks - ranks))
        ranks = new_ranks
        done += 1
        if (done >= n_iters) if n_iters is not None else (delta <= epsilon):
            break
    return pa.table(
        {
            "doc_id": pa.array(nodes_arr, pa.int64()),
            "page_rank": pa.array(ranks, pa.float64()),
        }
    )


def pagerank_from_edges(edges_ds, cfg: IndexConfig):
    """Edge Dataset -> (doc_id, page_rank) pyarrow Table.

    Path selection by ``edges_ds.count()`` BEFORE any collect: the
    distributed fallback is reachable without ever materializing the edge
    set on the driver."""
    # pin the (possibly derived) resolve+dedup pipeline once: count(),
    # metadata and the iteration loop each consume the dataset, and a
    # lazy input would re-run the whole shuffle per consumer
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "page_rank": pa.array([], pa.float64()),
            }
        )
    if n_edges <= cfg.pagerank_driver_edge_limit:
        head = edges_ds.to_pandas(limit=None)
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


def pagerank_fixed_iters(
    edges_ds,
    damping: float = 0.85,
    n_iters: int = 4,
    driver_edge_limit: int = 50_000_000,
):
    """Exactly ``n_iters`` synchronous power iterations over a deduped
    edge Dataset -> (node, page_rank) — the SQL-oracle-comparable form of
    A5 (an unrolled K-step recursion is expressible in plain SQL while
    ε-convergence is not).  Path selection mirrors
    ``pagerank_from_edges``: count()-gated driver numpy below the limit,
    the broadcast-arrays distributed iteration above it; both run the
    identical formula (incl. dangling mass), asserted equal by test."""
    edges_ds = edges_ds.materialize()  # see pagerank_from_edges
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
        nodes, ranks = _pagerank_numpy(
            head["src"].to_numpy(),
            head["dst"].to_numpy(),
            damping,
            0.0,
            n_iters=n_iters,
        )
        tbl = pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "page_rank": pa.array(ranks, pa.float64()),
            }
        )
    else:
        tbl = _pagerank_distributed(
            edges_ds, damping, 0.0, n_iters=n_iters
        ).rename_columns(["node", "page_rank"])
    return tbl


def personalized_pagerank_fixed_iters(
    edges_ds,
    *,
    seeds_mod: int = 16,
    damping: float = 0.85,
    n_iters: int = 4,
    driver_edge_limit: int = 50_000_000,
):
    """Personalized PageRank, K synchronous iterations: the teleport
    mass restarts on the deterministic seed set ``{node % seeds_mod ==
    1}`` — the local-relevance / recommendation variant of A5 (scores
    decay with distance from the seeds instead of measuring global
    centrality).  Same count()-gated driver-numpy / distributed path
    selection as ``pagerank_fixed_iters``; both paths run the identical
    seeded update.  Output: (node, ppr)."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "ppr": pa.array([], pa.float64()),
            }
        )
    if n_edges <= driver_edge_limit:
        head = edges_ds.to_pandas(limit=None)
        nodes, ranks = _pagerank_numpy(
            head["src"].to_numpy(),
            head["dst"].to_numpy(),
            damping,
            0.0,
            n_iters=n_iters,
            seeds_mod=seeds_mod,
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "ppr": pa.array(ranks, pa.float64()),
            }
        )
    return _pagerank_distributed(
        edges_ds, damping, 0.0, n_iters=n_iters, seeds_mod=seeds_mod
    ).rename_columns(["node", "ppr"])


_EMPTY_PR = pa.table(
    {"doc_id": pa.array([], pa.int64()), "page_rank": pa.array([], pa.float64())}
)


def pagerank_table_from_links_table(
    links_tbl: pa.Table, docs_table: pa.Table, cfg: IndexConfig
) -> pa.Table:
    """Driver fast path over an already-materialized link table (the
    caller read the parquet footer and both sides fit the driver limit):
    vectorized resolve + numpy iteration, zero Dataset executions."""
    if links_tbl.num_rows == 0:
        return _EMPTY_PR
    src, dst = resolve_links_driver(links_tbl, docs_table)
    nodes, ranks = _pagerank_numpy(
        src, dst, cfg.pagerank_damping, cfg.pagerank_epsilon
    )
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "page_rank": pa.array(ranks, pa.float64()),
        }
    )


def build_pagerank_table(links_ds, docs_ds, cfg: IndexConfig, docs_table=None):
    """links + docs -> (doc_id, page_rank) pyarrow Table (build stage 5).

    ``docs_table`` (optional pyarrow Table of (url, doc_id)): the driver
    fast path — when the link count and doc count both fit the driver
    limit, resolve + dedup + iterate run as pure numpy with a single Ray
    execution (materializing links), instead of four (url-map collect,
    resolve+dedup shuffle, count, iterate); the caller writes the small
    result table directly."""
    n_links = links_ds.count()
    if (
        docs_table is not None
        and n_links <= cfg.pagerank_driver_edge_limit
        and docs_table.num_rows <= cfg.pagerank_driver_edge_limit
    ):
        batches = list(links_ds.iter_batches(batch_format="pyarrow"))
        links_tbl = pa.concat_tables(batches) if batches else None
        if links_tbl is None or links_tbl.num_rows == 0:
            return _EMPTY_PR
        src, dst = resolve_links_driver(links_tbl, docs_table)
        nodes, ranks = _pagerank_numpy(
            src, dst, cfg.pagerank_damping, cfg.pagerank_epsilon
        )
        return pa.table(
            {
                "doc_id": pa.array(nodes, pa.int64()),
                "page_rank": pa.array(ranks, pa.float64()),
            }
        )
    # docs_table is None when the doc table exceeds the broadcast limit:
    # resolution becomes the two-sided url join (J1's literal SQL form)
    edges = (
        resolve_links(links_ds, docs_ds)
        if docs_table is not None
        else resolve_links_join(links_ds, docs_ds)
    )
    return pagerank_from_edges(edges, cfg)
