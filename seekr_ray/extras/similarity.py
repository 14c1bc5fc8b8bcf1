"""Similarity search over an embedding column (list<float>).

* ``ann_topk_bruteforce`` — the exact baseline: per-batch numpy matmul of
  the broadcast query matrix against the batch's embeddings, partial
  top-k per batch, heap-merged to global top-k on the driver.  This is
  the canonical "broadcast small side, stream the big side" shape: the
  query matrix rides ``ray.put`` once, batches stay zero-copy Arrow.
* ``ann_topk_lsh`` — a scale path: random-hyperplane signature buckets
  (signs of Q·v) prune the candidate set; exact re-scoring inside the
  matching buckets.  Recall < 1 by construction; tests assert recall
  against the brute-force baseline on the fixture table.
* ``ann_topk_ivf`` — the other classic scale path: spherical k-means
  centroids trained on a deterministic sample (driver Lloyd over a
  bounded sample; the corpus itself never collects), every vector
  assigned to its nearest-centroid list in one ``map_batches`` pass,
  queries probed against their ``nprobe`` nearest lists with exact
  cosine re-scoring.  ``nprobe == n_lists`` degenerates to exact brute
  force (asserted by test), which pins the probe machinery's
  correctness.

All three paths share one distributed shape: per-batch partial top-k in
``map_batches``, ``_merge_topk`` heap-merging k × n_batches rows on the
driver — nothing corpus-sized ever collects.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..bucket_agg import bucketed_group_agg
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .textstats import round6, round6_arr as _round6_arr


def _to_matrix(col) -> np.ndarray:
    """Arrow list column → (n, dim) float64 matrix.

    Fast path: FixedSizeList or uniform-length List/LargeList columns
    flatten to the contiguous child buffer and reshape — no per-row
    Python objects (the round-2 ``np.stack(col.to_pylist())`` converted
    every element through a Python float).  Ragged or null-bearing
    input falls back to the per-row conversion.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    typ = col.type
    if n and col.null_count == 0:
        if pa.types.is_fixed_size_list(typ):
            dim = typ.list_size
        elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            dim = int(lens[0]) if (lens == lens[0]).all() else -1
        else:
            dim = -1
        if dim >= 0:
            # flatten() respects array slices (``.values`` would not)
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(vals, dtype=np.float64).reshape(
                n, dim
            )
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _sorted_unit_sample(emb_ds, sample_mod: int) -> np.ndarray:
    """Unit-normalized driver sample (``vec_id % sample_mod == 0``),
    rows sorted by vec_id.  Block arrival order from ``iter_batches``
    is nondeterministic under load; an unsorted sample gave k-means a
    different centroid init per run (flaky PQ recall).  Sorting pins
    the training set bit-for-bit across runs and parallelism levels."""

    def keep_sample(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % sample_mod == 0))

    ids_parts, mat_parts = [], []
    for b in emb_ds.map_batches(
        keep_sample, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            ids_parts.append(b["vec_id"].to_numpy(zero_copy_only=False))
            mat_parts.append(_unit(_to_matrix(b["embedding"])))
    ids = np.concatenate(ids_parts)
    sample = np.concatenate(mat_parts)
    return sample[np.argsort(ids, kind="stable")]


def _cosine(q: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """dot(a,b) / (|a|*|b|) — the same FP formulation DuckDB's
    list_cosine_similarity uses, so 6dp-rounded outputs hash-match."""
    qn = np.linalg.norm(q, axis=1)
    mn = np.linalg.norm(mat, axis=1)
    qn[qn == 0] = 1.0
    mn[mn == 0] = 1.0
    return (q @ mat.T) / (qn[:, None] * mn[None, :])


class _BruteScorer:
    """Per-batch top-k against the broadcast query matrix."""

    def __init__(self, query_ref, k: int):
        import ray

        self.q = np.asarray(ray.get(query_ref), dtype=np.float64)  # (nq, dim)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = _to_matrix(batch["embedding"])
        sims = _cosine(self.q, mat)  # (nq, nbatch)
        out_q, out_id, out_cos = [], [], []
        k = min(self.k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # partial top-k, ties by vec_id asc (a positional argsort
            # would order ties by row position — block-layout-dependent)
            idx = np.lexsort((ids, -row))[:k]
            for j in idx:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_cos.append(float(row[j]))
        return pa.table(
            {
                "query_i": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )


def _merge_topk(partials, k: int) -> pa.Table:
    """Driver heap-merge of per-batch partial top-k rows (k × n_batches
    rows — tiny regardless of corpus size).  Final order: cos desc,
    vec_id asc; cos rounded to 6dp."""
    heaps: dict[int, list] = {}
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for qi, vid, cos in zip(
            batch["query_i"].to_pylist(),
            batch["vec_id"].to_pylist(),
            batch["cos"].to_pylist(),
        ):
            h = heaps.setdefault(qi, [])
            item = (cos, -vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows_q, rows_rank, rows_id, rows_cos = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (cos, nvid) in enumerate(best):
            rows_q.append(qi)
            rows_rank.append(rank)
            rows_id.append(-nvid)
            rows_cos.append(round6(cos))
    return pa.table(
        {
            "query_i": pa.array(rows_q, pa.int32()),
            "rank": pa.array(rows_rank, pa.int32()),
            "vec_id": pa.array(rows_id, pa.int64()),
            "cos": pa.array(rows_cos, pa.float64()),
        }
    )


def ann_topk_bruteforce(emb_ds, queries: np.ndarray, k: int = 10) -> pa.Table:
    """Exact top-k cosine for each query row.  Returns
    (query_i, rank, vec_id, cos) with cos rounded to 6dp and ties broken
    by vec_id asc — deterministic and oracle-comparable."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    query_ref = ray.put(queries)
    partials = emb_ds.map_batches(
        _BruteScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        concurrency=(1, 4),
        # The ctor kwargs hold driver-owned ObjectRefs that die when this
        # function returns; Ray Data's default max_restarts=-1 can then
        # wedge a late-restarting pool actor forever (it re-reserves its
        # CPU but can never resolve its ctor args — ray#53727), starving
        # every later actor pool on the cluster.  These scorer scans are
        # short and idempotent: on worker loss, re-running the query is
        # the recovery path, so restarts are disabled.
        max_restarts=0,
    )
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) path
# ---------------------------------------------------------------------------


def ivf_train(
    emb_ds,
    n_lists: int = 16,
    sample_mod: int = 1,
    iters: int = 5,
    seed: int = 13,
) -> np.ndarray:
    """Spherical k-means centroids from a deterministic sample.

    The sample (``vec_id % sample_mod == 0``) collects to the driver —
    at 100 TB pick ``sample_mod`` so the sample stays ~1e5-1e6 rows;
    training never touches the full corpus.  Lloyd iterations are
    driver numpy over the sample only.  Returns unit-norm centroids
    ``(n_lists, dim)``."""
    sample = _sorted_unit_sample(emb_ds, sample_mod)
    n_lists = min(n_lists, len(sample))
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit(centroids)
    return centroids


class _IvfAssigner:
    """Adds ``list_id`` = nearest centroid (max cosine) per vector."""

    def __init__(self, centroids_ref):
        import ray

        self.centroids = ray.get(centroids_ref)  # (n_lists, dim), unit

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _unit(_to_matrix(batch["embedding"]))
        lists = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(lists, pa.int32()))


def ivf_assign(emb_ds, centroids: np.ndarray):
    """The IVF "index build": one pass attaching each vector's list id.
    At scale, follow with a ``write_parquet(partition_cols=["list_id"])``
    so a probe reads only its lists' files."""
    import ray

    return emb_ds.map_batches(
        _IvfAssigner,
        batch_format="pyarrow",
        fn_constructor_kwargs={"centroids_ref": ray.put(centroids)},
        concurrency=(1, 4),
        max_restarts=0,  # ctor ref dies with the caller — see ann_topk_bruteforce
    )


class _IvfProbeScorer:
    """Per-batch exact scoring of each query against ITS probed lists
    only; emits partial top-k rows (same merge shape as _BruteScorer)."""

    def __init__(self, query_ref, probes_ref, k: int):
        import ray

        self.q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.probes = ray.get(probes_ref)  # (nq, nprobe) int32
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        mat = _to_matrix(batch["embedding"])
        out_q, out_id, out_cos = [], [], []
        for qi in range(len(self.q)):
            mask = np.isin(lists, self.probes[qi])
            if not mask.any():
                continue
            sims = _cosine(self.q[qi : qi + 1], mat[mask])[0]
            cids = ids[mask]
            order = np.lexsort((cids, -sims))[: self.k]
            out_q.extend([qi] * len(order))
            out_id.extend(int(cids[j]) for j in order)
            out_cos.extend(float(sims[j]) for j in order)
        return pa.table(
            {
                "query_i": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )


def ivf_build(
    emb_ds,
    index_dir: str,
    n_lists: int = 16,
    sample_mod: int = 1,
    iters: int = 5,
    seed: int = 13,
) -> dict:
    """Persist an IVF index for serving reuse: train once, assign once,
    write ``index_dir/`` as::

        centroids.parquet            (list_id, centroid list<double>)
        lists/list_id=K/*.parquet    (vec_id, embedding, list_id)
        meta.json + _SUCCESS

    ``ivf_query`` then probes WITHOUT retraining or reassigning — the
    round-2 ``ann_topk_ivf`` paid both on every call.  The list write
    uses the same per-block sort+slice pattern as the postings shuffle
    (no per-partition re-filtering of every block), so a probe reads
    only its lists' files.  Mirrors the segment-store layout discipline:
    tmp+rename files, meta last.
    """
    import json
    import os
    import uuid

    import ray.data  # noqa: F401 — Dataset already imported by caller

    centroids = ivf_train(
        emb_ds, n_lists, sample_mod=sample_mod, iters=iters, seed=seed
    )
    assigned = ivf_assign(emb_ds, centroids)
    lists_dir = os.path.join(index_dir, "lists")
    for lid in range(len(centroids)):
        os.makedirs(os.path.join(lists_dir, f"list_id={lid}"), exist_ok=True)

    def write_block(tbl: pa.Table) -> pa.Table:
        lists = tbl["list_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(lists, kind="stable")
        tbl = tbl.take(order)
        sorted_lists = lists[order]
        bounds = np.searchsorted(
            sorted_lists, np.arange(len(centroids) + 1)
        )
        task_id = uuid.uuid4().hex[:16]
        out_l, out_n = [], []
        for lid in range(len(centroids)):
            lo, hi = int(bounds[lid]), int(bounds[lid + 1])
            if lo == hi:
                continue
            path = os.path.join(
                lists_dir, f"list_id={lid}", f"{task_id}.parquet"
            )
            # driver pre-creates dirs, but a multi-node worker without
            # the shared-FS mkdir visible yet must not fail
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(
                tbl.slice(lo, hi - lo), path + ".tmp",
                compression="zstd", compression_level=1,
            )
            os.replace(path + ".tmp", path)
            out_l.append(lid)
            out_n.append(hi - lo)
        return pa.table(
            {
                "list_id": pa.array(out_l, pa.int32()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    n_vectors = 0
    for b in assigned.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        n_vectors += int(np.sum(b["n"].to_numpy(zero_copy_only=False)))
    cent_tbl = pa.table(
        {
            "list_id": pa.array(
                np.arange(len(centroids), dtype=np.int32)
            ),
            "centroid": pa.array(
                list(centroids), pa.list_(pa.float64())
            ),
        }
    )
    pq.write_table(cent_tbl, os.path.join(index_dir, "centroids.parquet.tmp"))
    os.replace(
        os.path.join(index_dir, "centroids.parquet.tmp"),
        os.path.join(index_dir, "centroids.parquet"),
    )
    meta = {
        "n_lists": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "n_vectors": n_vectors,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    open(os.path.join(index_dir, "_SUCCESS"), "w").close()
    return meta


def ivf_query(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Probe a persisted IVF index (``ivf_build``): nearest ``nprobe``
    centroids per query, read ONLY those lists' files, exact scoring
    in-list, distributed partial top-k + driver heap-merge.  Same output
    schema and determinism as ``ann_topk_ivf``; ``nprobe >= n_lists``
    equals brute force over the indexed vectors."""
    import os

    import ray
    import ray.data as rd

    if not os.path.isfile(os.path.join(index_dir, "_SUCCESS")):
        raise FileNotFoundError(f"no completed IVF index at {index_dir}")
    cent_tbl = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    order = np.argsort(
        cent_tbl["list_id"].to_numpy(zero_copy_only=False)
    )
    centroids = np.stack(
        [
            np.asarray(v, dtype=np.float64)
            for v in cent_tbl["centroid"].to_pylist()
        ]
    )[order]
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q_unit = _unit(queries)
    nprobe = min(nprobe, len(centroids))
    probes = np.argsort(-(q_unit @ centroids.T), axis=1)[:, :nprobe].astype(
        np.int32
    )
    needed = sorted({int(x) for x in probes.ravel()})
    paths = []
    for lid in needed:
        d = os.path.join(index_dir, "lists", f"list_id={lid}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return _merge_topk_empty()
    ds = rd.read_parquet(paths)
    partials = ds.map_batches(
        _IvfProbeScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "query_ref": ray.put(queries),
            "probes_ref": ray.put(probes),
            "k": k,
        },
        concurrency=(1, 4),
        max_restarts=0,  # ctor refs die with the caller — see ann_topk_bruteforce
    )
    return _merge_topk(partials, k)


def _merge_topk_empty() -> pa.Table:
    return pa.table(
        {
            "query_i": pa.array([], pa.int32()),
            "rank": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )


def ann_topk_ivf(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    sample_mod: int = 1,
    seed: int = 13,
) -> pa.Table:
    """Approximate top-k via IVF probe: train -> assign -> score the
    ``nprobe`` nearest lists per query, distributed partial top-k +
    driver heap-merge.  Output schema matches ``ann_topk_bruteforce``;
    ``nprobe >= n_lists`` returns exactly the brute-force result."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    centroids = ivf_train(emb_ds, n_lists, sample_mod=sample_mod, seed=seed)
    assigned = ivf_assign(emb_ds, centroids)
    q_unit = _unit(queries)
    nprobe = min(nprobe, len(centroids))
    probes = np.argsort(-(q_unit @ centroids.T), axis=1)[:, :nprobe].astype(
        np.int32
    )
    partials = assigned.map_batches(
        _IvfProbeScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "query_ref": ray.put(queries),
            "probes_ref": ray.put(probes),
            "k": k,
        },
        concurrency=(1, 4),
        max_restarts=0,  # ctor refs die with the caller — see ann_topk_bruteforce
    )
    return _merge_topk(partials, k)


class _LshBucketer:
    def __init__(self, planes_ref):
        import ray

        self.planes = ray.get(planes_ref)  # (nbits, dim)

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) >= 0  # (n, nbits)
        return bits.dot(1 << np.arange(bits.shape[1], dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _unit(_to_matrix(batch["embedding"]))
        sig = self.signature(mat)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "bucket": pa.array(sig, pa.int64()),
            }
        )


class _LshProbeScorer:
    """Per-batch exact scoring of each query against ITS bucket only;
    partial top-k rows, merged by ``_merge_topk`` — the same distributed
    shape as the brute/IVF scorers (no driver collection of matches)."""

    def __init__(self, q_unit_ref, sigs_ref, k: int):
        import ray

        self.q_unit = ray.get(q_unit_ref)  # (nq, dim) unit rows
        self.sigs = ray.get(sigs_ref)  # (nq,) int64 bucket per query
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        buckets = batch["bucket"].to_numpy(zero_copy_only=False)
        mat = None
        out_q, out_id, out_cos = [], [], []
        for qi in range(len(self.q_unit)):
            mask = buckets == int(self.sigs[qi])
            if not mask.any():
                continue
            if mat is None:
                mat = _unit(_to_matrix(batch["embedding"]))
            sims = mat[mask] @ self.q_unit[qi]
            cids = ids[mask]
            order = np.lexsort((cids, -sims))[: self.k]
            out_q.extend([qi] * len(order))
            out_id.extend(int(cids[j]) for j in order)
            out_cos.extend(float(sims[j]) for j in order)
        return pa.table(
            {
                "query_i": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )


def ann_topk_lsh(
    emb_ds, queries: np.ndarray, k: int = 10, nbits: int = 8, seed: int = 13
) -> pa.Table:
    """Approximate top-k: hyperplane-LSH bucket the corpus, score only the
    buckets the query lands in (exact cosine within bucket), distributed
    partial top-k + driver heap-merge.  Output schema matches
    ``ann_topk_bruteforce``."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    dim = queries.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    planes_ref = ray.put(planes)

    bucketed = emb_ds.map_batches(
        _LshBucketer,
        batch_format="pyarrow",
        fn_constructor_kwargs={"planes_ref": planes_ref},
        concurrency=(1, 4),
        max_restarts=0,  # ctor ref dies with the caller — see ann_topk_bruteforce
    )
    q_unit = _unit(queries)
    q_sigs = ((q_unit @ planes.T) >= 0).dot(1 << np.arange(nbits, dtype=np.int64))
    partials = bucketed.map_batches(
        _LshProbeScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "q_unit_ref": ray.put(q_unit),
            "sigs_ref": ray.put(q_sigs.astype(np.int64)),
            "k": k,
        },
        concurrency=(1, 4),
        max_restarts=0,  # ctor refs die with the caller — see ann_topk_bruteforce
    )
    return _merge_topk(partials, k)


def _qmean_empty(key_name: str, key_type) -> pa.Table:
    """Schema-stable empty partial (an empty upstream block must not
    crash ``_to_matrix``'s ``np.stack`` or change the exchange schema)."""
    return pa.table(
        {
            key_name: pa.array([], key_type),
            "dim": pa.array([], pa.int64()),
            "s_p": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
        }
    )


def _qmean_partial(
    keys: np.ndarray, mat: np.ndarray, scale: int, key_name: str, key_type
) -> pa.Table:
    """Per-block floor-quantized integer sum per (key, dim) — the ONE
    home of the exactness-critical quantized-mean partial (used by both
    label_centroids and kmeans_step; a fix here fixes both)."""
    qi = np.floor(mat * scale).astype(np.int64)
    uk, inv = np.unique(keys, return_inverse=True)
    dim = qi.shape[1]
    sums = np.zeros((len(uk), dim), np.int64)
    np.add.at(sums, inv, qi)
    n_rows = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    return pa.table(
        {
            key_name: pa.array(np.repeat(uk, dim), key_type),
            "dim": pa.array(
                np.tile(np.arange(dim, dtype=np.int64), len(uk)), pa.int64()
            ),
            "s_p": pa.array(sums.ravel(), pa.int64()),
            "n_p": pa.array(np.repeat(n_rows, dim), pa.int64()),
        }
    )


def _qmean_finalize(
    batch: pa.Table, scale: int, key_name: str, key_type=None
) -> pa.Table:
    import pyarrow.compute as pc

    s = batch["sum(s_p)"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = batch["sum(n_p)"].to_numpy(zero_copy_only=False)
    mean = (s / float(scale)) / n
    return pa.table(
        {
            # Ray's groupby upcasts narrow int keys; restore the input
            # column's type so the schema round-trips
            key_name: pc.cast(batch[key_name], key_type)
            if key_type is not None
            else batch[key_name],
            "dim": batch["dim"],
            "n": pa.array(n, pa.int64()),
            "centroid": pa.array(_round6_arr(mean), pa.float64()),
        }
    )


def label_centroids(
    emb_ds,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
):
    """Exact per-label centroid of the embedding column — the
    class-prototype / cluster-summary primitive (and the reduce step of
    a distributed k-means iteration).

    Elements are quantized to integers first (``floor(x * scale)`` —
    floor, not round: round-half ties would diverge between numpy's
    half-even and SQL's half-away), so the per-dimension sums are EXACT
    integer arithmetic: parallelism- and order-invariant, and
    SQL-replicable bit-for-bit.  Per-block partials carry one row per
    (label, dim) — the exchange is O(labels x dim), never O(rows).

    Output: ``(label, dim, n, centroid)`` where
    ``centroid = (sum / scale) / n`` rounded to 6dp.
    """

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _qmean_empty(label_col, batch[label_col].type)
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        mat = _to_matrix(batch[vec_col])  # (n, dim) float64
        return _qmean_partial(
            labels, mat, scale, label_col, batch[label_col].type
        )

    def finalize(batch: pa.Table, label_type=None) -> pa.Table:
        return _qmean_finalize(batch, scale, label_col, label_type)

    try:  # pandas-block datasets have no Arrow base schema; skip the pin
        label_type = emb_ds.schema().base_schema.field(label_col).type
    except AttributeError:
        label_type = None
    return bucketed_group_agg(
        emb_ds.select_columns([label_col, vec_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        [label_col, "dim"],
        [("s_p", "sum"), ("n_p", "sum")],
    ).map_batches(lambda b: finalize(b, label_type), batch_format="pyarrow")




def kmeans_step(
    emb_ds,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
):
    """ONE distributed Lloyd iteration (spherical k-means): assign every
    vector to its best centroid by 6dp-rounded cosine (smaller centroid
    id breaks ties — `np.argmax` keeps the first maximum, which is the
    SQL `ORDER BY cos DESC, cid` winner), then update each centroid as
    the floor-quantized EXACT integer mean of its members (the
    label_centroids kernel keyed by assignment).

    Both halves are deterministic at any parallelism: the assignment
    compares 6dp-rounded scores and the update is integer arithmetic —
    which is what makes the full iterated fit (``kmeans_fit``) exactly
    reproducible, and this single step SQL-oracle-able.

    The centroid matrix broadcasts once via ``ray.put``; the exchange
    carries O(k × dim) partial-sum rows per block.  Empty clusters drop
    from the output (callers keep the previous centroid if they need
    k stable).  Output: ``(cid, dim, n, centroid)``.
    """
    import ray

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _qmean_empty("cid", pa.int64())
        cents = ray.get(cents_ref)
        mat = _to_matrix(batch[vec_col])
        r = _round6_arr(_cosine(mat, cents))
        cid = np.argmax(r, axis=1).astype(np.int64)
        return _qmean_partial(cid, mat, scale, "cid", pa.int64())

    def finalize(batch: pa.Table) -> pa.Table:
        return _qmean_finalize(batch, scale, "cid")

    return bucketed_group_agg(
        emb_ds.select_columns([vec_col]).map_batches(
            assign_partial, batch_format="pyarrow"
        ),
        ["cid", "dim"],
        [("s_p", "sum"), ("n_p", "sum")],
    ).map_batches(finalize, batch_format="pyarrow")


def kmeans_fit(
    emb_ds,
    init_centroids: np.ndarray,
    *,
    iters: int,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
):
    """Iterated distributed Lloyd: run ``kmeans_step`` ``iters`` times,
    feeding each step's 6dp means back as the next centroids.  Every
    step is deterministic (rounded-score assignment + integer-mean
    update), so the whole fit replays bit-for-bit at any parallelism —
    pytest mirrors it with a pure-numpy driver loop and asserts exact
    equality.  An empty cluster keeps its previous centroid (so k never
    shrinks mid-fit).  Returns the final (k, dim) centroid matrix.
    """
    cents = np.asarray(init_centroids, dtype=np.float64).copy()
    # pin the (projected) input once: without this every Lloyd iteration
    # re-executes the whole upstream lineage (parquet scan + list decode)
    emb_ds = emb_ds.select_columns([vec_col]).materialize()
    for _ in range(iters):
        out = (
            kmeans_step(emb_ds, cents, vec_col=vec_col, scale=scale)
            .to_pandas()
            .sort_values(["cid", "dim"])
        )
        for cid, sub in out.groupby("cid"):
            cents[int(cid)] = sub["centroid"].to_numpy()
    return cents


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al. 2023, arXiv:2303.09540)
# ---------------------------------------------------------------------------

SEMDEDUP_SEED = 41


def semdedup_centroids(k: int, dim: int, seed: int = SEMDEDUP_SEED) -> np.ndarray:
    """Fixed seeded unit centroids — a deterministic partition of the
    sphere.  SemDeDup's correctness contract needs *a* partition (the
    quadratic work is bounded per cluster whatever the centroids are);
    callers wanting data-adapted clusters pass ``kmeans_fit`` output
    instead — ``semdedup_pairs`` takes any centroid matrix."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def semdedup_pairs(
    emb_ds,
    centroids: np.ndarray,
    *,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Semantic near-dup pairs, clustered form: assign every vector to
    its max-cosine centroid (6dp-rounded, ties -> smaller cid — the
    kmeans_step convention), then compare pairs ONLY within a cluster.

    This is the SemDeDup shape: the O(n²) cosine comparison of the
    brute-force near-dup collapses to Σ_c O(n_c²) — with k clusters of
    a 100-TB corpus the per-cluster work is (n/k)² and each cluster is
    an independent ``map_groups`` task; no global pairwise pass exists
    anywhere.  The centroid matrix broadcasts once (``ray.put``); the
    only exchange is the groupby(cid) co-partition of (id, vector).

    Output (cid, a, b, cos), a < b, round6(cos) >= tau — deterministic
    at any parallelism and SQL-replicable given the centroid literals.
    Near-dups straddling a cluster boundary are missed by design (the
    paper's recall/cost trade); the exact fallback is
    ``dedup.embedding_neardup_pairs``."""
    import ray

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cid": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch[vec_col],
                }
            )
        cents = ray.get(cents_ref)
        mat = _to_matrix(batch[vec_col])
        r = _round6_arr(_cosine(mat, cents))
        cid = np.argmax(r, axis=1).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(cid, pa.int64()),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {
                    "cid": pa.array([], pa.int64()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _to_matrix(group[vec_col])[order]
        sims = _round6_arr(_cosine(mat, mat))
        ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
        cid = group["cid"][0].as_py() if group.num_rows else 0
        return pa.table(
            {
                "cid": pa.array(np.full(len(ii), cid), pa.int64()),
                "a": pa.array(ids[ii].astype(np.int64), pa.int64()),
                "b": pa.array(ids[jj].astype(np.int64), pa.int64()),
                "cos": pa.array(sims[ii, jj], pa.float64()),
            }
        )

    return (
        emb_ds.select_columns([id_col, vec_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cid")
        .map_groups(pairs, batch_format="pyarrow")
    )


def semdedup_dropped(pairs_tbl: pa.Table) -> pa.Table:
    """Keep-smallest-id rule over the pair table: every id appearing as
    ``b`` is dropped; survivors are the corpus minus these."""
    dropped = pc.unique(pairs_tbl["b"])
    return pa.table({"vec_id": dropped.take(pc.array_sort_indices(dropped))})


# ---------------------------------------------------------------------------
# Product quantization ANN (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — inner-product/ADC variant on unit vectors
# ---------------------------------------------------------------------------

PQ_SEED = 17


def pq_train(
    emb_ds,
    *,
    m_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample_mod: int = 1,
    seed: int = PQ_SEED,
) -> np.ndarray:
    """Per-subspace k-means codebooks over a deterministic sample.

    Vectors are unit-normalized and split into ``m_subspaces`` equal
    slices; each slice gets its own ``n_codes``-centroid Lloyd fit
    (driver numpy over the ``vec_id % sample_mod == 0`` sample — size
    the mod so the sample stays ~1e5-1e6 rows at 100 TB; training never
    touches the full corpus, mirroring ``ivf_train``).  Returns
    ``(m_subspaces, n_codes, dim // m_subspaces)`` float64."""
    sample = _sorted_unit_sample(emb_ds, sample_mod)
    dim = sample.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    dsub = dim // m_subspaces
    n_codes = min(n_codes, len(sample))
    rng = np.random.default_rng(seed)
    books = np.empty((m_subspaces, n_codes, dsub))
    for m in range(m_subspaces):
        sub = sample[:, m * dsub : (m + 1) * dsub]
        cents = sub[rng.choice(len(sub), size=n_codes, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[m] = cents
    return books


class _PqEncoder:
    """Adds ``code`` (list<uint8>, one code per subspace, nearest-L2
    codeword of the unit vector's slice).  Codebooks fetched once per
    actor."""

    def __init__(self, books_ref):
        import ray

        self.books = ray.get(books_ref)  # (m, n_codes, dsub)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "code": pa.array([], pa.list_(pa.uint8())),
                }
            )
        mat = _unit(_to_matrix(batch["embedding"]))
        m, n_codes, dsub = self.books.shape
        codes = np.empty((batch.num_rows, m), np.uint8)
        for i in range(m):
            sub = mat[:, i * dsub : (i + 1) * dsub]
            # argmin ||x-c||² == argmax (x·c − ½||c||²)
            scores = sub @ self.books[i].T - 0.5 * (self.books[i] ** 2).sum(
                axis=1
            )
            codes[:, i] = np.argmax(scores, axis=1).astype(np.uint8)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "code": pa.array(list(codes), pa.list_(pa.uint8())),
            }
        )


def pq_encode(emb_ds, books: np.ndarray):
    """Corpus → (vec_id, code) — m bytes per vector instead of dim
    floats (32x smaller at dim=64/m=8/float32), the PQ memory story."""
    import ray

    return emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        _PqEncoder,
        batch_format="pyarrow",
        fn_constructor_kwargs={"books_ref": ray.put(books)},
        concurrency=(1, 4),
        max_restarts=0,  # ctor ref dies with the caller — see ann_topk_bruteforce
    )


class _PqAdcScorer:
    """ADC partial top-k per block: the query's per-subspace
    inner-product lookup table is built once per actor (m × n_codes);
    each block's approx score is a table gather + sum — no float
    vectors are ever read."""

    def __init__(self, luts_ref, k: int):
        import ray

        self.luts = ray.get(luts_ref)  # (n_q, m, n_codes)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_i": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        codes = np.stack(
            [np.asarray(c, np.int64) for c in batch["code"].to_pylist()]
        )  # (n, m)
        n, m = codes.shape
        qs, ranks, vids, sims = [], [], [], []
        ar = np.arange(m)
        for qi, lut in enumerate(self.luts):
            approx = lut[ar, codes].sum(axis=1)  # (n,)
            k = min(self.k, n)
            part = np.argpartition(-approx, k - 1)[:k]
            qs.append(np.full(k, qi, np.int32))
            vids.append(ids[part].astype(np.int64))
            sims.append(approx[part])
        return pa.table(
            {
                "query_i": pa.array(np.concatenate(qs), pa.int32()),
                "vec_id": pa.array(np.concatenate(vids), pa.int64()),
                "cos": pa.array(np.concatenate(sims), pa.float64()),
            }
        )


def ann_topk_pq(code_ds, books: np.ndarray, queries: np.ndarray, k: int = 10):
    """Approximate top-k by asymmetric distance computation over the
    PQ-encoded corpus (``pq_encode`` output).  Approx score =
    Σ_m <q_m, codeword_m> ≈ cos(q, x) for unit vectors; output schema
    matches ``ann_topk_bruteforce`` (the ``cos`` column carries the
    APPROX score).  Broadcast state: (n_q × m × n_codes) lookup tables
    — independent of corpus size."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q_unit = _unit(queries)
    m, n_codes, dsub = books.shape
    luts = np.empty((len(q_unit), m, n_codes))
    for i in range(m):
        luts[:, i, :] = q_unit[:, i * dsub : (i + 1) * dsub] @ books[i].T

    partials = code_ds.map_batches(
        _PqAdcScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={"luts_ref": ray.put(luts), "k": k},
        concurrency=(1, 4),
        max_restarts=0,  # ctor ref dies with the caller — see ann_topk_bruteforce
    )
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# Random projection (Johnson–Lindenstrauss dimensionality reduction)
# ---------------------------------------------------------------------------

RP_SEED = 29
RP_SCALE = 1_000_000  # per-term floor quantization (oracle-parity trick)


def projection_matrix(dim: int, out_dim: int, seed: int = RP_SEED) -> np.ndarray:
    """Seeded Gaussian JL projection, scaled 1/sqrt(out_dim) so expected
    pairwise distances are preserved."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, out_dim)) / np.sqrt(out_dim)


def random_projection(
    emb_ds,
    proj: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Project every embedding to ``out_dim`` dims: one shuffle-free
    ``map_batches`` pass, projection matrix broadcast once (``ray.put``).

    Each output coordinate is the INTEGER sum of per-term floor-quantized
    products (``floor(x_d * w_do * SCALE)`` — the label_centroids /
    kmeans exactness trick), so the result is bit-identical at any
    parallelism or summation order and SQL-replicable term-for-term.
    Output: (id, dim, y) long form — y rounded to 6dp."""
    import ray

    from .textstats import round6_arr

    proj_ref = ray.put(np.asarray(proj, dtype=np.float64))

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "y": pa.array([], pa.float64()),
                }
            )
        p = ray.get(proj_ref)  # (dim, out_dim)
        mat = _to_matrix(batch[vec_col])  # (n, dim)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # per-term quantized products: floor((x_d * w_do) * SCALE)
        terms = np.floor(
            (mat[:, :, None] * p[None, :, :]) * RP_SCALE
        ).astype(np.int64)
        ysum = terms.sum(axis=1)  # (n, out_dim) integer
        y = round6_arr(ysum / float(RP_SCALE))
        out_dim = p.shape[1]
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, out_dim), pa.int64()),
                "dim": pa.array(
                    np.tile(np.arange(out_dim, dtype=np.int64), len(ids)),
                    pa.int64(),
                ),
                "y": pa.array(y.ravel(), pa.float64()),
            }
        )

    return emb_ds.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow"
    )
