"""Merge two independently built indexes into one — shard-parallel builds.

The reference engine has no index-merge at all: its only multi-corpus
story is re-running the SQLite indexer, whose rerun semantics duplicate
every posting row (``Indexer/SQLiteSearcher.java:100-337``).  This module
adds the Lucene-style alternative build topology the north rule's scale
demands: split a 10^12-file corpus into shards, build each shard's index
with ZERO cross-shard traffic (each ``build_index`` shuffles only within
its shard), then ``merge_indexes`` combines the finished indexes WITHOUT
re-tokenizing anything — the expensive stage runs exactly once per doc,
wherever the doc was first indexed.

Why the merged index is *identical* (doc ids included) to a unified
build over the concatenated corpus (tests/test_merge.py):

* ``doc_id`` is a pure function of the UNION key set
  (``doc_table.assign_ids_driver``: khash -> unique-sorted rank within
  ``hash % num_id_partitions``), so re-running the assignment over
  A.keys + B.keys reproduces the unified ids exactly;
* dedup is re-run with the same rule (``compute_drops``) on the merged
  docs table, so key-dup / content-dup winners match;
* per-term posting merge is a re-sort: chunk rows decode to postings
  (position payloads stay varbyte-encoded — memcpy re-grouping, see
  ``extend._chunk_rows_to_postings``), doc ids remap through the
  old->new arrays, losers' postings drop, and
  ``build_partition_chunks`` re-sorts by (term, doc_id) — the same
  function the unified build ran;
* df recounts from the merged postings and idf uses the union N.

Cross-shard duplicate semantics (matching the unified build):

* same content, different keys (content-dup): the minimum NEW doc_id
  wins; the loser's postings are dropped via the merged drops table;
* same keys (khash), different content (key-dup): both rows share ONE
  doc_id; the union winner is the min-sha row; the losing SIDE's
  postings are dropped by a per-side keep flag (the drop can't key on
  doc_id — winner and loser share it);
* same keys AND same content in both shards: BOTH sides' postings drop
  — the unified build's (doc_id, sha) pair-mask masks every repeat of
  the pair, winner included, so the doc serves from neither index;
  the merge reproduces that quirk bit-for-bit rather than "fixing" it.

Scale shape: the heavy stage — per-partition decode/remap/re-encode —
is one local task per term partition (same unit as the build; no
object-store all-to-all).  The old->new id maps are 24 B per doc,
``ray.put`` once and shared per node; at 10^9 docs that is ~24 GB of
object store per node — the same broadcast ceiling as the serving
sidecars before sharding.  Past it, the remap becomes a doc-bucketed
exchange: decode postings to (old_pid-bucketed) rows, co-partition with
the id map on ``old_pid`` (the high doc_id bits), remap per bucket and
shuffle back to term partitions — machinery identical to
``extras/stats.bucketed_group_agg``; not wired because the sandbox
cannot exercise it honestly.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import DOC_ID_PARTITION_SHIFT, IndexConfig

# config knobs that must agree between the two sides for the merged
# partitions / scoring to be well-defined (term routing, chunk geometry,
# id space); serving/scoring knobs may differ — the merge writes A's.
_COMPAT_KEYS = (
    "num_term_partitions",
    "num_id_partitions",
    "postings_per_chunk",
    "store_positions",
    "max_phrase_gap",
)


def _docs_files(index_dir: str) -> list[str]:
    d = os.path.join(index_dir, "docs")
    return [
        os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]


def _side_key_table(index_dir: str, key_cols: list[str]):
    """Per unique khash of one side: (khash, old doc_id, indexed sha).

    The indexed sha is the MIN sha within the side's khash group — the
    side's key-dup winner, i.e. the content that side actually
    tokenized (``compute_drops`` rule 1).
    """
    from .doc_table import key_hashes

    tbl = pq.read_table(
        _docs_files(index_dir), columns=key_cols + ["doc_id", "content_sha256"]
    )
    kh = key_hashes(tbl, key_cols)
    old = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sha = np.asarray(tbl["content_sha256"].to_pylist(), dtype=object)
    # first row per khash in (khash asc, sha asc) order
    order = np.argsort(sha, kind="stable")
    order = order[np.argsort(kh[order], kind="stable")]
    kh, old, sha = kh[order], old[order], sha[order]
    first = np.ones(len(kh), bool)
    first[1:] = kh[1:] != kh[:-1]
    return kh[first], old[first], sha[first]


def _union_ids(kh_a, kh_b, num_id_partitions: int):
    """Unified-build id assignment over the union khash set — the same
    math as ``doc_table.assign_ids_driver`` (khash -> unique sorted ->
    rank within pid)."""
    kh = np.unique(np.concatenate([kh_a, kh_b]))
    pids = (kh % num_id_partitions).astype(np.int64)
    ids = np.empty(len(kh), dtype=np.int64)
    for p in np.unique(pids):
        mask = pids == p
        ids[mask] = (np.int64(p) << DOC_ID_PARTITION_SHIFT) + np.arange(
            mask.sum(), dtype=np.int64
        )
    return kh, ids


def _build_remaps(index_a: str, index_b: str, key_cols, num_id_partitions):
    """Per-side (old_id_sorted, new_id, keep) arrays + the union
    (khash_sorted, new_id) map for the docs rewrite."""
    kh_a, old_a, sha_a = _side_key_table(index_a, key_cols)
    kh_b, old_b, sha_b = _side_key_table(index_b, key_cols)
    if not len(kh_a) or not len(kh_b):
        raise ValueError("merge_indexes requires two non-empty indexes")
    kh_u, new_u = _union_ids(kh_a, kh_b, num_id_partitions)

    new_a = new_u[np.searchsorted(kh_u, kh_a)]
    new_b = new_u[np.searchsorted(kh_u, kh_b)]

    # cross-shard key-dup rule, matching the unified DropFilter exactly:
    # a side keeps its postings only when its indexed sha is STRICTLY
    # smaller than the other side's.  Equal shas (the identical-row-in-
    # both-shards case) drop BOTH — the unified build's (doc_id, sha)
    # pair-mask masks winner and loser alike when the pair repeats, so
    # the doc serves from neither index (DropFilter.keep_mask).
    pos_ab = np.searchsorted(kh_a, kh_b)
    in_a = (pos_ab < len(kh_a)) & (kh_a[np.minimum(pos_ab, len(kh_a) - 1)] == kh_b)
    pos_ba = np.searchsorted(kh_b, kh_a)
    in_b = (pos_ba < len(kh_b)) & (kh_b[np.minimum(pos_ba, len(kh_b) - 1)] == kh_a)
    keep_a = np.ones(len(kh_a), bool)
    bidx = np.flatnonzero(in_b)
    if len(bidx):
        keep_a[bidx] = sha_a[bidx] < sha_b[pos_ba[bidx]]
    keep_b = np.ones(len(kh_b), bool)
    aidx = np.flatnonzero(in_a)
    if len(aidx):
        keep_b[aidx] = sha_b[aidx] < sha_a[pos_ab[aidx]]

    def _by_old(old, new, keep):
        order = np.argsort(old)
        return old[order], new[order], keep[order]

    return (
        _by_old(old_a, new_a, keep_a),
        _by_old(old_b, new_b, keep_b),
        (kh_u, new_u),
    )


def _remap_filter(postings: pa.Table, remap, drop_new: np.ndarray) -> pa.Table:
    """Apply one side's (old->new, keep) map and the union content-dup
    drop set to a decoded postings table."""
    old_sorted, new_ids, keep = remap
    ids = postings["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(old_sorted, ids)
    if len(ids) and (
        pos.max(initial=0) >= len(old_sorted)
        or not np.array_equal(old_sorted[pos], ids)
    ):
        raise RuntimeError(
            "posting doc_id absent from the side's docs table — "
            "index and docs/ are out of sync"
        )
    new = new_ids[pos]
    mask = keep[pos]
    if len(drop_new):
        dpos = np.searchsorted(drop_new, new)
        in_drop = (dpos < len(drop_new)) & (
            drop_new[np.minimum(dpos, len(drop_new) - 1)] == new
        )
        mask &= ~in_drop
    idx = postings.schema.get_field_index("doc_id")
    out = postings.set_column(idx, "doc_id", pa.array(new, pa.int64()))
    return out.filter(pa.array(mask))


def _merge_partition(
    part: int,
    seg_a: str,
    seg_b: str,
    out_seg: str,
    out_stats: str,
    remap_a,
    remap_b,
    drop_new: np.ndarray,
    postings_per_chunk: int,
    n_docs: int,
) -> pa.Table:
    """One local task: decode both sides' partition-K files (base +
    deltas), remap/filter, re-chunk, write segment + stats, return the
    manifest row.  No shuffle — partition K's bytes never leave the
    task."""
    from .extend import _chunk_rows_to_postings, partition_files
    from .postings import CHUNK_SCHEMA, build_partition_chunks
    from .segments import (
        STATS_SCHEMA,
        _atomic_write,
        _sha256_file,
        _write_stats_partition,
        manifest_row_table,
        partition_file,
        write_empty_segment,
    )

    t0 = time.monotonic()
    parts = []
    for seg_dir, remap in ((seg_a, remap_a), (seg_b, remap_b)):
        files = partition_files(seg_dir, part)
        if not files:
            continue
        rows = pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="default"
        )
        if rows.num_rows == 0:
            continue
        postings = _chunk_rows_to_postings(rows, part)
        parts.append(_remap_filter(postings, remap, drop_new))
    merged = (
        pa.concat_tables(parts, promote_options="default") if parts else None
    )
    if merged is None or merged.num_rows == 0:
        _write_stats_partition(out_stats, part, STATS_SCHEMA.empty_table())
        row = write_empty_segment(out_seg, part)
        return manifest_row_table(
            part=row["partition"],
            path=row["path"],
            n_chunks=0,
            n_terms=0,
            n_postings=0,
            file_sha256=row["file_sha256"],
            duration_s=time.monotonic() - t0,
        )
    chunks = build_partition_chunks(merged, postings_per_chunk)
    chunks = chunks.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
    seg_path = partition_file(out_seg, part)
    _atomic_write(chunks, seg_path)

    agg = (
        merged.select(["term"]).group_by("term").aggregate([("term", "count")])
    )
    agg = agg.sort_by("term")
    df = pc.cast(agg["term_count"], pa.int64())
    idf = pc.log10(pc.divide(float(n_docs), pc.cast(df, pa.float64())))
    stats = pa.table(
        {
            "term": agg["term"],
            "df": df,
            "idf": idf,
            "n_salts": pa.array(
                np.ones(agg.num_rows, dtype=np.int32), pa.int32()
            ),
        },
        schema=STATS_SCHEMA,
    )
    _write_stats_partition(out_stats, part, stats)
    return manifest_row_table(
        part=part,
        path=seg_path,
        n_chunks=chunks.num_rows,
        n_terms=agg.num_rows,
        n_postings=merged.num_rows,
        file_sha256=_sha256_file(seg_path),
        duration_s=time.monotonic() - t0,
    )


def _merged_doclen(index_a, index_b, out_dir, remap_a, remap_b, drop_new):
    """Remap + filter both sides' doclen sidecars, then re-shard."""
    from ..query.sidecar import _read_raw, compact_sidecar_shards

    out_dl = os.path.join(out_dir, "doclen")
    parts = []
    for side_dir, remap in (
        (os.path.join(index_a, "doclen"), remap_a),
        (os.path.join(index_b, "doclen"), remap_b),
    ):
        if not os.path.isdir(side_dir):
            continue
        ids, vals = _read_raw(side_dir, "dl")
        if not len(ids):
            continue
        tbl = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "dl": pa.array(vals)}
        )
        parts.append(_remap_filter(tbl, remap, drop_new))
    if not parts:
        return False
    os.makedirs(out_dl, exist_ok=True)
    merged = pa.concat_tables(parts, promote_options="default")
    tmp = os.path.join(out_dl, "merged-00000.parquet.tmp")
    pq.write_table(merged, tmp)
    os.replace(tmp, tmp[: -len(".tmp")])
    compact_sidecar_shards(out_dl, "dl")
    return True


def merge_indexes(
    index_a: str,
    index_b: str,
    out_dir: str,
    *,
    key_cols: list[str] | None = None,
    links_path: str | None = None,
    links_ds=None,
    resume: bool = True,
) -> dict:
    """Merge finished indexes ``index_a`` + ``index_b`` into ``out_dir``.

    Identical output to ``build_index`` over the concatenated corpora
    (doc ids, docs table, drops, term stats, query results —
    tests/test_merge.py), without re-tokenizing a single document.
    PageRank is recomputed over the union graph when ``links_path`` /
    ``links_ds`` is given (subgraph ranks are not mergeable), else the
    merged index serves with rank 0.0 — the reference's own column
    default for unranked docs.
    """
    import ray
    import ray.data as rd

    from ..build import (
        _done,
        _mark,
        _parquet_count,
        drops_file,
        load_meta,
    )
    from .doc_table import compute_drops, key_hashes
    from .segments import read_manifest, write_manifest

    key_cols = key_cols or ["repo", "path", "commit"]
    meta_a, meta_b = load_meta(index_a), load_meta(index_b)
    cfg_a = IndexConfig.from_dict(meta_a["config"])
    cfg_b = IndexConfig.from_dict(meta_b["config"])
    for k in _COMPAT_KEYS:
        va, vb = getattr(cfg_a, k), getattr(cfg_b, k)
        if va != vb:
            raise ValueError(
                f"merge requires equal {k} (a={va!r}, b={vb!r}); "
                "rebuild one side or extend instead"
            )
    for side in (index_a, index_b):
        if os.path.exists(os.path.join(side, "_extend_pending.json")):
            raise RuntimeError(
                f"{side} has an incomplete extension; re-run extend "
                "(which rolls it back) before merging"
            )
    cfg = cfg_a
    if not resume and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {"stages": {}}
    t_all = time.monotonic()

    # -- id remaps (driver numpy; see module docstring for the >10^9
    # doc-bucketed exchange this becomes on a real cluster) -------------
    t0 = time.monotonic()
    remap_a, remap_b, (kh_u, new_u) = _build_remaps(
        index_a, index_b, key_cols, cfg.num_id_partitions
    )
    metrics["stages"]["id_remap"] = {
        "seconds": time.monotonic() - t0,
        "n_keys_union": int(len(kh_u)),
    }

    # -- docs: rewrite both sides' rows under the union ids -------------
    docs_dir = os.path.join(out_dir, "docs")
    t0 = time.monotonic()
    if not (resume and _done(docs_dir)):
        map_ref = ray.put((kh_u, new_u))

        def reattach(batch: pa.Table) -> pa.Table:
            # ray.get of a put ref is cached per worker — the union map
            # ships once per node, not per batch
            kh_map, id_map = ray.get(map_ref)
            kh = key_hashes(batch, key_cols)
            pos = np.searchsorted(kh_map, kh)
            batch = batch.drop_columns(["doc_id"])
            order = [
                c
                for c in batch.column_names
                if c not in ("content_sha256", "title", "url")
            ]
            batch = batch.select(order + ["content_sha256", "title", "url"])
            sha_i = batch.schema.get_field_index("content_sha256")
            batch = batch.add_column(
                sha_i,
                "doc_id",
                pa.array(id_map[pos], pa.int64()),
            )
            return batch.take(pc.sort_indices(batch["doc_id"]))

        src = rd.read_parquet(_docs_files(index_a) + _docs_files(index_b))
        src.map_batches(
            reattach, batch_format="pyarrow", batch_size=None
        ).write_parquet(
            docs_dir,
            mode="overwrite",
            compression="zstd",
            row_group_size=2048,
        )
        _mark(docs_dir)
    metrics["stages"]["doc_table"] = {"seconds": time.monotonic() - t0}

    # -- drops: the unified rule re-run on the merged docs ---------------
    drops_dir = os.path.join(out_dir, "drops")
    t0 = time.monotonic()
    if not (resume and _done(drops_dir)):
        drops = compute_drops(docs_dir)
        os.makedirs(drops_dir, exist_ok=True)
        tmp = drops_file(out_dir) + ".tmp"
        pq.write_table(drops, tmp)
        os.replace(tmp, drops_file(out_dir))
        _mark(drops_dir)
    drops_tbl = pq.read_table(drops_file(out_dir))
    content_mask = pc.equal(drops_tbl["reason"], "content_dup")
    drop_new = np.sort(
        drops_tbl.filter(content_mask)["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_docs = _parquet_count(docs_dir) - drops_tbl.num_rows
    metrics["stages"]["dedup"] = {
        "seconds": time.monotonic() - t0,
        "n_dropped": int(drops_tbl.num_rows),
    }

    # -- doclen sidecar ---------------------------------------------------
    doclen_dir = os.path.join(out_dir, "doclen")
    t0 = time.monotonic()
    if not (resume and _done(doclen_dir)):
        if _merged_doclen(
            index_a, index_b, out_dir, remap_a, remap_b, drop_new
        ):
            _mark(doclen_dir)
    metrics["stages"]["doclen"] = {"seconds": time.monotonic() - t0}

    # -- segments + stats: one local task per term partition --------------
    seg_dir = os.path.join(out_dir, "segments")
    stats_dir = os.path.join(out_dir, "term_stats")
    t0 = time.monotonic()
    from .segments import completed_partitions

    done = completed_partitions(out_dir, require_stats=True) if resume else set()
    missing = sorted(set(range(cfg.num_term_partitions)) - done)
    if missing:
        os.makedirs(seg_dir, exist_ok=True)
        os.makedirs(stats_dir, exist_ok=True)
        remap_a_ref = ray.put(remap_a)
        remap_b_ref = ray.put(remap_b)
        drop_ref = ray.put(drop_new)
        seg_a = os.path.join(index_a, "segments")
        seg_b = os.path.join(index_b, "segments")
        ppc = cfg.postings_per_chunk

        def run_parts(batch: pa.Table) -> pa.Table:
            ra = ray.get(remap_a_ref)
            rb = ray.get(remap_b_ref)
            dn = ray.get(drop_ref)
            rows = [
                _merge_partition(
                    int(p), seg_a, seg_b, seg_dir, stats_dir, ra, rb, dn,
                    ppc, n_docs,
                )
                for p in batch["part"].to_pylist()
            ]
            return pa.concat_tables(rows)

        parts_ds = rd.from_items(
            [{"part": int(p)} for p in missing],
            override_num_blocks=len(missing),
        )
        updates = parts_ds.map_batches(
            run_parts, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        rows = read_manifest(out_dir)
        for _, r in updates.iterrows():
            rows[int(r["partition"])] = {
                k: (v.item() if hasattr(v, "item") else v)
                for k, v in r.items()
            }
        write_manifest(out_dir, rows)
    metrics["stages"]["segments"] = {
        "seconds": time.monotonic() - t0,
        "partitions_built": len(missing),
        "partitions_skipped": len(done),
    }

    # -- meta (written before pagerank so refresh_pagerank can load it) ---
    meta = {
        "n_docs": int(n_docs),
        "config": cfg.to_dict(),
        "version": 2,
        "has_pagerank": False,
        "merged_from": [os.path.abspath(index_a), os.path.abspath(index_b)],
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)

    # -- pagerank over the union graph (optional) --------------------------
    t0 = time.monotonic()
    if links_path is not None or links_ds is not None:
        from ..build import _compute_and_write_pagerank

        _compute_and_write_pagerank(out_dir, cfg, n_docs, links_path, links_ds)
        meta["has_pagerank"] = True
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
    metrics["stages"]["pagerank"] = {"seconds": time.monotonic() - t0}

    metrics["total_seconds"] = time.monotonic() - t_all
    metrics["n_docs"] = int(n_docs)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    return metrics
