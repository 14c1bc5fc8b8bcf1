"""End-to-end index build orchestration (SURVEY.md §3.3 rebuild lifecycle,
§7.2 build order).

``build_index`` is the ``ray job submit`` driver body: each stage writes
its output under ``index_dir`` with a ``_SUCCESS`` marker, records metrics
in ``metrics.json``, and is skipped on resume when already complete.  The
segment stage additionally checkpoints per term-partition via
``manifest.jsonl`` (stages/segments.py), so a build killed mid-shuffle
resumes by rebuilding only the missing partitions.  A config checkpoint
(``config.json``) is validated on resume: partition-affecting knobs may
not change across a resume (they would silently mis-route lookups).

Content is touched exactly ONCE end-to-end (v2 layout):

    pass 0   key columns only          -> khash -> dense doc_id map
    pass 1   THE full corpus read      -> docs/ (sha + ids + title/url,
                                          doc_id-sorted row groups)
    pass 2   narrow (doc_id,sha) read  -> drops/ (dedup losers)
    pass 3   docs/ (doc_id,content)    -> postings/term_part=K/ hive write
                                          (write-side shuffle)
    pass 4   per-partition local read  -> segments/ + term_stats/ fused

Duplicate rows stay physically in docs/ masked by drops/ — storage cost
is the duplicate fraction; the win is a full corpus decode + sha pass.

No function here calls ``ray.init``; the caller owns the session
(driver contract in ``__ray_entry__.py``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from .config import IndexConfig
from .stages.doc_table import (
    DropFilter,
    DROPS_SCHEMA,
    attach_documents,
)
from .stages.postings import (
    add_partition_keys,
    compute_term_stats,
    hot_terms_from_parquet,
)
from .stages.segments import (
    build_partition_fused,
    completed_partitions,
    partition_file,
    read_manifest,
    write_empty_segment,
    write_manifest,
    write_segment_partition,
)
from .stages.tokenize import tokenize_documents


def _success(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def _done(path: str) -> bool:
    return os.path.exists(_success(path))


def _mark(path: str) -> None:
    with open(_success(path), "w") as f:
        f.write("")


def _read(path: str, columns: list[str] | None = None, blocks: int | None = None):
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if blocks is not None:
        kwargs["override_num_blocks"] = blocks
    return rd.read_parquet(path, **kwargs)


def _parquet_count(path: str) -> int:
    """Row count from parquet footers — no Ray execution needed."""
    if os.path.isfile(path):
        return pq.read_metadata(path).num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def _ncpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def _target_blocks() -> int:
    """Block-count target for shuffle inputs.  Ray's sort-based shuffle
    materializes ~(#map blocks x #reduce partitions) objects and defaults
    reduce partitions to the input block count, so feeding a groupby
    hundreds of 1-MB blocks is quadratic overhead; 4 blocks per CPU keeps
    both sides linear while leaving scheduling slack."""
    return 4 * _ncpus()


def _bytes_of(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _blocks_for(path: str, per_block_bytes: int = 32 << 20, cap: int | None = None) -> int:
    """Input block count for a stage that fans out per block (e.g. the
    hive-partitioned postings write creates ~blocks x P files): enough
    blocks to keep every CPU busy, no more than the data supports —
    excess blocks here are pure per-file overhead, not parallelism."""
    n = _ncpus()
    by_bytes = max(1, _bytes_of(path) // per_block_bytes)
    return max(n, min(_target_blocks(), by_bytes))


# partition-affecting knobs: changing any across a resume would mis-route
# hash(term) % P lookups into files partitioned under the old value
# (silently-empty query results) — hard-fail instead.
_RESUME_PINNED_FIELDS = (
    "num_term_partitions",
    "num_id_partitions",
    "hot_df_threshold",
    "postings_per_chunk",
    "store_positions",
    "shuffle_strategy",
)


def _check_config(index_dir: str, cfg: IndexConfig, resume: bool) -> None:
    path = os.path.join(index_dir, "config.json")
    if resume and os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        diffs = {
            f: (old.get(f), getattr(cfg, f))
            for f in _RESUME_PINNED_FIELDS
            if old.get(f) != getattr(cfg, f)
        }
        if diffs:
            raise ValueError(
                f"resume with changed partition-affecting config for {index_dir}: "
                f"{diffs}; pass resume=False (full rebuild) or restore the "
                "original values"
            )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cfg.to_dict(), f, indent=1, sort_keys=True)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# drops helpers
# ---------------------------------------------------------------------------


def drops_file(index_dir: str) -> str:
    return os.path.join(index_dir, "drops", "drops.parquet")


def load_drops(index_dir: str) -> pa.Table:
    """All drop rows — the base build's drops.parquet plus any
    extendNNN.parquet files appended by ``stages/extend.py``."""
    drops_dir = os.path.join(index_dir, "drops")
    if not os.path.isdir(drops_dir):
        return DROPS_SCHEMA.empty_table()
    files = [
        os.path.join(drops_dir, f)
        for f in sorted(os.listdir(drops_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return DROPS_SCHEMA.empty_table()
    return pq.read_table(files)


def read_docs_table(
    index_dir: str, columns: list[str] | None = None
) -> pa.Table:
    """Dedup-filtered docs table as one pyarrow Table (test/oracle/export
    helper — small-scale convenience; pipelines use the Dataset form)."""
    cols = columns
    if cols is not None:
        need = set(cols) | {"doc_id", "content_sha256"}
        cols = sorted(need)
    tbl = pq.read_table(os.path.join(index_dir, "docs"), columns=cols)
    dropf = DropFilter(load_drops(index_dir))
    if not dropf.empty:
        import numpy as np

        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        shas = tbl["content_sha256"].to_pylist()
        tbl = tbl.filter(pa.array(dropf.keep_mask(ids, shas)))
    if columns is not None:
        tbl = tbl.select(columns)
    return tbl


def _filtered_docs_ds(docs_dir: str, index_dir: str, columns: list[str], blocks: int):
    """Dataset over docs/ with dedup losers masked out."""
    import ray

    dropf = DropFilter(load_drops(index_dir))
    need = list(dict.fromkeys(columns + ["doc_id", "content_sha256"]))
    ds = _read(docs_dir, columns=need, blocks=blocks)
    if dropf.empty:
        return ds.select_columns(columns) if set(columns) != set(need) else ds
    ref = ray.put(dropf)

    def apply(batch: pa.Table) -> pa.Table:
        f: DropFilter = ray.get(ref)
        return f.filter_batch(batch).select(columns)

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_index(
    docs_ds,
    index_dir: str,
    cfg: IndexConfig | None = None,
    *,
    key_cols: list[str] | None = None,
    id_col: str | None = None,
    content_col: str = "content",
    links_ds=None,
    resume: bool = True,
    input_path: str | None = None,
    links_path: str | None = None,
) -> dict:
    """Build the full inverted index under ``index_dir``.

    ``docs_ds`` — Ray Dataset with either ``id_col`` (pre-assigned stable
    ids) or ``key_cols`` (e.g. ["repo", "path", "commit"]) plus
    ``content_col``.  ``links_ds`` (optional) — link rows for PageRank
    (src key columns + ``dst_url``).  ``input_path`` (optional) — the
    source parquet path; when given, the key-only id pass prunes its read
    to ``key_cols`` at the parquet layer (Ray 2.49 has no projection
    pushdown for ``select_columns``).  Returns the metrics dict.
    """
    from .graph.pagerank import build_pagerank_table

    cfg = cfg or IndexConfig()
    if not resume and os.path.isdir(index_dir):
        # a full rebuild starts from nothing: stale EXTENSION artifacts
        # (docs/extendNNN-*, drops/extendNNN.parquet, delta segments,
        # meta extension log) are not touched by the per-stage rebuilds
        # below, and leftover extension drop rows would mask rebuilt
        # docs and undercount n_docs
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    _check_config(index_dir, cfg, resume)
    metrics: dict = {"stages": {}}
    t_all = time.monotonic()

    docs_dir = os.path.join(index_dir, "docs")
    drops_dir = os.path.join(index_dir, "drops")
    postings_dir = os.path.join(index_dir, "postings")
    stats_dir = os.path.join(index_dir, "term_stats")
    seg_dir = os.path.join(index_dir, "segments")
    pr_dir = os.path.join(index_dir, "pagerank")

    # -- stage 1: doc table — THE single full content pass ------------------
    t0 = time.monotonic()
    if not (resume and _done(docs_dir)):
        if id_col is None:
            assert key_cols, "need key_cols when no id column is given"
            from .stages import doc_table as dt

            id_map = None
            id_map_ds = None
            if input_path and _parquet_count(input_path) <= dt.DRIVER_TABLE_LIMIT:
                # key columns only, straight off the parquet footers —
                # no Ray execution for the id bookkeeping at this scale
                id_map = dt.assign_ids_driver(
                    pq.read_table(input_path, columns=key_cols),
                    key_cols,
                    cfg.num_id_partitions,
                )
            else:
                keys_src = (
                    _read(input_path, columns=key_cols, blocks=_target_blocks())
                    if input_path
                    else docs_ds.select_columns(key_cols)
                )
                id_map_ds = dt.assign_ids_dataset(
                    keys_src, key_cols, cfg.num_id_partitions
                ).materialize()
                if id_map_ds.count() <= dt.DRIVER_TABLE_LIMIT:
                    kh_parts, id_parts = [], []
                    for b in id_map_ds.iter_batches(batch_format="pyarrow"):
                        kh_parts.append(
                            b["_khash"].to_numpy(zero_copy_only=False)
                        )
                        id_parts.append(
                            b["doc_id"].to_numpy(zero_copy_only=False)
                        )
                    import numpy as np

                    kh = np.concatenate(kh_parts)
                    ids = np.concatenate(id_parts)
                    order = np.argsort(kh)
                    id_map = (kh[order], ids[order])
                    id_map_ds = None
        else:
            id_map = None
            id_map_ds = None
        # when the source path is known, re-read it with size-targeted
        # blocks: the docs write emits ~one file per read task, and a
        # fragmented docs/ (hundreds of tiny files) taxes every
        # downstream read with per-fragment blocks
        src = (
            _read(input_path, blocks=_blocks_for(input_path))
            if input_path
            else docs_ds
        )
        if id_map_ds is not None:
            # unique-key table too large for a broadcast: ids attach via
            # an inner hash join on the 8-byte key hash
            from .stages.doc_table import attach_documents_via_join

            prepared = attach_documents_via_join(
                src, key_cols, content_col, id_map_ds, _target_blocks()
            )
        else:
            prepared = attach_documents(
                src, key_cols, content_col, id_map, id_col=id_col
            )
        prepared.write_parquet(
            docs_dir,
            mode="overwrite",
            compression="zstd",
            row_group_size=2048,
        )
        _mark(docs_dir)
    metrics["stages"]["doc_table"] = {"seconds": time.monotonic() - t0}

    # -- stage 1b: dedup drops (narrow (doc_id, sha) pass) ------------------
    t0 = time.monotonic()
    if not (resume and _done(drops_dir)):
        from .stages.doc_table import compute_drops

        drops = compute_drops(docs_dir)
        os.makedirs(drops_dir, exist_ok=True)
        tmp = drops_file(index_dir) + ".tmp"
        pq.write_table(drops, tmp)
        os.replace(tmp, drops_file(index_dir))
        _mark(drops_dir)
    n_docs = _parquet_count(docs_dir) - _parquet_count(drops_dir)
    metrics["stages"]["doc_table"]["n_docs"] = n_docs
    metrics["stages"]["dedup"] = {
        "seconds": time.monotonic() - t0,
        "n_dropped": _parquet_count(drops_dir),
    }

    # tokenize fan-out blocks: 32 MB (≈8k docs) measured best for the
    # 2→8 cpu scaling runs (BASELINE.md §3 "32MB tokenize blocks") —
    # large enough to amortize task overhead, small enough that
    # ncpus*blocks stay balanced
    docs_in = _filtered_docs_ds(
        docs_dir, index_dir, ["doc_id", content_col],
        _blocks_for(docs_dir, per_block_bytes=32 << 20),
    )

    if cfg.shuffle_strategy == "partitioned_write":
        _build_segments_partitioned(
            docs_in, index_dir, cfg, content_col, n_docs, resume, metrics
        )
    else:
        _build_segments_salted(
            docs_in, index_dir, cfg, content_col, n_docs, resume, metrics
        )

    # -- stage 5: pagerank ---------------------------------------------------
    t0 = time.monotonic()
    if (links_ds is not None or links_path is not None) and not (
        resume and _done(pr_dir)
    ):
        _compute_and_write_pagerank(
            index_dir, cfg, n_docs, links_path, links_ds
        )
    metrics["stages"]["pagerank"] = {"seconds": time.monotonic() - t0}

    # -- meta ----------------------------------------------------------------
    meta = {
        "n_docs": n_docs,
        "config": cfg.to_dict(),
        "version": 2,
        "has_pagerank": _done(pr_dir),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    metrics["total_seconds"] = time.monotonic() - t_all
    metrics["n_docs"] = n_docs
    with open(os.path.join(index_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    return metrics


def _build_segments_partitioned(
    docs_in, index_dir, cfg, content_col, n_docs, resume, metrics
):
    """Stages 2-4, partitioned-write strategy: hive-partitioned postings
    write (write-side shuffle), then one fused local task per partition
    building segment + stats — no object-store all-to-all anywhere."""
    import ray.data as rd

    postings_dir = os.path.join(index_dir, "postings")
    stats_dir = os.path.join(index_dir, "term_stats")
    seg_dir = os.path.join(index_dir, "segments")

    # -- stage 2: tokenize -> hive-partitioned postings (write shuffle) -----
    # + per-doc token-length sidecar (doclen/) for the BM25 scorer's dl;
    # same tasks, same _SUCCESS gate, no extra pass over content
    doclen_dir = os.path.join(index_dir, "doclen")
    t0 = time.monotonic()
    if not (resume and _done(postings_dir)):

        from .stages.tokenize import write_postings_partitioned

        shutil.rmtree(postings_dir, ignore_errors=True)
        shutil.rmtree(doclen_dir, ignore_errors=True)
        write_postings_partitioned(
            docs_in, cfg, content_col, postings_dir, doclen_dir=doclen_dir
        )
        # shard the doclen sidecar so serving actors fault doc_id
        # ranges instead of holding O(n_docs) arrays (query/sidecar.py)
        from .query.sidecar import compact_sidecar_shards

        compact_sidecar_shards(doclen_dir, "dl")
        _mark(postings_dir)
    metrics["stages"]["tokenize"] = {"seconds": time.monotonic() - t0}

    # -- stages 3+4 fused: per-partition segment + stats --------------------
    t0 = time.monotonic()
    done = completed_partitions(index_dir, require_stats=True) if resume else set()
    missing = sorted(set(range(cfg.num_term_partitions)) - done)
    if missing:
        os.makedirs(seg_dir, exist_ok=True)
        os.makedirs(stats_dir, exist_ok=True)
        ppc = cfg.postings_per_chunk

        def run_parts(batch: pa.Table) -> pa.Table:
            rows = [
                build_partition_fused(
                    int(p), postings_dir, seg_dir, stats_dir, ppc, n_docs
                )
                for p in batch["part"].to_pylist()
            ]
            return pa.concat_tables(rows)

        parts_ds = rd.from_items(
            [{"part": int(p)} for p in missing],
            override_num_blocks=len(missing),
        )
        manifest_updates = parts_ds.map_batches(
            run_parts, batch_format="pyarrow", batch_size=None
        )
        rows = read_manifest(index_dir)
        new_rows = manifest_updates.to_pandas()
        for _, r in new_rows.iterrows():
            rows[int(r["partition"])] = {
                k: (v.item() if hasattr(v, "item") else v) for k, v in r.items()
            }
        write_manifest(index_dir, rows)
    metrics["stages"]["term_stats"] = {"seconds": 0.0, "fused": True}
    metrics["stages"]["segments"] = {
        "seconds": time.monotonic() - t0,
        "partitions_built": len(missing),
        "partitions_skipped": len(done),
    }


def _build_segments_salted(
    docs_in, index_dir, cfg, content_col, n_docs, resume, metrics
):
    """Stages 2-4, round-1 strategy: flat postings intermediate, partial-df
    stats groupby, hot-term salting, groupby(term_part) shuffle into the
    partition writer.  Kept for corpora with df ~ N terms."""
    import ray
    import ray.data as rd

    postings_dir = os.path.join(index_dir, "postings")
    stats_dir = os.path.join(index_dir, "term_stats")
    seg_dir = os.path.join(index_dir, "segments")

    # -- stage 2: tokenize -> postings intermediate -------------------------
    t0 = time.monotonic()
    if not (resume and _done(postings_dir)):
        postings = tokenize_documents(docs_in, cfg, content_col)
        postings.write_parquet(postings_dir, mode="overwrite")
        _mark(postings_dir)
    metrics["stages"]["tokenize"] = {"seconds": time.monotonic() - t0}

    # -- stage 3: term stats (df, idf) --------------------------------------
    t0 = time.monotonic()
    if not (resume and _done(stats_dir)):
        term_only = rd.read_parquet(
            postings_dir, columns=["term"], override_num_blocks=_target_blocks()
        )
        stats = compute_term_stats(term_only, n_docs, cfg)
        stats.write_parquet(
            stats_dir, partition_cols=["term_part"], mode="overwrite"
        )
        _mark(stats_dir)
    metrics["stages"]["term_stats"] = {"seconds": time.monotonic() - t0}

    # -- stage 4: segments (salted chunk build + partition writer) ----------
    t0 = time.monotonic()
    done = completed_partitions(index_dir) if resume else set()
    missing = sorted(set(range(cfg.num_term_partitions)) - done)
    if missing:
        os.makedirs(seg_dir, exist_ok=True)
        hot = hot_terms_from_parquet(stats_dir, cfg.hot_df_threshold)
        hot_ref = ray.put(hot) if hot else None
        postings_blocks = rd.read_parquet(
            postings_dir, override_num_blocks=_target_blocks()
        )
        keyed = postings_blocks.map_batches(
            add_partition_keys,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={
                "hot_ref": hot_ref,
                "num_partitions": cfg.num_term_partitions,
            },
        )
        if done:
            import pyarrow.compute as pc

            missing_arr = pa.array(missing, pa.int64())

            def keep_missing(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.is_in(batch["term_part"], missing_arr))

            keyed = keyed.map_batches(
                keep_missing, batch_format="pyarrow", batch_size=None
            )
        manifest_updates = keyed.groupby("term_part").map_groups(
            write_segment_partition,
            batch_format="pyarrow",
            fn_kwargs={
                "segments_dir": seg_dir,
                "postings_per_chunk": cfg.postings_per_chunk,
            },
        )
        rows = read_manifest(index_dir)
        new_rows = manifest_updates.to_pandas()
        for _, r in new_rows.iterrows():
            rows[int(r["partition"])] = {
                k: (v.item() if hasattr(v, "item") else v) for k, v in r.items()
            }
        # partitions with no terms at all: write empty markers
        for part in missing:
            if part not in rows or not os.path.exists(
                partition_file(seg_dir, part)
            ):
                rows[part] = write_empty_segment(seg_dir, part)
        write_manifest(index_dir, rows)
        metrics["stages"]["segments"] = {
            "seconds": time.monotonic() - t0,
            "partitions_built": len(missing),
            "partitions_skipped": len(done),
            "hot_terms": len(hot),
        }
    else:
        metrics["stages"]["segments"] = {
            "seconds": time.monotonic() - t0,
            "partitions_built": 0,
            "partitions_skipped": len(done),
        }


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def _compute_and_write_pagerank(
    index_dir: str,
    cfg: IndexConfig,
    n_docs: int,
    links_path: str | None,
    links_ds,
):
    """The ONE home of the pagerank stage body (build stage 5 AND
    ``refresh_pagerank``): driver-fast-path selection gated on the link
    table's parquet footer (skipping the Dataset round-trip's fixed
    2-3 s when the doc count and edge count allow), the distributed path
    otherwise, then an atomic tmp+rename write of ``pagerank/`` +
    ``_SUCCESS``.  Returns the rank table."""
    import shutil

    from .graph.pagerank import (
        build_pagerank_table,
        pagerank_table_from_links_table,
    )
    from .stages.doc_table import DRIVER_TABLE_LIMIT

    docs_dir = os.path.join(index_dir, "docs")
    pr_dir = os.path.join(index_dir, "pagerank")
    docs_for_links = _filtered_docs_ds(
        docs_dir, index_dir, ["url", "doc_id"], _blocks_for(docs_dir)
    )
    docs_table = (
        read_docs_table(index_dir, columns=["url", "doc_id"])
        if n_docs <= DRIVER_TABLE_LIMIT
        else None
    )
    if (
        links_path is not None
        and docs_table is not None
        and _parquet_count(links_path) <= cfg.pagerank_driver_edge_limit
    ):
        pr = pagerank_table_from_links_table(
            pq.read_table(links_path), docs_table, cfg
        )
    else:
        if links_ds is None:
            import ray.data as _rd

            links_ds = _rd.read_parquet(links_path)
        pr = build_pagerank_table(
            links_ds, docs_for_links, cfg, docs_table=docs_table
        )
    shutil.rmtree(pr_dir, ignore_errors=True)
    os.makedirs(pr_dir, exist_ok=True)
    tmp = os.path.join(pr_dir, "part-00000.parquet.tmp")
    pq.write_table(pr, tmp)
    os.replace(tmp, tmp[: -len(".tmp")])
    # doc_id-sorted shards + manifest: serving actors fault ranges on
    # demand instead of holding the full rank array (query/sidecar.py)
    from .query.sidecar import compact_sidecar_shards

    compact_sidecar_shards(pr_dir, "page_rank")
    _mark(pr_dir)
    return pr


def refresh_pagerank(
    index_dir: str,
    links_path: str | None = None,
    links_ds=None,
) -> dict:
    """Recompute PageRank over the CURRENT docs table (including any
    extensions) and atomically replace ``pagerank/`` — the companion to
    ``stages/extend.py``: extension leaves new docs at the reference's
    0.0 column default until this runs with a link table covering the
    union graph."""
    import time as _time

    t0 = _time.monotonic()
    meta = load_meta(index_dir)
    cfg = IndexConfig.from_dict(meta["config"])
    n_docs = int(meta["n_docs"])
    pr = _compute_and_write_pagerank(
        index_dir, cfg, n_docs, links_path, links_ds
    )
    if not meta.get("has_pagerank"):
        meta["has_pagerank"] = True
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
    return {
        "n_ranked": pr.num_rows,
        "n_docs": n_docs,
        "seconds": _time.monotonic() - t0,
    }
