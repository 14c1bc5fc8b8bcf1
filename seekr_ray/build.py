"""End-to-end index build orchestration (SURVEY.md §3.3 rebuild lifecycle,
§7.2 build order).

``build_index`` is the ``ray job submit`` driver body: each stage writes
its output under ``index_dir`` with a ``_SUCCESS`` marker, records metrics
in ``metrics.json``, and is skipped on resume when already complete.  The
segment stage additionally checkpoints per term-partition via
``manifest.jsonl`` (stages/segments.py), so a build killed mid-shuffle
resumes by rebuilding only the missing partitions.

No function here calls ``ray.init``; the caller owns the session
(driver contract in ``__ray_entry__.py``).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

from .config import IndexConfig
from .stages.doc_table import prepare_documents
from .stages.postings import (
    add_partition_keys,
    compute_term_stats,
    hot_terms_from_parquet,
)
from .stages.segments import (
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


def _read(path: str):
    import ray.data as rd

    return rd.read_parquet(path)


def _parquet_count(path: str) -> int:
    """Row count from parquet footers — no Ray execution needed."""
    import pyarrow.parquet as pq

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
) -> dict:
    """Build the full inverted index under ``index_dir``.

    ``docs_ds`` — Ray Dataset with either ``id_col`` (pre-assigned stable
    ids) or ``key_cols`` (e.g. ["repo", "path", "commit"]) plus
    ``content_col``.  ``links_ds`` (optional) — link rows for PageRank
    (src key columns + ``dst_url``).  Returns the metrics dict.
    """
    from .graph.pagerank import build_pagerank_table

    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    metrics: dict = {"stages": {}}
    t_all = time.monotonic()

    docs_dir = os.path.join(index_dir, "docs")
    postings_dir = os.path.join(index_dir, "postings")
    stats_dir = os.path.join(index_dir, "term_stats")
    seg_dir = os.path.join(index_dir, "segments")
    pr_dir = os.path.join(index_dir, "pagerank")

    # -- stage 1: doc table (ids + sha256 + exact dedup) --------------------
    t0 = time.monotonic()
    if not (resume and _done(docs_dir)):
        prepared = prepare_documents(
            docs_ds,
            key_cols=key_cols,
            content_col=content_col,
            num_id_partitions=cfg.num_id_partitions,
            id_col=id_col,
        )
        prepared.write_parquet(docs_dir, mode="overwrite")
        _mark(docs_dir)
    docs = _read(docs_dir)
    n_docs = _parquet_count(docs_dir)
    metrics["stages"]["doc_table"] = {
        "seconds": time.monotonic() - t0,
        "n_docs": n_docs,
    }

    # -- stage 2: tokenize -> postings intermediate -------------------------
    # Materialized to parquet on purpose: it is (a) the tokenize-stage
    # checkpoint and (b) read twice (stats pass + segment pass) without
    # re-running the actor pool.  Scale: columnar + dictionary encoding
    # keeps this well under the raw-text input size.
    t0 = time.monotonic()
    if not (resume and _done(postings_dir)):
        postings = tokenize_documents(
            docs.select_columns(["doc_id", content_col]), cfg, content_col
        )
        postings.write_parquet(postings_dir, mode="overwrite")
        _mark(postings_dir)
    metrics["stages"]["tokenize"] = {"seconds": time.monotonic() - t0}

    # -- stage 3: term stats (df, idf) --------------------------------------
    t0 = time.monotonic()
    if not (resume and _done(stats_dir)):
        import ray.data as rd

        # column pruning AT the read: a post-read select would still
        # decompress the (heavy) positions column in every read task
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
        import ray

        os.makedirs(seg_dir, exist_ok=True)
        hot = hot_terms_from_parquet(stats_dir, cfg.hot_df_threshold)
        hot_ref = ray.put(hot) if hot else None
        import ray.data as rd

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
                k: (v.item() if hasattr(v, "item") else v)
                for k, v in r.items()
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

    # -- stage 5: pagerank ---------------------------------------------------
    t0 = time.monotonic()
    if links_ds is not None and not (resume and _done(pr_dir)):
        pr = build_pagerank_table(links_ds, docs, cfg)
        pr.write_parquet(pr_dir, mode="overwrite")
        os.makedirs(pr_dir, exist_ok=True)  # empty write creates no dir
        _mark(pr_dir)
    metrics["stages"]["pagerank"] = {"seconds": time.monotonic() - t0}

    # -- meta ----------------------------------------------------------------
    meta = {
        "n_docs": n_docs,
        "config": cfg.to_dict(),
        "version": 1,
        "has_pagerank": _done(pr_dir) if links_ds is not None else os.path.exists(_success(pr_dir)),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    metrics["total_seconds"] = time.monotonic() - t_all
    metrics["n_docs"] = n_docs
    with open(os.path.join(index_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    return metrics


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)
