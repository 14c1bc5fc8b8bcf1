"""Incremental index extension — the reference's ``addDocuments`` parity.

``SQLiteSearcher.addDocuments`` (``SQLiteSearcher.java:101-137``) inserts
new documents into the EXISTING SQLite index and then re-runs
``updateIDF`` over every word (``SQLiteSearcher.java:339-403``).  This
module is the segment-store analog:

* new docs get fresh deterministic ids that CONTINUE each pid's rank
  sequence (``doc_id = (pid << 40) | rank``) — existing ids never move;
* dedup vs the existing corpus is temporal first-wins (the crawler's
  visited-set semantics, ``Crawler.java:129-169``): an existing document
  always beats an incoming duplicate, by key and by content;
* the new postings land as DELTA segment files
  (``part-XXXXX.deltaGGG.parquet``) next to the base partition file; the
  store merges chunk rows across files at decode time with the same
  machinery that merges salted chunks — queries need no compaction;
* term stats are fully rewritten (df merged old+delta, idf =
  log10(N_total/df) for EVERY term since N changed) — the ``updateIDF``
  analog, touching only the tiny stats tables;
* docs/, drops/, doclen/, manifest.jsonl and meta.json extend in place;
  pagerank/ is left untouched — new docs default to rank 0.0 at lookup,
  exactly the reference's column default (``Crawler.java:400``) until
  PageRank is re-run over a union link graph.

Serving processes must open a NEW SegmentStore / QueryEngine to see the
extension (the standard segment-visibility rule); long-lived engines keep
serving the pre-extension snapshot consistently.

Scale notes: the existing-corpus key/sha state is collected to driver
numpy arrays (narrow columns only — 8 B khash + 64 B sha per doc; the
same DRIVER_TABLE_LIMIT regime as the base build's id map, with the same
documented Dataset-join escape hatch).  The delta build itself is the
ordinary partitioned-write pipeline over ONLY the new rows.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import DOC_ID_PARTITION_SHIFT, IndexConfig
from ..nputil import isin_sorted
from .doc_table import DROPS_SCHEMA, DropFilter, _sha_hex, key_hashes
from .postings import build_partition_chunks
from .segments import (
    CHUNK_SCHEMA,
    STATS_SCHEMA,
    _atomic_write,
    _sha256_file,
    partition_file,
    read_manifest,
    stats_partition_file,
    write_manifest,
)

RANK_MASK = (np.int64(1) << DOC_ID_PARTITION_SHIFT) - 1

_DELTA_RE = re.compile(r"part-\d{5}\.delta(\d{3})\.parquet$")


def delta_partition_file(seg_dir: str, part: int, gen: int) -> str:
    return os.path.join(seg_dir, f"part-{part:05d}.delta{gen:03d}.parquet")


def partition_files(seg_dir: str, part: int) -> list[str]:
    """Base + delta segment files of one partition, decode order."""
    out = []
    base = partition_file(seg_dir, part)
    if os.path.exists(base):
        out.append(base)
    out.extend(
        sorted(glob.glob(os.path.join(seg_dir, f"part-{part:05d}.delta*.parquet")))
    )
    return out


def next_generation(index_dir: str, meta: dict) -> int:
    """Next extension generation, derived from every DURABLE trace of a
    prior generation: delta segment files, the meta extension log, and
    docs/drops extension files.  Delta filenames alone are not enough —
    ``compact_index`` deletes them, and a reset counter would let a later
    extend silently overwrite an earlier generation's docs/drops files.
    """
    gens = [0]
    seg_dir = os.path.join(index_dir, "segments")
    gens += [
        int(m.group(1))
        for f in os.listdir(seg_dir)
        if (m := _DELTA_RE.search(f))
    ]
    gens += [int(e["generation"]) for e in meta.get("extensions", [])]
    ext_re = re.compile(r"^extend(\d{3})[.-]")
    for sub in ("docs", "drops"):
        d = os.path.join(index_dir, sub)
        if os.path.isdir(d):
            gens += [
                int(m.group(1))
                for f in os.listdir(d)
                if (m := ext_re.match(f))
            ]
    return max(gens) + 1


def _pending_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_extend_pending.json")


def _rebuild_partition_stats(
    seg_dir: str, stats_dir: str, part: int, n_docs_total: int
) -> None:
    """Recompute one partition's term stats EXACTLY from its segment
    files (base + remaining deltas): df = Σ chunk n_docs per term (doc
    sets are disjoint across a term's salts/chunks), n_salts = distinct
    salts, idf = log10(N/df).  Used by rollback, where the incremental
    old-stats + delta-df merge cannot be trusted (a crashed extend may
    have rewritten some partitions' stats already)."""
    files = partition_files(seg_dir, part)
    stats_path = stats_partition_file(stats_dir, part)
    if not files:
        _atomic_write(STATS_SCHEMA.empty_table(), stats_path)
        return
    tbl = pq.read_table(files, columns=["term", "salt", "n_docs"])
    agg = tbl.group_by("term").aggregate(
        [("n_docs", "sum"), ("salt", "count_distinct")]
    )
    agg = agg.sort_by("term")
    df = pc.cast(agg["n_docs_sum"], pa.int64())
    idf = pc.log10(pc.divide(float(n_docs_total), pc.cast(df, pa.float64())))
    stats = pa.table(
        {
            "term": agg["term"],
            "df": df,
            "idf": idf,
            "n_salts": pc.cast(agg["salt_count_distinct"], pa.int32()),
        },
        schema=STATS_SCHEMA,
    )
    _atomic_write(stats, stats_path)


def rollback_extend(index_dir: str, gen: int, meta: dict) -> None:
    """Remove every artifact of an INCOMPLETE extension generation and
    restore consistent term stats, making a crashed ``extend_index``
    safely re-runnable.  If ``gen`` is already recorded in the meta
    extension log the extend actually completed (the pending marker just
    wasn't cleared) and nothing is rolled back.

    Residual doclen sidecar rows for the rolled-back docs are left in
    place deliberately: the files are uuid-named (not attributable to a
    generation) and ``load_doclens`` dedupes by doc_id, so the re-run's
    identical (doc_id, dl) re-emission collapses to one row per doc —
    avgdl and BM25 stay equal to a fresh union build."""
    if any(int(e["generation"]) == gen for e in meta.get("extensions", [])):
        os.remove(_pending_path(index_dir))
        return
    seg_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "term_stats")
    for f in glob.glob(
        os.path.join(seg_dir, f"part-*.delta{gen:03d}.parquet")
    ):
        os.remove(f)
    for pat in (
        os.path.join(index_dir, "docs", f"extend{gen:03d}-*.parquet"),
        os.path.join(index_dir, "drops", f"extend{gen:03d}.parquet"),
    ):
        for f in glob.glob(pat):
            os.remove(f)
    shutil.rmtree(
        os.path.join(index_dir, f"_extend_docs_g{gen}"), ignore_errors=True
    )
    shutil.rmtree(
        os.path.join(index_dir, f"postings_delta_g{gen}"), ignore_errors=True
    )
    rows = read_manifest(index_dir)
    for p, row in rows.items():
        if row.get("deltas"):
            row["deltas"] = [
                d for d in row["deltas"] if int(d["generation"]) != gen
            ]
    write_manifest(index_dir, rows)
    cfg = IndexConfig.from_dict(meta["config"])
    for part in range(cfg.num_term_partitions):
        _rebuild_partition_stats(
            seg_dir, stats_dir, part, int(meta["n_docs"])
        )
    os.remove(_pending_path(index_dir))


def _extend_partition(
    part: int,
    postings_delta_dir: str,
    seg_dir: str,
    stats_dir: str,
    postings_per_chunk: int,
    n_docs_total: int,
    gen: int,
) -> pa.Table:
    """One task per partition: build the delta segment (if this partition
    received new postings) and recompute the partition's term stats from
    the on-disk segment files with the new corpus N — every term's idf
    changes when N does."""
    t0 = time.monotonic()
    part_dir = os.path.join(postings_delta_dir, f"term_part={part}")
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    seg_path = ""
    seg_sha = ""
    n_postings = 0
    n_chunks = 0
    if files:
        cols = ["doc_id", "term", "tf", "positions"]
        if "importance" in pq.read_schema(files[0]).names:
            cols.append("importance")
        tbl = pq.read_table(files, columns=cols)
        if tbl.num_rows:
            n_postings = tbl.num_rows
            tbl = tbl.append_column(
                "salt", pa.array(np.zeros(n_postings, np.int32), pa.int32())
            ).append_column(
                "term_part",
                pa.array(np.full(n_postings, part, np.int64), pa.int64()),
            )
            chunks = build_partition_chunks(tbl, postings_per_chunk)
            chunks = chunks.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
            n_chunks = chunks.num_rows
            seg_path = delta_partition_file(seg_dir, part, gen)
            _atomic_write(chunks, seg_path)
            seg_sha = _sha256_file(seg_path)

    # stats: recomputed EXACTLY from the on-disk segment files (base +
    # deltas incl. the one just written) with the new N — the same
    # derivation rollback uses.  Deriving from durable immutable inputs
    # (never read-modify-write of the stats file) makes the task
    # IDEMPOTENT: a Ray retry that re-runs after a completed write
    # produces byte-identical output instead of double-merging the
    # delta df (review 2026-08-18).
    _rebuild_partition_stats(seg_dir, stats_dir, part, n_docs_total)
    stats_path = stats_partition_file(stats_dir, part)
    n_terms_total = pq.read_metadata(stats_path).num_rows

    return pa.table(
        {
            "partition": pa.array([part], pa.int64()),
            "delta_path": pa.array([seg_path], pa.string()),
            "delta_sha256": pa.array([seg_sha], pa.string()),
            "n_postings": pa.array([n_postings], pa.int64()),
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "n_terms_total": pa.array([n_terms_total], pa.int64()),
            "duration_s": pa.array([time.monotonic() - t0], pa.float64()),
        }
    )


def extend_index(
    new_docs_ds,
    index_dir: str,
    *,
    key_cols: list[str],
    content_col: str = "content",
) -> dict:
    """Add ``new_docs_ds`` to an existing partitioned-write index.

    Returns a metrics dict (n_received / n_new_docs / n_dropped /
    generation / per-stage seconds).
    """
    import ray
    import ray.data as rd

    from ..build import _target_blocks, load_drops, load_meta

    t_all = time.monotonic()
    meta = load_meta(index_dir)
    cfg = IndexConfig.from_dict(meta["config"])
    if cfg.shuffle_strategy != "partitioned_write":
        raise ValueError(
            "extend_index requires a partitioned_write index "
            f"(got {cfg.shuffle_strategy!r})"
        )
    docs_dir = os.path.join(index_dir, "docs")
    seg_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "term_stats")
    doclen_dir = os.path.join(index_dir, "doclen")
    drops_dir = os.path.join(index_dir, "drops")
    # crash recovery: finish any interrupted compaction first, then a
    # pending marker means a previous extend died mid-flight — roll its
    # generation back (idempotent) before starting
    recover_compaction(seg_dir)
    if os.path.exists(_pending_path(index_dir)):
        with open(_pending_path(index_dir)) as f:
            stale = json.load(f)
        rollback_extend(index_dir, int(stale["generation"]), meta)
        meta = load_meta(index_dir)
    gen = next_generation(index_dir, meta)
    with open(_pending_path(index_dir), "w") as f:
        json.dump({"generation": gen}, f)
    metrics: dict = {"generation": gen, "stages": {}}

    # -- existing state: khash / kept shas / per-pid max rank (narrow) ------
    t0 = time.monotonic()
    ex = pq.read_table(
        docs_dir, columns=list(key_cols) + ["doc_id", "content_sha256"]
    )
    ex_kh = key_hashes(ex, list(key_cols))
    ex_ids = ex["doc_id"].to_numpy(zero_copy_only=False)
    dropf = DropFilter(load_drops(index_dir))
    ex_shas = np.asarray(ex["content_sha256"].to_pylist(), dtype=object)
    kept = (
        dropf.keep_mask(ex_ids, ex["content_sha256"].to_pylist())
        if not dropf.empty
        else np.ones(len(ex_ids), bool)
    )
    kept_shas = np.unique(ex_shas[kept])
    ex_kh_sorted = np.sort(ex_kh)
    # per-pid max rank over ALL ids ever assigned (dropped ones included)
    pids = (ex_ids >> DOC_ID_PARTITION_SHIFT).astype(np.int64)
    ranks = (ex_ids & RANK_MASK).astype(np.int64)
    base_rank = np.full(cfg.num_id_partitions, -1, np.int64)
    if len(pids):
        np.maximum.at(base_rank, pids, ranks)
    metrics["stages"]["existing_state"] = {"seconds": time.monotonic() - t0}

    # -- pass 1 over the new rows: (khash, sha), driver numpy ---------------
    t0 = time.monotonic()

    def pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_khash": pa.array(
                    key_hashes(batch, list(key_cols)), pa.uint64()
                ),
                "content_sha256": pa.array(
                    _sha_hex(batch[content_col].to_pylist()), pa.string()
                ),
            }
        )

    ptables = list(
        new_docs_ds.map_batches(
            pairs, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    )
    ptbl = (
        pa.concat_tables(ptables)
        if ptables
        else pa.table(
            {
                "_khash": pa.array([], pa.uint64()),
                "content_sha256": pa.array([], pa.string()),
            }
        )
    )
    kh = ptbl["_khash"].to_numpy(zero_copy_only=False)
    shas = np.asarray(ptbl["content_sha256"].to_pylist(), dtype=object)
    n_received = len(kh)

    # visited-set skip: keys already in the corpus (existing wins)
    seen, _ = isin_sorted(ex_kh_sorted, kh)
    fresh = ~seen
    kh, shas = kh[fresh], shas[fresh]

    # within-batch key dedup: min-sha winner per khash (B5 rule)
    if len(kh):
        order = np.lexsort((shas, kh))
        kh, shas = kh[order], shas[order]
        first = np.ones(len(kh), bool)
        first[1:] = kh[1:] != kh[:-1]
        kh, shas = kh[first], shas[first]

    # id assignment: continue each pid's rank sequence in khash order
    new_ids = np.empty(len(kh), np.int64)
    if len(kh):
        pid_new = (kh % np.uint64(cfg.num_id_partitions)).astype(np.int64)
        order = np.lexsort((kh, pid_new))
        seq = np.arange(len(kh), dtype=np.int64)
        grp_start = np.zeros(len(kh), np.int64)
        starts = np.flatnonzero(
            np.r_[True, pid_new[order][1:] != pid_new[order][:-1]]
        )
        grp_start[starts] = seq[starts]
        grp_start = np.maximum.accumulate(grp_start)
        within = seq - grp_start
        ranks_new = base_rank[pid_new[order]] + 1 + within
        new_ids[order] = (
            pid_new[order] << DOC_ID_PARTITION_SHIFT
        ) | ranks_new
    kh_order = np.argsort(kh)
    id_map = (kh[kh_order], new_ids[kh_order], shas[kh_order])

    # content-dup drops: vs existing kept shas (existing wins), then
    # within-batch min-id winner (B6 rule)
    drop_ids, drop_shas = [], []
    if len(new_ids):
        vs_existing, _ = isin_sorted(kept_shas, shas)
        drop_ids.extend(new_ids[vs_existing].tolist())
        drop_shas.extend(shas[vs_existing].tolist())
        wi, ws = new_ids[~vs_existing], shas[~vs_existing]
        order2 = np.lexsort((wi, ws))
        wi, ws = wi[order2], ws[order2]
        if len(wi):
            cd = np.zeros(len(wi), bool)
            cd[1:] = ws[1:] == ws[:-1]
            drop_ids.extend(wi[cd].tolist())
            drop_shas.extend(ws[cd].tolist())
    new_drops = pa.table(
        {
            "doc_id": pa.array(drop_ids, pa.int64()),
            "content_sha256": pa.array(drop_shas, pa.string()),
            "reason": pa.array(["content_dup"] * len(drop_ids), pa.string()),
        },
        schema=DROPS_SCHEMA,
    )
    metrics["stages"]["id_pass"] = {"seconds": time.monotonic() - t0}

    # -- write the new docs rows (content pass #1 of 1) ----------------------
    t0 = time.monotonic()
    map_ref = ray.put(id_map)

    def attach_new(batch: pa.Table) -> pa.Table:
        from .doc_table import _decorate_batch

        ksorted, ids_sorted, winner_shas = ray.get(map_ref)
        bkh = key_hashes(batch, list(key_cols))
        valid, pos = isin_sorted(ksorted, bkh)
        ids = np.where(valid, ids_sorted[pos] if len(ids_sorted) else -1, -1)
        batch = batch.append_column("doc_id", pa.array(ids, pa.int64()))
        batch = _decorate_batch(batch, content_col, "path")
        if len(ksorted):
            bs = np.asarray(batch["content_sha256"].to_pylist(), dtype=object)
            valid = valid & (np.asarray(winner_shas[pos], dtype=object) == bs)
        batch = batch.filter(pa.array(valid))
        return batch.take(pc.sort_indices(batch["doc_id"]))

    tmp_docs = os.path.join(index_dir, f"_extend_docs_g{gen}")
    shutil.rmtree(tmp_docs, ignore_errors=True)
    new_docs_ds.map_batches(
        attach_new, batch_format="pyarrow", batch_size=None
    ).write_parquet(
        tmp_docs, mode="overwrite", compression="zstd", row_group_size=2048
    )
    new_doc_files = []
    # an all-duplicates batch filters down to zero rows and write_parquet
    # then creates nothing
    for i, f in enumerate(
        sorted(os.listdir(tmp_docs)) if os.path.isdir(tmp_docs) else []
    ):
        if f.endswith(".parquet"):
            dst = os.path.join(docs_dir, f"extend{gen:03d}-{i:04d}.parquet")
            os.replace(os.path.join(tmp_docs, f), dst)
            new_doc_files.append(dst)
    shutil.rmtree(tmp_docs, ignore_errors=True)
    if new_drops.num_rows:
        _atomic_write(
            new_drops, os.path.join(drops_dir, f"extend{gen:03d}.parquet")
        )
    n_new_docs = int(len(new_ids) - new_drops.num_rows)
    n_total = int(meta["n_docs"]) + n_new_docs
    metrics["stages"]["doc_table"] = {
        "seconds": time.monotonic() - t0,
        "n_written": int(len(new_ids)),
        "n_dropped": int(new_drops.num_rows),
    }

    # -- tokenize ONLY the new kept docs -> delta postings + doclen ---------
    t0 = time.monotonic()
    postings_delta = os.path.join(index_dir, f"postings_delta_g{gen}")
    shutil.rmtree(postings_delta, ignore_errors=True)
    if new_doc_files:
        from .tokenize import write_postings_partitioned

        src = rd.read_parquet(
            new_doc_files, columns=["doc_id", content_col, "content_sha256"]
        )
        ndropf = DropFilter(new_drops)
        if not ndropf.empty:
            ref = ray.put(ndropf)

            def mask(batch: pa.Table) -> pa.Table:
                return ray.get(ref).filter_batch(batch)

            src = src.map_batches(mask, batch_format="pyarrow")
        src = src.map_batches(
            lambda b: b.select(["doc_id", content_col]),
            batch_format="pyarrow",
        )
        write_postings_partitioned(
            src, cfg, content_col, postings_delta, doclen_dir=doclen_dir
        )
    metrics["stages"]["tokenize"] = {"seconds": time.monotonic() - t0}

    # -- delta segments + merged stats (updateIDF analog), per partition ----
    t0 = time.monotonic()
    P = cfg.num_term_partitions
    ppc = cfg.postings_per_chunk

    def run_parts(batch: pa.Table) -> pa.Table:
        rows = [
            _extend_partition(
                int(p), postings_delta, seg_dir, stats_dir, ppc, n_total, gen
            )
            for p in batch["part"].to_pylist()
        ]
        return pa.concat_tables(rows)

    parts_ds = rd.from_items(
        [{"part": int(p)} for p in range(P)], override_num_blocks=P
    )
    updates = parts_ds.map_batches(
        run_parts, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    rows = read_manifest(index_dir)
    for _, r in updates.iterrows():
        p = int(r["partition"])
        row = rows.get(p, {"partition": p})
        deltas = row.get("deltas", [])
        if r["delta_path"]:
            deltas = deltas + [
                {
                    "generation": gen,
                    "path": str(r["delta_path"]),
                    "file_sha256": str(r["delta_sha256"]),
                    "n_postings": int(r["n_postings"]),
                    "n_chunks": int(r["n_chunks"]),
                }
            ]
        row["deltas"] = deltas
        row["n_terms_total"] = int(r["n_terms_total"])
        rows[p] = row
    write_manifest(index_dir, rows)
    shutil.rmtree(postings_delta, ignore_errors=True)
    metrics["stages"]["segments"] = {"seconds": time.monotonic() - t0}

    # -- meta ----------------------------------------------------------------
    meta["n_docs"] = n_total
    meta.setdefault("extensions", []).append(
        {"generation": gen, "n_added": n_new_docs}
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    # meta is the commit point: once the extension is in the log, the
    # pending marker is moot (rollback_extend treats logged generations
    # as complete even if this remove never runs)
    os.remove(_pending_path(index_dir))
    metrics["n_received"] = int(n_received)
    metrics["n_new_docs"] = n_new_docs
    metrics["n_docs_total"] = n_total
    metrics["total_seconds"] = time.monotonic() - t_all
    return metrics


# ---------------------------------------------------------------------------
# compaction: fold delta files back into one base file per partition
# ---------------------------------------------------------------------------


def _chunk_rows_to_postings(tbl: pa.Table, part: int) -> pa.Table:
    """Decode segment chunk rows back into per-posting rows.

    doc ids / tfs / importances decode to their arrays; the per-posting
    POSITION blobs are sliced out of each chunk's concatenated payload
    still varbyte-encoded (offsets from the decoded length list), so
    compaction re-encodes nothing — the rebuilt chunk is a memcpy
    re-grouping of the original bytes."""
    from ..codec import decode_doc_ids, unpack_f64, varbyte_decode

    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
    n_docs_col = tbl["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids_enc = tbl["doc_ids_enc"].to_pylist()
    tfs_enc = tbl["tfs_enc"].to_pylist()
    lens_enc = tbl["pos_blob_lens_enc"].to_pylist()
    blobs = tbl["pos_blobs"].to_pylist()
    imp_enc = (
        tbl["importance_enc"].to_pylist()
        if "importance_enc" in tbl.column_names
        else [None] * tbl.num_rows
    )
    id_parts, tf_parts, imp_parts, pos_arrays = [], [], [], []
    for i in range(tbl.num_rows):
        n = int(n_docs_col[i])
        id_parts.append(decode_doc_ids(ids_enc[i], n).astype(np.int64))
        tf_parts.append(unpack_f64(tfs_enc[i]))
        imp_parts.append(
            unpack_f64(imp_enc[i])
            if imp_enc[i] is not None
            else np.ones(n, np.float64)
        )
        lens = varbyte_decode(lens_enc[i]).astype(np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        pos_arrays.append(
            pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                n,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blobs[i])],
            )
        )
    n_total = int(n_docs_col.sum())
    return pa.table(
        {
            "doc_id": pa.array(
                np.concatenate(id_parts) if id_parts else np.empty(0, np.int64),
                pa.int64(),
            ),
            "term": pa.array(np.repeat(terms, n_docs_col), pa.string()),
            "tf": pa.array(
                np.concatenate(tf_parts) if tf_parts else np.empty(0),
                pa.float64(),
            ),
            "positions": pa.chunked_array(
                pos_arrays or [pa.array([], pa.large_binary())]
            ),
            "importance": pa.array(
                np.concatenate(imp_parts) if imp_parts else np.empty(0),
                pa.float64(),
            ),
            "salt": pa.array(np.zeros(n_total, np.int32), pa.int32()),
            "term_part": pa.array(
                np.full(n_total, part, np.int64), pa.int64()
            ),
        }
    )


def _compact_marker_path(seg_dir: str, part: int) -> str:
    return os.path.join(seg_dir, f"part-{part:05d}.compact.json")


def recover_compaction(seg_dir: str) -> int:
    """Finish or undo any compaction interrupted mid-commit, restoring
    the invariant that a partition's postings appear EXACTLY once across
    its files.  Returns the number of partitions recovered.

    The commit protocol (``_compact_partition``) is: (1) write the
    marker listing the delta files being folded + the merged base sha,
    (2) atomic-rename the merged base into place, (3) unlink the listed
    deltas, (4) remove the marker.  On recovery: if the base's sha
    matches the marker, the rename happened — complete the delta
    unlinks; otherwise the rename never landed — the original base +
    deltas are intact and the marker is simply discarded.  Without this,
    a crash between (2) and (3) leaves merged postings in the base AND
    the deltas on disk: every query double-counts and a re-compaction
    would bake the duplicates in permanently."""
    recovered = 0
    for mpath in glob.glob(os.path.join(seg_dir, "part-*.compact.json")):
        with open(mpath) as f:
            marker = json.load(f)
        base = os.path.join(seg_dir, os.path.basename(marker["base"]))
        merged_sha = marker["merged_sha256"]
        if os.path.exists(base) and _sha256_file(base) == merged_sha:
            for d in marker["deltas"]:
                dp = os.path.join(seg_dir, os.path.basename(d))
                if os.path.exists(dp):
                    os.unlink(dp)
        for leftover in (base + ".compact-tmp", base + ".compact-tmp.tmp"):
            if os.path.exists(leftover):
                os.unlink(leftover)
        os.remove(mpath)
        recovered += 1
    return recovered


# rebuild-task sizing: one compaction task decodes ~this many postings.
# A 10^12-doc hot partition used to rebuild in ONE local task (straggler
# + decoded-postings OOM, VERDICT r3 #5); the doc-id range split bounds
# each task's decoded working set and runs ranges in parallel.
_COMPACT_TARGET_POSTINGS = 2_000_000
_COMPACT_MAX_RANGES = 16
_DOC_LO = -(1 << 62)
_DOC_HI = 1 << 62


def _plan_compact_ranges(
    files: list[str],
    target: int = _COMPACT_TARGET_POSTINGS,
    max_ranges: int = _COMPACT_MAX_RANGES,
) -> list[tuple[int, int]]:
    """Doc-id split points for one partition's rebuild, planned from the
    persisted chunk metadata alone (n_docs + max_doc_id columns — no
    payload IO): weighted quantiles of chunk max_doc_id by posting
    count, so each range decodes ~``target`` postings.  Legacy files
    without the metadata columns (or partitions small enough for one
    task) plan a single full range.  Returns [] for partitions with no
    postings at all (nothing to rebuild)."""
    counts: list[np.ndarray] = []
    maxs: list[np.ndarray] = []
    for f in files:
        pf = pq.ParquetFile(f)
        if not {"n_docs", "max_doc_id"} <= set(pf.schema_arrow.names):
            return [(_DOC_LO, _DOC_HI)]
        t = pf.read(columns=["n_docs", "max_doc_id"])
        counts.append(t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64))
        maxs.append(t["max_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    n = np.concatenate(counts) if counts else np.empty(0, np.int64)
    total = int(n.sum())
    if total == 0:
        return []
    k = int(min(max_ranges, max(1, -(-total // target))))
    if k <= 1:
        return [(_DOC_LO, _DOC_HI)]
    mx = np.concatenate(maxs)
    order = np.argsort(mx, kind="stable")
    mx = mx[order]
    cum = np.cumsum(n[order])
    bounds = sorted(
        {
            int(mx[min(int(np.searchsorted(cum, i * total / k)), len(mx) - 1)]) + 1
            for i in range(1, k)
        }
    )
    edges = [_DOC_LO] + bounds + [_DOC_HI]
    return [
        (edges[i], edges[i + 1])
        for i in range(len(edges) - 1)
        if edges[i] < edges[i + 1]
    ]


def _rebuild_doc_range(
    part: int, seg_dir: str, postings_per_chunk: int, dlo: int, dhi: int
) -> pa.Table:
    """The parallel unit of compaction: stream one partition's base +
    delta files row-group-wise, keep only chunk rows whose doc range
    overlaps [dlo, dhi), decode those, slice the postings to the range
    and rebuild chunk rows.  Peak memory is the overlapping rows + their
    decoded postings, NOT the whole partition.  ``chunk_seq`` is local
    to the range here; ``_finalize_compacted`` renumbers per
    (term, salt).  Correctness does not depend on the split points:
    per-term posting sets partition cleanly by doc id (ids are unique
    within a term), so concatenating the per-range chunk runs in range
    order reproduces the doc-sorted posting sequence exactly."""
    kept: list[pa.Table] = []
    for f in partition_files(seg_dir, part):
        pf = pq.ParquetFile(f)
        has_meta = {"min_doc_id", "max_doc_id"} <= set(pf.schema_arrow.names)
        for rb in pf.iter_batches(batch_size=2048):
            t = pa.Table.from_batches([rb])
            if has_meta:
                t = t.filter(
                    pc.and_(
                        pc.greater_equal(t["max_doc_id"], dlo),
                        pc.less(t["min_doc_id"], dhi),
                    )
                )
            if t.num_rows:
                kept.append(t)
    empty = CHUNK_SCHEMA.empty_table().append_column(
        "_dlo", pa.array([], pa.int64())
    )
    if not kept:
        return empty
    rows = pa.concat_tables(kept, promote_options="default")
    postings = _chunk_rows_to_postings(rows, part)
    postings = postings.filter(
        pc.and_(
            pc.greater_equal(postings["doc_id"], dlo),
            pc.less(postings["doc_id"], dhi),
        )
    )
    if postings.num_rows == 0:
        return empty
    chunks = build_partition_chunks(postings, postings_per_chunk)
    chunks = chunks.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
    return chunks.append_column(
        "_dlo", pa.array(np.full(chunks.num_rows, dlo, np.int64), pa.int64())
    )


def _finalize_compacted(group: pa.Table, seg_dir: str) -> pa.Table:
    """Gather one partition's rebuilt chunk rows (all ranges), restore
    the (term, salt, chunk_seq) file invariant — ranges concatenate in
    doc order, chunk_seq renumbers 0..m-1 per run — and commit via the
    crash-safe marker protocol (``recover_compaction``)."""
    t0 = time.monotonic()
    part = int(group["term_part"][0].as_py())
    order = pc.sort_indices(
        group,
        sort_keys=[
            ("term", "ascending"),
            ("salt", "ascending"),
            ("_dlo", "ascending"),
            ("chunk_seq", "ascending"),
        ],
    )
    tbl = group.take(order).drop_columns(["_dlo"])
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
    salts = tbl["salt"].to_numpy(zero_copy_only=False)
    n = len(terms)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    run_starts = np.flatnonzero(change)
    run_ids = np.cumsum(change) - 1
    seq = (np.arange(n, dtype=np.int64) - run_starts[run_ids]).astype(np.int32)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("chunk_seq"),
        "chunk_seq",
        pa.array(seq, pa.int32()),
    )
    chunks = tbl.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
    removed, seg_sha = _commit_compacted(chunks, part, seg_dir)
    return pa.table(
        {
            "partition": pa.array([part], pa.int64()),
            "removed": pa.array([removed], pa.int64()),
            "n_postings": pa.array(
                [int(pc.sum(chunks["n_docs"]).as_py() or 0)], pa.int64()
            ),
            "n_chunks": pa.array([chunks.num_rows], pa.int64()),
            "file_sha256": pa.array([seg_sha], pa.string()),
            "duration_s": pa.array([time.monotonic() - t0], pa.float64()),
        }
    )


def _commit_compacted(
    chunks: pa.Table, part: int, seg_dir: str
) -> tuple[int, str]:
    """The crash-safe marker-protocol commit shared by the range
    finalize and the zero-posting fold: stage merged bytes + marker,
    atomic-rename the base, unlink the deltas."""
    files = partition_files(seg_dir, part)
    base = partition_file(seg_dir, part)
    deltas = [f for f in files if f != base]
    # (1) stage the merged bytes + commit marker BEFORE touching base
    tmp = base + ".compact-tmp"
    _atomic_write(chunks, tmp)
    seg_sha = _sha256_file(tmp)
    mpath = _compact_marker_path(seg_dir, part)
    mtmp = mpath + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(
            {
                "base": os.path.basename(base),
                "merged_sha256": seg_sha,
                "deltas": [os.path.basename(d) for d in deltas],
            },
            f,
        )
    os.replace(mtmp, mpath)
    # (2) commit point: after this rename the marker's sha matches
    os.replace(tmp, base)
    removed = 0
    for f in deltas:  # (3) + (4)
        os.unlink(f)
        removed += 1
    os.remove(mpath)
    return removed, seg_sha


def compact_index(
    index_dir: str,
    target_postings_per_task: int = _COMPACT_TARGET_POSTINGS,
    max_range_parallel: int = _COMPACT_MAX_RANGES,
) -> dict:
    """Fold every partition's delta segment files back into its base file
    (LSM compaction for the extension path).  Query-equivalent by
    construction — the same chunk bytes re-grouped into doc-sorted
    per-term runs; term stats, docs, drops, doclen and pagerank are
    untouched.  Round 4: the rebuild is CHUNK-PARALLEL — each partition
    splits into doc-id ranges planned from persisted chunk metadata
    (``_plan_compact_ranges``), one Ray task decodes and re-chunks each
    range, and a per-partition finalize restores the
    (term, salt, chunk_seq) invariant and commits atomically — so a
    10^12-doc hot partition is neither a straggler nor a memory spike.
    Returns {partitions_compacted, files_removed, seconds}."""
    import ray.data as rd

    from ..build import load_meta

    t0 = time.monotonic()
    if os.path.exists(_pending_path(index_dir)):
        # compacting now would fold an incomplete generation's deltas
        # into the base, making the later rollback leave ghost postings
        raise RuntimeError(
            "index has an incomplete extension (_extend_pending.json): "
            "re-run extend (which rolls it back) before compacting"
        )
    meta = load_meta(index_dir)
    cfg = IndexConfig.from_dict(meta["config"])
    seg_dir = os.path.join(index_dir, "segments")
    recover_compaction(seg_dir)
    ppc = cfg.postings_per_chunk

    work: list[dict] = []
    inline_rows: list[dict] = []
    for part in range(cfg.num_term_partitions):
        files = partition_files(seg_dir, part)
        if len(files) <= 1:
            continue  # no deltas: nothing to fold
        ranges = _plan_compact_ranges(
            files, target_postings_per_task, max_range_parallel
        )
        if not ranges:
            # zero postings across base+deltas: fold to an empty base
            # inline (the range path would emit no rows and never
            # finalize, leaving the deltas behind forever)
            ti = time.monotonic()
            removed, sha = _commit_compacted(
                CHUNK_SCHEMA.empty_table(), part, seg_dir
            )
            inline_rows.append(
                {
                    "partition": part,
                    "removed": removed,
                    "n_postings": 0,
                    "n_chunks": 0,
                    "file_sha256": sha,
                    "duration_s": time.monotonic() - ti,
                }
            )
            continue
        for dlo, dhi in ranges:
            work.append({"part": part, "dlo": dlo, "dhi": dhi})
    if not work and not inline_rows:
        return {
            "partitions_compacted": 0,
            "files_removed": 0,
            "seconds": time.monotonic() - t0,
        }

    def run_ranges(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                _rebuild_doc_range(int(p), seg_dir, ppc, int(lo), int(hi))
                for p, lo, hi in zip(
                    batch["part"].to_pylist(),
                    batch["dlo"].to_pylist(),
                    batch["dhi"].to_pylist(),
                )
            ],
            promote_options="default",
        )

    import pandas as pd

    if work:
        work_ds = rd.from_items(work, override_num_blocks=len(work))
        updates = (
            work_ds.map_batches(
                run_ranges, batch_format="pyarrow", batch_size=None
            )
            .groupby("term_part")
            .map_groups(
                lambda g: _finalize_compacted(g, seg_dir),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        # Legacy deltas without the n_docs/max_doc_id metadata plan a
        # single full range even when they hold ZERO postings; that
        # range rebuilds to no rows, so the partition never reaches the
        # finalize groupby and its deltas would linger on every
        # compact_index call.  Fold any planned-but-unfinalized
        # partition to an empty base inline, like the metadata-present
        # zero-posting path above.
        planned = {int(w["part"]) for w in work}
        finalized = (
            {int(p) for p in updates["partition"]} if len(updates) else set()
        )
        for part in sorted(planned - finalized):
            ti = time.monotonic()
            removed_n, sha = _commit_compacted(
                CHUNK_SCHEMA.empty_table(), part, seg_dir
            )
            inline_rows.append(
                {
                    "partition": part,
                    "removed": removed_n,
                    "n_postings": 0,
                    "n_chunks": 0,
                    "file_sha256": sha,
                    "duration_s": time.monotonic() - ti,
                }
            )
    else:
        updates = pd.DataFrame(
            columns=[
                "partition", "removed", "n_postings", "n_chunks",
                "file_sha256", "duration_s",
            ]
        )
    if inline_rows:
        updates = pd.concat(
            [updates, pd.DataFrame(inline_rows)], ignore_index=True
        )
    rows = read_manifest(index_dir)
    compacted = 0
    removed = 0
    for _, r in updates.iterrows():
        if int(r["removed"]) == 0:
            continue
        compacted += 1
        removed += int(r["removed"])
        p = int(r["partition"])
        row = rows.get(p, {"partition": p})
        row.pop("deltas", None)
        row["path"] = partition_file(seg_dir, p)
        row["file_sha256"] = str(r["file_sha256"])
        row["n_postings"] = int(r["n_postings"])
        row["n_chunks"] = int(r["n_chunks"])
        row["compacted"] = True
        rows[p] = row
    write_manifest(index_dir, rows)
    return {
        "partitions_compacted": compacted,
        "files_removed": removed,
        "seconds": time.monotonic() - t0,
    }
