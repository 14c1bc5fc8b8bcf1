"""Posting-list construction: the wide, skew-aware shuffle (SURVEY.md §7.2
steps 3-4, §4 "Skew control").

Pipeline shape (ONE all-to-all exchange)::

    postings (doc_id, term, tf, positions)
      ├─ map_batches partial df ── groupby(term).sum ─> term_stats
      │                            (term, df, idf, n_salts, term_part)
      └─ map_batches add_partition_keys (salt, term_part)
           └─ groupby(term_part).map_groups(BuildAndWritePartition)
                -> segments/part-K.parquet + manifest row

* **df / idf** come from a per-batch partial aggregation (one row per term
  per batch) so the stats shuffle moves tiny (term, count) pairs — the
  distributed form of ``SQLiteSearcher.updateIDF``'s ``GROUP BY word``
  (``Indexer/SQLiteSearcher.java:339-403``).  ``idf = log10(N/df)``:
  SQLite's ``-LOG(df/N)`` is base-10 (SURVEY.md §1.3).
* **Hot terms** (df > cfg.hot_df_threshold) are split into
  ``n_salts = ceil(df / threshold)`` doc-id-keyed salts, and each
  (term, salt) routes to its OWN partition ``hash(term:salt) % P`` — so a
  term that appears in half the corpus spreads across partitions instead
  of melting one reducer (the north rule's "skew-aware repartitioning of
  hot terms").  ``n_salts`` is recorded in term_stats; the query store
  fans its reads across the salt partitions.
* **Chunks** cap postings-per-row at ``cfg.postings_per_chunk`` (Lucene
  block style): bounded Arrow rows AND block-max WAND granularity.
* The partition build is vectorized: one sort per partition, run
  boundaries via numpy, delta+varbyte encode over Arrow list offsets —
  no per-posting Python.
* Determinism: rows are (term, salt, doc_id)-sorted before encoding, so
  a resumed build writes byte-identical files (SURVEY.md §7.5.4).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec import encode_doc_ids, pack_f64, varbyte_encode
from .doc_table import stable_hash_str

CHUNK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("chunk_seq", pa.int32()),
        ("n_docs", pa.int32()),
        ("doc_ids_enc", pa.binary()),
        ("tfs_enc", pa.binary()),
        ("pos_blob_lens_enc", pa.binary()),
        ("pos_blobs", pa.binary()),
        # per-posting importance (best-section weight, SQLiteSearcher.java:69);
        # NULL means "all 1.0" so single-section corpora store zero bytes
        ("importance_enc", pa.binary()),
        ("max_tf", pa.float64()),
        ("min_doc_id", pa.int64()),
        ("max_doc_id", pa.int64()),
        ("term_part", pa.int64()),
    ]
)


def term_partition(term: str, num_partitions: int, salt: int = 0) -> int:
    """Partition routing.  salt 0 (the common case) hashes the bare term;
    hot-term salts hash (term, salt) so their chunks spread across
    partitions."""
    if salt == 0:
        return stable_hash_str(term) % num_partitions
    return stable_hash_str(f"{term}\x00{salt}") % num_partitions


# ---------------------------------------------------------------------------
# df / idf (A2-A4)
# ---------------------------------------------------------------------------


def _partial_df(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Per-block partial df + the term's partition key (computed once per
    unique term, memoized per worker process)."""
    g = batch.select(["term"]).group_by("term").aggregate([("term", "count")])
    g = g.rename_columns(["term", "df_part"])
    cache = _part_cache(num_partitions)
    parts = np.empty(g.num_rows, dtype=np.int64)
    for i, t in enumerate(g["term"].to_pylist()):
        p = cache.get(t)
        if p is None:
            p = term_partition(t, num_partitions)
            cache[t] = p
        parts[i] = p
    return g.append_column("term_part", pa.array(parts, pa.int64()))


def compute_term_stats(postings_ds, n_docs: int, cfg):
    """postings -> term_stats Dataset (term, df, idf, n_salts, term_part).

    The global aggregation is a groupby on the INT partition key (P
    groups) with a vectorized Arrow group_by(term) inside each group —
    Ray's native string-key aggregate was the build's slowest operator at
    this shape (measured: 72s for 1.7M partial rows at 2 cpus; this form
    takes ~2s)."""
    num_partitions = cfg.num_term_partitions
    threshold = cfg.hot_df_threshold
    partial = postings_ds.map_batches(
        _partial_df,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"num_partitions": num_partitions},
    )

    def finish_partition(group: pa.Table) -> pa.Table:
        term_part = int(group["term_part"][0].as_py())
        agg = (
            group.select(["term", "df_part"])
            .group_by("term")
            .aggregate([("df_part", "sum")])
        )
        df = pc.cast(agg["df_part_sum"], pa.int64())
        idf = pc.log10(pc.divide(float(n_docs), pc.cast(df, pa.float64())))
        df_np = df.to_numpy(zero_copy_only=False)
        n_salts = np.maximum(1, -(-df_np // threshold)).astype(np.int32)
        return pa.table(
            {
                "term": agg["term"],
                "df": df,
                "idf": idf,
                "n_salts": pa.array(n_salts, pa.int32()),
                "term_part": pa.array(
                    np.full(agg.num_rows, term_part, dtype=np.int64), pa.int64()
                ),
            }
        )

    return partial.groupby("term_part").map_groups(
        finish_partition, batch_format="pyarrow"
    )


def hot_terms_from_parquet(stats_dir: str, threshold: int) -> dict[str, int]:
    """Same result read straight from the written term_stats parquet with
    a pushed-down row filter — no Ray execution for a tiny lookup."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(stats_dir, format="parquet", partitioning="hive")
    tbl = dataset.to_table(
        columns=["term", "n_salts"], filter=pads.field("df") > threshold
    )
    return {
        t: int(s)
        for t, s in zip(tbl["term"].to_pylist(), tbl["n_salts"].to_pylist())
    }


# ---------------------------------------------------------------------------
# partition keys
# ---------------------------------------------------------------------------


# per-worker-process caches for the stateless partition-key tasks: the
# broadcast hot dict is fetched once per process (zero-copy plasma get)
# and term->partition hashes memoize across batches.  The partition memo
# MUST be keyed by num_partitions: worker processes outlive a single
# build, and a cache warmed under P=8 silently mis-partitions a later
# P=4 build (hot terms vanish from their expected partitions).
_HOT_CACHE: dict[str, dict] = {}
_PART_CACHES: dict[int, dict[str, int]] = {}


def _part_cache(num_partitions: int) -> dict[str, int]:
    cache = _PART_CACHES.get(num_partitions)
    if cache is None:
        _PART_CACHES.clear()
        cache = _PART_CACHES.setdefault(num_partitions, {})
    return cache


def add_partition_keys(batch: pa.Table, hot_ref, num_partitions: int) -> pa.Table:
    """Adds (salt, term_part).  A stateless TASK stage on purpose: tasks
    are elastic, so this never competes with other pools for reserved
    CPUs.  Vectorized via dictionary encoding: the per-term hash runs
    once per UNIQUE term per block (memoized per worker process), then
    fans out with a take."""
    import ray

    if hot_ref is None:
        hot = {}
    else:
        key = hot_ref.hex()
        hot = _HOT_CACHE.get(key)
        if hot is None:
            hot = ray.get(hot_ref)
            _HOT_CACHE.clear()
            _HOT_CACHE[key] = hot
    cache = _part_cache(num_partitions)
    n = batch.num_rows
    enc = pc.dictionary_encode(batch["term"])
    if enc.num_chunks:
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    parts_u = np.empty(len(uniq), dtype=np.int64)
    hot_uniq: list[tuple[int, str, int]] = []
    for u, t in enumerate(uniq):
        s_count = hot.get(t)
        if s_count:
            hot_uniq.append((u, t, s_count))
            parts_u[u] = -1
        else:
            p = cache.get(t)
            if p is None:
                p = term_partition(t, num_partitions)
                cache[t] = p
            parts_u[u] = p
    parts = parts_u[idx]
    salts = np.zeros(n, dtype=np.int32)
    if hot_uniq:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        for u, t, s_count in hot_uniq:
            mask = idx == u
            s = (doc_ids[mask] % s_count).astype(np.int64)
            salts[mask] = s.astype(np.int32)
            salt_parts = np.fromiter(
                (term_partition(t, num_partitions, k) for k in range(s_count)),
                dtype=np.int64,
                count=s_count,
            )
            parts[mask] = salt_parts[s]
    batch = batch.append_column("salt", pa.array(salts, pa.int32()))
    return batch.append_column("term_part", pa.array(parts, pa.int64()))


# ---------------------------------------------------------------------------
# vectorized per-partition chunk build
# ---------------------------------------------------------------------------


def _flat_binary_views(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, data uint8) views over ALL chunks of a
    (large_)binary column — no combine_chunks (which would re-overflow the
    2 GiB ceiling this exists to avoid)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    off_parts = [np.zeros(1, dtype=np.int64)]
    data_parts = []
    base = 0
    for ch in chunks:
        if len(ch) == 0:
            continue
        bufs = ch.buffers()
        odt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        offs = np.frombuffer(bufs[1], dtype=odt)[
            ch.offset : ch.offset + len(ch) + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
            if bufs[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
        off_parts.append(offs[1:] - offs[0] + base)
        base += int(offs[-1] - offs[0])
        data_parts.append(data)
    pos_offs = np.concatenate(off_parts)
    pos_data = (
        np.concatenate(data_parts) if data_parts else np.empty(0, dtype=np.uint8)
    )
    return pos_offs, pos_data


def build_partition_chunks(group: pa.Table, postings_per_chunk: int) -> pa.Table:
    """All postings of one term_part -> chunk rows, vectorized.

    One multi-key sort, then numpy run detection per (term, salt); the
    per-posting position blobs arrive pre-encoded from the tokenizer, so
    a chunk's position payload is a single memcpy slice of the binary
    column's data buffer."""
    term_part = int(group["term_part"][0].as_py())
    # large_binary end-to-end for the position payload: int64 offsets keep
    # a partition whose positions exceed 2 GiB from overflowing (the
    # int32-offset `binary` type caps a single array at 2 GiB)
    pos_idx = group.schema.get_field_index("positions")
    group = group.set_column(
        pos_idx, "positions", pc.cast(group["positions"], pa.large_binary())
    )
    order = pc.sort_indices(
        group,
        sort_keys=[("term", "ascending"), ("salt", "ascending"), ("doc_id", "ascending")],
    )
    tbl = group.take(order)
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
    salts = tbl["salt"].to_numpy(zero_copy_only=False)
    doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = tbl["tf"].to_numpy(zero_copy_only=False)
    imps = (
        tbl["importance"].to_numpy(zero_copy_only=False)
        if "importance" in tbl.column_names
        else None
    )

    n = len(tbl)
    rows = {k: [] for k in CHUNK_SCHEMA.names}
    if n == 0:
        return pa.table(rows, schema=CHUNK_SCHEMA)

    pos_offs, pos_data = _flat_binary_views(tbl["positions"])

    # run boundaries at (term, salt) changes
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    run_starts = np.flatnonzero(change)
    run_ends = np.r_[run_starts[1:], n]

    for rs, re_ in zip(run_starts, run_ends):
        term = terms[rs]
        salt = int(salts[rs])
        seq = 0
        for cs in range(rs, re_, postings_per_chunk):
            ce = min(cs + postings_per_chunk, re_)
            ids = doc_ids[cs:ce]
            tf = tfs[cs:ce]
            blob_lens = (pos_offs[cs + 1 : ce + 1] - pos_offs[cs:ce]).astype(np.uint64)
            blobs = pos_data[pos_offs[cs] : pos_offs[ce]].tobytes()
            rows["term"].append(term)
            rows["salt"].append(salt)
            rows["chunk_seq"].append(seq)
            rows["n_docs"].append(ce - cs)
            rows["doc_ids_enc"].append(encode_doc_ids(ids))
            rows["tfs_enc"].append(pack_f64(tf))
            rows["pos_blob_lens_enc"].append(varbyte_encode(blob_lens))
            rows["pos_blobs"].append(blobs)
            if imps is None:
                rows["importance_enc"].append(None)
            else:
                imp = imps[cs:ce]
                rows["importance_enc"].append(
                    None if (imp == 1.0).all() else pack_f64(imp)
                )
            rows["max_tf"].append(float(tf.max()))
            rows["min_doc_id"].append(int(ids[0]))
            rows["max_doc_id"].append(int(ids[-1]))
            rows["term_part"].append(term_part)
            seq += 1
    return pa.table(rows, schema=CHUNK_SCHEMA)
