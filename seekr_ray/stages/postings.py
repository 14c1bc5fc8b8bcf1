"""Posting-list construction: the wide, skew-aware shuffle (SURVEY.md §7.2
steps 3-4, §4 "Skew control").

Pipeline shape::

    postings (doc_id, term, tf, positions)
      ├─ map_batches partial df  ─ groupby(term).sum ─> term_stats (term, df, idf)
      └─ map_batches add (salt, term_part)
           └─ groupby(term, salt).map_groups(build_chunks)
                └─ groupby(term_part).map_groups(SegmentPartitionWriter)

* **df / idf** come from a per-batch partial aggregation (one row per term
  per batch) so the stats shuffle moves tiny rows, not postings — the
  distributed form of ``SQLiteSearcher.updateIDF``'s ``GROUP BY word``
  (``Indexer/SQLiteSearcher.java:339-403``).  ``idf = log10(N / df)``:
  SQLite's ``-LOG(df/N)`` is base-10 (SURVEY.md §1.3).
* **Hot terms** (df > cfg.hot_df_threshold — fed back from the stats pass)
  are salted by ``doc_id % S`` into S sub-groups so no single
  ``map_groups`` call sees an unbounded group.  Chunks from different
  salts cover interleaved doc-id ranges; that's fine — query-side merge
  and WAND only need per-chunk (min_doc, max_doc, max_tf) metadata, not
  globally sorted chunks.
* **Chunks** cap postings-per-row at ``cfg.postings_per_chunk`` (Lucene
  block style): bounded Arrow rows AND block-max WAND granularity.
* Every byte written is a pure function of (rows, config): groups are
  doc_id-sorted before encoding and partition files are row-sorted before
  writing, so a resumed build reproduces identical segment files
  (SURVEY.md §7.5.4).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec import encode_doc_ids, encode_position_lists, pack_f64
from .doc_table import stable_hash_str

CHUNK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("chunk_seq", pa.int32()),
        ("n_docs", pa.int32()),
        ("doc_ids_enc", pa.binary()),
        ("tfs_enc", pa.binary()),
        ("pos_lens_enc", pa.binary()),
        ("pos_vals_enc", pa.binary()),
        ("max_tf", pa.float64()),
        ("min_doc_id", pa.int64()),
        ("max_doc_id", pa.int64()),
        ("term_part", pa.int64()),
    ]
)


def term_partition(term: str, num_partitions: int) -> int:
    return stable_hash_str(term) % num_partitions


# ---------------------------------------------------------------------------
# df / idf (A2-A4)
# ---------------------------------------------------------------------------


def _partial_df(batch: pa.Table) -> pa.Table:
    g = batch.select(["term"]).group_by("term").aggregate([("term", "count")])
    return g.rename_columns(["term", "df_part"])


def compute_term_stats(postings_ds, n_docs: int, num_partitions: int):
    """postings -> term_stats Dataset (term, df, idf, term_part).

    Partial-aggregates per batch before the groupby so the shuffle moves
    (term, count) pairs.  ``n_docs`` is the post-dedup corpus size N (A3).
    """
    partial = postings_ds.map_batches(_partial_df, batch_format="pyarrow")
    stats = partial.groupby("term").sum("df_part")

    def finish(batch: pa.Table) -> pa.Table:
        df = batch["sum(df_part)"]
        idf = pc.log10(pc.divide(float(n_docs), pc.cast(df, pa.float64())))
        parts = np.fromiter(
            (term_partition(t, num_partitions) for t in batch["term"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                "term": batch["term"],
                "df": pc.cast(df, pa.int64()),
                "idf": idf,
                "term_part": pa.array(parts, pa.int64()),
            }
        )

    return stats.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# salting + chunk build
# ---------------------------------------------------------------------------


class AddSaltAndPartition:
    """Adds (salt, term_part) columns.  ``hot`` maps term -> salt count S;
    the dict is broadcast once via ray.put and read per actor, never
    re-shipped per batch."""

    def __init__(self, hot_ref, num_partitions: int):
        import ray

        self.hot = ray.get(hot_ref) if hot_ref is not None else {}
        self.num_partitions = num_partitions
        self._part_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cache = self._part_cache
        parts = np.empty(len(terms), dtype=np.int64)
        salts = np.zeros(len(terms), dtype=np.int32)
        hot = self.hot
        for i, t in enumerate(terms):
            p = cache.get(t)
            if p is None:
                p = term_partition(t, self.num_partitions)
                cache[t] = p
            parts[i] = p
            s = hot.get(t)
            if s:
                salts[i] = doc_ids[i] % s
        batch = batch.append_column("salt", pa.array(salts, pa.int32()))
        return batch.append_column("term_part", pa.array(parts, pa.int64()))


def build_chunks(group: pa.Table, postings_per_chunk: int) -> pa.Table:
    """One (term, salt) group -> compressed chunk rows."""
    term = group["term"][0].as_py()
    salt = group["salt"][0].as_py()
    term_part = group["term_part"][0].as_py()
    order = pc.sort_indices(group["doc_id"])
    doc_ids = group["doc_id"].take(order).to_numpy(zero_copy_only=False)
    tfs = group["tf"].take(order).to_numpy(zero_copy_only=False)
    positions = group["positions"].take(order).to_pylist()

    rows = {k: [] for k in CHUNK_SCHEMA.names}
    n = len(doc_ids)
    for seq, start in enumerate(range(0, n, postings_per_chunk)):
        end = min(start + postings_per_chunk, n)
        ids = doc_ids[start:end]
        tf = tfs[start:end]
        pos = positions[start:end]
        lens_enc, vals_enc = encode_position_lists(pos)
        rows["term"].append(term)
        rows["salt"].append(salt)
        rows["chunk_seq"].append(seq)
        rows["n_docs"].append(end - start)
        rows["doc_ids_enc"].append(encode_doc_ids(ids.astype(np.uint64)))
        rows["tfs_enc"].append(pack_f64(tf))
        rows["pos_lens_enc"].append(lens_enc)
        rows["pos_vals_enc"].append(vals_enc)
        rows["max_tf"].append(float(tf.max()))
        rows["min_doc_id"].append(int(ids[0]))
        rows["max_doc_id"].append(int(ids[-1]))
        rows["term_part"].append(term_part)
    return pa.table(rows, schema=CHUNK_SCHEMA)


def hot_terms_from_stats(term_stats_ds, threshold: int) -> dict[str, int]:
    """Collect {term: S} for terms whose df exceeds the salting threshold.
    The result is tiny (only Zipf-head terms) and safe to broadcast."""
    hot_tbl = (
        term_stats_ds.filter(expr=f"df > {int(threshold)}")
        .select_columns(["term", "df"])
        .to_pandas()
    )
    if hot_tbl.empty or "term" not in hot_tbl.columns:
        return {}
    return {
        t: int(math.ceil(df / threshold))
        for t, df in zip(hot_tbl["term"], hot_tbl["df"])
    }


def build_segment_rows(postings_ds, hot: dict[str, int], cfg):
    """postings -> chunk-row Dataset (pre-write)."""
    import ray

    hot_ref = ray.put(hot) if hot else None
    with_keys = postings_ds.map_batches(
        AddSaltAndPartition,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "hot_ref": hot_ref,
            "num_partitions": cfg.num_term_partitions,
        },
        concurrency=(1, 8),
    )
    return with_keys.groupby(["term", "salt"]).map_groups(
        build_chunks,
        batch_format="pyarrow",
        fn_kwargs={"postings_per_chunk": cfg.postings_per_chunk},
    )
