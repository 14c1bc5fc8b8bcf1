"""Document-table stage: deterministic ids, content hash, exact dedup.

Replaces the reference's SQLite AUTOINCREMENT doc ids
(``Crawler.java:393-403``) and its in-memory MD5 visited/hash sets
(``Crawler.java:129-169``) with shuffle-based, rerun-stable equivalents:

* ``doc_id = (pid << 40) | rank`` where ``pid = hash(repo,path,commit) %
  num_id_partitions`` and ``rank`` is the row's position in the
  key-sorted order of its partition.  No global sort, no shared counter;
  ids are identical for any parallelism level and any resume point.
* ``content_sha256`` — the per-row invariant column (BASELINE.json
  ``input_hint``; the crawler's analog is the MD5 ``hash`` column,
  ``Crawler.java:542-555``).
* exact dedup keeps the minimum ``doc_id`` per ``content_sha256``
  (first-doc-wins, ``Crawler.java:163-169``, SURVEY.md §2.7 B6).

Scale note: both shuffles here key on high-cardinality columns (pid is
uniform by construction; sha256 is uniform), so no skew handling is needed
— unlike the term shuffle in stages/postings.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DOC_ID_PARTITION_SHIFT


def stable_hash_str(s: str) -> int:
    """Process-stable 64-bit hash (python's builtin hash() is salted)."""
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "little")


def _add_pid(batch: pa.Table, key_cols: list[str], num_partitions: int) -> pa.Table:
    keys = [batch[c].to_pylist() for c in key_cols]
    pid = np.fromiter(
        (
            stable_hash_str("\x00".join(parts)) % num_partitions
            for parts in zip(*keys)
        ),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("_pid", pa.array(pid, pa.int64()))


def _assign_ids_in_partition(group: pa.Table, key_cols: list[str]) -> pa.Table:
    pid = group["_pid"][0].as_py()
    order = pc.sort_indices(
        group, sort_keys=[(c, "ascending") for c in key_cols]
    )
    group = group.take(order)
    base = np.int64(pid) << DOC_ID_PARTITION_SHIFT
    ids = base + np.arange(group.num_rows, dtype=np.int64)
    group = group.append_column("doc_id", pa.array(ids, pa.int64()))
    return group.drop_columns(["_pid"])


def assign_doc_ids(ds, key_cols: list[str], num_partitions: int):
    """Deterministic doc_id assignment (SURVEY.md §7.2 step 1).

    One shuffle (groupby pid); within each partition rows sort by the key
    so ids don't depend on input block order.
    """
    ds = ds.map_batches(
        _add_pid,
        batch_format="pyarrow",
        fn_kwargs={"key_cols": key_cols, "num_partitions": num_partitions},
    )
    return ds.groupby("_pid").map_groups(
        _assign_ids_in_partition,
        batch_format="pyarrow",
        fn_kwargs={"key_cols": key_cols},
    )


def add_content_sha256(ds, content_col: str = "content"):
    def sha_batch(batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256(s.encode()).hexdigest() if s is not None else None
            for s in batch[content_col].to_pylist()
        ]
        return batch.append_column("content_sha256", pa.array(shas, pa.string()))

    return ds.map_batches(sha_batch, batch_format="pyarrow")


_DEDUP_BUCKETS = 64


def _add_sha_bucket(batch: pa.Table) -> pa.Table:
    # sha256 is uniform: the first 8 hex chars are a ready-made hash
    buckets = np.fromiter(
        (int(s[:8], 16) % _DEDUP_BUCKETS for s in batch["content_sha256"].to_pylist()),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("_sha_bucket", pa.array(buckets, pa.int64()))


def _dedup_bucket(group: pa.Table) -> pa.Table:
    """Vectorized first-per-sha within one bucket: sort by (sha, doc_id),
    keep change points.  One UDF call per bucket, not per sha — a
    per-group map_groups over a near-unique key would pay Python overhead
    per ROW (the mistake this replaces)."""
    order = pc.sort_indices(
        group,
        sort_keys=[("content_sha256", "ascending"), ("doc_id", "ascending")],
    )
    tbl = group.take(order)
    shas = np.asarray(tbl["content_sha256"].to_pylist(), dtype=object)
    keep = np.empty(len(shas), dtype=bool)
    if len(shas):
        keep[0] = True
        keep[1:] = shas[1:] != shas[:-1]
    return tbl.filter(pa.array(keep)).drop_columns(["_sha_bucket"])


def dedup_exact(ds):
    """Exact content dedup: first (min doc_id) row per sha wins (B6).

    Bucketed shuffle: rows hash to one of _DEDUP_BUCKETS groups by sha
    prefix; each group dedups vectorized.  Scale note: bucket count just
    needs buckets to fit a worker — sha is uniform so there is no skew."""
    return (
        ds.map_batches(_add_sha_bucket, batch_format="pyarrow")
        .groupby("_sha_bucket")
        .map_groups(_dedup_bucket, batch_format="pyarrow")
    )


def prepare_documents(
    ds,
    key_cols: list[str] | None,
    content_col: str,
    num_id_partitions: int,
    id_col: str | None = None,
    title_from: str | None = "path",
):
    """Full doc-table stage: ids + sha + dedup + title + url.

    ``id_col`` short-circuits id assignment when the source already carries
    stable ids (e.g. the driver's ``documents.doc_id``).  ``title`` mirrors
    ``DocumentMetaData.title``: for the code corpus it's the path basename;
    ``url`` mirrors the crawler's key (``repo://{repo}/{path}``).
    """
    if id_col is not None:
        if id_col != "doc_id":
            ds = ds.map_batches(
                lambda b: b.rename_columns(
                    [("doc_id" if c == id_col else c) for c in b.column_names]
                ),
                batch_format="pyarrow",
            )
    else:
        assert key_cols, "need key_cols when no id column is given"
        ds = assign_doc_ids(ds, key_cols, num_id_partitions)
    ds = add_content_sha256(ds, content_col)

    def add_meta(batch: pa.Table) -> pa.Table:
        if title_from and title_from in batch.column_names:
            titles = [
                (p.rsplit("/", 1)[-1] if p is not None else "")
                for p in batch[title_from].to_pylist()
            ]
        else:
            titles = [""] * batch.num_rows
        if "repo" in batch.column_names and "path" in batch.column_names:
            urls = [
                f"repo://{r}/{p}"
                for r, p in zip(
                    batch["repo"].to_pylist(), batch["path"].to_pylist()
                )
            ]
        else:
            urls = [f"doc://{d}" for d in batch["doc_id"].to_pylist()]
        batch = batch.append_column("title", pa.array(titles, pa.string()))
        return batch.append_column("url", pa.array(urls, pa.string()))

    ds = ds.map_batches(add_meta, batch_format="pyarrow")
    return dedup_exact(ds)
