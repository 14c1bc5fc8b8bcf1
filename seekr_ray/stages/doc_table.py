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
  (first-doc-wins, ``Crawler.java:163-169``, SURVEY.md §2.7 B5/B6);
  duplicate *keys* (same repo/path/commit) also collapse to one row.

Shuffle discipline — the content column NEVER moves through an exchange:
pass 1 projects (keys, sha) — tens of bytes per row — and runs the id /
dedup shuffles on that; pass 2 re-reads the input and attaches ids +
metadata per batch via a broadcast key->id map, filtering dropped
duplicates.  Hashing content twice is ~2 cpu-s per GB; shuffling content
even once costs far more (object-store write+read+spill per byte).

Scale note: the broadcast key->id map works to ~10^8 rows; beyond that
the attach step becomes a ``Dataset.join`` on the key columns with
identical semantics (documented trade — the shuffles here stay tiny
either way).
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


def _key_of(parts) -> str:
    return "\x00".join("" if p is None else str(p) for p in parts)


def _add_pid(batch: pa.Table, key_cols: list[str], num_partitions: int) -> pa.Table:
    keys = [batch[c].to_pylist() for c in key_cols]
    pid = np.fromiter(
        (stable_hash_str(_key_of(parts)) % num_partitions for parts in zip(*keys)),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("_pid", pa.array(pid, pa.int64()))


def _assign_ids_in_partition(group: pa.Table, key_cols: list[str]) -> pa.Table:
    """Sort one pid partition by key, drop duplicate keys (first wins —
    the visited-set analog, B5), assign rank-based ids."""
    pid = group["_pid"][0].as_py()
    order = pc.sort_indices(group, sort_keys=[(c, "ascending") for c in key_cols])
    group = group.take(order)
    keys = list(zip(*[group[c].to_pylist() for c in key_cols]))
    keep = np.empty(len(keys), dtype=bool)
    if keys:
        keep[0] = True
        for i in range(1, len(keys)):
            keep[i] = keys[i] != keys[i - 1]
        group = group.filter(pa.array(keep))
    base = np.int64(pid) << DOC_ID_PARTITION_SHIFT
    ids = base + np.arange(group.num_rows, dtype=np.int64)
    group = group.append_column("doc_id", pa.array(ids, pa.int64()))
    return group.drop_columns(["_pid"])


def assign_doc_ids(ds, key_cols: list[str], num_partitions: int):
    """Deterministic doc_id assignment (SURVEY.md §7.2 step 1) over a
    KEY-ONLY dataset: one small shuffle (groupby pid)."""
    from ..build import _target_blocks

    ds = ds.map_batches(
        _add_pid,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"key_cols": key_cols, "num_partitions": num_partitions},
    )
    # pairs are tiny; coalesce so the groupby shuffle is #blocks-linear
    ds = ds.repartition(_target_blocks())
    return ds.groupby("_pid").map_groups(
        _assign_ids_in_partition,
        batch_format="pyarrow",
        fn_kwargs={"key_cols": key_cols},
    )


_DEDUP_BUCKETS = 64


def _dedup_drop_ids(pairs_ds) -> set[int]:
    """(content_sha256, doc_id) -> doc_ids to DROP (every id that is not
    the minimum of its sha group).  Bucketed vectorized dedup; the drop
    set is the ~duplicate-fraction of the corpus, cheap to broadcast."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = np.fromiter(
            (
                int(s[:8], 16) % _DEDUP_BUCKETS
                for s in batch["content_sha256"].to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("_b", pa.array(buckets, pa.int64()))

    def drops_in_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("content_sha256", "ascending"), ("doc_id", "ascending")],
        )
        tbl = group.take(order)
        shas = np.asarray(tbl["content_sha256"].to_pylist(), dtype=object)
        drop = np.empty(len(shas), dtype=bool)
        if len(shas):
            drop[0] = False
            drop[1:] = shas[1:] == shas[:-1]
        return pa.table({"doc_id": tbl["doc_id"].filter(pa.array(drop))})

    from ..build import _target_blocks

    drops = (
        pairs_ds.select_columns(["content_sha256", "doc_id"])
        .repartition(_target_blocks())
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(drops_in_bucket, batch_format="pyarrow")
    )
    out: set[int] = set()
    for batch in drops.iter_batches(batch_format="pyarrow"):
        out.update(batch["doc_id"].to_pylist())
    return out


def _sha_hex(texts: list[str | None]) -> list[str]:
    return [
        hashlib.sha256((t or "").encode()).hexdigest() if t is not None else ""
        for t in texts
    ]


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
    import ray

    if id_col is not None:
        # pass 1: (sha, doc_id) pairs only
        def sha_pairs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "content_sha256": pa.array(
                        _sha_hex(batch[content_col].to_pylist()), pa.string()
                    ),
                    "doc_id": pc.cast(batch[id_col], pa.int64()),
                }
            )

        drop_ids = _dedup_drop_ids(
            ds.map_batches(sha_pairs, batch_format="pyarrow", batch_size=None)
        )
        id_map_ref = None
    else:
        assert key_cols, "need key_cols when no id column is given"

        def key_pairs(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in key_cols}
            cols["content_sha256"] = pa.array(
                _sha_hex(batch[content_col].to_pylist()), pa.string()
            )
            return pa.table(cols)

        pairs = ds.map_batches(key_pairs, batch_format="pyarrow", batch_size=None)
        with_ids = assign_doc_ids(pairs, key_cols, num_id_partitions)
        # collect the small (key -> id) table + compute the drop set in
        # the same materialized pass
        id_map: dict[tuple, int] = {}
        sha_rows: list[pa.Table] = []
        for batch in with_ids.iter_batches(batch_format="pyarrow"):
            keys = list(zip(*[batch[c].to_pylist() for c in key_cols]))
            for k, d in zip(keys, batch["doc_id"].to_pylist()):
                id_map[k] = d
            sha_rows.append(batch.select(["content_sha256", "doc_id"]))
        import ray.data as rd

        drop_ids = _dedup_drop_ids(
            rd.from_arrow(pa.concat_tables(sha_rows)) if sha_rows else rd.from_items([])
        )
        id_map_ref = ray.put(id_map)

    drop_ref = ray.put(drop_ids)

    def attach(batch: pa.Table) -> pa.Table:
        drops = ray.get(drop_ref)
        if id_col is not None:
            if id_col != "doc_id":
                batch = batch.rename_columns(
                    [("doc_id" if c == id_col else c) for c in batch.column_names]
                )
            ids = batch["doc_id"].to_pylist()
        else:
            lookup = ray.get(id_map_ref)
            keys = list(zip(*[batch[c].to_pylist() for c in key_cols]))
            ids = [lookup.get(k) for k in keys]
            batch = batch.append_column("doc_id", pa.array(ids, pa.int64()))
        shas = _sha_hex(batch[content_col].to_pylist())
        if "content_sha256" not in batch.column_names:
            batch = batch.append_column("content_sha256", pa.array(shas, pa.string()))
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
                for r, p in zip(batch["repo"].to_pylist(), batch["path"].to_pylist())
            ]
        else:
            urls = [f"doc://{d}" for d in batch["doc_id"].to_pylist()]
        batch = batch.append_column("title", pa.array(titles, pa.string()))
        batch = batch.append_column("url", pa.array(urls, pa.string()))
        # drop duplicate-content rows and (key-dup) rows with no id
        keep = [
            (d is not None) and (d not in drops) for d in batch["doc_id"].to_pylist()
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)


# Back-compat vectorized dedup over full rows (used by tests/extras);
# prefer prepare_documents which never shuffles content.
def add_content_sha256(ds, content_col: str = "content"):
    def sha_batch(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "content_sha256",
            pa.array(_sha_hex(batch[content_col].to_pylist()), pa.string()),
        )

    return ds.map_batches(sha_batch, batch_format="pyarrow", batch_size=None)


def _add_sha_bucket(batch: pa.Table) -> pa.Table:
    buckets = np.fromiter(
        (int(s[:8], 16) % _DEDUP_BUCKETS for s in batch["content_sha256"].to_pylist()),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("_sha_bucket", pa.array(buckets, pa.int64()))


def _dedup_bucket(group: pa.Table) -> pa.Table:
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
    """Exact content dedup over full rows: first (min doc_id) per sha."""
    return (
        ds.map_batches(_add_sha_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_sha_bucket")
        .map_groups(_dedup_bucket, batch_format="pyarrow")
    )
