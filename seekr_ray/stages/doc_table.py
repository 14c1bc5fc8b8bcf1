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


def key_hashes(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """64-bit stable hash of each row's key tuple.  The key identity used
    for ids, pids and duplicate-key collapse — two distinct keys colliding
    in 64 bits is treated as a duplicate key (first wins), the same
    first-wins rule as B5; expected collisions stay negligible far past
    10^9 rows."""
    keys = [batch[c].to_pylist() for c in key_cols]
    return np.fromiter(
        (stable_hash_str(_key_of(parts)) for parts in zip(*keys)),
        dtype=np.uint64,
        count=batch.num_rows,
    )


def _assign_ids_in_partition(group: pa.Table) -> pa.Table:
    """Sort one pid partition by key hash, drop duplicate keys (first wins
    — the visited-set analog, B5), assign rank-based ids."""
    pid = group["_pid"][0].as_py()
    sort_keys = [("_khash", "ascending")]
    if "content_sha256" in group.column_names:
        # deterministic winner for duplicate keys: min content sha
        sort_keys.append(("content_sha256", "ascending"))
    order = pc.sort_indices(group, sort_keys=sort_keys)
    group = group.take(order)
    kh = group["_khash"].to_numpy(zero_copy_only=False)
    keep = np.empty(len(kh), dtype=bool)
    if len(kh):
        keep[0] = True
        keep[1:] = kh[1:] != kh[:-1]
        group = group.filter(pa.array(keep))
    base = np.int64(pid) << DOC_ID_PARTITION_SHIFT
    ids = base + np.arange(group.num_rows, dtype=np.int64)
    group = group.append_column("doc_id", pa.array(ids, pa.int64()))
    return group.drop_columns(["_pid"])


def assign_doc_ids(ds, key_cols: list[str], num_partitions: int):
    """Deterministic doc_id assignment (SURVEY.md §7.2 step 1) over a
    KEY-ONLY dataset: one small numeric shuffle (groupby pid over key
    hashes).  Output columns: _khash, doc_id (+ any carried columns)."""
    from ..build import _target_blocks

    def add_keys(batch: pa.Table) -> pa.Table:
        kh = key_hashes(batch, key_cols)
        batch = batch.append_column("_khash", pa.array(kh, pa.uint64()))
        return batch.append_column(
            "_pid", pa.array((kh % num_partitions).astype(np.int64), pa.int64())
        )

    ds = ds.map_batches(add_keys, batch_format="pyarrow", batch_size=None)
    # pairs are tiny; coalesce so the groupby shuffle is #blocks-linear
    ds = ds.repartition(_target_blocks())
    return ds.groupby("_pid").map_groups(
        _assign_ids_in_partition, batch_format="pyarrow"
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

    Driver-side work is all-numpy (sorted key-hash lookup arrays built
    from the collected pass-1 table; no per-row Python).  The drop-set /
    lookup arrays are broadcast via ``ray.put`` — at a scale where the
    unique-key table itself outgrows the driver (>> 10^8 rows), pass 1's
    outputs stay a Dataset and the attach becomes a hash join on _khash
    (``_dedup_drop_ids`` remains the dataset-shaped dedup for that path).
    """
    import ray

    if id_col is not None:
        # single pass-1: (sha, doc_id) pairs, collected vectorized
        def sha_pairs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "content_sha256": pa.array(
                        _sha_hex(batch[content_col].to_pylist()), pa.string()
                    ),
                    "doc_id": pc.cast(batch[id_col], pa.int64()),
                }
            )

        pair_tables = []
        for batch in ds.map_batches(
            sha_pairs, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            pair_tables.append(batch)
        pairs_tbl = (
            pa.concat_tables(pair_tables)
            if pair_tables
            else pa.table(
                {"content_sha256": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64())}
            )
        )
        drop_arr = _drop_ids_numpy(
            np.asarray(pairs_tbl["content_sha256"].to_pylist(), dtype=object),
            pairs_tbl["doc_id"].to_numpy(zero_copy_only=False),
        )
        khash_sorted = ids_by_khash = None
    else:
        assert key_cols, "need key_cols when no id column is given"

        def key_pairs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    c: batch[c]
                    for c in key_cols
                }
                | {
                    "content_sha256": pa.array(
                        _sha_hex(batch[content_col].to_pylist()), pa.string()
                    )
                }
            )

        pairs = ds.map_batches(key_pairs, batch_format="pyarrow", batch_size=None)
        with_ids = assign_doc_ids(pairs, key_cols, num_id_partitions)
        # vectorized driver collection: no per-row Python
        tables = [
            b.select(["_khash", "doc_id", "content_sha256"])
            for b in with_ids.iter_batches(batch_format="pyarrow")
        ]
        if tables:
            all_tbl = pa.concat_tables(tables)
            kh = all_tbl["_khash"].to_numpy(zero_copy_only=False)
            ids = all_tbl["doc_id"].to_numpy(zero_copy_only=False)
            shas = np.asarray(all_tbl["content_sha256"].to_pylist(), dtype=object)
        else:
            kh = np.empty(0, dtype=np.uint64)
            ids = np.empty(0, dtype=np.int64)
            shas = np.empty(0, dtype=object)
        order = np.argsort(kh)
        khash_sorted = kh[order]
        ids_by_khash = ids[order]
        sha_by_khash = shas[order]
        drop_arr = _drop_ids_numpy(shas, ids)

    drop_ref = ray.put(np.sort(drop_arr))
    lookup_ref = (
        ray.put((khash_sorted, ids_by_khash, sha_by_khash))
        if khash_sorted is not None
        else None
    )

    def attach(batch: pa.Table) -> pa.Table:
        drops = ray.get(drop_ref)
        if id_col is not None:
            if id_col != "doc_id":
                batch = batch.rename_columns(
                    [("doc_id" if c == id_col else c) for c in batch.column_names]
                )
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            valid = np.ones(len(ids), dtype=bool)
        else:
            ksorted, ival, sval = ray.get(lookup_ref)
            kh = key_hashes(batch, key_cols)
            if len(ksorted):
                pos = np.searchsorted(ksorted, kh)
                pos_c = np.minimum(pos, len(ksorted) - 1)
                valid = ksorted[pos_c] == kh
                ids = np.where(valid, ival[pos_c], -1)
            else:
                pos_c = np.zeros(len(kh), dtype=np.int64)
                valid = np.zeros(len(kh), dtype=bool)
                ids = np.full(len(kh), -1, dtype=np.int64)
            batch = batch.append_column("doc_id", pa.array(ids, pa.int64()))
        shas = _sha_hex(batch[content_col].to_pylist())
        if id_col is None and len(shas) and len(sval):
            # duplicate-key rows: only the winner content (min sha per
            # key, chosen deterministically at id assignment) keeps its id
            winner = np.asarray(sval[pos_c], dtype=object)
            valid = valid & (np.asarray(shas, dtype=object) == winner)
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
        # drop duplicate-content rows and key-dup rows that lost the
        # winner check above.  (Byte-identical source rows — same key AND
        # same content — are indistinguishable and would each pass; such
        # rows cannot occur when (repo,path,commit) is the input's
        # primary key, which the input contract assumes.)
        if len(drops):
            dpos = np.minimum(np.searchsorted(drops, ids), len(drops) - 1)
            dropped = drops[dpos] == ids
        else:
            dropped = np.zeros(len(ids), dtype=bool)
        keep = valid & ~dropped
        return batch.filter(pa.array(keep))

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)


def _drop_ids_numpy(shas: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized: ids to drop = every id that is not the min of its sha
    group (first-content-wins, B6)."""
    if len(shas) == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((ids, shas))
    s = shas[order]
    i = ids[order]
    dup = np.empty(len(s), dtype=bool)
    dup[0] = False
    dup[1:] = s[1:] == s[:-1]
    return i[dup].astype(np.int64)


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
