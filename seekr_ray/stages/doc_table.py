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


# ---------------------------------------------------------------------------
# single-full-pass doc table (build.py v2 path)
#
# The round-1 two-pass design read + sha-hashed the corpus TWICE (pass 1
# key/sha projection, pass 2 attach).  The v2 split touches content exactly
# once:
#
#   pass 0 (key columns only — no content read): khash -> dense doc_id
#   pass 1 (THE full read): sha + doc_id attach + title/url, written
#          sorted-by-doc_id with small row groups (point-lookup pruning)
#   pass 2 (narrow (doc_id, sha) columnar read of the written docs):
#          dedup losers -> small drops table; consumers filter against it
#
# Duplicate rows stay physically present in docs/ and are masked by the
# drops table everywhere downstream — the ~duplicate-fraction storage
# overhead buys back a full corpus decode + sha pass per build.
# ---------------------------------------------------------------------------


# below this row count the id / dedup bookkeeping runs driver-side
# (vectorized numpy over two narrow columns — ~80 B/row transient); above
# it the identical math runs as bucketed Dataset groupbys.  The crossover
# exists because a Ray all-to-all costs ~seconds of fixed overhead that
# dwarfs tiny inputs, while 20M rows is still < 2 GB of driver heap.
DRIVER_TABLE_LIMIT = 20_000_000


def _unique_rank_partition(group: pa.Table) -> pa.Table:
    """One pid group of key hashes -> (khash unique sorted, doc_id).
    Identical id assignment to ``_assign_ids_in_partition`` (rank over the
    sorted unique khashes of the pid), without needing content/sha."""
    pid = group["_pid"][0].as_py()
    kh = np.unique(group["_khash"].to_numpy(zero_copy_only=False))
    base = np.int64(pid) << DOC_ID_PARTITION_SHIFT
    ids = base + np.arange(len(kh), dtype=np.int64)
    return pa.table(
        {
            "_khash": pa.array(kh, pa.uint64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


def assign_ids_dataset(keys_ds, key_cols: list[str], num_partitions: int):
    """Key-only id assignment as a DATASET (khash uint64, doc_id int64)
    — the form that stays distributed for the join-based attach when the
    unique-key table outgrows a broadcast."""
    from ..build import _target_blocks

    def add_keys(batch: pa.Table) -> pa.Table:
        kh = key_hashes(batch, key_cols)
        return pa.table(
            {
                "_khash": pa.array(kh, pa.uint64()),
                "_pid": pa.array(
                    (kh % num_partitions).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        keys_ds.map_batches(add_keys, batch_format="pyarrow", batch_size=None)
        .repartition(_target_blocks())
        .groupby("_pid")
        .map_groups(_unique_rank_partition, batch_format="pyarrow")
    )


def assign_ids_from_keys(keys_ds, key_cols: list[str], num_partitions: int):
    """Key-only id assignment: Dataset[key_cols] -> driver-side sorted
    (khash, doc_id) arrays.  The shuffle moves 8-byte hashes only; the
    collected map is 16 B/doc (join-based attach takes over past the
    broadcast limit — see ``attach_documents_via_join``)."""
    ranked = assign_ids_dataset(keys_ds, key_cols, num_partitions)
    kh_parts, id_parts = [], []
    for b in ranked.iter_batches(batch_format="pyarrow"):
        kh_parts.append(b["_khash"].to_numpy(zero_copy_only=False))
        id_parts.append(b["doc_id"].to_numpy(zero_copy_only=False))
    if kh_parts:
        kh = np.concatenate(kh_parts)
        ids = np.concatenate(id_parts)
        order = np.argsort(kh)
        return kh[order], ids[order]
    return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)


def assign_ids_driver(keys_tbl: pa.Table, key_cols: list[str], num_partitions: int):
    """Driver-side form of ``assign_ids_from_keys`` (same math, no
    shuffle): khash -> unique sorted per pid -> rank ids.  Used below
    DRIVER_TABLE_LIMIT rows."""
    kh_all = key_hashes(keys_tbl, key_cols)
    kh = np.unique(kh_all)  # sorted unique
    pids = (kh % num_partitions).astype(np.int64)
    # rank within pid over khash order: kh is globally sorted, so ranks
    # per pid are the running counts of that pid in khash order
    ids = np.empty(len(kh), dtype=np.int64)
    for p in np.unique(pids):
        mask = pids == p
        ids[mask] = (np.int64(p) << DOC_ID_PARTITION_SHIFT) + np.arange(
            mask.sum(), dtype=np.int64
        )
    return kh, ids


def attach_documents(
    ds,
    key_cols: list[str] | None,
    content_col: str,
    id_map: tuple[np.ndarray, np.ndarray] | None,
    id_col: str | None = None,
    title_from: str | None = "path",
):
    """THE single full content pass: sha256 + doc_id + title/url, each
    output batch sorted by doc_id (row-group pruning for point lookups).
    No rows are dropped here — dedup happens against the drops table
    (``compute_drops``) computed from the written output's narrow columns."""
    import ray

    map_ref = ray.put(id_map) if id_map is not None else None

    def attach(batch: pa.Table) -> pa.Table:
        if id_col is not None:
            if id_col != "doc_id":
                batch = batch.rename_columns(
                    [("doc_id" if c == id_col else c) for c in batch.column_names]
                )
            batch = batch.set_column(
                batch.column_names.index("doc_id"),
                "doc_id",
                pc.cast(batch["doc_id"], pa.int64()),
            )
        else:
            ksorted, ids = ray.get(map_ref)
            kh = key_hashes(batch, key_cols)
            pos = np.searchsorted(ksorted, kh)  # every khash is in the map
            batch = batch.append_column(
                "doc_id", pa.array(ids[pos], pa.int64())
            )
        batch = _decorate_batch(batch, content_col, title_from)
        return batch.take(pc.sort_indices(batch["doc_id"]))

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)


def _decorate_batch(
    batch: pa.Table, content_col: str, title_from: str | None
) -> pa.Table:
    """sha256 + title + url columns (shared by both attach forms)."""
    shas = _sha_hex(batch[content_col].to_pylist())
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
    elif "doc_id" in batch.column_names:
        urls = [f"doc://{d}" for d in batch["doc_id"].to_pylist()]
    else:
        urls = [""] * batch.num_rows
    batch = batch.append_column("title", pa.array(titles, pa.string()))
    return batch.append_column("url", pa.array(urls, pa.string()))


def attach_documents_via_join(
    ds,
    key_cols: list[str],
    content_col: str,
    id_map_ds,
    num_partitions: int,
    title_from: str | None = "path",
):
    """Join-form of ``attach_documents`` for corpora whose unique-key
    table outgrows a driver broadcast (>> DRIVER_TABLE_LIMIT rows): the
    (khash, doc_id) map STAYS a Dataset and ids attach via an inner hash
    join on the 8-byte key hash.  Unlike the broadcast form this moves
    the content through the join exchange — the price of not holding the
    id map anywhere whole; identical output rows (equal-by-test)."""

    def add_khash(batch: pa.Table) -> pa.Table:
        kh = key_hashes(batch, key_cols)
        batch = batch.append_column("_khash", pa.array(kh, pa.uint64()))
        return _decorate_batch(batch, content_col, title_from)

    decorated = ds.map_batches(add_khash, batch_format="pyarrow", batch_size=None)
    joined = decorated.join(
        id_map_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("_khash",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns(["_khash"])
        return batch.take(pc.sort_indices(batch["doc_id"]))

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


DROPS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("content_sha256", pa.string()),
        ("reason", pa.string()),
    ]
)


def _drops_from_arrays(ids: np.ndarray, shas: np.ndarray) -> pa.Table:
    """Vectorized loser detection over (doc_id, sha) arrays — the
    driver-side form of ``compute_drops`` (same winner rules)."""
    out_ids: list[int] = []
    out_shas: list[str] = []
    out_reason: list[str] = []
    if len(ids):
        order = np.lexsort((shas, ids))
        si, ss = ids[order], shas[order]
        kd = np.empty(len(si), dtype=bool)
        kd[0] = False
        kd[1:] = si[1:] == si[:-1]
        out_ids.extend(si[kd].tolist())
        out_shas.extend(ss[kd].tolist())
        out_reason.extend(["key_dup"] * int(kd.sum()))
        wi, ws = si[~kd], ss[~kd]
        order2 = np.lexsort((wi, ws))
        wi, ws = wi[order2], ws[order2]
        cd = np.empty(len(wi), dtype=bool)
        if len(wi):
            cd[0] = False
            cd[1:] = ws[1:] == ws[:-1]
            out_ids.extend(wi[cd].tolist())
            out_shas.extend(ws[cd].tolist())
            out_reason.extend(["content_dup"] * int(cd.sum()))
    return pa.table(
        {"doc_id": out_ids, "content_sha256": out_shas, "reason": out_reason},
        schema=DROPS_SCHEMA,
    )


def compute_drops(docs_dir: str, num_buckets: int = _DEDUP_BUCKETS) -> pa.Table:
    """Narrow (doc_id, content_sha256) pass over the written docs ->
    drops table.  Two bucketed groupbys over ~80 B/row pairs, both with
    tiny outputs:

    1. key-dup losers: rows sharing a doc_id (same key, different
       content) keep the min-sha row — the deterministic winner rule of
       B5 (``Crawler.java:129-169`` visited-set analog);
    2. content-dup losers: among winners, every doc_id that is not the
       min of its sha group (B6, ``Crawler.java:163-169``).
    """
    import ray.data as rd

    from ..build import _parquet_count, _target_blocks

    if _parquet_count(docs_dir) <= DRIVER_TABLE_LIMIT:
        import pyarrow.parquet as pq

        tbl = pq.read_table(docs_dir, columns=["doc_id", "content_sha256"])
        return _drops_from_arrays(
            tbl["doc_id"].to_numpy(zero_copy_only=False),
            np.asarray(tbl["content_sha256"].to_pylist(), dtype=object),
        )

    pairs = rd.read_parquet(
        docs_dir,
        columns=["doc_id", "content_sha256"],
        override_num_blocks=_target_blocks(),
    )

    def add_id_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_b", pa.array((ids % num_buckets).astype(np.int64), pa.int64())
        )

    def keydup_losers(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("doc_id", "ascending"), ("content_sha256", "ascending")],
        )
        tbl = group.take(order)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        lose = np.empty(len(ids), dtype=bool)
        if len(ids):
            lose[0] = False
            lose[1:] = ids[1:] == ids[:-1]
        keep = pa.array(lose)
        return pa.table(
            {
                "doc_id": tbl["doc_id"].filter(keep),
                "content_sha256": tbl["content_sha256"].filter(keep),
            }
        )

    kd = (
        pairs.map_batches(add_id_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(keydup_losers, batch_format="pyarrow")
    )
    kd_tables = list(kd.iter_batches(batch_format="pyarrow"))
    kd_tbl = (
        pa.concat_tables(kd_tables)
        if kd_tables
        else pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "content_sha256": pa.array([], pa.string()),
            }
        )
    )
    loser_ids = np.sort(kd_tbl["doc_id"].to_numpy(zero_copy_only=False))
    loser_keys = set(
        zip(
            kd_tbl["doc_id"].to_pylist(),
            kd_tbl["content_sha256"].to_pylist(),
        )
    )
    import ray

    losers_ref = ray.put((loser_ids, loser_keys))

    def winners_with_bucket(batch: pa.Table) -> pa.Table:
        lids, lkeys = ray.get(losers_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(lids):
            pos = np.minimum(np.searchsorted(lids, ids), len(lids) - 1)
            cand = lids[pos] == ids
            if cand.any():
                shas = batch["content_sha256"].to_pylist()
                keep = np.ones(len(ids), dtype=bool)
                for i in np.flatnonzero(cand):
                    if (int(ids[i]), shas[i]) in lkeys:
                        keep[i] = False
                batch = batch.filter(pa.array(keep))
        buckets = np.fromiter(
            (
                int(s[:8], 16) % num_buckets
                for s in batch["content_sha256"].to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("_b", pa.array(buckets, pa.int64()))

    def contentdup_losers(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("content_sha256", "ascending"), ("doc_id", "ascending")],
        )
        tbl = group.take(order)
        shas = np.asarray(tbl["content_sha256"].to_pylist(), dtype=object)
        lose = np.empty(len(shas), dtype=bool)
        if len(shas):
            lose[0] = False
            lose[1:] = shas[1:] == shas[:-1]
        keep = pa.array(lose)
        return pa.table(
            {
                "doc_id": tbl["doc_id"].filter(keep),
                "content_sha256": tbl["content_sha256"].filter(keep),
            }
        )

    cd = (
        pairs.map_batches(
            winners_with_bucket, batch_format="pyarrow", batch_size=None
        )
        .groupby("_b")
        .map_groups(contentdup_losers, batch_format="pyarrow")
    )
    cd_tables = list(cd.iter_batches(batch_format="pyarrow"))
    rows = {
        "doc_id": kd_tbl["doc_id"].to_pylist(),
        "content_sha256": kd_tbl["content_sha256"].to_pylist(),
        "reason": ["key_dup"] * kd_tbl.num_rows,
    }
    for t in cd_tables:
        rows["doc_id"].extend(t["doc_id"].to_pylist())
        rows["content_sha256"].extend(t["content_sha256"].to_pylist())
        rows["reason"].extend(["content_dup"] * t.num_rows)
    return pa.table(rows, schema=DROPS_SCHEMA)


class DropFilter:
    """Vectorized mask for the drops table, broadcast-friendly.

    content-dup losers are identified by doc_id alone; key-dup losers
    share their winner's doc_id and need the (doc_id, sha) pair."""

    def __init__(self, drops: pa.Table):
        reasons = np.asarray(drops["reason"].to_pylist(), dtype=object)
        ids = drops["doc_id"].to_numpy(zero_copy_only=False)
        shas = drops["content_sha256"].to_pylist()
        cmask = reasons == "content_dup"
        self.drop_ids = np.sort(ids[cmask])
        self.keydup_ids = np.sort(ids[~cmask])
        self.keydup_pairs = {
            (int(i), s)
            for i, s, r in zip(ids.tolist(), shas, reasons.tolist())
            if r == "key_dup"
        }

    @property
    def empty(self) -> bool:
        return len(self.drop_ids) == 0 and len(self.keydup_ids) == 0

    def keep_mask(self, doc_ids: np.ndarray, shas: list[str] | None) -> np.ndarray:
        keep = np.ones(len(doc_ids), dtype=bool)
        if len(self.drop_ids):
            pos = np.minimum(
                np.searchsorted(self.drop_ids, doc_ids), len(self.drop_ids) - 1
            )
            keep &= self.drop_ids[pos] != doc_ids
        if len(self.keydup_ids) and shas is not None:
            pos = np.minimum(
                np.searchsorted(self.keydup_ids, doc_ids),
                len(self.keydup_ids) - 1,
            )
            cand = self.keydup_ids[pos] == doc_ids
            for i in np.flatnonzero(cand):
                if (int(doc_ids[i]), shas[i]) in self.keydup_pairs:
                    keep[i] = False
        return keep

    def filter_batch(self, batch: pa.Table) -> pa.Table:
        if self.empty:
            return batch
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        shas = (
            batch["content_sha256"].to_pylist()
            if "content_sha256" in batch.column_names
            else None
        )
        return batch.filter(pa.array(self.keep_mask(ids, shas)))
