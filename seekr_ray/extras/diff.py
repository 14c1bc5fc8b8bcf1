"""Snapshot diff — classify keys across two corpus versions.

The incremental-pipeline primitive that decides what an index rebuild
actually has to touch (feeds stages/extend.py's add path): given two
keyed, content-hashed snapshots, every key is ``added`` (new only),
``removed`` (old only), ``changed`` (both, hash differs) or
``unchanged``.

Shape: both sides tagged with hash(key) % num_buckets, one union, one
``groupby(bucket).map_groups`` — each bucket holds every row of its
keys from BOTH sides, so classification is local (sorted-key merge,
vectorized).  The exchange is O(|old| + |new|) rows of (key, hash);
content itself never moves — callers pass a precomputed content hash
(the doc table's sha256 column at build time, stages/doc_table.py).

Assumes keys are unique per side (the doc-table invariant after B5
key dedup); duplicate keys raise rather than mis-classify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

STATUS = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old_ds,
    new_ds,
    *,
    key_col: str = "doc_id",
    hash_col: str = "content_hash",
    num_buckets: int = 64,
    include_unchanged: bool = True,
):
    """Per-key status across two snapshots.  Output: (key_col, status)."""

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "_b": pa.array(k % num_buckets, pa.int64()),
                    "_side": pa.array(
                        np.full(len(k), side, np.int8), pa.int8()
                    ),
                    key_col: pa.array(k, pa.int64()),
                    hash_col: batch[hash_col],
                }
            )

        return fn

    def classify(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        hashes = group[hash_col].to_numpy(zero_copy_only=False)
        ok, oh = keys[side == 0], hashes[side == 0]
        nk, nh = keys[side == 1], hashes[side == 1]
        for name, arr in (("old", ok), ("new", nk)):
            if len(np.unique(arr)) != len(arr):
                raise ValueError(f"duplicate keys in {name} snapshot")
        oo, no = np.argsort(ok), np.argsort(nk)
        ok, oh = ok[oo], oh[oo]
        nk, nh = nk[no], nh[no]
        # membership of each side in the other (sorted merge)
        pos_o_in_n = np.searchsorted(nk, ok)
        in_both_o = (pos_o_in_n < len(nk)) & (
            nk[np.minimum(pos_o_in_n, max(len(nk) - 1, 0))] == ok
            if len(nk)
            else np.zeros(len(ok), bool)
        )
        pos_n_in_o = np.searchsorted(ok, nk)
        in_both_n = (pos_n_in_o < len(ok)) & (
            ok[np.minimum(pos_n_in_o, max(len(ok) - 1, 0))] == nk
            if len(ok)
            else np.zeros(len(nk), bool)
        )
        out_k, out_s = [], []
        # removed: old only
        out_k.append(ok[~in_both_o])
        out_s.append(np.full((~in_both_o).sum(), "removed", object))
        # added: new only
        out_k.append(nk[~in_both_n])
        out_s.append(np.full((~in_both_n).sum(), "added", object))
        # both: compare hashes
        bk = ok[in_both_o]
        bh_old = oh[in_both_o]
        bh_new = nh[pos_o_in_n[in_both_o]]
        changed = bh_old != bh_new
        out_k.append(bk[changed])
        out_s.append(np.full(int(changed.sum()), "changed", object))
        if include_unchanged:
            out_k.append(bk[~changed])
            out_s.append(np.full(int((~changed).sum()), "unchanged", object))
        return pa.table(
            {
                key_col: pa.array(
                    np.concatenate(out_k).astype(np.int64), pa.int64()
                ),
                "status": pa.array(
                    np.concatenate(out_s).tolist(), pa.string()
                ),
            }
        )

    tagged = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    return tagged.groupby("_b").map_groups(classify, batch_format="pyarrow")


def diff_counts(diff_ds):
    """O(4) summary of a snapshot_diff stream: (status, n)."""
    return diff_ds.groupby("status").count().rename_columns(["status", "n"])
