"""Top-k rows per group, Ray-Data-first.

Two-phase exact top-k: every block partial-selects its own per-key
top-k inside ``map_batches`` (so at most k rows per key per block reach
the exchange), then a hash-bucketed ``groupby(bucket).map_groups``
finalizes — the shuffle moves O(keys·k) rows, not O(rows).  Top-k is
distributive (the global top-k of a key is contained in the union of
per-block top-ks), so the two-phase result is exact.  Ordering is
(value desc, id asc) — fully deterministic under value ties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_BUCKETS = 64


def _topk_kernel(
    key: np.ndarray, val: np.ndarray, idc: np.ndarray, k: int
) -> np.ndarray:
    """Indices of the per-key top-k rows by (val desc, id asc)."""
    order = np.lexsort((idc, -val, key))
    ks = key[order]
    new = np.ones(len(ks), bool)
    if len(ks) > 1:
        new[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(len(ks)) - np.repeat(starts, np.diff(np.r_[starts, len(ks)]))
    return order[rank < k]


def latest_per_key(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    payload_cols: list[str],
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Upsert compaction: the latest row per key by (ts desc, id desc) —
    the CDC/"keep newest record" primitive.  Top-1 is distributive, so
    every block keeps one candidate row per key it saw and only
    O(keys · blocks) rows reach the bucketed finalize; payload columns
    ride along untouched (exact passthrough — zero FP risk).

    Output: ``(key_col, id_col, ts_col, *payload_cols)`` with ts pinned
    to timestamp[us] (any input timestamp resolution is cast, not
    reinterpreted).
    """
    import pyarrow.compute as pc

    def _keep_latest(
        kk: np.ndarray, tt: np.ndarray, ii: np.ndarray
    ) -> np.ndarray:
        # top-1 per key by (ts desc, id desc) == _topk_kernel with the
        # id tie-break negated (the kernel breaks ties id ASC)
        return _topk_kernel(kk, tt, -ii, 1)

    def partial(batch: pa.Table) -> pa.Table:
        kk = batch[key_col].to_numpy(zero_copy_only=False)
        tt = (
            pc.cast(batch[ts_col], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        ii = batch[id_col].to_numpy(zero_copy_only=False)
        keep = _keep_latest(kk, tt, ii)
        sel = pa.array(keep, pa.int64())
        cols = {
            "_b": pa.array((kk[keep] % num_buckets).astype(np.int32), pa.int32()),
            key_col: pa.array(kk[keep], pa.int64()),
            "_t": pa.array(tt[keep], pa.int64()),
            id_col: pa.array(ii[keep], pa.int64()),
        }
        for c in payload_cols:
            cols[c] = batch[c].take(sel)
        return pa.table(cols)

    def final(group: pa.Table) -> pa.Table:
        kk = group[key_col].to_numpy(zero_copy_only=False)
        tt = group["_t"].to_numpy(zero_copy_only=False)
        ii = group[id_col].to_numpy(zero_copy_only=False)
        keep = _keep_latest(kk, tt, ii)
        sel = pa.array(keep, pa.int64())
        cols = {
            key_col: pa.array(kk[keep], pa.int64()),
            id_col: pa.array(ii[keep], pa.int64()),
            ts_col: pa.array(
                tt[keep].view("datetime64[us]"), pa.timestamp("us")
            ),
        }
        for c in payload_cols:
            cols[c] = group[c].take(sel)
        return pa.table(cols)

    return (
        ds.select_columns([key_col, ts_col, id_col, *payload_cols])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )


def topk_per_group(
    ds,
    *,
    key: str,
    value: str,
    id_col: str,
    k: int,
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Exact per-key top-k with 1-based ``rank`` column.

    Output: ``(key, id_col, value, rank)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False)
        vv = batch[value].to_numpy(zero_copy_only=False)
        ii = batch[id_col].to_numpy(zero_copy_only=False)
        keep = _topk_kernel(kk, vv, ii, k)
        return pa.table(
            {
                "_b": pa.array(
                    (kk[keep] % num_buckets).astype(np.int32), pa.int32()
                ),
                key: pa.array(kk[keep], pa.int64()),
                id_col: pa.array(ii[keep], pa.int64()),
                value: pa.array(vv[keep], pa.float64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        kk = group[key].to_numpy(zero_copy_only=False)
        vv = group[value].to_numpy(zero_copy_only=False)
        ii = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ii, -vv, kk))
        ks = kk[order]
        new = np.ones(len(ks), bool)
        if len(ks) > 1:
            new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(ks)) - np.repeat(
            starts, np.diff(np.r_[starts, len(ks)])
        )
        keep = rank < k
        sel = order[keep]
        return pa.table(
            {
                key: pa.array(kk[sel], pa.int64()),
                id_col: pa.array(ii[sel], pa.int64()),
                value: pa.array(vv[sel], pa.float64()),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )
