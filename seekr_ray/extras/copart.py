"""Shared hash-bucketed co-partition lookup-attach kernel.

The repo's alternative to ``Dataset.join`` for (big table) x (keyed
lookup) attaches: tag both sides with hash(key) % num_buckets, union,
one ``groupby(bucket).map_groups`` — every target row meets every
lookup row of its key in one group, where a sorted searchsorted stamp
is vectorized.  One exchange of O(|target| + |lookup|) rows; used by
extras/triangles.py (degree attach), extras/apss.py (norm attach) and
extras/kcore.py (per-round degree attach).  Chained ``Dataset.join``
hash-shuffle operators stall multi-join plans at low parallelism
(observed: two chained joins at num_cpus=4 never complete), and a
groupby co-partition is one exchange instead of two anyway.

Contract: every key_col / carry / value column is int64 (ids, counts,
packed keys — the repo's graph/pair row shape); every target key MUST
exist in the lookup (asserted per bucket) — the callers all attach
values derived FROM the target rows themselves, so a miss is a bug,
not data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pairs_within_runs(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All within-run index pairs (i < j), vectorized by run-LENGTH
    class: one ``triu_indices`` per distinct run length, broadcast over
    every run of that length at once — replaces the per-run Python
    loop (one triu call per source/group) that dominated wedge/pair
    emission kernels (triangles, APSS, co-occurrence) on graphs with
    many small runs.  Returns the two paired VALUE arrays."""
    d = ends - starts
    total = int((d * (d - 1) // 2).sum())
    out_x = np.empty(total, values.dtype)
    out_y = np.empty(total, values.dtype)
    off = 0
    for length in np.unique(d):
        if length < 2:
            continue
        s = starts[d == length]
        xi, yi = np.triu_indices(int(length), k=1)
        n = len(s) * len(xi)
        np.take(values, (s[:, None] + xi[None, :]).ravel(),
                out=out_x[off: off + n])
        np.take(values, (s[:, None] + yi[None, :]).ravel(),
                out=out_y[off: off + n])
        off += n
    return out_x, out_y


def attach_value(
    target_ds,
    lookup_ds,
    *,
    key_col: str,
    out_col: str,
    carry: list[str],
    num_buckets: int = 64,
    lookup_key: str = "node",
    lookup_value: str = "value",
    missing: str = "error",
):
    """Stamp ``lookup[lookup_value]`` onto each target row as
    ``out_col``, matching ``target[key_col] == lookup[lookup_key]``.
    Output columns: (key_col, *carry, out_col), all int64.

    ``missing``: "error" (default) raises if a target key has no lookup
    row — the graph kernels' invariant; "drop" silently drops unmatched
    target rows, i.e. co-partitioned INNER-join semantics (the TPC-H
    style filter-through-join)."""
    if missing not in ("error", "drop"):
        raise ValueError(f"unknown missing mode {missing!r}")

    def tag_lookup(batch: pa.Table) -> pa.Table:
        n = batch[lookup_key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[lookup_value].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cols = {
            "_b": pa.array(n % num_buckets, pa.int64()),
            "_side": pa.array(np.zeros(len(n), np.int8), pa.int8()),
            key_col: pa.array(n, pa.int64()),
            out_col: pa.array(v, pa.int64()),
        }
        for c in carry:
            cols[c] = pa.array(np.zeros(len(n), np.int64), pa.int64())
        return pa.table(cols)

    def tag_target(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "_b": pa.array(k % num_buckets, pa.int64()),
            "_side": pa.array(np.ones(len(k), np.int8), pa.int8()),
            key_col: pa.array(k, pa.int64()),
            out_col: pa.array(np.zeros(len(k), np.int64), pa.int64()),
        }
        for c in carry:
            cols[c] = batch[c]
        return pa.table(cols)

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False).astype(bool)
        k = group[key_col].to_numpy(zero_copy_only=False)
        vv = group[out_col].to_numpy(zero_copy_only=False)
        nodes, nv = k[~side], vv[~side]
        o = np.argsort(nodes)
        nodes, nv = nodes[o], nv[o]
        tk = k[side]
        if len(nodes):
            pos = np.searchsorted(nodes, tk)
            found = (pos < len(nodes)) & (
                nodes[np.minimum(pos, len(nodes) - 1)] == tk
            )
        else:
            pos = np.zeros(len(tk), np.int64)
            found = np.zeros(len(tk), bool)
        if not found.all():
            if missing == "error":
                raise KeyError(
                    f"attach_value: target key missing in lookup ({key_col})"
                )
            tk = tk[found]
            pos = pos[found]
        cols = {key_col: pa.array(tk, pa.int64())}
        for c in carry:
            cv = group[c].to_numpy(zero_copy_only=False)[side]
            if not found.all():
                cv = cv[found]
            cols[c] = pa.array(cv, pa.int64())
        cols[out_col] = pa.array(
            nv[pos] if len(tk) else np.empty(0, np.int64), pa.int64()
        )
        return pa.table(cols)

    tagged = lookup_ds.map_batches(tag_lookup, batch_format="pyarrow").union(
        target_ds.map_batches(tag_target, batch_format="pyarrow")
    )
    return tagged.groupby("_b").map_groups(per_bucket, batch_format="pyarrow")
