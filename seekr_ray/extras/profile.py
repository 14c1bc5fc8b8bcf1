"""Data-quality column profiling (the expectation-check primitive).

One row per profiled column: ``(col_name, n, n_null, n_distinct,
min_v, max_v)`` — the table-health summary a 100 TB ingest runs before
and after every pipeline stage (null-rate regressions, key-cardinality
drift, range violations).

Plan shape — two narrow passes, no all-to-all over rows:

1. moments — ``map_batches`` emits ONE partial row per (block, column)
   with additive/extremal stats (n, n_null, min, max); a groupby over
   <= n_cols string keys reduces them (exchange O(blocks * cols)).
2. distinct — per-block DISTINCT ``(col, value)`` partials, bucketed by
   crc32 so equal values co-locate, per-bucket dedupe + count, then the
   same tiny per-col reduce.  The exchange is O(distinct values) — the
   exact-path cost; the HLL sketch (extras/sketch.py) is the bounded
   alternative when cardinality itself is huge.

min/max are emitted as strings via ``str()`` — profiled columns are
restricted to int64 / ASCII string types where Python and DuckDB
``::VARCHAR`` renderings agree byte-for-byte (floats would not:
repr(0.1) vs DuckDB's shortest-round-trip differ; quantize first or
profile them as cents).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _min_max_str(col: pa.ChunkedArray | pa.Array):
    """(min, max) of non-null values rendered as strings; ('', '') when
    all-null (mirrored in SQL as coalesce(min(c)::VARCHAR, ''))."""
    valid = pc.drop_null(col)
    if len(valid) == 0:
        return "", ""
    mm = pc.min_max(valid)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    return str(lo), str(hi)


def profile_columns(ds, cols: list[str], num_buckets: int = 64):
    """Profile ``cols`` (int64 / ASCII string) of ``ds``."""

    def block_moments(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            col = batch[c]
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            lo, hi = _min_max_str(col)
            mins.append(lo)
            maxs.append(hi)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.string()),
                "max_v": pa.array(maxs, pa.string()),
            }
        )

    def reduce_moments(group: pa.Table) -> pa.Table:
        name = group["col_name"][0].as_py()
        mins = [v for v in group["min_v"].to_pylist() if v != ""]
        maxs = [v for v in group["max_v"].to_pylist() if v != ""]
        # string compare of stringified ints is NOT numeric order — all
        # partials of an int column re-compare numerically
        numeric = name in int_cols
        lo = min(mins, key=(int if numeric else str)) if mins else ""
        hi = max(maxs, key=(int if numeric else str)) if maxs else ""
        return pa.table(
            {
                "col_name": pa.array([name], pa.string()),
                "n": pa.array([pc.sum(group["n"]).as_py()], pa.int64()),
                "n_null": pa.array(
                    [pc.sum(group["n_null"]).as_py()], pa.int64()
                ),
                "min_v": pa.array([lo], pa.string()),
                "max_v": pa.array([hi], pa.string()),
            }
        )

    def block_distinct(batch: pa.Table) -> pa.Table:
        out_c, out_v, out_b = [], [], []
        for c in cols:
            vals = pc.drop_null(batch[c])
            if len(vals) == 0:
                continue
            uniq = pc.unique(
                vals if isinstance(vals, pa.Array) else vals.combine_chunks()
            )
            for v in uniq.to_pylist():
                s = str(v)
                out_c.append(c)
                out_v.append(s)
                out_b.append(zlib.crc32((c + "\x00" + s).encode()) % num_buckets)
        return pa.table(
            {
                "col_name": pa.array(out_c, pa.string()),
                "v": pa.array(out_v, pa.string()),
                "_b": pa.array(out_b, pa.int64()),
            }
        )

    def bucket_distinct_counts(group: pa.Table) -> pa.Table:
        t = (
            group.select(["col_name", "v"])
            .group_by(["col_name", "v"])
            .aggregate([])
            .group_by("col_name")
            .aggregate([("v", "count")])
        )
        return pa.table(
            {
                "col_name": t["col_name"],
                "n_distinct": t["v_count"].cast(pa.int64()),
            }
        )

    int_cols = set()
    schema = ds.schema()
    for f_name, f_type in zip(schema.names, schema.types):
        if f_name in cols and pa.types.is_integer(f_type):
            int_cols.add(f_name)

    proj = ds.select_columns(cols)
    moments = (
        proj.map_batches(block_moments, batch_format="pyarrow")
        .groupby("col_name")
        .map_groups(reduce_moments, batch_format="pyarrow")
    ).to_pandas()  # n_cols rows — bounded driver collect
    distinct = (
        proj.map_batches(block_distinct, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_distinct_counts, batch_format="pyarrow")
        .groupby("col_name")
        .sum("n_distinct")
    ).to_pandas()  # n_cols rows
    dmap = dict(
        zip(distinct["col_name"], distinct["sum(n_distinct)"].astype("int64"))
    )
    moments = moments.sort_values("col_name").reset_index(drop=True)
    return pa.table(
        {
            "col_name": pa.array(moments["col_name"], pa.string()),
            "n": pa.array(moments["n"].astype("int64"), pa.int64()),
            "n_null": pa.array(moments["n_null"].astype("int64"), pa.int64()),
            "n_distinct": pa.array(
                [int(dmap.get(c, 0)) for c in moments["col_name"]], pa.int64()
            ),
            "min_v": pa.array(moments["min_v"], pa.string()),
            "max_v": pa.array(moments["max_v"], pa.string()),
        }
    )
