"""Corpus-overlap matrix: pairwise shingle Jaccard between document
SOURCES — the cross-corpus contamination / redundancy diagnostic a
mixture designer reads before weighting sources (two feeds with 0.9
shingle overlap are one feed; a benchmark source overlapping a train
source is a leak).

Scale shape (100 TB honest): per-block DISTINCT (source, shingle)
pairs (set built where the rows live) → ONE crc32(shingle)-bucketed
exchange; within a bucket every holder of a shingle co-locates, so
per-shingle source-pair emission and per-source distinct totals fold
to per-bucket partials — the final reduce is O(sources²) rows.
Source-pair fan-out is bounded by the (small) source count per
shingle, never by corpus size.
"""

from __future__ import annotations

import itertools
import zlib

import numpy as np
import pyarrow as pa

from .decontam import _doc_shingles


def source_overlap_matrix(
    docs_ds,
    *,
    k: int = 3,
    source_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 64,
):
    """(src_a, src_b, n_shared, n_a, n_b, jaccard) for every source pair
    sharing at least one distinct k-shingle (src_a < src_b); ``n_s`` is
    the source's distinct-shingle count, jaccard the single mirrored
    IEEE division rounded at 6dp."""

    def emit(batch: pa.Table) -> pa.Table:
        seen: set[tuple[str, str]] = set()
        for src, text in zip(
            batch[source_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for s in _doc_shingles(text or "", k):
                seen.add((src, s))
        srcs, shs, buckets = [], [], []
        for src, s in seen:
            srcs.append(src)
            shs.append(s)
            buckets.append(zlib.crc32(s.encode()) % num_buckets)
        return pa.table(
            {
                "_b": pa.array(buckets, pa.int32()),
                "src": pa.array(srcs, pa.string()),
                "s": pa.array(shs, pa.string()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        # exact distinct (source, shingle) within the bucket, then
        # per-shingle source-pair partials; self rows (a == b) carry the
        # per-source distinct totals through the same reduce
        t = (
            group.drop_columns(["_b"])
            .group_by(["s", "src"])
            .aggregate([])
        )
        codes = pa.compute.dictionary_encode(t["s"].combine_chunks())
        idx = codes.indices.to_numpy(zero_copy_only=False)
        srcs = np.asarray(t["src"].to_pylist(), dtype=object)
        order = np.argsort(idx, kind="stable")
        idx, srcs = idx[order], srcs[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], idx[1:] != idx[:-1]))
        )
        acc: dict[tuple[str, str], int] = {}
        ends = np.append(bounds[1:], len(idx))
        for lo, hi in zip(bounds, ends):
            holders = sorted(srcs[lo:hi])
            for src in holders:
                key = (src, src)
                acc[key] = acc.get(key, 0) + 1
            for a, b in itertools.combinations(holders, 2):
                acc[(a, b)] = acc.get((a, b), 0) + 1
        return pa.table(
            {
                "src_a": pa.array([a for a, _ in acc], pa.string()),
                "src_b": pa.array([b for _, b in acc], pa.string()),
                "n": pa.array(list(acc.values()), pa.int64()),
            }
        )

    reduced = (
        docs_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .sum("n")
    ).to_pandas()  # O(sources²) rows
    self_rows = reduced[reduced["src_a"] == reduced["src_b"]]
    totals = {
        a: int(n) for a, n in zip(self_rows["src_a"], self_rows["sum(n)"])
    }
    pairs = reduced[reduced["src_a"] != reduced["src_b"]]
    out_a, out_b, out_n, out_na, out_nb, out_j = [], [], [], [], [], []
    from .textstats import round6

    for _, row in pairs.sort_values(["src_a", "src_b"]).iterrows():
        a, b, n = row["src_a"], row["src_b"], int(row["sum(n)"])
        na, nb = totals[a], totals[b]
        out_a.append(a)
        out_b.append(b)
        out_n.append(n)
        out_na.append(na)
        out_nb.append(nb)
        out_j.append(round6(float(n) / float(na + nb - n)))
    return pa.table(
        {
            "src_a": pa.array(out_a, pa.string()),
            "src_b": pa.array(out_b, pa.string()),
            "n_shared": pa.array(out_n, pa.int64()),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )
