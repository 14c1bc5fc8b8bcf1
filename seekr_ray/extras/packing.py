"""Sequence packing — a distributed exact prefix sum (scan).

Training pipelines concatenate tokenized documents in a fixed order and
split the stream into fixed-capacity packs (GPT-style sequence packing:
a document may straddle a pack boundary).  The assignment each doc
needs is its *global start offset* in that stream — an exact prefix sum
over doc_id order, which no groupby/sort primitive provides directly.

Three-phase exact scan, never materializing the corpus:

1. **narrow pass** — ``map_batches`` projects each doc to
   ``(doc_id, n_tokens, range)`` where ``range = doc_id // range_size``
   partitions the id space into contiguous spans (ids are
   build-assigned and dense-ish, so ranges are balanced);
2. **range totals** — ``groupby(range).sum(n_tokens)`` produces one row
   per range; the driver prefix-sums the R sorted totals (O(R), tiny)
   and broadcasts the per-range base offsets;
3. **local scan** — ``groupby(range).map_groups``: sort the range's
   rows by doc_id, cumulative-sum locally, add the broadcast base.

The exchange carries 2 ints/doc (never text), the driver holds O(R),
and every phase is deterministic — the same contract as the build's
id assignment.  ``pack_id = start_offset // capacity`` and
``pack_offset = start_offset % capacity`` then place every doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import simple_tokens

DEFAULT_RANGE_SIZE = 1 << 36  # ids are (pid << 36) | rank in the index build


def pack_offsets(
    docs_ds,
    *,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_size: int = DEFAULT_RANGE_SIZE,
):
    """Global packing offsets for every doc, in ``doc_id`` order.

    Output: ``(doc_id, n_tokens, start_offset, pack_id, pack_offset)``
    where ``start_offset`` is the sum of ``n_tokens`` over all docs with
    smaller ``doc_id`` (token counts from the simplified shared
    tokenizer).
    """
    import ray

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = np.fromiter(
            (
                len(simple_tokens(t or ""))
                for t in batch[text_col].to_pylist()
            ),
            dtype=np.int64,
            count=len(ids),
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "_rng": pa.array(ids // range_size, pa.int64()),
            }
        )

    # materialize the NARROW derived table: it feeds two consumers
    # (range totals + the local scan); without this Ray re-reads and
    # re-tokenizes the corpus for each
    counts = docs_ds.map_batches(narrow, batch_format="pyarrow").materialize()

    # phase 2: one row per range -> driver prefix sum -> broadcast
    totals = counts.groupby("_rng").sum("n_tokens").to_pandas()
    totals = totals.sort_values("_rng")
    bases = dict(
        zip(
            totals["_rng"].to_numpy(),
            np.concatenate(
                ([0], np.cumsum(totals["sum(n_tokens)"].to_numpy())[:-1])
            ),
        )
    )
    bases_ref = ray.put(bases)

    def local_scan(group: pa.Table) -> pa.Table:
        base_map = ray.get(bases_ref)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        toks = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, toks = ids[order], toks[order]
        start = base_map[int(group["_rng"][0].as_py())]
        offs = start + np.concatenate(([0], np.cumsum(toks)[:-1]))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "start_offset": pa.array(offs, pa.int64()),
                "pack_id": pa.array(offs // capacity, pa.int64()),
                "pack_offset": pa.array(offs % capacity, pa.int64()),
            }
        )

    return counts.groupby("_rng").map_groups(
        local_scan, batch_format="pyarrow"
    )


def pack_offsets_by_key(
    docs_ds,
    *,
    capacity: int,
    key_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_size: int = DEFAULT_RANGE_SIZE,
):
    """Per-key packing: each key (language / domain shard) gets its OWN
    doc_id-ordered token stream and pack numbering — the standard layout
    when training shards must not mix languages or sources.

    Same three-phase exact scan as ``pack_offsets``, with (key, range)
    replacing range everywhere: range totals come back as one row per
    (key, range), the driver prefix-sums WITHIN each key (O(keys x
    ranges), tiny), and the local scan co-partitions on (key, range) so
    every group cumsum stays key-pure.  Output: ``(key, doc_id,
    n_tokens, start_offset, pack_id, pack_offset)``."""
    import ray

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = np.fromiter(
            (
                len(simple_tokens(t or ""))
                for t in batch[text_col].to_pylist()
            ),
            dtype=np.int64,
            count=len(ids),
        )
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "_rng": pa.array(ids // range_size, pa.int64()),
            }
        )

    counts = docs_ds.select_columns(
        [key_col, id_col, text_col]
    ).map_batches(narrow, batch_format="pyarrow").materialize()

    totals = counts.groupby([key_col, "_rng"]).sum("n_tokens").to_pandas()
    totals = totals.sort_values([key_col, "_rng"])
    bases: dict = {}
    for key, sub in totals.groupby(key_col, sort=True):
        csum = np.concatenate(
            ([0], np.cumsum(sub["sum(n_tokens)"].to_numpy())[:-1])
        )
        for rng, base in zip(sub["_rng"].to_numpy(), csum):
            bases[(key, int(rng))] = int(base)
    bases_ref = ray.put(bases)

    def local_scan(group: pa.Table) -> pa.Table:
        base_map = ray.get(bases_ref)
        key = group[key_col][0].as_py()
        ids = group[id_col].to_numpy(zero_copy_only=False)
        toks = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, toks = ids[order], toks[order]
        start = base_map[(key, int(group["_rng"][0].as_py()))]
        offs = start + np.concatenate(([0], np.cumsum(toks)[:-1]))
        return pa.table(
            {
                key_col: pa.array([key] * len(ids), group[key_col].type),
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "start_offset": pa.array(offs, pa.int64()),
                "pack_id": pa.array(offs // capacity, pa.int64()),
                "pack_offset": pa.array(offs % capacity, pa.int64()),
            }
        )

    return counts.groupby([key_col, "_rng"]).map_groups(
        local_scan, batch_format="pyarrow"
    )
