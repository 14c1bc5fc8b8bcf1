"""Token-budget sampling — exact per-group prefix under a token budget.

The data-mixing step of an LLM training pipeline when the recipe is
stated in TOKENS, not rates: "take 2M tokens of each language, chosen
deterministically".  ``extras/split.mixture_sample`` covers the
rate-form (per-row stateless keep/drop at a target rate); this module
covers the exact-form: per group, walk docs in the stateless md5 hash
order (the same ``md5_number_upper`` keying as ``hash_split`` /
``cap_per_lang``, so the selection is reproducible AND SQL-replicable)
and keep every doc while the running token total stays within budget.

Scale shape — the same three-phase exact scan as
``extras/packing.pack_offsets_by_key`` (no global sort, no driver
O(rows) state):

1. one narrow pass computes (group, id, n_tokens, h) and the range key
   ``h >> 48`` (high bits of the hash, so range order == hash order and
   equal hashes can never straddle a range);
2. per-(group, range) token totals — O(groups x 65536) rows — prefix-sum
   on the driver;
3. a co-partitioned local scan orders each (group, range) by (h, id),
   adds its range base, and keeps rows with inclusive running total
   <= budget.  Ranges whose base already exceeds the budget
   short-circuit to empty without sorting their rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import simple_tokens

RANGE_SHIFT = 48  # h >> 48 -> 65536 hash ranges


def _md5_le(ids: list, salt: str = "") -> np.ndarray:
    """md5 first-8-bytes little-endian of str(id) — bit-equal to
    DuckDB's ``md5_number_upper(id::VARCHAR)`` (split.py convention)."""
    out = np.empty(len(ids), dtype=np.uint64)
    for i, v in enumerate(ids):
        h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
        out[i] = int.from_bytes(h, "little")
    return out


def token_budget_sample(
    docs_ds,
    *,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
):
    """Per-group deterministic token-budget prefix.

    Output: ``(group_col, id_col, n_tokens)`` — the kept docs.  A doc is
    kept iff the INCLUSIVE running token total, in (md5(id), id) order
    within its group, is <= ``budget``; groups short on supply keep
    everything.
    """
    import ray

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        toks = np.fromiter(
            (len(simple_tokens(t or "")) for t in batch[text_col].to_pylist()),
            dtype=np.int64,
            count=len(ids),
        )
        h = _md5_le(ids, salt)
        return pa.table(
            {
                group_col: batch[group_col],
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "_h": pa.array(h, pa.uint64()),
                "_rng": pa.array(
                    (h >> RANGE_SHIFT).astype(np.int64), pa.int64()
                ),
            }
        )

    counts = (
        docs_ds.select_columns([group_col, id_col, text_col])
        .map_batches(narrow, batch_format="pyarrow")
        .materialize()
    )

    totals = counts.groupby([group_col, "_rng"]).sum("n_tokens").to_pandas()
    totals = totals.sort_values([group_col, "_rng"])
    bases: dict = {}
    for key, sub in totals.groupby(group_col, sort=True):
        csum = np.concatenate(
            ([0], np.cumsum(sub["sum(n_tokens)"].to_numpy())[:-1])
        )
        for rng, base in zip(sub["_rng"].to_numpy(), csum):
            bases[(key, int(rng))] = int(base)
    bases_ref = ray.put(bases)

    def local_scan(group: pa.Table) -> pa.Table:
        base_map = ray.get(bases_ref)
        key = group[group_col][0].as_py()
        base = base_map[(key, int(group["_rng"][0].as_py()))]
        empty = pa.table(
            {
                group_col: pa.array([], group[group_col].type),
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if base > budget:
            # the whole range starts past the budget — skip the sort
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False)
        toks = group["n_tokens"].to_numpy(zero_copy_only=False)
        h = group["_h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        ids, toks = ids[order], toks[order]
        cum = base + np.cumsum(toks)  # inclusive running total
        keep = cum <= budget
        if not keep.any():
            return empty
        return pa.table(
            {
                group_col: pa.array(
                    [key] * int(keep.sum()), group[group_col].type
                ),
                id_col: pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(toks[keep], pa.int64()),
            }
        )

    return counts.groupby([group_col, "_rng"]).map_groups(
        local_scan, batch_format="pyarrow"
    )
