"""Positional skip-gram pair counts: unordered token pairs within a
±window positional distance, counted corpus-wide — the training-pair
extraction stage of word2vec/GloVe-style embedding pipelines (PMI in
extras/textstats counts per-doc DISTINCT co-occurrence; this counts
every positional co-occurrence, which is what the embedding objective
consumes).

Scale shape (100 TB honest): pair emission is vectorized per batch
(flat token array + doc-boundary mask, one shift per window offset —
no per-doc Python loop), partial counts fold per block via Arrow hash
aggregate, and the ONE exchange is a (tok_a, tok_b)-bucketed sum whose
volume is O(distinct pairs per block), never O(token positions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bucket_agg import bucketed_group_agg
from .textstats import simple_tokens


def skipgram_pair_counts(
    docs_ds,
    *,
    window: int = 2,
    text_col: str = "text",
    num_buckets: int = 64,
):
    """(tok_a, tok_b, n) — unordered pairs (``tok_a < tok_b`` lexicographic
    on the ASCII token bytes; equal-token pairs kept as (t, t)) with
    positional distance 1..``window`` inside a document."""

    def emit(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        bounds: list[int] = [0]
        for text in batch[text_col].to_pylist():
            toks.extend(simple_tokens(text or ""))
            bounds.append(len(toks))
        arr = np.asarray(toks, dtype=object)
        lens = np.diff(np.asarray(bounds, np.int64))
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        lefts, rights = [], []
        for off in range(1, window + 1):
            if len(arr) <= off:
                break
            same = doc_of[off:] == doc_of[:-off]
            a = arr[:-off][same]
            b = arr[off:][same]
            swap = a > b
            lo = np.where(swap, b, a)
            hi = np.where(swap, a, b)
            lefts.append(lo)
            rights.append(hi)
        if not lefts:
            return pa.table(
                {
                    "tok_a": pa.array([], pa.string()),
                    "tok_b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "tok_a": pa.array(np.concatenate(lefts), pa.string()),
                "tok_b": pa.array(np.concatenate(rights), pa.string()),
            }
        )
        part = t.group_by(["tok_a", "tok_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "tok_a": part["tok_a"],
                "tok_b": part["tok_b"],
                "n": part["count_all"],
            }
        )

    summed = bucketed_group_agg(
        docs_ds.map_batches(emit, batch_format="pyarrow"),
        ["tok_a", "tok_b"],
        [("n", "sum")],
        num_buckets=num_buckets,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tok_a": batch["tok_a"],
                "tok_b": batch["tok_b"],
                "n": batch["sum(n)"],
            }
        )

    return summed.map_batches(rename, batch_format="pyarrow")
