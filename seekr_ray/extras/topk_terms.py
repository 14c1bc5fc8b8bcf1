"""Top-k terms per group: the vocabulary-profile primitive (per-lang /
per-source most frequent tokens) behind mixture dashboards and stopword
discovery.

Scale shape (100 TB honest): per-block (group, token) combiner → ONE
bucketed exact sum (O(distinct pairs) exchange) → per-BUCKET top-k
candidates (any global winner is a winner of its own bucket, so the
candidate set is a superset) → final per-group merge over ≤ k·buckets
rows.  No global sort, no full-vocab collect.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bucket_agg import bucketed_group_agg
from .textstats import simple_tokens


def top_terms_per_group(
    docs_ds,
    *,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 10,
    num_buckets: int = 64,
):
    """(group, token, c, rn) — each group's k most frequent tokens,
    rn 1-based by (count DESC, token ASC)."""

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[tuple[str, str], int] = {}
        for g, text in zip(
            batch[group_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for t in simple_tokens(text or ""):
                key = (g, t)
                acc[key] = acc.get(key, 0) + 1
        return pa.table(
            {
                group_col: pa.array([g for g, _ in acc], pa.string()),
                "token": pa.array([t for _, t in acc], pa.string()),
                "n": pa.array(list(acc.values()), pa.int64()),
            }
        )

    counts = bucketed_group_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"],
        [("n", "sum")],
        num_buckets=num_buckets,
    )

    def topk(tbl: pa.Table, out_rn: bool) -> pa.Table:
        g = np.asarray(tbl[group_col].to_pylist(), dtype=object)
        t = np.asarray(tbl["token"].to_pylist(), dtype=object)
        c = (
            tbl["sum(n)" if "sum(n)" in tbl.column_names else "c"]
            .to_numpy(zero_copy_only=False)
        )
        order = sorted(range(len(g)), key=lambda i: (g[i], -c[i], t[i]))
        keep, rns = [], []
        prev, rn = None, 0
        for i in order:
            rn = rn + 1 if g[i] == prev else 1
            prev = g[i]
            if rn <= k:
                keep.append(i)
                rns.append(rn)
        return pa.table(
            {
                group_col: pa.array([g[i] for i in keep], pa.string()),
                "token": pa.array([t[i] for i in keep], pa.string()),
                "c": pa.array([int(c[i]) for i in keep], pa.int64()),
                **(
                    {"rn": pa.array(rns, pa.int64())} if out_rn else {}
                ),
            }
        )

    candidates = counts.map_batches(
        lambda b: topk(b, out_rn=False), batch_format="pyarrow"
    )

    def final(group: pa.Table) -> pa.Table:
        return topk(group, out_rn=True)

    return candidates.groupby(group_col).map_groups(
        final, batch_format="pyarrow"
    )
