"""Market-basket co-occurrence: part pairs bought in the same order,
with support counts and lift — the association-rule / co-purchase
primitive of recommendation prep (and the relational analog of
skip-gram pair extraction).

Scale shape (100 TB honest): ONE hash(order)-bucketed co-partition of
the two projected lineitem columns; inside a bucket every order's items
are contiguous after a lexsort, pair emission is bounded by the
per-order item count (TPC-H ~4), and per-bucket partial counts fold
before the tiny (pair)-keyed sum.  Item marginals ride the same
partials; lift's three divisions are mirrored IEEE ops on exact
integer counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bucket_agg import bucketed_group_agg
from .textstats import round6


def copurchase_lift(
    lineitem_ds,
    *,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    num_buckets: int = 64,
):
    """(item_a, item_b, n_ab, n_a, n_b, lift) for item pairs co-bought
    in ≥ ``min_support`` orders (item_a < item_b).

    ``n_x`` counts DISTINCT orders containing the item; ``lift =
    round6((n_ab·N_orders) / (n_a·n_b))`` with N the total distinct
    order count — lift > 1 is genuine affinity.
    """

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((o % num_buckets).astype(np.int64), pa.int64()),
                "o": pa.array(o, pa.int64()),
                "i": batch[item_col],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        o = group["o"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, o))
        o, i = o[order], i[order]
        # distinct (order, item)
        keep = np.ones(len(o), bool)
        if len(o) > 1:
            keep[1:] = (o[1:] != o[:-1]) | (i[1:] != i[:-1])
        o, i = o[keep], i[keep]
        bounds = np.flatnonzero(
            np.concatenate(([True], o[1:] != o[:-1])) if len(o) else []
        )
        ends = np.append(bounds[1:], len(o))
        pair_acc: dict[tuple[int, int], int] = {}
        item_acc: dict[int, int] = {}
        n_orders = len(bounds)
        for lo, hi in zip(bounds, ends):
            items = i[lo:hi]  # sorted ascending within the order
            for x in range(len(items)):
                ix = int(items[x])
                item_acc[ix] = item_acc.get(ix, 0) + 1
                for y in range(x + 1, len(items)):
                    key = (ix, int(items[y]))
                    pair_acc[key] = pair_acc.get(key, 0) + 1
        # self rows (a == b) carry item marginals; (-1, -1) the order count
        a = [k[0] for k in pair_acc] + list(item_acc) + [-1]
        b = [k[1] for k in pair_acc] + list(item_acc) + [-1]
        n = list(pair_acc.values()) + list(item_acc.values()) + [n_orders]
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    reduced = bucketed_group_agg(
        lineitem_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["a", "b"],
        [("n", "sum")],
        num_buckets=num_buckets,
    ).to_pandas()  # O(qualifying pairs + items); see min_support note below
    # NOTE: the driver collect here is O(distinct co-bought pairs); at a
    # scale where that outgrows the driver, keep it as a Dataset and
    # broadcast only the item marginals (O(items)) into a final map.
    n_total = int(
        reduced.loc[
            (reduced["a"] == -1) & (reduced["b"] == -1), "sum(n)"
        ].iloc[0]
    )
    items = reduced[(reduced["a"] == reduced["b"]) & (reduced["a"] >= 0)]
    marg = {int(r): int(n) for r, n in zip(items["a"], items["sum(n)"])}
    pairs = reduced[reduced["a"] < reduced["b"]]
    pairs = pairs[pairs["sum(n)"] >= min_support].sort_values(["a", "b"])
    out_a = pairs["a"].astype("int64").to_numpy()
    out_b = pairs["b"].astype("int64").to_numpy()
    n_ab = pairs["sum(n)"].astype("int64").to_numpy()
    n_a = np.array([marg[int(x)] for x in out_a], np.int64)
    n_b = np.array([marg[int(x)] for x in out_b], np.int64)
    lift = [
        round6(float(ab * n_total) / float(na * nb))
        for ab, na, nb in zip(n_ab.tolist(), n_a.tolist(), n_b.tolist())
    ]
    return pa.table(
        {
            "item_a": pa.array(out_a, pa.int64()),
            "item_b": pa.array(out_b, pa.int64()),
            "n_ab": pa.array(n_ab, pa.int64()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "lift": pa.array(lift, pa.float64()),
        }
    )


def basket_size_histogram(
    lineitem_ds,
    *,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    num_buckets: int = 64,
):
    """(n_items, n_orders) — how many orders contain exactly k distinct
    items.  Same one-shuffle co-partition plan as ``copurchase_lift``;
    the count-of-counts reduce is O(max basket size)."""

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((o % num_buckets).astype(np.int64), pa.int64()),
                "o": pa.array(o, pa.int64()),
                "i": batch[item_col],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        o = group["o"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, o))
        o, i = o[order], i[order]
        keep = np.ones(len(o), bool)
        if len(o) > 1:
            keep[1:] = (o[1:] != o[:-1]) | (i[1:] != i[:-1])
        o = o[keep]
        _, per_order = np.unique(o, return_counts=True)
        sizes, n_orders = np.unique(per_order, return_counts=True)
        return pa.table(
            {
                "n_items": pa.array(sizes, pa.int64()),
                "n": pa.array(n_orders, pa.int64()),
            }
        )

    out = (
        lineitem_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("n_items")
        .sum("n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": batch["n_items"],
                "n_orders": batch["sum(n)"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")
