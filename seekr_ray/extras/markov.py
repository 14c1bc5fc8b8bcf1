"""Event-type transition matrix: first-order Markov statistics over
each user's event stream — P(next_type | prev_type) with exact counts.

The behavioral-sequence analog of the query-log aggregation the
reference serves suggestions from (`Suggestions` frequency counts):
instead of counting terms, count ordered type->type transitions per
user timeline.  Feeds session modeling, curriculum ordering of
interaction data, and anomaly screens (transitions with tiny P).

Scale shape (100 TB honest): the same hash(user)-bucketed co-partition
plan as extras/windows.sessionize / lag_gaps_per_group — ONE shuffle
keyed by user bucket, a per-bucket lexsort (user, ts, id), vectorized
shift to pair each row with its successor, then per-bucket partial
(prev, next) counts so the final exchange is O(types² x buckets), not
O(events).  Probabilities are a single mirrored IEEE division of exact
integer counts, rounded half-away-from-zero at 6dp.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import round6


def event_type_transitions(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
):
    """(prev_type, next_type, n, p) — global transition counts over
    per-user (ts, id)-ordered streams; ``p = round6(n / Σ n over
    prev_type)`` (row-conditional probability)."""

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
                "y": batch[type_col],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k = k[order]
        y = group["y"].combine_chunks().take(pa.array(order))
        same = k[1:] == k[:-1] if len(k) > 1 else np.zeros(0, bool)
        prev = y.slice(0, max(len(k) - 1, 0)).filter(pa.array(same))
        nxt = y.slice(1).filter(pa.array(same))
        part = (
            pa.table({"prev_type": prev, "next_type": nxt})
            .group_by(["prev_type", "next_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "prev_type": part["prev_type"],
                "next_type": part["next_type"],
                "n": part["count_all"],
            }
        )

    def attach_p(group: pa.Table) -> pa.Table:
        n = group["n"].to_numpy(zero_copy_only=False)
        tot = float(int(n.sum()))
        p = [round6(float(v) / tot) for v in n.tolist()]
        return group.append_column("p", pa.array(p, pa.float64()))

    counts = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .sum("n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev_type": batch["prev_type"],
                "next_type": batch["next_type"],
                "n": batch["sum(n)"],
            }
        )

    return (
        counts.map_batches(rename, batch_format="pyarrow")
        .groupby("prev_type")
        .map_groups(attach_p, batch_format="pyarrow")
    )


def transition_entropy(events_ds, *, num_buckets: int = 64, **kw):
    """Per-prev-type Shannon entropy of the next-type distribution —
    the predictability profile of the event stream (0 bits = scripted
    bot behavior, high bits = organic).  Derived from the SAME exact
    transition counts as ``event_type_transitions``; each term
    ``−p·log2(p)`` floor-quantized at 1e-6 and summed as an integer
    (the token_entropy discipline), so the result is order-invariant
    and SQL-replicable.

    Output: ``(prev_type, n_total, entropy)``.
    """
    from .textstats import ENTROPY_SCALE

    counts = event_type_transitions(events_ds, num_buckets=num_buckets, **kw)

    def per_prev(group: pa.Table) -> pa.Table:
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = float(int(n.sum()))
        p = n / tot
        q = np.floor(-(p) * np.log2(p) * ENTROPY_SCALE).astype(np.int64)
        return pa.table(
            {
                "prev_type": group["prev_type"].slice(0, 1),
                "n_total": pa.array([int(tot)], pa.int64()),
                "entropy": pa.array(
                    [float(int(q.sum())) / ENTROPY_SCALE], pa.float64()
                ),
            }
        )

    return (
        counts.select_columns(["prev_type", "next_type", "n"])
        .groupby("prev_type")
        .map_groups(per_prev, batch_format="pyarrow")
    )
