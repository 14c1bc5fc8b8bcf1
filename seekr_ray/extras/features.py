"""Entity-level feature engineering: per-user activity profiles and
graph degree statistics — the feature-extraction stage that turns raw
event / edge streams into model-ready tables.

Reference scope analog: the aggregate side of the suggestion engine
(query-frequency counts per key, `Suggestions`) generalized to full
per-entity profiles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bucket_agg import bucketed_group_agg
from .textstats import round6

_US_PER_DAY = 86_400_000_000


def user_activity_features(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
    num_buckets: int = 64,
):
    """Per-user profile: ``(user_id, n_events, n_active_days, n_types,
    value_sum, value_mean, first_ts, last_ts)``.

    Scale shape (100 TB honest): hash(user)-bucketed co-partition (ONE
    shuffle of four projected columns); inside each bucket every user's
    rows are contiguous after a lexsort, so counts / sums / distinct
    days / distinct types reduce with vectorized ``reduceat`` /
    ``unique`` — no per-row Python.  Timestamps stay integer µs and pin
    to timestamp[us]; value sums run in exact integer cents (2dp
    column; integer-valued doubles sum exactly below 2^53) so the 6dp
    rounding is invariant to summation order — a raw double sum flipped
    a mean's 6th dp at a .5 boundary at sf0.01.
    """

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
                "y": batch[type_col],
                "v": pc.cast(batch[val_col], pa.float64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        ycodes = pc.dictionary_encode(
            group["y"].combine_chunks()
        ).indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((t, k))
        k, t, v, ycodes = k[order], t[order], v[order], ycodes[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1])) if len(k) else []
        )
        users = k[starts]
        n = np.diff(np.append(starts, len(k)))
        vsum = np.add.reduceat(np.rint(v * 100.0), starts) / 100.0
        first = t[starts]
        last = np.maximum.reduceat(t, starts)
        days = t // _US_PER_DAY
        # distinct (user, day) / (user, type) via pair-unique
        ud = np.unique(np.stack([k, days]), axis=1)
        _, d_cnt = np.unique(ud[0], return_counts=True)
        uy = np.unique(np.stack([k, ycodes]), axis=1)
        _, y_cnt = np.unique(uy[0], return_counts=True)
        return pa.table(
            {
                key_col: pa.array(users, pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "n_active_days": pa.array(d_cnt, pa.int64()),
                "n_types": pa.array(y_cnt, pa.int64()),
                "value_sum": pa.array(
                    [round6(x) for x in vsum.tolist()], pa.float64()
                ),
                "value_mean": pa.array(
                    [
                        round6(s / ni)
                        for s, ni in zip(vsum.tolist(), n.tolist())
                    ],
                    pa.float64(),
                ),
                "first_ts": pa.array(first, pa.timestamp("us")),
                "last_ts": pa.array(last, pa.timestamp("us")),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def degree_stats(edges_ds, *, num_buckets: int = 64):
    """Per-node in/out degree over a DISTINCT (src, dst) edge set:
    ``(node_id, out_deg, in_deg)``.

    Scale shape: edge dedup where the edges live (graph.pagerank.
    dedup_edges' bucketed distinct), then union-tagged degree partials
    into ONE bucketed sum keyed by node — the corpus of edges crosses
    the wire twice (distinct + partials), never more.
    """
    from ..graph.pagerank import dedup_edges

    distinct = dedup_edges(edges_ds)

    def partials(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        s_ids, s_cnt = np.unique(src, return_counts=True)
        d_ids, d_cnt = np.unique(dst, return_counts=True)
        return pa.table(
            {
                "node_id": pa.array(
                    np.concatenate([s_ids, d_ids]), pa.int64()
                ),
                "out_deg": pa.array(
                    np.concatenate([s_cnt, np.zeros(len(d_cnt), np.int64)]),
                    pa.int64(),
                ),
                "in_deg": pa.array(
                    np.concatenate([np.zeros(len(s_cnt), np.int64), d_cnt]),
                    pa.int64(),
                ),
            }
        )

    summed = bucketed_group_agg(
        distinct.map_batches(partials, batch_format="pyarrow"),
        "node_id",
        [("out_deg", "sum"), ("in_deg", "sum")],
        num_buckets=num_buckets,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_id": batch["node_id"],
                "out_deg": batch["sum(out_deg)"],
                "in_deg": batch["sum(in_deg)"],
            }
        )

    return summed.map_batches(rename, batch_format="pyarrow")


def user_type_profile(events_ds, *, key_col: str = "user_id",
                      type_col: str = "event_type", sep: str = "|"):
    """Per-user sorted distinct event-type profile string — the
    ``string_agg(DISTINCT t, sep ORDER BY t)`` aggregate, the classic
    set-valued feature SQL engines special-case and Ray Data lacks.

    Per-batch pair dedup (an Arrow group_by with no aggregates) shrinks
    the exchange to O(distinct pairs seen per block); one
    groupby(user).map_groups then sorts each user's small distinct set
    and joins it.  The exchange and the group state are both bounded by
    the TYPE domain per user, never by event count.  Byte-order string
    sort == DuckDB's default binary collation, so the oracle compares
    bit-exactly.

    Output: ``(key_col, n_types, type_profile)``.
    """

    def dedup(batch: pa.Table) -> pa.Table:
        return (
            batch.select([key_col, type_col])
            .group_by([key_col, type_col])
            .aggregate([])
        )

    def profile(group: pa.Table) -> pa.Table:
        types = sorted(set(group[type_col].to_pylist()))
        return pa.table(
            {
                key_col: pa.array([group[key_col][0].as_py()],
                                  group[key_col].type),
                "n_types": pa.array([len(types)], pa.int64()),
                "type_profile": pa.array([sep.join(types)], pa.string()),
            }
        )

    return (
        events_ds.select_columns([key_col, type_col])
        .map_batches(dedup, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(profile, batch_format="pyarrow")
    )
