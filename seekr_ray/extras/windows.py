"""Windowed aggregates over event streams, Ray-Data-first.

``tumbling_agg`` — per (window, event_type) count + value sum for a
tumbling time window (hour/day): partial-aggregated INSIDE ``map_batches``
(one output row per distinct (window, type) per block), so the shuffle
moves O(groups) rows instead of O(events) — the S10/A7 aggregation shape
generalized to time windows.  At 100 TB the exchange stays tiny because
group cardinality (windows x types) is bounded, not data-sized.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .textstats import round6, round6_arr


def tumbling_agg(events_ds, unit: str = "hour"):
    """(window timestamp, event_type, n events, 6dp value sum) per
    tumbling window.  ``unit`` is any ``pc.floor_temporal`` unit."""

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch["ts"], unit=unit)
        tbl = pa.table(
            {
                "window": win,
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )
        agg = tbl.group_by(["window", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(
            ["window", "event_type", "n_part", "sum_part"]
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                # pin to us resolution: the hash-shuffle groupby can coarsen the
                # key to [s], and the driver compares dtypes vs DuckDB [us]
                "window": pc.cast(batch["window"], pa.timestamp("us")),
                "event_type": batch["event_type"],
                "n": pc.cast(batch["sum(n_part)"], pa.int64()),
                "value_sum": pa.array(
                    [round6(v) for v in batch["sum(sum_part)"].to_pylist()],
                    pa.float64(),
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window", "event_type"])
        .sum(["n_part", "sum_part"])
        .map_batches(finalize, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# gap-based session windows
# ---------------------------------------------------------------------------


def sessionize(events_ds, gap_us: int, num_buckets: int = 64):
    """Gap-based session windows: per user, consecutive events belong to
    one session while the time gap stays ≤ ``gap_us``; a strictly larger
    gap starts a new session.  Output one row per session:
    ``(user_id, session_id, session_start, session_end, n_events,
    value_sum)`` with ``session_id`` the 1-based per-user ordinal.

    Plan: hash(user) → bucket, ONE ``groupby(bucket).map_groups``
    co-locates each user's events; the kernel is a single lexsort +
    vectorized diff/cumsum (no per-event Python).  Partitioning
    assumption: a bucket (not the table) fits in a worker —
    ``num_buckets`` scales out; a single user's events are never split.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch["event_id"],
                "v": batch["value"],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:  # Ray never hands map_groups an empty group; belt+braces
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "value_sum": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((i, t, k))
        k, t, v = k[order], t[order], v[order]
        brk = np.ones(n, bool)
        if n > 1:
            brk[1:] = (k[1:] != k[:-1]) | (np.diff(t) > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], n]
        su = k[starts]  # session's user
        user_new = np.ones(len(starts), bool)
        if len(starts) > 1:
            user_new[1:] = su[1:] != su[:-1]
        idx = np.arange(len(starts))
        base = np.maximum.accumulate(np.where(user_new, idx, 0))
        sid = idx - base + 1
        sums = np.add.reduceat(v, starts)
        return pa.table(
            {
                "user_id": pa.array(su, pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "session_start": pa.array(
                    t[starts].view("datetime64[us]"), pa.timestamp("us")
                ),
                "session_end": pa.array(
                    t[ends - 1].view("datetime64[us]"), pa.timestamp("us")
                ),
                "n_events": pa.array(ends - starts, pa.int64()),
                "value_sum": pa.array(
                    [round6(s) for s in sums], pa.float64()
                ),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# hopping (sliding) windows
# ---------------------------------------------------------------------------


def hopping_agg(events_ds, window_us: int, hop_us: int):
    """Hopping-window aggregate: per (window_start, event_type) count +
    6dp value sum for overlapping windows of span ``window_us`` advancing
    every ``hop_us`` (``window_us`` must be a multiple of ``hop_us``).
    Each event lands in exactly window/hop windows — the explode factor
    is a small constant, then the same partial-agg-before-tiny-exchange
    plan as ``tumbling_agg``: the shuffle stays O(windows × types).
    """
    import numpy as np

    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["ts"].to_numpy(zero_copy_only=False).view("int64")
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        base = t // hop_us
        parts = []
        for s in range(k):
            start = (base - s) * hop_us
            parts.append(
                pa.table(
                    {
                        "window": pa.array(
                            start.view("datetime64[us]"), pa.timestamp("us")
                        ),
                        "event_type": pa.array(et),
                        "value": pa.array(v, pa.float64()),
                    }
                )
            )
        tbl = pa.concat_tables(parts)
        agg = tbl.group_by(["window", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["window", "event_type", "n_part", "sum_part"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                # pin to us resolution: the hash-shuffle groupby can coarsen the
                # key to [s], and the driver compares dtypes vs DuckDB [us]
                "window": pc.cast(batch["window"], pa.timestamp("us")),
                "event_type": batch["event_type"],
                "n": pc.cast(batch["sum(n_part)"], pa.int64()),
                "value_sum": pa.array(
                    [round6(v) for v in batch["sum(sum_part)"].to_pylist()],
                    pa.float64(),
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window", "event_type"])
        .sum(["n_part", "sum_part"])
        .map_batches(finalize, batch_format="pyarrow")
    )


def rolling_mean_per_group(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    frame: int = 3,
    num_buckets: int = 64,
):
    """Per-key rolling mean over the last ``frame`` rows in (ts, id)
    order — SQL's ``avg(val) OVER (... ROWS BETWEEN frame-1 PRECEDING
    AND CURRENT ROW)`` as a distributed operator.  Same co-location plan
    as ``running_sum_per_group``.

    The frame sum runs in EXACT integers (values quantized at 1e-6, the
    testdata's own precision), so it is invariant to the window
    implementation's internal summation order (DuckDB slides a segment
    tree; a float sum could differ in the last ulp and flip the 6dp
    compare).  The final division mirrors the SQL expression
    ``sum::DOUBLE / count / 1e6`` operation-for-operation.

    Output: ``(id_col, key_col, rolling_avg)`` rounded to 6dp.
    """
    import numpy as np

    scale = 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = batch[ts_col].to_numpy(zero_copy_only=False)
        v = batch[val_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
                "q": pa.array(np.rint(v * scale).astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        q = group["q"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, i, q = k[order], i[order], q[order]
        new = np.ones(len(k), bool)
        if len(k) > 1:
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        bounds = np.r_[starts, len(k)]
        out = np.empty(len(k), np.float64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            cs = np.concatenate(([0], np.cumsum(q[s:e])))
            idx = np.arange(e - s)
            lo = np.maximum(idx - (frame - 1), 0)
            wsum = cs[idx + 1] - cs[lo]
            cnt = (idx + 1 - lo).astype(np.float64)
            out[s:e] = wsum.astype(np.float64) / cnt / scale
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "rolling_avg": pa.array(round6_arr(out), pa.float64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def lag_gaps_per_group(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
):
    """Per-key LAG: microseconds since the key's previous row in
    (ts, id) order — SQL's ``ts − lag(ts) OVER (PARTITION BY key ORDER
    BY ts, id)``, rows with no predecessor omitted (so the output
    carries no NULLs into the driver's value-hash compare).  Integer
    microsecond arithmetic ⇒ parallelism-invariant.  Same co-location
    plan as ``sessionize``.

    Output: ``(id_col, key_col, gap_us)``.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        # cast (not reinterpret) so a [ns]/[s] input still yields true µs
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, t, i = k[order], t[order], i[order]
        has_prev = np.zeros(len(k), bool)
        if len(k) > 1:
            has_prev[1:] = k[1:] == k[:-1]
        gap = np.zeros(len(k), np.int64)
        if len(k) > 1:
            gap[1:] = t[1:] - t[:-1]
        return pa.table(
            {
                id_col: pa.array(i[has_prev], pa.int64()),
                key_col: pa.array(k[has_prev], pa.int64()),
                "gap_us": pa.array(gap[has_prev], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def percent_rank_per_group(
    events_ds,
    *,
    key_col: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
    num_buckets: int = 64,
):
    """Per-key PERCENT_RANK in (val, id) order — ``(rank − 1)/(n − 1)``
    with rank 1-based; singleton keys emit 0.0 (SQL's convention).  The
    ordering (val, id) is total (id is unique), so RANK == ROW_NUMBER
    and no tie handling is needed; rank and n are exact integers, the
    single division mirrors the SQL engine's, so the float output is
    identical at any parallelism.  Same co-location plan as
    ``running_sum_per_group``.

    Output: ``(id_col, key_col, pct_rank)`` rounded to 6dp.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "v": batch[val_col],
                "i": batch[id_col],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v, k))
        k, i = k[order], i[order]
        new = np.ones(len(k), bool)
        if len(k) > 1:
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(k)])
        rank0 = np.arange(len(k)) - np.repeat(starts, sizes)
        n = np.repeat(sizes, sizes).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.where(n > 1.0, rank0.astype(np.float64) / (n - 1.0), 0.0)
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "pct_rank": pa.array(round6_arr(pct), pa.float64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def running_sum_per_group(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    num_buckets: int = 64,
):
    """Per-key running (cumulative) sum in (ts, id) order — SQL's
    ``sum(val) OVER (PARTITION BY key ORDER BY ts, id)`` as a
    distributed operator.  Same co-location plan as ``sessionize``:
    hash(key) → bucket, one ``groupby(bucket).map_groups``, then a
    single lexsort + grouped cumsum kernel (global cumsum minus each
    group's starting offset — no per-row Python).

    The summation order is DEFINED by (key, ts, id), not by block
    layout, so the float result is identical at any parallelism and
    replicable by the SQL window frame.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = batch[ts_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
                "v": batch[val_col],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, t, i, v = k[order], t[order], i[order], v[order]
        new = np.ones(len(k), bool)
        if len(k) > 1:
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        # cumsum PER KEY SLICE: a global-cumsum-minus-base shortcut
        # would absorb FP rounding from OTHER keys in the bucket and
        # break the SQL-window replicability this operator promises
        run = np.empty(len(k), np.float64)
        bounds = np.r_[starts, len(k)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            run[s:e] = np.cumsum(v[s:e])
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "running_value": pa.array(round6_arr(run), pa.float64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def dense_hourly_counts(events_ds, *, type_col: str = "event_type",
                        ts_col: str = "ts"):
    """Per event-type hourly counts on a DENSE hour grid — gap filling:
    hours with no events appear with n = 0, the resample/zero-fill step
    every time-series pipeline needs before windowed models.

    Counts aggregate distributedly (tumbling_agg discipline: per-batch
    partial groupby, one O(cells) exchange); the dense grid is then
    O(span-hours × |types|) — bounded by the clock and the type domain,
    never by event count — so materializing it driver-side and
    left-merging the counts is the scale-true plan.

    Output: ``(window, event_type, n)`` over [min hour, max hour] ×
    distinct types.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.floor_temporal(batch[ts_col], unit="hour"), pa.timestamp("us")
        )
        tbl = pa.table({"window": win, type_col: batch[type_col]})
        agg = tbl.group_by(["window", type_col]).aggregate([([], "count_all")])
        return agg.rename_columns(["window", type_col, "n_part"])

    cells = (
        events_ds.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window", type_col])
        .sum("n_part")
    ).to_pandas()
    cells = cells.rename(columns={"sum(n_part)": "n"})
    cells["window"] = cells["window"].astype("datetime64[us]")
    hours = pd.date_range(
        cells["window"].min(), cells["window"].max(), freq="h"
    ).astype("datetime64[us]")
    types = sorted(cells[type_col].unique())
    grid = pd.MultiIndex.from_product(
        [hours, types], names=["window", type_col]
    ).to_frame(index=False)
    out = grid.merge(cells, on=["window", type_col], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return pa.table(
        {
            "window": pa.array(out["window"], pa.timestamp("us")),
            type_col: pa.array(out[type_col], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def locf_per_group(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    mark_type: str = "click",
    num_buckets: int = 64,
):
    """Per-key last-observation-carried-forward: for every event, the
    timestamp of the key's most recent ``mark_type`` event at or before
    it in (ts, id) order — SQL's ``max(CASE WHEN type = mark THEN ts
    END) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``, the IGNORE-NULLS carry-forward window LAG can't
    express.  Rows before the key's first mark are omitted (no NULLs
    into the value-hash compare).

    Same hash-bucket co-location plan as lag_gaps_per_group; inside a
    bucket the carry is one segmented cummax (pandas C kernel) over the
    (key, ts, id)-sorted rows.  Integer microseconds ⇒ exact.

    Output: ``(id_col, key_col, last_mark_us)``.
    """
    import numpy as np
    import pandas as pd

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        is_mark = pc.equal(batch[type_col], mark_type).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "_b": pa.array(
                    (k % num_buckets).astype(np.int32), pa.int32()
                ),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
                "m": pa.array(is_mark, pa.bool_()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        m = group["m"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, t, i, m = k[order], t[order], i[order], m[order]
        marked = np.where(m, t, np.int64(np.iinfo(np.int64).min))
        carried = (
            pd.Series(marked).groupby(pd.Series(k)).cummax().to_numpy()
        )
        keep = carried != np.iinfo(np.int64).min
        return pa.table(
            {
                id_col: pa.array(i[keep], pa.int64()),
                key_col: pa.array(k[keep], pa.int64()),
                "last_mark_us": pa.array(carried[keep], pa.int64()),
            }
        )

    return (
        events_ds.select_columns([key_col, ts_col, id_col, type_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sliding_distinct_users(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_hours: int = 24,
    num_buckets: int = 64,
):
    """Trailing-window COUNT(DISTINCT user) per hour on the dense hour
    grid — the sliding-uniques series (DAU-style) that naive SQL solves
    with an O(grid × events) range join and that never scales that way.

    Exact distributed plan: dedup to (user, hour) pairs (one bucketed
    groupby — the only event-volume exchange), then per user (hash-
    bucket co-partition) merge each hour h into the interval
    [h, h + window) and UNION overlapping intervals, so a user active
    in many nearby hours still counts once; each merged interval emits
    ±1 diff markers.  Marker volume is O(activity spells), not events;
    the dense prefix sum over the clock-bounded hour grid runs on the
    driver.  Window = hours (h − window, h] inclusive of the current
    hour bucket.

    Output: ``(window, n_users)`` over [min hour, max hour].
    """
    import numpy as np

    us_per_hour = 3_600_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(
            pc.floor_temporal(batch[ts_col], unit="hour"), pa.timestamp("us")
        ).to_numpy(zero_copy_only=False)
        h = (t.view("int64") // us_per_hour).astype(np.int64)
        tbl = pa.table(
            {
                "_b": pa.array(
                    (k % num_buckets).astype(np.int32), pa.int32()
                ),
                "k": pa.array(k, pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )
        return tbl.group_by(["_b", "k", "h"]).aggregate([])

    def markers(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, k))
        k, h = k[order], h[order]
        # interval starts: new user, or gap >= window from previous hour
        new_user = np.zeros(len(k), bool)
        new_user[0] = True
        if len(k) > 1:
            new_user[1:] = k[1:] != k[:-1]
        gap = np.zeros(len(k), bool)
        if len(k) > 1:
            gap[1:] = h[1:] - h[:-1] >= window_hours
        start = new_user | gap
        starts_h = h[start]
        # interval end = last hour of the run + window
        idx = np.flatnonzero(start)
        last = np.concatenate([idx[1:] - 1, [len(h) - 1]])
        ends_h = h[last] + window_hours
        # separate run-end flag column: it pins the grid's upper bound
        # (the max event hour may sit inside a merged run, never at a
        # start) and cannot be cancelled by coincident ±1 markers
        return pa.table(
            {
                "hour": pa.array(
                    np.concatenate([starts_h, ends_h, h[last]]), pa.int64()
                ),
                "d": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(starts_h), np.int64),
                            -np.ones(len(ends_h), np.int64),
                            np.zeros(len(last), np.int64),
                        ]
                    ),
                    pa.int64(),
                ),
                "e": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(starts_h), np.int64),
                            np.zeros(len(ends_h), np.int64),
                            np.ones(len(last), np.int64),
                        ]
                    ),
                    pa.int64(),
                ),
            }
        )

    deltas = (
        events_ds.select_columns([key_col, ts_col])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(markers, batch_format="pyarrow")
        .groupby("hour")
        .sum(["d", "e"])
    ).to_pandas()
    deltas = deltas.rename(
        columns={"sum(d)": "d", "sum(e)": "e"}
    ).sort_values("hour")
    # dense clock grid between the observed event-hour bounds; the first
    # marker is always a start (+1) so min(hour) is the true min event hour
    lo = int(deltas["hour"].min())
    hi = int(deltas.loc[deltas["e"] > 0, "hour"].max())
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    diff = np.zeros(len(hours) + window_hours + 1, np.int64)
    for hh, dd in zip(deltas["hour"], deltas["d"]):
        off = int(hh) - lo
        if 0 <= off < len(diff):
            diff[off] += int(dd)
    n = np.cumsum(diff)[: len(hours)]
    return pa.table(
        {
            "window": pa.array(
                (hours * us_per_hour).view("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "n_users": pa.array(n, pa.int64()),
        }
    )


def ewma_per_group(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    window: int = 32,
    num_buckets: int = 64,
):
    """Trailing-window EWMA (alpha = 1/2) of each key's value stream:
    over the key's LAST ``window`` rows in (ts, id) order,
    ``s_1 = x_1; s_t = x_t/2 + s_{t-1}/2`` — the online smoother a
    streaming scorer keeps per key, evaluated here in one batch pass.

    The trailing window is the 100-TB shape on purpose: an unbounded
    EWMA replays each key's full history, while the trailing form is
    computable from bounded per-key state.  alpha = 1/2 with cent-scaled
    integer values makes every term an exact dyadic rational of <= 17+31
    significand bits, so the sum is EXACT in float64 under ANY
    association — the numpy scan, the SQL closed form, and any future
    tree-reduction agree bit-for-bit (oracle ``ewma_user_value``).

    Output: ``(key_col, ewma_value)`` — cents scan divided by 100 once.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        v = batch[val_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
                "v": pa.array(np.rint(v * 100.0).astype(np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, v = k[order], v[order]
        new = np.ones(len(k), bool)
        if len(k) > 1:
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(k)])
        # trailing window: scan the last min(size, window) rows per key,
        # vectorized ACROSS keys one step at a time (max `window` steps)
        m = np.minimum(sizes, window)
        wstart = starts + sizes - m
        s = np.zeros(len(starts), np.float64)
        maxm = int(m.max()) if len(m) else 0
        for step in range(maxm):
            active = m > step
            x = v[wstart[active] + step].astype(np.float64)
            if step == 0:
                s[active] = x
            else:
                s[active] = x * 0.5 + s[active] * 0.5
        return pa.table(
            {
                key_col: pa.array(k[starts], pa.int64()),
                "ewma_value": pa.array(s / 100.0, pa.float64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


SCD2_OPEN_END_US = 9223372036854775807  # int64 max: the open interval end


def scd2_intervals(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    num_buckets: int = 64,
):
    """Slowly-changing-dimension (type 2) compaction of a value stream:
    per key in (ts, id) order, keep only CHANGE rows (value in cents
    differs from the key's previous row) and stamp each with its
    validity interval ``[valid_from_us, valid_to_us)`` — valid_to is the
    next change's timestamp, int64-max for the current row.  The
    dimension-history builder of a warehouse pipeline; change detection
    on integer cents is parallelism-invariant, and the interval stamp is
    a vectorized shift within each co-partitioned bucket.

    Output: ``(key_col, v_cents, valid_from_us, valid_to_us)``.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        v = batch[val_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch[id_col],
                "v": pa.array(np.rint(v * 100.0).astype(np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, t, v = k[order], t[order], v[order]
        keep = np.ones(len(k), bool)
        if len(k) > 1:
            keep[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        kk, tk, vk = k[keep], t[keep], v[keep]
        # valid_to = next kept row's ts within the same key, else open
        vto = np.full(len(kk), SCD2_OPEN_END_US, np.int64)
        if len(kk) > 1:
            same = kk[1:] == kk[:-1]
            vto[:-1][same] = tk[1:][same]
        return pa.table(
            {
                key_col: pa.array(kk, pa.int64()),
                "v_cents": pa.array(vk, pa.int64()),
                "valid_from_us": pa.array(tk, pa.int64()),
                "valid_to_us": pa.array(vto, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
