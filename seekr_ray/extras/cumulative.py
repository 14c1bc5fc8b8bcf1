"""Cumulative distinct users per day — the growth-curve metric
("DAU-to-date") computed EXACTLY without a running HLL union: a user
contributes to the cumulative count from their FIRST active day on, so
``cumulative(d) = Σ_{d' ≤ d} |{users whose first day = d'}|``.

Scale shape (100 TB honest): per-block (user, min-day) partials → ONE
user-bucketed min reduce (O(users) exchange of two int64 columns) →
per-block first-day histograms → tiny day-keyed sum → O(days) prefix
sum on the driver.  No O(rows) state, no sketch error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bucket_agg import bucketed_group_agg

_US_PER_DAY = 86_400_000_000


def cumulative_users_by_day(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
):
    """(day timestamp, n_new, n_cumulative) — new users whose first
    event lands on the day, and the running total of distinct users
    seen through that day.  Days with zero new users are omitted (the
    oracle mirrors: only observed first-days emit rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        d = t.view("int64") // _US_PER_DAY
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        first = np.ones(len(k), bool)
        if len(k) > 1:
            first[1:] = k[1:] != k[:-1]
        return pa.table(
            {
                key_col: pa.array(k[first], pa.int64()),
                "day": pa.array(d[first], pa.int64()),
            }
        )

    first_days = bucketed_group_agg(
        events_ds.select_columns([key_col, ts_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        key_col,
        [("day", "min")],
        num_buckets=num_buckets,
    )

    def day_hist(batch: pa.Table) -> pa.Table:
        d, c = np.unique(
            batch["min(day)"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {"day": pa.array(d, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    hist = (
        first_days.map_batches(day_hist, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
    ).to_pandas()  # O(days)
    hist = hist.sort_values("day")
    days = hist["day"].to_numpy()
    new = hist["sum(n)"].to_numpy()
    cum = np.cumsum(new)
    return pa.table(
        {
            "day": pa.array(
                (days * _US_PER_DAY).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "n_new": pa.array(new, pa.int64()),
            "n_cumulative": pa.array(cum, pa.int64()),
        }
    )
