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

from .textstats import round6


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
                "window": batch["window"],
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
