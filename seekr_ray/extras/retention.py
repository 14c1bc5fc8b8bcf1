"""Weekly retention cohorts over the event stream.

The classic growth-analytics operator: users are cohorted by the ISO
week (Monday-start, DuckDB ``date_trunc('week', ...)``) of their FIRST
event; for each cohort and week offset k, retention = fraction of the
cohort active (>= 1 event) during cohort_week + k.

Plan: ONE shuffle.  Blocks project to per-block DISTINCT
``(user, week)`` pairs (events collapse ~weekly before the exchange),
bucketed by hash(user) so each user's weeks co-locate; the per-bucket
kernel lexsorts, dedupes, takes the per-user min week as the cohort and
emits PARTIAL ``(cohort, offset, kind, cnt)`` counts via one
``np.unique`` — no per-event Python.  A second groupby over the tiny
(cohorts x offsets) key space sums partials, and the final
(n_active / n_cohort) division happens on O(cohorts x offsets) rows.

Partitioning assumption: a user bucket fits in a worker (num_buckets
scales out; one user's distinct weeks are never split).

Output: ``(cohort_week timestamp[us], week_offset, n_active, n_cohort,
retention)`` with retention = ROUND(n_active / n_cohort, 6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import round6

_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US
# 1970-01-01 was a Thursday; with Monday = 0 its day-of-week is 3
_EPOCH_DOW = 3


def _week_start_us(ts_us: np.ndarray) -> np.ndarray:
    """Monday-start week truncation in integer microseconds — matches
    DuckDB date_trunc('week', ts) for non-negative timestamps."""
    days = ts_us // _DAY_US
    dow = (days + _EPOCH_DOW) % 7
    return (days - dow) * _DAY_US


def retention_cohorts(events_ds, num_buckets: int = 64):
    """Weekly cohort retention table from ``(user_id, ts)`` events."""

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy(zero_copy_only=False).view("int64")
        w = _week_start_us(t)
        # per-block distinct (user, week) — the shuffle-volume collapse
        key = np.stack([u, w], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {
                "_b": pa.array(
                    (uniq[:, 0] % num_buckets).astype(np.int64), pa.int64()
                ),
                "u": pa.array(uniq[:, 0], pa.int64()),
                "w": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        u = group["u"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        brk = np.ones(len(u), bool)
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        seglen = np.diff(np.r_[starts, len(u)])
        cohort = np.repeat(w[starts], seglen)  # per-user min week
        offset = (w - cohort) // _WEEK_US
        # partial (cohort, offset) activity counts + (cohort,) sizes
        act_key = np.stack([cohort, offset], axis=1)
        ak, ac = np.unique(act_key, axis=0, return_counts=True)
        ck, cc = np.unique(w[starts], return_counts=True)
        return pa.table(
            {
                "cohort": pa.array(
                    np.r_[ak[:, 0], ck].astype(np.int64), pa.int64()
                ),
                "k": pa.array(
                    np.r_[ak[:, 1], np.full(len(ck), -1)].astype(np.int64),
                    pa.int64(),
                ),  # k = -1 marks a cohort-size partial
                "cnt": pa.array(np.r_[ac, cc].astype(np.int64), pa.int64()),
            }
        )

    agg = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["cohort", "k"])
        .sum("cnt")
        .to_pandas()
    )  # O(cohorts x offsets) rows — bounded driver collect
    coh = agg[agg.k == -1]
    sizes = dict(zip(coh.cohort.astype(int), coh["sum(cnt)"].astype(int)))
    act = agg[agg.k >= 0].sort_values(["cohort", "k"])
    n_cohort = np.array([sizes[int(c)] for c in act.cohort], np.int64)
    n_active = act["sum(cnt)"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "cohort_week": pa.array(
                act.cohort.to_numpy().astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "week_offset": pa.array(act.k.to_numpy().astype(np.int64)),
            "n_active": pa.array(n_active, pa.int64()),
            "n_cohort": pa.array(n_cohort, pa.int64()),
            "retention": pa.array(
                [round6(a / c) for a, c in zip(n_active, n_cohort)],
                pa.float64(),
            ),
        }
    )
