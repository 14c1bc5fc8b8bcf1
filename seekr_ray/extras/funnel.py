"""Sequential funnel analysis over the event stream.

Classic product-analytics operator: per user, how far through an
ordered stage sequence (e.g. ``view -> click -> purchase``) did they
get within a conversion window.  Stage 1 is the user's FIRST stage-1
event (time ``t1``); stage *i+1* only counts if it happens at-or-after
the first qualifying stage-*i* event AND within ``window_us`` of
``t1`` (min-timestamp funnel with a deadline — the standard
"converted within 24h" shape).  Output one row per distinct user:
``(user_id, funnel_stage)`` with ``funnel_stage`` in ``0..len(stages)``.

Plan: hash(user) -> bucket, ONE ``groupby(bucket).map_groups``
co-locates each user's events (same partitioning discipline as
``windows.sessionize``); the kernel is a lexsort + one masked
``np.minimum.reduceat`` per stage — no per-event Python.  Partitioning
assumption: a bucket (not the table) fits in a worker; ``num_buckets``
scales out and a single user's events are never split.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TMAX = np.iinfo(np.int64).max
_TMIN = np.iinfo(np.int64).min


def funnel_stages(
    events_ds,
    stages: tuple[str, ...],
    window_us: int,
    num_buckets: int = 64,
):
    """Per-user funnel depth for ``stages`` within ``window_us`` of t1."""
    if len(stages) == 0:
        raise ValueError("need at least one stage")
    stage_of = {s: i + 1 for i, s in enumerate(stages)}
    n_stages = len(stages)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        d = pc.dictionary_encode(et)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        vocab = np.array(
            [stage_of.get(s, 0) for s in d.dictionary.to_pylist()], np.int8
        )
        codes = vocab[d.indices.to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "c": pa.array(codes, pa.int8()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:  # Ray never hands map_groups an empty group; belt+braces
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "funnel_stage": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((t, k))
        k, t, c = k[order], t[order], c[order]
        brk = np.ones(n, bool)
        brk[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(brk)
        seglen = np.diff(np.r_[starts, n])
        first = np.minimum.reduceat(np.where(c == 1, t, _TMAX), starts)
        hit = first != _TMAX
        depth = hit.astype(np.int64)
        # real timestamps are ~2^50 us, so first + window cannot overflow;
        # non-hit segments get a -inf deadline (nothing qualifies)
        dl = np.repeat(np.where(hit, first + window_us, _TMIN), seglen)
        gate = np.repeat(np.where(hit, first, _TMAX), seglen)
        for s in range(2, n_stages + 1):
            masked = np.where((c == s) & (t >= gate) & (t <= dl), t, _TMAX)
            first = np.minimum.reduceat(masked, starts)
            hit = first != _TMAX
            depth += hit
            if s < n_stages:
                gate = np.repeat(np.where(hit, first, _TMAX), seglen)
        return pa.table(
            {
                "user_id": pa.array(k[starts], pa.int64()),
                "funnel_stage": pa.array(depth, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def conversion_lag(
    events_ds,
    *,
    target_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int = 64,
):
    """Per-user microseconds from their FIRST event (any type) to their
    FIRST ``target_type`` event — the funnel-timing metric.  Users who
    never convert are omitted; a user whose very first event converts
    reports 0.

    ONE hash(user)-bucketed co-partition of three projected columns;
    per-bucket vectorized min/min-where reduce; integer-µs arithmetic
    (parallelism-invariant).  Output: ``(user_id, first_ts,
    convert_ts, lag_us)`` with timestamps pinned to [us].
    """
    import pyarrow.compute as pc

    def tag(batch):
        import pyarrow as pa

        k = batch[key_col].to_numpy(zero_copy_only=False)
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int64), pa.int64()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "y": batch[type_col],
            }
        )

    def per_bucket(group):
        import pyarrow as pa

        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        is_target = pc.equal(group["y"], target_type).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((t, k))
        k, t, is_target = k[order], t[order], is_target[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1])) if len(k) else []
        )
        ends = np.append(starts[1:], len(k))
        out_k, out_f, out_c = [], [], []
        for lo, hi in zip(starts, ends):
            hits = np.flatnonzero(is_target[lo:hi])
            if len(hits):
                out_k.append(int(k[lo]))
                out_f.append(int(t[lo]))
                out_c.append(int(t[lo + hits[0]]))
        first = np.array(out_f, np.int64)
        conv = np.array(out_c, np.int64)
        return pa.table(
            {
                key_col: pa.array(out_k, pa.int64()),
                "first_ts": pa.array(
                    first.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "convert_ts": pa.array(
                    conv.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "lag_us": pa.array(conv - first, pa.int64()),
            }
        )

    return (
        events_ds.select_columns([key_col, ts_col, type_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
