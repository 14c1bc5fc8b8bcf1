"""Temporal joins over keyed event streams, Ray-Data-first.

Two operators a training-data pipeline needs that Ray Data lacks natively
(the reference engine has no analog either — these extend §2.6's join
family to time, the way ``extras/windows.py`` extends §2.4 to windows):

* ``asof_join_prev``   — point-in-time lookup: for every left row
  ``(key, ts)`` attach the build-side row with the greatest ``(ts, id)``
  strictly before it ("the user's most recent *purchase* at event time",
  the classic feature-at-label-time join; DuckDB spells it ASOF JOIN).
* ``range_lookback_agg`` — sliding lookback window: for every label row
  aggregate build rows of the same key with ``ts ∈ [label_ts - W,
  label_ts)`` ("activity in the 24 h before each purchase").

Execution plan (both operators, same shape):

* **broadcast path** (build side under ``broadcast_limit`` rows): the
  build side is collected once to sorted parallel numpy arrays and
  ``ray.put`` ONCE; every probe block resolves in ``map_batches`` with
  two global ``searchsorted`` calls — no shuffle at all.  This is the
  J1/orders_by_nation small-side pattern.
* **bucketed path** (both sides big): tag each side, hash the key into
  ``num_buckets`` buckets, one ``groupby(bucket).map_groups`` co-locates
  every key's rows from both sides in one task and runs the identical
  vectorized kernel per bucket.  Partitioning assumption: a single
  *bucket* (not the whole table) fits in a worker — ``num_buckets``
  scales it out; skewed single keys are bounded by per-key row counts,
  not table size.  Both paths are asserted equal in
  ``tests/test_temporal_joins.py``.

The per-probe binary search is fully vectorized with a composite-rank
monotone key: build rows sorted by ``(key, ts, id)`` map to
``key_rank * (U + 1) + time_rank`` where ``U = #distinct build
timestamps`` in scope and ``time_rank = searchsorted(unique_ts, ts)`` —
dense ranks keep the composite inside int64 for any bucket that fits in
memory (n·(n+1) ≤ 2^63 up to ~3e9 rows/bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import round6

# Collected build side at/under this many rows rides the broadcast path.
BROADCAST_LIMIT = 5_000_000
DEFAULT_BUCKETS = 64


def _ts_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column → int64 microseconds (zero-copy view)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).view("int64")


def _collect_build(ds, cols: list[str]) -> tuple[np.ndarray, ...]:
    """Stream a (small) build side to driver numpy arrays, one per col.

    Timestamp columns come back as int64 microseconds.
    """
    parts: list[list[np.ndarray]] = [[] for _ in cols]
    for b in ds.iter_batches(batch_format="pyarrow"):
        for i, c in enumerate(cols):
            col = b[c]
            if pa.types.is_timestamp(col.type):
                parts[i].append(_ts_i64(col))
            else:
                parts[i].append(col.to_numpy(zero_copy_only=False))
    return tuple(
        np.concatenate(p) if p else np.empty(0, np.int64) for p in parts
    )


def _asof_kernel(
    p_key: np.ndarray,
    p_ts: np.ndarray,
    b_key: np.ndarray,
    b_ts: np.ndarray,
    b_id: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """For each probe (key, ts) return (found mask, build row index of the
    greatest (ts, id) with same key and build_ts < probe_ts).

    ``b_*`` MUST already be sorted by (key, ts, id) ascending.
    """
    if len(b_key) == 0 or len(p_key) == 0:
        return np.zeros(len(p_key), bool), np.zeros(len(p_key), np.int64)
    ut = np.unique(b_ts)
    u = len(ut)
    b_trank = np.searchsorted(ut, b_ts)  # exact: every b_ts ∈ ut
    # dense key ranks shared by both sides (probe keys absent from the
    # build side get an arbitrary rank; masked out via starts below)
    ukeys = np.unique(b_key)
    b_krank = np.searchsorted(ukeys, b_key)
    p_krank = np.searchsorted(ukeys, np.minimum(p_key, ukeys[-1]))
    mono_b = b_krank * (u + 1) + b_trank
    # strict "< probe_ts": bound at searchsorted-left of the probe ts
    p_trank = np.searchsorted(ut, p_ts, side="left")
    mono_p = p_krank * (u + 1) + p_trank
    idx = np.searchsorted(mono_b, mono_p, side="left")
    starts = np.searchsorted(b_key, p_key, side="left")
    cand = idx - 1
    found = (idx > starts) & (starts < len(b_key))
    np.clip(cand, 0, len(b_key) - 1, out=cand)
    found &= b_key[cand] == p_key
    return found, cand


def _lookback_kernel(
    p_key: np.ndarray,
    p_ts: np.ndarray,
    window_us: int,
    b_key: np.ndarray,
    b_ts: np.ndarray,
    b_val: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per probe: (count, value sum) of build rows with same key and
    ``ts ∈ [probe_ts - window, probe_ts)``.

    ``b_*`` MUST already be sorted by (key, ts) ascending.  Sums are
    computed with ``np.add.reduceat`` over the contiguous per-probe slice
    so the FP accumulation order is the build sort order — identical in
    the broadcast and bucketed paths.
    """
    n = len(p_key)
    if len(b_key) == 0 or n == 0:
        return np.zeros(n, np.int64), np.zeros(n, np.float64)
    ut = np.unique(b_ts)
    u = len(ut)
    ukeys = np.unique(b_key)
    b_krank = np.searchsorted(ukeys, b_key)
    p_krank = np.searchsorted(ukeys, np.minimum(p_key, ukeys[-1]))
    key_ok = ukeys[p_krank] == p_key
    mono_b = b_krank * (u + 1) + np.searchsorted(ut, b_ts)
    lo = p_krank * (u + 1) + np.searchsorted(ut, p_ts - window_us, side="left")
    hi = p_krank * (u + 1) + np.searchsorted(ut, p_ts, side="left")
    j1 = np.searchsorted(mono_b, lo, side="left")
    j2 = np.searchsorted(mono_b, hi, side="left")
    counts = np.where(key_ok, j2 - j1, 0).astype(np.int64)
    # pairwise reduceat: sum b_val[j1:j2] per probe; sentinel guards j==len
    vals = np.concatenate([b_val, np.zeros(1, np.float64)])
    bounds = np.empty(2 * n, np.int64)
    bounds[0::2] = j1
    bounds[1::2] = np.maximum(j2, j1)  # reduceat needs non-decreasing pairs
    np.clip(bounds, 0, len(vals) - 1, out=bounds)
    sums = np.add.reduceat(vals, bounds)[0::2]
    sums = np.where(counts > 0, sums, 0.0)
    return counts, sums


def _sort_build_asof(key, ts, bid):
    order = np.lexsort((bid, ts, key))
    return key[order], ts[order], bid[order]


def _sort_build_lookback(key, ts, val, bid):
    order = np.lexsort((bid, ts, key))
    return key[order], ts[order], val[order]


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join_prev(
    left_ds,
    build_ds,
    *,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    broadcast_limit: int = BROADCAST_LIMIT,
    num_buckets: int = DEFAULT_BUCKETS,
):
    """For every left row attach the build row with the greatest
    ``(ts, id)`` of the same key strictly before the left row's ts
    (inner semantics: left rows with no prior build row are dropped).

    Output: ``(event_id, user_id, ts, prev_id, prev_ts)``.
    """
    import ray

    n_build = build_ds.count()
    if n_build <= broadcast_limit:
        bkey, bts, bid = _collect_build(build_ds, [key, ts, id_col])
        bkey, bts, bid = _sort_build_asof(bkey, bts, bid)
        side_ref = ray.put((bkey, bts, bid))

        def probe(batch: pa.Table) -> pa.Table:
            bk, bt, bi = ray.get(side_ref)
            pk = batch[key].to_numpy(zero_copy_only=False)
            pt = _ts_i64(batch[ts])
            found, cand = _asof_kernel(pk, pt, bk, bt, bi)
            sel = np.flatnonzero(found)
            hit = batch.filter(pa.array(found))
            return pa.table(
                {
                    "event_id": hit[id_col],
                    "user_id": hit[key],
                    "ts": hit[ts],
                    "prev_id": pa.array(bi[cand[sel]], pa.int64()),
                    "prev_ts": pa.array(
                        bt[cand[sel]].view("datetime64[us]"),
                        pa.timestamp("us"),
                    ),
                }
            )

        return left_ds.map_batches(probe, batch_format="pyarrow")

    # bucketed path: co-partition both sides by hash(key) % num_buckets
    def tag(side_id: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "_b": pa.array(
                        (k % num_buckets).astype(np.int32), pa.int32()
                    ),
                    "_side": pa.array(
                        np.full(len(k), side_id, np.int8), pa.int8()
                    ),
                    "k": pa.array(k, pa.int64()),
                    "t": pa.array(_ts_i64(batch[ts]), pa.int64()),
                    "i": pc.cast(batch[id_col], pa.int64()),
                }
            )

        return fn

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        build_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        pm = side == 0
        bk, bt, bi = _sort_build_asof(k[~pm], t[~pm], i[~pm])
        found, cand = _asof_kernel(k[pm], t[pm], bk, bt, bi)
        sel = np.flatnonzero(found)
        return pa.table(
            {
                "event_id": pa.array(i[pm][sel], pa.int64()),
                "user_id": pa.array(k[pm][sel], pa.int64()),
                "ts": pa.array(
                    t[pm][sel].view("datetime64[us]"), pa.timestamp("us")
                ),
                "prev_id": pa.array(bi[cand[sel]], pa.int64()),
                "prev_ts": pa.array(
                    bt[cand[sel]].view("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return tagged.groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# lookback-window aggregate (range join + aggregate)
# ---------------------------------------------------------------------------


def range_lookback_agg(
    label_ds,
    build_ds,
    *,
    window_us: int,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    broadcast_limit: int = BROADCAST_LIMIT,
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Per label row: count + 6dp value sum of build rows with the same
    key in ``[label_ts - window, label_ts)`` (labels with zero matches
    are dropped — inner range-join semantics).

    Output: ``(event_id, n_events, value_sum)``.
    """
    import ray

    n_build = build_ds.count()
    if n_build <= broadcast_limit:
        bkey, bts, bval, bid = _collect_build(
            build_ds, [key, ts, value, id_col]
        )
        bkey, bts, bval = _sort_build_lookback(bkey, bts, bval, bid)
        side_ref = ray.put((bkey, bts, bval))

        def probe(batch: pa.Table) -> pa.Table:
            bk, bt, bv = ray.get(side_ref)
            pk = batch[key].to_numpy(zero_copy_only=False)
            pt = _ts_i64(batch[ts])
            counts, sums = _lookback_kernel(pk, pt, window_us, bk, bt, bv)
            m = counts > 0
            return pa.table(
                {
                    "event_id": batch.filter(pa.array(m))[id_col],
                    "n_events": pa.array(counts[m], pa.int64()),
                    "value_sum": pa.array(
                        [round6(s) for s in sums[m]], pa.float64()
                    ),
                }
            )

        return label_ds.map_batches(probe, batch_format="pyarrow")

    def tag(side_id: int, with_value: bool):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False)
            v = (
                batch[value].to_numpy(zero_copy_only=False)
                if with_value
                else np.zeros(len(k), np.float64)
            )
            return pa.table(
                {
                    "_b": pa.array(
                        (k % num_buckets).astype(np.int32), pa.int32()
                    ),
                    "_side": pa.array(
                        np.full(len(k), side_id, np.int8), pa.int8()
                    ),
                    "k": pa.array(k, pa.int64()),
                    "t": pa.array(_ts_i64(batch[ts]), pa.int64()),
                    "i": pc.cast(batch[id_col], pa.int64()),
                    "v": pa.array(v, pa.float64()),
                }
            )

        return fn

    tagged = label_ds.map_batches(tag(0, False), batch_format="pyarrow").union(
        build_ds.map_batches(tag(1, True), batch_format="pyarrow")
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        pm = side == 0
        bk, bt, bv = _sort_build_lookback(k[~pm], t[~pm], v[~pm], i[~pm])
        counts, sums = _lookback_kernel(k[pm], t[pm], window_us, bk, bt, bv)
        m = counts > 0
        return pa.table(
            {
                "event_id": pa.array(i[pm][m], pa.int64()),
                "n_events": pa.array(counts[m], pa.int64()),
                "value_sum": pa.array(
                    [round6(s) for s in sums[m]], pa.float64()
                ),
            }
        )

    return tagged.groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# semi / anti join (existence filtering)
# ---------------------------------------------------------------------------


def key_filter_join(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
    anti: bool = False,
    columns: list[str] | None = None,
):
    """Semi join (``anti=False``: keep left rows whose key EXISTS on the
    right) / anti join (``anti=True``: keep those whose key does NOT) —
    SQL's ``WHERE [NOT] EXISTS`` as a broadcast filter.

    The right side is reduced to its DISTINCT keys where it lives
    (per-block ``unique`` inside ``map_batches``), the shrunk key set is
    exchanged once, sorted, and ``ray.put`` ONCE; every left block then
    filters itself with one ``searchsorted`` — the left side never
    shuffles.  Partitioning assumption: the right side's distinct-key
    array fits in the object store (keys only — at 8 bytes/key, 10^9
    keys = 8 GB; beyond that, swap the exact set for a Bloom filter with
    the same broadcast shape, or co-partition both sides by key hash as
    in the bucketed temporal-join path above).
    """
    import ray

    def block_unique(batch: pa.Table) -> pa.Table:
        u = np.unique(batch[right_key].to_numpy(zero_copy_only=False))
        return pa.table({right_key: pa.array(u, batch[right_key].type)})

    key_parts = [
        b[right_key].to_numpy(zero_copy_only=False)
        for b in right_ds.select_columns([right_key])
        .map_batches(block_unique, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    keys = (
        np.unique(np.concatenate(key_parts))
        if key_parts
        else np.empty(0, np.int64)
    )
    keys_ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        v = batch[left_key].to_numpy(zero_copy_only=False)
        if len(ks):
            pos = np.searchsorted(ks, v)
            pos_c = np.minimum(pos, len(ks) - 1)
            found = ks[pos_c] == v
        else:
            found = np.zeros(len(v), bool)
        mask = ~found if anti else found
        out = batch.filter(pa.array(mask))
        return out.select(columns) if columns else out

    # prune the left read to columns + the key (filt needs it even when
    # the caller's projection excludes it; filt re-projects afterwards)
    src = (
        left_ds.select_columns(
            list(dict.fromkeys([*columns, left_key]))
        )
        if columns
        else left_ds
    )
    return src.map_batches(filt, batch_format="pyarrow")


def left_outer_count_join(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
):
    """LEFT OUTER JOIN + COUNT: every left row with the number of right
    rows sharing its key, 0 when none — the join type the semi/anti pair
    above can't express (unmatched LEFT rows must SURVIVE with a fill).

    The right side collapses to per-key counts where it lives (per-block
    partial ``group_by`` inside ``map_batches``, then an O(keys)
    groupby), the (sorted keys, counts) pair broadcasts ONCE via
    ``ray.put``, and each left block attaches its count with one
    ``searchsorted`` — the left side never shuffles and unmatched keys
    fill 0 locally.  Same partitioning assumption as key_filter_join:
    the right side's DISTINCT-key table fits the object store (16
    bytes/key; co-partition both sides by key hash beyond that).
    Integer counts ⇒ parallelism-invariant.

    Output: ``(left_key, n_right)``.
    """
    import ray

    def partial_counts(batch: pa.Table) -> pa.Table:
        agg = batch.select([right_key]).group_by([right_key]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns([right_key, "_c"])

    from ..bucket_agg import bucketed_group_agg

    counts_df = bucketed_group_agg(
        right_ds.select_columns([right_key]).map_batches(
            partial_counts, batch_format="pyarrow"
        ),
        right_key,
        [("_c", "sum")],
    ).to_pandas()
    rk = counts_df[right_key].to_numpy()
    order = np.argsort(rk)
    pair = (rk[order], counts_df["sum(_c)"].to_numpy()[order])
    pair_ref = ray.put(pair)

    def attach(batch: pa.Table) -> pa.Table:
        ks, cs = ray.get(pair_ref)
        v = batch[left_key].to_numpy(zero_copy_only=False)
        n = np.zeros(len(v), np.int64)
        if len(ks):
            pos = np.searchsorted(ks, v)
            pos_c = np.minimum(pos, len(ks) - 1)
            hit = ks[pos_c] == v
            n[hit] = cs[pos_c[hit]]
        return pa.table(
            {
                left_key: batch[left_key],
                "n_right": pa.array(n, pa.int64()),
            }
        )

    return left_ds.select_columns([left_key]).map_batches(
        attach, batch_format="pyarrow"
    )


def interval_band_join_agg(
    events_ds,
    bands: list[tuple[int, int, int]],
    *,
    val_col: str = "value",
    type_col: str = "event_type",
):
    """Broadcast interval (non-equi) join + aggregate: every event row
    matches EVERY band whose ``[lo, hi)`` range contains its value —
    bands may overlap, so this is a true one-to-many interval join
    (the IP-range / price-tier / SLA-bucket shape), not a bucketing.

    ``bands`` is the small side: ``(band_id, lo, hi)`` integer bounds,
    broadcast into every task (at 100 TB the band table rides in the
    closure once per worker — the probe side never shuffles).  Each
    block emits per-(band, type) partial rows with cent-scaled integer
    sums, so the exchange is O(bands x types x blocks) and bit-stable
    under any block arrangement.  With B bands the per-block probe is B
    vectorized mask-reduces; for large overlapping band sets the scale
    path is an interval tree / sorted-endpoint sweep per block — same
    contract, still broadcast.

    Output: ``(band_id, event_type, n, sum_value)``; sum_value is the
    exact cent sum divided by 100 once (matches the SQL oracle's
    expression).
    """
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[val_col].to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100.0).astype(np.int64)
        et = np.asarray(batch[type_col].to_pylist(), dtype=object)
        # stable per-block type codes via sorted uniques
        uniq, inv = np.unique(et, return_inverse=True)
        bid_out, type_out, n_out, sum_out = [], [], [], []
        for band_id, lo, hi in bands:
            m = (cents >= lo * 100) & (cents < hi * 100)
            if not m.any():
                continue
            sel = inv[m]
            cnt = np.bincount(sel, minlength=len(uniq))
            csum = np.bincount(sel, weights=cents[m], minlength=len(uniq))
            nz = np.flatnonzero(cnt)
            for t in nz.tolist():
                bid_out.append(band_id)
                type_out.append(uniq[t])
                n_out.append(int(cnt[t]))
                sum_out.append(int(csum[t]))
        return pa.table(
            {
                "band_id": pa.array(bid_out, pa.int64()),
                "event_type": pa.array(type_out, pa.string()),
                "_n": pa.array(n_out, pa.int64()),
                "_sc": pa.array(sum_out, pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch["sum(_n)"].to_numpy(zero_copy_only=False)
        sc = batch["sum(_sc)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_id": batch["band_id"],
                "event_type": batch["event_type"],
                "n": pa.array(n, pa.int64()),
                "sum_value": pa.array(sc / 100.0, pa.float64()),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["band_id", "event_type"])
        .sum(["_n", "_sc"])
        .map_batches(finalize, batch_format="pyarrow")
    )
