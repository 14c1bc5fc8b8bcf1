"""Distributed numeric/statistical operators for training-data curation.

Everything here is two-phase where the math is mergeable: a vectorized
partial aggregate INSIDE ``map_batches`` (so the exchange carries
O(groups) rows, not O(rows)), then a small ``groupby`` finalize.  The
two inherently non-mergeable members document their co-location
assumption:

* ``grouped_quantiles`` — EXACT per-group continuous quantiles need the
  group's values in one place, so it rides ``groupby().map_groups``
  (sort-based shuffle of just ``(key, value)``).  A group must fit in
  one worker's heap; for heavy groups use ``histogram_quantiles``, whose
  fixed-bin partial counts merge like any sum and bound the exchange at
  O(bins) regardless of input size.
* ``hash_ksample`` — deterministic uniform k-sample: every block keeps
  its k smallest md5 keys (a distributive top-k, like
  ``topk.topk_per_group``), so only O(blocks · k) rows reach the final
  merge.  The md5-little-endian key equals DuckDB ``md5_number_upper``,
  making the sample membership SQL-replicable bit-for-bit — the
  reference sampling discipline of extras/split.py (see split.py:1-9).

Reference anchors: the per-group aggregate family generalizes the
reference's IDF/per-word statistics pass (Indexer/SQLiteSearcher.java:
347-383 recomputes per-term corpus statistics in bulk); rollup
generalizes its per-domain/per-page tallies.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bucket_agg import bucketed_group_agg
from .textstats import round6, round6_arr

_SEP = "\x1f"


def _np_col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


def quantile_cont(sorted_vals: np.ndarray, q: float) -> float:
    """Continuous (linearly interpolated) quantile over pre-sorted values
    — ``v[lo]*(1-frac) + v[hi]*frac`` at ``pos = q*(n-1)``.  The oracle
    SQL replicates this exact expression (same FP operation order) via
    list indexing instead of relying on ``quantile_cont``'s unspecified
    interpolation form.
    """
    n = len(sorted_vals)
    if n == 0:
        raise ValueError("empty group")
    pos = q * (n - 1)
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    frac = pos - lo
    return float(sorted_vals[lo] * (1.0 - frac) + sorted_vals[hi] * frac)


def grouped_quantiles(ds, *, key_col: str, val_col: str, qs: list[float]):
    """Exact per-group continuous quantiles.

    Output: one row per (group, q): ``(key_col, q, value)`` with the
    value rounded to 6dp.  The shuffle moves only the two projected
    columns; each group's values co-locate on one worker (see module
    docstring for the bounded-memory alternative).
    """
    qs = list(qs)

    def per_group(group: pa.Table) -> pa.Table:
        v = np.sort(_np_col(group, val_col))
        key = group[key_col][0].as_py()
        return pa.table(
            {
                key_col: pa.array([key] * len(qs), group[key_col].type),
                "q": pa.array(qs, pa.float64()),
                "value": pa.array(
                    [round6(quantile_cont(v, q)) for q in qs], pa.float64()
                ),
            }
        )

    return (
        ds.select_columns([key_col, val_col])
        .groupby(key_col)
        .map_groups(per_group, batch_format="pyarrow")
    )


def winsorize_grouped(
    ds,
    *,
    key_col: str,
    val_col: str,
    id_cols: list[str],
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    out_col: str = "value_w",
):
    """Per-group winsorization (outlier clipping): every value is clipped
    to its group's exact ``[q_lo, q_hi]`` continuous quantiles — the
    heavy-tail-taming cleanup step of a curation pipeline.

    Two-phase plan: ``grouped_quantiles`` computes the per-group bounds
    (O(groups · 2) rows — tiny), the driver broadcasts the bounds map
    once via ``ray.put``, and a stateless ``map_batches`` clips
    vectorized (``np.minimum``/``np.maximum`` per group slice).  The
    corpus itself never shuffles.  Bounds are 6dp-rounded on BOTH sides
    (here and in the SQL oracle), so the clip decision is insensitive to
    interpolation-expression FP noise.

    Output: ``(*id_cols, key_col, out_col)`` — one row per input row,
    ``out_col`` rounded to 6dp.
    """
    import ray

    if not 0.0 <= q_lo < q_hi <= 1.0:
        raise ValueError(f"need 0 <= q_lo < q_hi <= 1, got ({q_lo}, {q_hi})")
    bounds_tbl = grouped_quantiles(
        ds, key_col=key_col, val_col=val_col, qs=[q_lo, q_hi]
    ).to_pandas()
    bounds: dict = {}
    for k, q, v in zip(bounds_tbl[key_col], bounds_tbl["q"], bounds_tbl["value"]):
        lo, hi = bounds.get(k, (None, None))
        if q == q_lo:
            lo = float(v)
        else:
            hi = float(v)
        bounds[k] = (lo, hi)
    bounds_ref = ray.put(bounds)

    def clip(batch: pa.Table) -> pa.Table:
        bm = ray.get(bounds_ref)
        v = _np_col(batch, val_col).astype(np.float64)
        keys = batch[key_col].to_pylist()
        lo = np.fromiter((bm[k][0] for k in keys), np.float64, len(keys))
        hi = np.fromiter((bm[k][1] for k in keys), np.float64, len(keys))
        w = np.minimum(np.maximum(v, lo), hi)
        cols = {c: batch[c] for c in id_cols}
        cols[key_col] = batch[key_col]
        cols[out_col] = pa.array(round6_arr(w), pa.float64())
        return pa.table(cols)

    return ds.select_columns([*id_cols, key_col, val_col]).map_batches(
        clip, batch_format="pyarrow"
    )


def histogram_quantiles(
    ds,
    *,
    val_col: str,
    qs: list[float],
    num_bins: int = 4096,
):
    """Approximate global quantiles with bounded state: fixed equi-width
    bins between the global min/max (one cheap pre-pass), per-block
    vectorized bin counts (``np.bincount``), an O(bins) exchange, then
    linear interpolation inside the target bin.  Error ≤ one bin width —
    the 100-TB path when a group is too big to co-locate.
    """
    lo = ds.min(val_col)
    hi = ds.max(val_col)
    if lo is None or hi is None:
        raise ValueError("empty dataset")
    width = (hi - lo) / num_bins or 1.0

    def partial(batch: pa.Table) -> pa.Table:
        v = _np_col(batch, val_col)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, num_bins - 1)
        counts = np.bincount(idx, minlength=num_bins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "c": pa.array(counts[nz], pa.int64()),
            }
        )

    merged = (
        ds.select_columns([val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .sum("c")
    ).to_pandas()
    counts = np.zeros(num_bins, np.int64)
    counts[merged["bin"].to_numpy()] = merged["sum(c)"].to_numpy()
    cum = np.cumsum(counts)
    total = cum[-1]
    out_q, out_v = [], []
    for q in qs:
        target = q * (total - 1)
        b = int(np.searchsorted(cum, target, side="right"))
        b = min(b, num_bins - 1)
        prev = cum[b - 1] if b else 0
        inbin = counts[b] or 1
        frac = (target - prev) / inbin
        out_q.append(q)
        out_v.append(lo + (b + frac) * width)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def global_value_rank(
    ds,
    *,
    val_col: str,
    id_col: str,
    ntile: int | None = None,
    num_bins: int = 4096,
):
    """Distributed exact ``ROW_NUMBER() OVER (ORDER BY val, id)`` (plus
    optional ``NTILE``) — the global ORDER-BY rank primitive, without a
    single-worker sort.

    Same prefix-sum discipline as split.global_shuffle, but the buckets
    are VALUE ranges instead of hash ranges: an exact global min/max
    pre-pass fixes equi-width bins (deterministic at any parallelism),
    per-bin counts prefix-sum on the driver (O(bins)), and each bin
    sorts locally by ``(val, id)`` — bin ranges are value-contiguous, so
    bin-order + local order IS the global order.  Skewed distributions
    make bins uneven (a bin must fit in one worker's heap); at 100 TB,
    split hot bins recursively or pick boundaries from a quantile sketch
    instead of equi-width.

    ``ntile=K`` adds SQL's NTILE(K) (1-based; first ``n % K`` tiles get
    the extra row), derived arithmetically from the exact rank.
    Output: ``(id_col, value_rank, [tile])`` with ``value_rank`` 0-based.

    ``val_col`` must be NaN-free (NaN has no place in a value-range
    bucket; SQL would order it last) and, if integer, within float64's
    exact range (|v| ≤ 2^53) — both guarded/assumed below.
    """
    import ray

    lo = ds.min(val_col)
    hi = ds.max(val_col)
    if lo is None or hi is None:
        raise ValueError("empty dataset")
    if math.isnan(lo) or math.isnan(hi):
        raise ValueError(f"{val_col!r} contains NaN — rank order undefined")
    width = (hi - lo) / num_bins or 1.0

    def narrow(batch: pa.Table) -> pa.Table:
        v = _np_col(batch, val_col).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, num_bins - 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "_v": pa.array(v, pa.float64()),
                "_bin": pa.array(b, pa.int64()),
            }
        )

    keyed = (
        ds.select_columns([id_col, val_col])
        .map_batches(narrow, batch_format="pyarrow")
        .materialize()  # feeds two consumers: bin counts + the local rank
    )
    counts = keyed.groupby("_bin").count().to_pandas().sort_values("_bin")
    n_total = int(counts["count()"].sum())
    bases = dict(
        zip(
            counts["_bin"].to_numpy(),
            np.concatenate(([0], np.cumsum(counts["count()"].to_numpy())[:-1])),
        )
    )
    bases_ref = ray.put(bases)

    def local_rank(group: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)[int(group["_bin"][0].as_py())]
        v = group["_v"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v))
        rank = base + np.arange(len(order), dtype=np.int64)
        cols = {
            id_col: pa.array(ids[order], group[id_col].type),
            "value_rank": pa.array(rank, pa.int64()),
        }
        if ntile:
            q, r = divmod(n_total, ntile)
            split = r * (q + 1)
            tile = np.where(
                rank < split,
                rank // (q + 1),
                r + (rank - split) // max(q, 1),
            )
            cols["tile"] = pa.array(tile + 1, pa.int64())
        return pa.table(cols)

    return keyed.groupby("_bin").map_groups(local_rank, batch_format="pyarrow")


def grouped_stats(ds, *, key_col: str, val_col: str):
    """Per-group describe: ``(key, n, vmin, vmax, mean, std_pop)``.

    Partial (n, Σx, Σx², min, max) per block — all five merge under
    sum/min/max, so the exchange is O(groups).  ``std_pop`` uses the
    population form √(Σx²/n − mean²); mean/std round to 6dp so the
    DuckDB ``avg``/``stddev_pop`` oracle compares despite summation-order
    differences (output is O(groups) rows, so boundary flips are not a
    realistic risk at that magnitude).
    """

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.select([key_col, val_col])
        agg = tbl.group_by([key_col]).aggregate(
            [(val_col, "count"), (val_col, "sum"), (val_col, "min"), (val_col, "max")]
        )
        v = _np_col(batch, val_col)
        keys = batch[key_col]
        sq = pa.table({key_col: keys, "_sq": pa.array(v * v, pa.float64())})
        agg_sq = sq.group_by([key_col]).aggregate([("_sq", "sum")])
        joined = agg.join(agg_sq, keys=[key_col])
        return pa.table(
            {
                key_col: joined[key_col],
                "n_p": pc.cast(joined[f"{val_col}_count"], pa.int64()),
                "s_p": pc.cast(joined[f"{val_col}_sum"], pa.float64()),
                "ss_p": pc.cast(joined["_sq_sum"], pa.float64()),
                "mn_p": pc.cast(joined[f"{val_col}_min"], pa.float64()),
                "mx_p": pc.cast(joined[f"{val_col}_max"], pa.float64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = _np_col(batch, "sum(n_p)").astype(np.float64)
        s = _np_col(batch, "sum(s_p)")
        ss = _np_col(batch, "sum(ss_p)")
        mean = s / n
        var = np.maximum(ss / n - mean * mean, 0.0)
        return pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "vmin": batch["min(mn_p)"],
                "vmax": batch["max(mx_p)"],
                "mean": pa.array([round6(x) for x in mean], pa.float64()),
                "std_pop": pa.array(
                    [round6(x) for x in np.sqrt(var)], pa.float64()
                ),
            }
        )

    return bucketed_group_agg(
        ds.select_columns([key_col, val_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        key_col,
        [
            ("n_p", "sum"),
            ("s_p", "sum"),
            ("ss_p", "sum"),
            ("mn_p", "min"),
            ("mx_p", "max"),
        ],
    ).map_batches(finalize, batch_format="pyarrow")


def rollup_agg(ds, *, key_cols: list[str], val_col: str, all_label: str = "ALL"):
    """GROUP BY ROLLUP(a, b): detail cells plus per-a subtotals plus a
    grand total, with ``all_label`` standing in for SQL's NULL grouping
    marker (a sentinel keeps the driver's value-hash compare away from
    NULL-ordering ambiguity).

    One partial-agg pass produces the detail cells; every coarser level
    is derived from those O(cells) rows in a final single task — the
    input is read ONCE and never re-shuffled per grouping set (SQL
    engines typically re-aggregate per set).
    Output: ``(*key_cols, n, total)``.
    """
    assert len(key_cols) == 2, "rollup_agg implements the 2-key rollup"
    a_col, b_col = key_cols

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.select([a_col, b_col, val_col])
        agg = tbl.group_by([a_col, b_col]).aggregate(
            [(val_col, "count"), (val_col, "sum")]
        )
        return pa.table(
            {
                a_col: agg[a_col],
                b_col: agg[b_col],
                "n_p": pc.cast(agg[f"{val_col}_count"], pa.int64()),
                "s_p": pc.cast(agg[f"{val_col}_sum"], pa.float64()),
            }
        )

    detail = (
        ds.select_columns([a_col, b_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([a_col, b_col])
        .sum(["n_p", "s_p"])
    ).to_pandas()
    # derive the coarser grouping sets from the detail cells (tiny)
    detail = detail.rename(columns={"sum(n_p)": "n", "sum(s_p)": "s"})
    detail = detail.sort_values([a_col, b_col]).reset_index(drop=True)
    rows_a = []
    rows_b = []
    rows_n = []
    rows_s = []
    for _, r in detail.iterrows():
        rows_a.append(r[a_col])
        rows_b.append(r[b_col])
        rows_n.append(int(r["n"]))
        rows_s.append(float(r["s"]))
    sub = detail.groupby(a_col, sort=True).agg(n=("n", "sum"), s=("s", "sum"))
    for a, r in sub.iterrows():
        rows_a.append(a)
        rows_b.append(all_label)
        rows_n.append(int(r["n"]))
        rows_s.append(float(r["s"]))
    rows_a.append(all_label)
    rows_b.append(all_label)
    rows_n.append(int(detail["n"].sum()))
    rows_s.append(float(sub["s"].sum()))
    return pa.table(
        {
            a_col: pa.array(rows_a, pa.string()),
            b_col: pa.array(rows_b, pa.string()),
            "n": pa.array(rows_n, pa.int64()),
            # raw sums on purpose: callers that rescale (e.g. cents →
            # dollars) must round ONCE, at the final unit, like the SQL
            # ROUND(sum/100, 6) — rounding here too would double-round
            # (ray) vs single-round (SQL) and diverge at |Σ|·1e6 ≥ 2^52
            "total": pa.array(rows_s, pa.float64()),
        }
    )


def cube_agg(ds, *, key_cols: list[str], val_col: str, all_label: str = "ALL"):
    """GROUP BY CUBE(a, b): detail cells, per-a subtotals, per-b
    subtotals, and the grand total — the full 2-key grouping-set
    lattice, with ``all_label`` for SQL's NULL grouping marker (same
    sentinel rationale as :func:`rollup_agg`).

    Like rollup_agg, the input is aggregated ONCE into detail cells;
    all three coarser sets are derived from those O(cells) rows on the
    driver instead of re-shuffling the input per grouping set.  The
    b-only subtotal (the set ROLLUP lacks) is just a second O(cells)
    re-group of the detail frame.
    Output: ``(*key_cols, n, total)``.
    """
    assert len(key_cols) == 2, "cube_agg implements the 2-key cube"
    a_col, b_col = key_cols

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.select([a_col, b_col, val_col])
        agg = tbl.group_by([a_col, b_col]).aggregate(
            [(val_col, "count"), (val_col, "sum")]
        )
        return pa.table(
            {
                a_col: agg[a_col],
                b_col: agg[b_col],
                "n_p": pc.cast(agg[f"{val_col}_count"], pa.int64()),
                "s_p": pc.cast(agg[f"{val_col}_sum"], pa.float64()),
            }
        )

    import pandas as pd

    detail = (
        ds.select_columns([a_col, b_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([a_col, b_col])
        .sum(["n_p", "s_p"])
    ).to_pandas()
    detail = detail.rename(columns={"sum(n_p)": "n", "sum(s_p)": "s"})
    detail = detail.sort_values([a_col, b_col]).reset_index(drop=True)
    sub_a = detail.groupby(a_col, sort=True, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum")
    )
    sub_a[b_col] = all_label
    sub_b = detail.groupby(b_col, sort=True, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum")
    )
    sub_b[a_col] = all_label
    grand = pd.DataFrame(
        {
            a_col: [all_label],
            b_col: [all_label],
            "n": [int(detail["n"].sum())],
            "s": [float(detail["s"].sum())],
        }
    )
    out = pd.concat(
        [detail, sub_a, sub_b, grand], ignore_index=True
    )[[a_col, b_col, "n", "s"]]
    return pa.table(
        {
            a_col: pa.array(out[a_col].astype(str), pa.string()),
            b_col: pa.array(out[b_col].astype(str), pa.string()),
            "n": pa.array(out["n"].astype(np.int64), pa.int64()),
            # raw sums — same single-round contract as rollup_agg
            "total": pa.array(out["s"].tolist(), pa.float64()),
        }
    )


def _md5_le64(values: list, salt: str = "") -> np.ndarray:
    """md5(salt + str(v)) first 8 bytes little-endian, as uint64 — equal
    to DuckDB ``md5_number_upper(salt || v::VARCHAR)`` (split.py:19-24).
    """
    out = np.empty(len(values), np.uint64)
    for i, v in enumerate(values):
        h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
        out[i] = int.from_bytes(h, "little")
    return out


def hash_ksample(ds, *, id_col: str, k: int, salt: str = ""):
    """Deterministic uniform k-sample: the k rows with the smallest
    ``md5(salt + id)`` keys — the distributed-reservoir analog with no
    RNG state.  Per-block partial keeps only its own k smallest (top-k is
    distributive), so the merge sees O(blocks · k) rows.

    Output: ``(id_col,)`` of the k sampled ids.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = _md5_le64(ids, salt)
        if len(h) > k:
            keep = np.argpartition(h, k)[:k]
        else:
            keep = np.arange(len(h))
        return pa.table(
            {
                "_b": pa.array(np.zeros(len(keep), np.int32), pa.int32()),
                id_col: pa.array([ids[i] for i in keep], batch[id_col].type),
                "h": pa.array(h[keep], pa.uint64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return pa.table({id_col: pa.array(ids[order], group[id_col].type)})

    return (
        ds.select_columns([id_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )


def distinct_count_per_group(ds, *, key_col: str, val_col: str):
    """Exact COUNT(DISTINCT val) per key — HLL's exact sibling
    (extras/sketch.py is the approximate one).  Per-block distinct pairs
    first (cuts duplicate traffic at the source), a pair-level groupby to
    finish the distinct, then an O(pairs) → O(keys) count.

    Output: ``(key_col, n_distinct)``.
    """

    def block_distinct(batch: pa.Table) -> pa.Table:
        tbl = batch.select([key_col, val_col])
        return tbl.group_by([key_col, val_col]).aggregate([])

    def project_key(batch: pa.Table) -> pa.Table:
        return batch.select([key_col])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "n_distinct": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return bucketed_group_agg(
        bucketed_group_agg(
            ds.select_columns([key_col, val_col]).map_batches(
                block_distinct, batch_format="pyarrow"
            ),
            [key_col, val_col],
            [(key_col, "count")],
        ).map_batches(project_key, batch_format="pyarrow"),
        key_col,
        [(key_col, "count")],
    ).map_batches(finalize, batch_format="pyarrow")


def grouped_corr(
    ds,
    *,
    key_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1,
):
    """Per-group Pearson correlation + sample covariance from EXACT
    integer sufficient statistics.

    Quantizing x/y to integers (``np.rint(v * scale)`` — the inputs are
    integral at that scale, e.g. 2dp money) makes every partial sum
    (n, Σx, Σy, Σxy, Σx², Σy²) an exact int64 that merges under + —
    O(groups) rows cross the exchange and the result is bit-identical
    at any parallelism.  Naive float sufficient stats would lose ~1e-7
    absolute to catastrophic cancellation at these magnitudes — past
    the 6dp compare; the SQL oracle replicates the final float
    expression operation-for-operation instead of calling ``corr()``.

    Degenerate groups (n < 2, or zero variance on either side) emit
    0.0 — mirrored by CASE guards in the SQL oracle — instead of
    NaN/inf.  Caller contract: quantized magnitudes must keep every
    per-group Σ product under 2^63 (Σ|x·scale|² < 9.2e18 — at larger
    scales carry the partials as decimal128/HUGEINT).

    Output: ``(key_col, n, covar, corr)`` — covariance in ORIGINAL
    units (÷ x_scale·y_scale), both rounded to 6dp.
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(_np_col(batch, x_col) * x_scale).astype(np.int64)
        y = np.rint(_np_col(batch, y_col) * y_scale).astype(np.int64)
        tbl = pa.table(
            {
                key_col: batch[key_col],
                "_n": pa.array(np.ones(len(x), np.int64), pa.int64()),
                "_sx": pa.array(x, pa.int64()),
                "_sy": pa.array(y, pa.int64()),
                "_sxy": pa.array(x * y, pa.int64()),
                "_sxx": pa.array(x * x, pa.int64()),
                "_syy": pa.array(y * y, pa.int64()),
            }
        )
        return tbl.group_by([key_col]).aggregate(
            [(c, "sum") for c in ["_n", "_sx", "_sy", "_sxy", "_sxx", "_syy"]]
        ).rename_columns([key_col, "_n", "_sx", "_sy", "_sxy", "_sxx", "_syy"])

    def finalize(batch: pa.Table) -> pa.Table:
        n = _np_col(batch, "sum(_n)").astype(np.float64)
        sx = _np_col(batch, "sum(_sx)").astype(np.float64)
        sy = _np_col(batch, "sum(_sy)").astype(np.float64)
        sxy = _np_col(batch, "sum(_sxy)").astype(np.float64)
        sxx = _np_col(batch, "sum(_sxx)").astype(np.float64)
        syy = _np_col(batch, "sum(_syy)").astype(np.float64)
        # operation order mirrored by the SQL oracle expression exactly
        cov_num = sxy - sx * sy / n
        var_prod = (sxx - sx * sx / n) * (syy - sy * sy / n)
        with np.errstate(divide="ignore", invalid="ignore"):
            covar = np.where(
                n > 1.0, cov_num / (n - 1.0) / (x_scale * y_scale), 0.0
            )
            corr = np.where(var_prod > 0.0, cov_num / np.sqrt(var_prod), 0.0)
        return pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "covar": pa.array([round6(v) for v in covar], pa.float64()),
                "corr": pa.array([round6(v) for v in corr], pa.float64()),
            }
        )

    return bucketed_group_agg(
        ds.select_columns([key_col, x_col, y_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        key_col,
        [(c, "sum") for c in ["_n", "_sx", "_sy", "_sxy", "_sxx", "_syy"]],
    ).map_batches(finalize, batch_format="pyarrow")


def grouped_spearman(
    ds,
    *,
    key_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1,
):
    """Per-group Spearman rank correlation with AVERAGE tie ranks, from
    exact integer sufficient statistics over the per-group joint (x, y)
    histogram.

    One distributed ``groupby(key, x, y).sum`` builds the joint counts —
    O(distinct pairs) rows, the only exchange; the raw rows never leave
    their blocks un-aggregated.  Doubled average ranks
    ``2·r(v) = 2·cum_below + c + 1`` are integers (the usual half-integer
    tie rank, times 2), so every weighted rank sum is an exact integer
    accumulated in arbitrary-precision Python (the SQL side sums BIGINT
    → HUGEINT); the constant factor 2 cancels in the correlation.  The
    final Pearson-on-ranks float expression is replicated
    operation-for-operation by the SQL oracle.

    Designed for BOUNDED-CARDINALITY axes: the joint histogram is
    O(groups × |X| × |Y|) and is collected to the driver (documented
    domain bound, not data-size bound — e.g. integral quantities ×
    2dp discounts).  For unbounded axes, rank per group with the
    global_value_rank prefix-sum discipline instead and feed the ranked
    rows to grouped_corr.

    Output: ``(key_col, n, spearman)``.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(_np_col(batch, x_col) * x_scale).astype(np.int64)
        y = np.rint(_np_col(batch, y_col) * y_scale).astype(np.int64)
        tbl = pa.table(
            {
                key_col: batch[key_col],
                "_x": pa.array(x, pa.int64()),
                "_y": pa.array(y, pa.int64()),
            }
        )
        agg = tbl.group_by([key_col, "_x", "_y"]).aggregate([([], "count_all")])
        return agg.rename_columns([key_col, "_x", "_y", "_n"])

    joint = (
        ds.select_columns([key_col, x_col, y_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "_x", "_y"])
        .sum("_n")
    ).to_pandas()
    joint = joint.rename(columns={"sum(_n)": "_n"})

    def rank2_map(sub: pd.DataFrame, axis: str) -> dict[int, int]:
        # doubled average rank per distinct value: 2·cum_below + c + 1
        c = sub.groupby(axis)["_n"].sum().sort_index()
        cum_below = c.cumsum().shift(fill_value=0)
        return {
            int(v): int(2 * int(cb) + int(cc) + 1)
            for v, cb, cc in zip(c.index, cum_below, c)
        }

    keys, ns, rhos = [], [], []
    for g, sub in joint.groupby(key_col, sort=True):
        rx = rank2_map(sub, "_x")
        ry = rank2_map(sub, "_y")
        n_i = 0
        sx = sy = sxy = sxx = syy = 0  # exact Python ints
        for xv, yv, nn in zip(sub["_x"], sub["_y"], sub["_n"]):
            nn = int(nn)
            a = rx[int(xv)]
            b = ry[int(yv)]
            n_i += nn
            sx += nn * a
            sy += nn * b
            sxy += nn * a * b
            sxx += nn * a * a
            syy += nn * b * b
        # float conversion + op order mirrored by the SQL oracle
        n_f, sx_f, sy_f = float(n_i), float(sx), float(sy)
        sxy_f, sxx_f, syy_f = float(sxy), float(sxx), float(syy)
        var_prod = (sxx_f - sx_f * sx_f / n_f) * (syy_f - sy_f * sy_f / n_f)
        rho = (
            (sxy_f - sx_f * sy_f / n_f) / math.sqrt(var_prod)
            if var_prod > 0.0
            else 0.0
        )
        keys.append(g)
        ns.append(n_i)
        rhos.append(round6(rho))
    return pa.table(
        {
            key_col: pa.array(keys, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "spearman": pa.array(rhos, pa.float64()),
        }
    )


def grouped_mode(ds, *, key_col: str, val_col: str, num_buckets: int = 64):
    """Per-key modal value: the value with the highest count, ties broken
    by the SMALLEST value — fully deterministic, integer counts, zero FP
    risk.  Partial (key, val, count) per block → pair-level groupby sum
    (O(keys·|domain|) rows) → bucketed argmax per key.

    Integer keys bucket by ``key % num_buckets``; any other key type
    buckets by its md5 hash.  Key and value dtypes pass through.

    Output: ``(key_col, mode_<val_col>, n)``.
    """
    out_val = f"mode_{val_col}"

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.select([key_col, val_col])
        agg = tbl.group_by([key_col, val_col]).aggregate([([], "count_all")])
        return agg.rename_columns([key_col, val_col, "_c"])

    def tag(batch: pa.Table) -> pa.Table:
        k = _np_col(batch, key_col)
        if np.issubdtype(k.dtype, np.integer):
            b = (k % num_buckets).astype(np.int32)
        else:
            b = (_md5_le64(batch[key_col].to_pylist()) % num_buckets).astype(
                np.int32
            )
        return pa.table(
            {
                "_b": pa.array(b, pa.int32()),
                key_col: batch[key_col],
                val_col: batch[val_col],
                "_c": pc.cast(batch["sum(_c)"], pa.int64()),
            }
        )

    def argmax(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        df = df.sort_values(
            [key_col, "_c", val_col], ascending=[True, False, True]
        )
        win = df.groupby(key_col, sort=True).head(1)
        return pa.table(
            {
                key_col: pa.array(win[key_col], group[key_col].type),
                out_val: pa.array(win[val_col], group[val_col].type),
                "n": pa.array(win["_c"].to_numpy(), pa.int64()),
            }
        )

    return (
        bucketed_group_agg(
            ds.select_columns([key_col, val_col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            [key_col, val_col],
            [("_c", "sum")],
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(argmax, batch_format="pyarrow")
    )


def grouped_zscore(
    ds,
    *,
    key_col: str,
    val_col: str,
    id_col: str,
    scale: int = 100,
):
    """Per-group z-score normalization: ``(v − mean) / std_pop`` with the
    group moments from EXACT integer sums (same quantization discipline
    as grouped_corr), so the per-row float expression — mirrored
    operation-for-operation by the SQL oracle — is bit-identical at any
    parallelism.  Two-phase: O(groups) moment rows broadcast via
    ``ray.put``; the table itself never shuffles.

    Zero-variance groups emit z = 0.0 (mirrored by a CASE guard in the
    SQL oracle).  Same int64 magnitude contract as ``grouped_corr``.

    Output: ``(id_col, key_col, z)`` with z rounded to 6dp.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        c = np.rint(_np_col(batch, val_col) * scale).astype(np.int64)
        tbl = pa.table(
            {
                key_col: batch[key_col],
                "_n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "_s": pa.array(c, pa.int64()),
                "_ss": pa.array(c * c, pa.int64()),
            }
        )
        return tbl.group_by([key_col]).aggregate(
            [("_n", "sum"), ("_s", "sum"), ("_ss", "sum")]
        ).rename_columns([key_col, "_n", "_s", "_ss"])

    moments_tbl = bucketed_group_agg(
        ds.select_columns([key_col, val_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        key_col,
        [("_n", "sum"), ("_s", "sum"), ("_ss", "sum")],
    ).to_pandas()
    moments = {
        k: (float(n), float(s), float(ss))
        for k, n, s, ss in zip(
            moments_tbl[key_col],
            moments_tbl["sum(_n)"],
            moments_tbl["sum(_s)"],
            moments_tbl["sum(_ss)"],
        )
    }
    mref = ray.put(moments)
    sc = float(scale)
    sc2 = float(scale * scale)

    def zmap(batch: pa.Table) -> pa.Table:
        mm = ray.get(mref)
        keys = batch[key_col].to_pylist()
        c = np.rint(_np_col(batch, val_col) * scale)
        n = np.fromiter((mm[k][0] for k in keys), np.float64, len(keys))
        s = np.fromiter((mm[k][1] for k in keys), np.float64, len(keys))
        ss = np.fromiter((mm[k][2] for k in keys), np.float64, len(keys))
        # mirrored by SQL: mean = (s / n) / scale; var = (ss / n) / scale²
        # − mean·mean; z = (c/scale − mean) / sqrt(var)
        mean = (s / n) / sc
        var = (ss / n) / sc2 - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(var > 0.0, (c / sc - mean) / np.sqrt(var), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                "z": pa.array(round6_arr(z), pa.float64()),
            }
        )

    return ds.select_columns([id_col, key_col, val_col]).map_batches(
        zmap, batch_format="pyarrow"
    )


def pivot_counts(
    ds,
    *,
    key_col: str,
    pivot_col: str,
    categories: list[str],
    num_buckets: int = 64,
):
    """Wide (pivoted) per-key counts: one row per key, one int64 column
    per category of ``pivot_col`` — SQL's conditional-aggregation
    ``count(CASE WHEN pivot = c THEN 1 END)`` as a distributed operator.

    ``categories`` is the explicit pivot domain (the output SCHEMA must
    not depend on which blocks a worker saw); values outside it are
    ignored.  Plan: per-block partial counts shrink the exchange to
    O(keys x |categories|) narrow rows, a hash-bucketed
    ``groupby(bucket).map_groups`` widens each key vectorized (lexsort +
    reduceat — no per-row Python).  Counts are integers, so results are
    bit-identical at any parallelism.
    """
    cat_idx = {c: i for i, c in enumerate(categories)}
    ncat = len(categories)

    def partial(batch: pa.Table) -> pa.Table:
        all_keys = batch[key_col].to_numpy(zero_copy_only=False)
        piv = batch[pivot_col].to_pylist()
        ci = np.fromiter(
            (cat_idx.get(p, -1) for p in piv), np.int64, len(piv)
        )
        keep = ci >= 0
        keys, ci = all_keys[keep], ci[keep]
        # dense-index the keys before composing (keys * ncat would wrap
        # int64 for ids shaped like (pid << 36) | rank)
        uk_all, inv = np.unique(keys, return_inverse=True)
        if len(keys):
            comp = inv * ncat + ci
            un, cnt = np.unique(comp, return_counts=True)
            out_k = uk_all[un // ncat]
            out_c = un % ncat
        else:
            out_k = np.empty(0, np.int64)
            out_c = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        # keys whose rows are ALL outside `categories` still owe an
        # all-zero output row (SQL's GROUP BY emits them); a zero-count
        # sentinel keeps them present without changing any count
        missing = np.setdiff1d(np.unique(all_keys), uk_all)
        out_k = np.concatenate([out_k, missing])
        out_c = np.concatenate([out_c, np.zeros(len(missing), np.int64)])
        cnt = np.concatenate([cnt, np.zeros(len(missing), np.int64)])
        return pa.table(
            {
                "_b": pa.array((out_k % num_buckets).astype(np.int32), pa.int32()),
                key_col: pa.array(out_k, pa.int64()),
                "_c": pa.array(out_c, pa.int64()),
                "_n": pa.array(cnt, pa.int64()),
            }
        )

    def widen(group: pa.Table) -> pa.Table:
        keys = group[key_col].to_numpy(zero_copy_only=False)
        ci = group["_c"].to_numpy(zero_copy_only=False)
        n = group["_n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        wide = np.zeros((len(uk), ncat), np.int64)
        np.add.at(wide, (inv, ci), n)
        cols = {key_col: pa.array(uk, pa.int64())}
        for j, c in enumerate(categories):
            cols[c] = pa.array(wide[:, j], pa.int64())
        return pa.table(cols)

    return (
        ds.select_columns([key_col, pivot_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(widen, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# robust statistics: median absolute deviation
# ---------------------------------------------------------------------------


def grouped_mad(ds, *, key_col: str, val_col: str):
    """Per-group median absolute deviation — the robust-scale statistic
    behind MAD-based outlier flagging (the heavy-tail-safe alternative
    to z-scores in a curation pipeline).

    ``med = round6(median(v))`` then ``mad = round6(median(|v − med|))``
    with both medians the exact interpolated ``quantile_cont`` at 0.5.
    The inner median is 6dp-rounded on BOTH sides BEFORE the deviations
    (the winsorize-bounds discipline), so a last-ulp interpolation
    difference cannot leak into every deviation and flip the outer
    median's 6dp rounding.

    Plan: same shape as ``grouped_quantiles`` — the shuffle moves only
    the two projected columns and each group's values co-locate on one
    worker (see module docstring for the bounded-memory histogram
    alternative when a single group outgrows a worker).

    Output: one row per group: ``(key_col, n, med, mad)``.
    """

    def per_group(group: pa.Table) -> pa.Table:
        v = np.sort(_np_col(group, val_col))
        key = group[key_col][0].as_py()
        med = round6(quantile_cont(v, 0.5))
        dev = np.sort(np.abs(v - med))
        mad = round6(quantile_cont(dev, 0.5))
        return pa.table(
            {
                key_col: pa.array([key], group[key_col].type),
                "n": pa.array([len(v)], pa.int64()),
                "med": pa.array([med], pa.float64()),
                "mad": pa.array([mad], pa.float64()),
            }
        )

    return (
        ds.select_columns([key_col, val_col])
        .groupby(key_col)
        .map_groups(per_group, batch_format="pyarrow")
    )


def mad_outlier_rows(
    ds,
    *,
    key_col: str,
    val_col: str,
    id_col: str,
    k: float = 3.0,
):
    """Robust outlier screen: rows where ``|v − med(group)| > k·mad(group)``
    — the heavy-tail-safe filter a curation pipeline runs before price /
    value aggregation (z-scores blow up when the tail itself drags the
    mean; MAD does not).

    Plan (100 TB honest): per-group ``(med, mad)`` comes from
    ``grouped_mad`` (same quantile law the ``mad_value`` oracle pins);
    that O(groups) table broadcasts into a stateless map filter — the
    corpus itself NEVER shuffles.  The comparison is two mirrored IEEE
    ops (one subtraction, one multiplication) on the 6dp-rounded
    med/mad, so the keep set is parallelism-invariant.

    Output: ``(id_col, key_col, val_col)`` of the outlier rows only.
    """
    stats: dict = {}
    for b in grouped_mad(ds, key_col=key_col, val_col=val_col).iter_batches(
        batch_format="pyarrow"
    ):
        for key, med, mad in zip(
            b[key_col].to_pylist(), b["med"].to_pylist(), b["mad"].to_pylist()
        ):
            stats[key] = (med, mad)

    def flt(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        med = np.array([stats[x][0] for x in keys], np.float64)
        mad = np.array([stats[x][1] for x in keys], np.float64)
        v = _np_col(batch, val_col).astype(np.float64)
        mask = np.abs(v - med) > k * mad
        return batch.select([id_col, key_col, val_col]).filter(
            pa.array(mask)
        )

    return ds.map_batches(flt, batch_format="pyarrow")


def global_quantile_filter(
    counts_ds,
    *,
    id_col: str,
    val_col: str,
    q: float = 0.1,
):
    """Rows strictly above the corpus-wide exact continuous q-quantile
    of an INTEGER-valued column — the "drop the bottom decile" length /
    quality gate of a curation pipeline.

    Plan (100 TB honest): the quantile is computed from an exact VALUE
    histogram — per-block ``np.unique`` partials, one tiny groupby over
    the (bounded) distinct-value domain, then the interpolated rank
    lookup over cumulative counts on the driver (O(distinct values),
    never O(rows)).  The threshold broadcasts into a stateless map
    filter; the rows never shuffle.  The interpolation expression is
    ``quantile_cont``'s exact form, mirrored by the oracle over a
    sorted list, and the threshold is 6dp-rounded before the strict
    ``>`` compare so the keep set is parallelism-invariant.

    Output: ``(id_col, val_col)`` of the kept rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals, cnt = np.unique(_np_col(batch, val_col), return_counts=True)
        return pa.table(
            {
                "v": pa.array(vals, pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        counts_ds.select_columns([val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("c")
    ).to_pandas()
    vals = hist["v"].to_numpy()
    cnts = hist["sum(c)"].to_numpy()
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    pos = q * (n - 1)
    lo_i = int(math.floor(pos))
    hi_i = int(math.ceil(pos))
    frac = pos - lo_i
    lo_v = float(vals[np.searchsorted(cum, lo_i, side="right")])
    hi_v = float(vals[np.searchsorted(cum, hi_i, side="right")])
    thr = round6(lo_v * (1.0 - frac) + hi_v * frac)

    def flt(batch: pa.Table) -> pa.Table:
        v = _np_col(batch, val_col).astype(np.float64)
        return batch.select([id_col, val_col]).filter(pa.array(v > thr))

    return counts_ds.map_batches(flt, batch_format="pyarrow")


def grouped_trend(
    ds,
    *,
    key_col: str,
    ts_col: str,
    val_col: str,
):
    """Per-group OLS trend of value over time — drift detection (a
    rising per-type mean flags inflation/spam; a collapsing one flags a
    broken feed).

    x = integer DAYS since epoch (``µs // 86.4e9`` — day granularity
    keeps x² sums inside exact-integer range), y = exact integer cents.
    ALL five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact
    integers folded per block and summed through ONE tiny groupby, so
    the fit is parallelism-invariant; the final slope/intercept are one
    mirrored float expression over the de-quantized sums (slope in
    dollars/day).  Python-int accumulation on the Ray side matches the
    oracle's HUGEINT sums (driver sums must stay < 2^53 for the exact
    DOUBLE cast — holds to ~10¹² rows at this value range).

    Output: ``(key_col, n, slope, intercept)``; zero-variance-x groups
    emit slope = intercept = 0.0 (CASE-mirrored).
    """

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_pylist()
        t = pc.cast(batch[ts_col], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        x = (t.view("int64") // 86_400_000_000).astype(np.int64)
        y = np.rint(_np_col(batch, val_col) * 100.0).astype(np.int64)
        acc: dict = {}
        for key, xi, yi in zip(k, x.tolist(), y.tolist()):
            e = acc.setdefault(key, [0, 0, 0, 0, 0])
            e[0] += 1
            e[1] += xi
            e[2] += yi
            e[3] += xi * yi
            e[4] += xi * xi
        keys = list(acc.keys())
        return pa.table(
            {
                key_col: pa.array(keys, pa.string()),
                "n": pa.array([acc[k][0] for k in keys], pa.int64()),
                "sx": pa.array([acc[k][1] for k in keys], pa.int64()),
                "sy": pa.array([acc[k][2] for k in keys], pa.int64()),
                "sxy": pa.array([acc[k][3] for k in keys], pa.int64()),
                "sxx": pa.array([acc[k][4] for k in keys], pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        out_k, out_n, out_s, out_i = [], [], [], []
        for key, n, sx, sy, sxy, sxx in zip(
            batch[key_col].to_pylist(),
            batch["sum(n)"].to_pylist(),
            batch["sum(sx)"].to_pylist(),
            batch["sum(sy)"].to_pylist(),
            batch["sum(sxy)"].to_pylist(),
            batch["sum(sxx)"].to_pylist(),
        ):
            nf, sxf, syf = float(n), float(sx), float(sy)
            sxyf, sxxf = float(sxy), float(sxx)
            den = nf * sxxf - sxf * sxf
            if den > 0.0:
                slope_cents = (nf * sxyf - sxf * syf) / den
                slope = round6(slope_cents / 100.0)
                intercept = round6(
                    ((syf - slope_cents * sxf) / nf) / 100.0
                )
            else:
                slope = intercept = 0.0
            out_k.append(key)
            out_n.append(int(n))
            out_s.append(slope)
            out_i.append(intercept)
        return pa.table(
            {
                key_col: pa.array(out_k, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "slope": pa.array(out_s, pa.float64()),
                "intercept": pa.array(out_i, pa.float64()),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["n", "sx", "sy", "sxy", "sxx"])
        .map_batches(finish, batch_format="pyarrow")
    )


def grouped_quantile_filter(
    ds,
    *,
    key_col: str,
    id_col: str,
    val_col: str,
    q: float = 0.1,
):
    """Rows strictly above their OWN group's exact continuous
    q-quantile — the per-language/per-source adaptive quality gate (a
    global threshold over-prunes low-resource slices; a per-group one
    keeps each slice's top (1−q)).

    Plan: per-group thresholds from the exact VALUE histogram per group
    (per-block ``np.unique`` partials over (group, value) — O(groups ×
    distinct values) exchange, never O(rows)), interpolated with
    ``quantile_cont``'s expression over cumulative counts, 6dp-rounded,
    then broadcast into a stateless map filter.  The corpus never
    shuffles.

    Output: ``(id_col, key_col, val_col)`` of the kept rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: batch[key_col],
                "v": pc.cast(batch[val_col], pa.int64()),
            }
        )
        g = t.group_by([key_col, "v"]).aggregate([([], "count_all")])
        return pa.table(
            {
                key_col: g[key_col],
                "v": g["v"],
                "c": g["count_all"],
            }
        )

    hist = (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "v"])
        .sum("c")
    ).to_pandas()  # O(groups x distinct values)
    thresholds: dict = {}
    for key, sub in hist.groupby(key_col):
        sub = sub.sort_values("v")
        vals = sub["v"].to_numpy()
        cnts = sub["sum(c)"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        pos = q * (n - 1)
        lo_i = int(math.floor(pos))
        hi_i = int(math.ceil(pos))
        frac = pos - lo_i
        lo_v = float(vals[np.searchsorted(cum, lo_i, side="right")])
        hi_v = float(vals[np.searchsorted(cum, hi_i, side="right")])
        thresholds[key] = round6(lo_v * (1.0 - frac) + hi_v * frac)

    def flt(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        thr = np.array([thresholds[k] for k in keys], np.float64)
        v = _np_col(batch, val_col).astype(np.float64)
        return batch.select([id_col, key_col, val_col]).filter(
            pa.array(v > thr)
        )

    return ds.map_batches(flt, batch_format="pyarrow")


def gini_coefficient(ds, *, val_col: str, id_col: str, num_bins: int = 4096):
    """Exact Gini coefficient of a nonnegative integer value column —
    the inequality summary (revenue concentration, token-budget skew)
    curation dashboards report.

    Needs the rank-weighted sum Σ rank·x over the GLOBAL (value, id)
    order; computed with the global_value_rank bucket discipline: value-
    range buckets, driver prefix-sums the O(bins) counts, each bucket
    sorts locally and reduces to three partials (n, Σx, Σ(rank+1)·x).
    The rank-weighted partial can exceed int64 (rank ~ n), so buckets
    emit it as a decimal STRING and the driver sums arbitrary-precision
    Python ints — exact at any scale, O(bins) driver rows.  The final
    float expression G = 2·Σi·x / (n·Σx) − (n+1)/n is mirrored by the
    SQL oracle term for term.

    Output: one row ``(n, gini)``.
    """
    import ray

    lo = ds.min(val_col)
    hi = ds.max(val_col)
    if lo is None:
        raise ValueError("empty dataset")
    width = (float(hi) - float(lo)) / num_bins or 1.0

    def narrow(batch: pa.Table) -> pa.Table:
        v = _np_col(batch, val_col).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, num_bins - 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "_v": pa.array(
                    _np_col(batch, val_col).astype(np.int64), pa.int64()
                ),
                "_bin": pa.array(b, pa.int64()),
            }
        )

    keyed = (
        ds.select_columns([id_col, val_col])
        .map_batches(narrow, batch_format="pyarrow")
        .materialize()
    )
    counts = keyed.groupby("_bin").count().to_pandas().sort_values("_bin")
    bases = dict(
        zip(
            counts["_bin"].to_numpy(),
            np.concatenate(
                ([0], np.cumsum(counts["count()"].to_numpy())[:-1])
            ),
        )
    )
    bases_ref = ray.put(bases)

    def partials(group: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)[int(group["_bin"][0].as_py())]
        v = group["_v"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v))
        v = v[order]
        rank1 = base + np.arange(1, len(v) + 1, dtype=np.int64)
        si = sum(int(a) * int(b) for a, b in zip(rank1, v))  # exact
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "sx": pa.array([int(v.sum())], pa.int64()),
                "si_dec": pa.array([str(si)], pa.string()),
            }
        )

    parts = (
        keyed.groupby("_bin")
        .map_groups(partials, batch_format="pyarrow")
    ).to_pandas()
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    si = sum(int(s) for s in parts["si_dec"])
    if n == 0 or sx == 0:
        g = 0.0
    else:
        g = 2.0 * float(si) / (float(n) * float(sx)) - float(n + 1) / float(n)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "gini": pa.array([round6(g)], pa.float64()),
        }
    )


def grouped_fano(ds, *, key_col: str, bucket_col: str):
    """Per-key Fano factor (index of dispersion, var_pop/mean) of the
    per-bucket event counts — the burstiness screen over OBSERVED
    buckets (hours with ≥1 event).  Integer sufficient statistics
    (n buckets, Σc, Σc²) are the only exchange; the float finish is
    mirrored by the SQL oracle.

    Output: ``(key_col, n_buckets, fano)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select([key_col, bucket_col]).group_by(
            [key_col, bucket_col]
        ).aggregate([([], "count_all")])
        return agg.rename_columns([key_col, bucket_col, "_c"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, bucket_col])
        .sum("_c")
    )

    def stats_rows(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch["sum(_c)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        tbl = pa.table(
            {
                key_col: batch[key_col],
                "_n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "_sc": pa.array(c, pa.int64()),
                "_sc2": pa.array(c * c, pa.int64()),
            }
        )
        agg = tbl.group_by([key_col]).aggregate(
            [("_n", "sum"), ("_sc", "sum"), ("_sc2", "sum")]
        )
        return agg.rename_columns([key_col, "_n", "_sc", "_sc2"])

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(_n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sc = batch["sum(_sc)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sc2 = batch["sum(_sc2)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        mean = sc / n
        var = sc2 / n - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            fano = np.where(mean > 0, var / mean, 0.0)
        return pa.table(
            {
                key_col: batch[key_col],
                "n_buckets": pa.array(n.astype(np.int64), pa.int64()),
                "fano": pa.array(round6_arr(fano), pa.float64()),
            }
        )

    return (
        cells.map_batches(stats_rows, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["_n", "_sc", "_sc2"])
        .map_batches(finalize, batch_format="pyarrow")
    )
