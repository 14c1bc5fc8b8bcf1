"""Poisson bootstrap over a distributed metric (Chamandy et al., "
"Estimating Uncertainty for Massive Data Streams", Google 2012).

The classic bootstrap (sample n rows with replacement, R times) needs
global coordination; the Poisson bootstrap replaces each resample's
multinomial row counts with independent Poisson(1) weights, computable
PER ROW from a hash — no RNG state, no shuffle of the data, any worker
decides any row's R weights alone.  Each block emits R partial
(sum_w, sum_wx) pairs, the exchange is O(R x blocks), and the resample
means come out of one tiny groupby.

Determinism / SQL-replicability (oracle ``poisson_bootstrap_means``):

* u_{i,r} = a 32-bit lane of md5(row_id ":" r//2) — the repo's
  ``md5_number_upper`` convention (first 8 digest bytes little-endian;
  two lanes per hash) — divided by 2^32 (exact: power-of-two divisor);
* w_{i,r} = #{k : u >= cdf_k} with the Poisson(1) CDF thresholds
  embedded as identical double literals on both sides;
* the metric's sufficient statistics are INTEGERS (value scaled to a
  fixed point), so cross-block addition order cannot change a bit and
  the single float division at the end mirrors the SQL expression.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

# Poisson(1) CDF thresholds c_k = e^-1 * sum_{j<=k} 1/j!, k = 0..11:
# weight = #{k : u >= c_k} (max 12).  repr() round-trips doubles, so the
# SQL literals built from these are bit-identical.
POISSON1_CDF: list[float] = []
_acc = 0.0
_fact = 1.0
for _k in range(12):
    if _k > 0:
        _fact *= _k
    _acc += math.exp(-1.0) / _fact
    POISSON1_CDF.append(_acc)
_CDF_ARR = np.array(POISSON1_CDF)


def poisson_weights(row_ids: np.ndarray, n_resamples: int) -> np.ndarray:
    """(n_rows, R) uint8 Poisson(1) weights; row_ids are int64 identity
    keys.  Two 32-bit lanes per md5 — R/2 hashes per row."""
    n = len(row_ids)
    u = np.empty((n, n_resamples), np.float64)
    n_hashes = (n_resamples + 1) // 2
    for i, rid in enumerate(row_ids.tolist()):
        for b in range(n_hashes):
            h = hashlib.md5(f"{rid}:{b}".encode()).digest()[:8]
            v = int.from_bytes(h, "little")
            u[i, 2 * b] = (v % 4294967296) / 4294967296.0
            if 2 * b + 1 < n_resamples:
                u[i, 2 * b + 1] = (v // 4294967296) / 4294967296.0
    # weight = count of thresholds <= u, vectorized over the matrix
    return np.searchsorted(_CDF_ARR, u.ravel(), side="right").reshape(
        n, n_resamples
    )


def poisson_bootstrap_means(
    ds,
    *,
    id_expr,
    value_expr,
    n_resamples: int = 64,
    value_scale: int = 10000,
):
    """R resample means of a row metric under the Poisson bootstrap.

    ``id_expr(batch) -> int64 ndarray`` gives each row's stable identity
    key; ``value_expr(batch) -> int64 ndarray`` gives the metric value
    pre-scaled to a fixed-point integer (exactness across any block
    arrangement).  Output: ``(r, mean_value)`` — R rows, mean_value =
    (sum_wx / value_scale) / sum_w exactly as the SQL oracle writes it.
    """

    def partial(batch: pa.Table) -> pa.Table:
        rid = id_expr(batch)
        x = value_expr(batch)
        w = poisson_weights(rid, n_resamples)
        sw = w.sum(axis=0).astype(np.int64)
        swx = (w * x[:, None]).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "r": pa.array(np.arange(n_resamples, dtype=np.int64)),
                "_sw": pa.array(sw),
                "_swx": pa.array(swx),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        sw = batch["sum(_sw)"].to_numpy(zero_copy_only=False).astype(np.float64)
        swx = batch["sum(_swx)"].to_numpy(zero_copy_only=False)
        mean = (swx / float(value_scale)) / sw
        order = np.argsort(r)
        return pa.table(
            {
                "r": pa.array(r[order], pa.int64()),
                "mean_value": pa.array(mean[order], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("r")
        .sum(["_sw", "_swx"])
        .map_batches(finalize, batch_format="pyarrow")
    )


def cdf_sql_weight_expr(u_expr: str) -> str:
    """The SQL weight expression matching ``poisson_weights`` for a
    uniform expression ``u_expr``: sum of 12 threshold comparisons with
    the same double literals."""
    terms = [
        f"(CASE WHEN {u_expr} >= {c!r} THEN 1 ELSE 0 END)"
        for c in POISSON1_CDF
    ]
    return " + ".join(terms)
