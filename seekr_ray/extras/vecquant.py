"""Symmetric int8 embedding quantization (vector compression).

The 4x storage / memory-bandwidth saver for ANN serving: each vector is
mapped to ``code_i = round(x_i / scale)`` with per-vector
``scale = amax / 127`` (amax = max |x_i|), the standard absmax scheme.
Output is FLATTENED one row per (vector, dimension) —
``(vec_id, i, code int8, scale double)`` — so the oracle hash-compares
scalars, and a downstream consumer regroups by vec_id (list
reconstruction is a local, shuffle-free regroup when blocks are
vec_id-contiguous, which read order preserves).

Shape: a single zero-copy ``map_batches`` pass — list offsets + values
buffer come straight from Arrow, amax via ``np.maximum.reduceat``, no
per-row Python.  No shuffle, no state; the operator is embarrassingly
parallel at any scale.

Exactness: float32 -> float64 widening is exact on both sides; amax is
a max (no arithmetic); scale and x/scale are single IEEE divisions
mirrored operation-for-operation in the oracle SQL; rounding is
half-away-from-zero (sign * floor(|q| + 0.5)) == DuckDB ROUND.  x <=
amax means |x/scale| <= 127 * (1 + 2ulp) < 127.5, so no clamp is
needed on either side.  All-zero vectors (amax == 0) emit code 0 and
scale 0.0 (CASE-mirrored).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def int8_quantize(emb_ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Flattened absmax-int8 quantization of a ``list<float>`` column."""

    def quantize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # ListArray internals: offsets + flat values, no Python lists.
        # A block slice keeps the full values buffer with shifted
        # offsets — rebase both so flat covers exactly this block's
        # elements.
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        flat = flat[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        nrows = len(lens)
        if nrows == 0 or len(flat) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                    "code": pa.array([], pa.int8()),
                    "scale": pa.array([], pa.float64()),
                }
            )
        # per-vector amax; reduceat needs non-empty segments — empty
        # vectors contribute no output rows and are masked out
        nonempty = lens > 0
        amax = np.zeros(nrows, np.float64)
        amax[nonempty] = np.maximum.reduceat(
            np.abs(flat), offsets[:-1][nonempty]
        )
        scale = amax / 127.0
        rep_scale = np.repeat(scale, lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = flat / rep_scale
        q[rep_scale == 0.0] = 0.0
        code = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int8)
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], lens
        )
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, lens), pa.int64()),
                "i": pa.array(idx, pa.int64()),
                "code": pa.array(code, pa.int8()),
                "scale": pa.array(rep_scale, pa.float64()),
            }
        )

    return emb_ds.map_batches(quantize, batch_format="pyarrow")
