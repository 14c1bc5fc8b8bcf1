"""Zipf's-law fit over the corpus unigram distribution: OLS slope of
ln(frequency) on ln(rank) — the classic corpus-health statistic (natural
text sits near −1; template/boilerplate corpora flatten, OCR noise
steepens the tail).

Scale shape (100 TB honest):
- token counts: per-block combiner → ONE token-bucketed sum (O(V)).
- rank assignment needs NO global sort: ranks order by (count DESC,
  token ASC), and every regression term depends only on (rank, count) —
  inside one count-group the ranks are the consecutive range
  [base+1, base+m] regardless of which token takes which rank.  So the
  O(distinct counts) histogram (tiny — counts are heavy-tailed) fixes
  the bases on the driver, and the per-count contribution sums expand
  VECTORIZED inside workers over rank ranges, never materializing
  per-token rank rows.
- every regression term (ln r, ln c, their product/squares) is
  floor-quantized at 1e-6 and summed as exact integers (the
  token_entropy discipline), so the fit is invariant to summation
  order and replicated term-for-term by the SQL oracle's
  row_number() form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bucket_agg import bucketed_group_agg
from .textstats import round6, simple_tokens

ZIPF_SCALE = 1_000_000


def zipf_fit(docs_ds, *, text_col: str = "text", num_buckets: int = 64):
    """One row: ``(n_terms, slope, intercept)`` of the OLS fit
    ``ln(c) ≈ slope·ln(rank) + intercept`` over all distinct tokens,
    rank 1-based by (count DESC, token ASC)."""

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for text in batch[text_col].to_pylist():
            for t in simple_tokens(text or ""):
                acc[t] = acc.get(t, 0) + 1
        return pa.table(
            {
                "t": pa.array(list(acc.keys()), pa.string()),
                "n": pa.array(list(acc.values()), pa.int64()),
            }
        )

    counts = bucketed_group_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        "t",
        [("n", "sum")],
        num_buckets=num_buckets,
    )

    def to_hist(batch: pa.Table) -> pa.Table:
        c, m = np.unique(
            batch["sum(n)"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"c": pa.array(c, pa.int64()), "m": pa.array(m, pa.int64())}
        )

    hist = (
        counts.map_batches(to_hist, batch_format="pyarrow")
        .groupby("c")
        .sum("m")
    ).to_pandas()  # O(distinct count values) — tiny (heavy-tailed)
    if hist.empty:
        raise ValueError("empty corpus")
    hist = hist.sort_values("c", ascending=False)
    cs = hist["c"].to_numpy()
    ms = hist["sum(m)"].to_numpy()
    bases = np.concatenate(([0], np.cumsum(ms)[:-1]))
    v = int(ms.sum())

    import ray.data as rd

    rows = pa.table(
        {
            "c": pa.array(cs, pa.int64()),
            "m": pa.array(ms, pa.int64()),
            "base": pa.array(bases, pa.int64()),
        }
    )

    def contrib(batch: pa.Table) -> pa.Table:
        sx = sy = sxy = sxx = 0
        for c, m, base in zip(
            batch["c"].to_pylist(),
            batch["m"].to_pylist(),
            batch["base"].to_pylist(),
        ):
            r = np.arange(base + 1, base + m + 1, dtype=np.float64)
            lr = np.log(r)
            lc = float(np.log(float(c)))
            sx += int(np.floor(lr * ZIPF_SCALE).astype(np.int64).sum())
            sy += int(np.floor(np.full(m, lc) * ZIPF_SCALE).astype(np.int64).sum())
            sxy += int(np.floor(lr * lc * ZIPF_SCALE).astype(np.int64).sum())
            sxx += int(np.floor(lr * lr * ZIPF_SCALE).astype(np.int64).sum())
        return pa.table(
            {
                "sx": pa.array([sx], pa.int64()),
                "sy": pa.array([sy], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
                "sxx": pa.array([sxx], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        rd.from_arrow(rows)
        .repartition(max(1, min(len(cs), 16)))
        .map_batches(contrib, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    import pyarrow.compute as pc

    sx = float(int(pc.sum(parts["sx"]).as_py()) / ZIPF_SCALE)
    sy = float(int(pc.sum(parts["sy"]).as_py()) / ZIPF_SCALE)
    sxy = float(int(pc.sum(parts["sxy"]).as_py()) / ZIPF_SCALE)
    sxx = float(int(pc.sum(parts["sxx"]).as_py()) / ZIPF_SCALE)
    vf = float(v)
    if v < 2:
        raise ValueError("zipf_fit needs >= 2 distinct tokens")
    slope_raw = (vf * sxy - sx * sy) / (vf * sxx - sx * sx)
    intercept_raw = (sy - slope_raw * sx) / vf
    return pa.table(
        {
            "n_terms": pa.array([v], pa.int64()),
            "slope": pa.array([round6(slope_raw)], pa.float64()),
            "intercept": pa.array([round6(intercept_raw)], pa.float64()),
        }
    )
