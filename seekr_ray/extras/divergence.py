"""Per-language unigram KL divergence vs the corpus-wide distribution.

The domain-shift / mixture-balance diagnostic of training-data
curation: KL(lang || corpus) near 0 means a language slice is
lexically indistinguishable from the blend; large values flag slices
that dominate or starve the shared vocabulary (the same statistic DSIR
builds its importance weights from — see extras/dsir.py).

Scale shape (100 TB honest):
- stage 1: per-block partial (lang, token, c) counts — the classic
  combiner; the exchange is O(distinct (lang, token) per block), never
  O(tokens).
- ONE crc32(token)-bucketed groupby reduces to exact global (lang,
  token, c_l) rows AND attaches the per-token corpus total c_g in the
  same pass (all rows of a token share a bucket).
- the reduced table is O(V x langs); it is materialized ONCE (bounded,
  two small consumers) to read the per-lang totals and then stream the
  contribution sum — no full-corpus second pass.

Oracle parity: each term's contribution ``p_l * log2(p_l / p_g)`` is
floor-quantized at 1e-6 and summed as an exact integer (the
CENTROID_SCALE discipline of extras/textstats.token_entropy), so the
result is invariant to summation order and replicated term-for-term by
the DuckDB oracle.  p_l = c_l/N_l and p_g = c_g/N are single IEEE
divisions of exact integers, mirrored operation-for-operation.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .textstats import ENTROPY_SCALE, simple_tokens


def lang_unigram_kl(
    docs_ds,
    *,
    num_buckets: int = 64,
    text_col: str = "text",
    lang_col: str = "lang",
):
    """(lang, n_tokens, kl_bits) per language.

    ``kl_bits = Σ_t floor(p_l(t)·log2(p_l(t)/p_g(t))·1e6) / 1e6`` over
    the lang's tokens, with p from the filtered ``simple_tokens``
    stream (the same token law every textstats oracle uses).
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        acc: dict[tuple[str, str], int] = {}
        for lang, text in zip(
            batch[lang_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for t in simple_tokens(text or ""):
                key = (lang, t)
                acc[key] = acc.get(key, 0) + 1
        langs, toks, counts, buckets = [], [], [], []
        for (lang, t), c in acc.items():
            langs.append(lang)
            toks.append(t)
            counts.append(c)
            buckets.append(zlib.crc32(t.encode()) % num_buckets)
        return pa.table(
            {
                "_b": pa.array(buckets, pa.int32()),
                "lang": pa.array(langs, pa.string()),
                "t": pa.array(toks, pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        # exact (lang, token) counts, then the per-token corpus total
        # broadcast back onto the rows — token-complete within a bucket
        t = (
            group.drop_columns(["_b"])
            .group_by(["lang", "t"])
            .aggregate([("c", "sum")])
        )
        codes = pa.compute.dictionary_encode(t["t"].combine_chunks()).indices
        c_l = t["c_sum"].to_numpy(zero_copy_only=False)
        cg = np.zeros(int(pa.compute.max(codes).as_py()) + 1 if len(t) else 0,
                      np.int64)
        idx = codes.to_numpy(zero_copy_only=False)
        np.add.at(cg, idx, c_l)
        return pa.table(
            {
                "lang": t["lang"],
                "c_l": pa.array(c_l, pa.int64()),
                "c_g": pa.array(cg[idx], pa.int64()),
            }
        )

    reduced = (
        docs_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    ).materialize()  # bounded O(V x langs); two consumers below

    totals = {}
    for b in (
        reduced.groupby("lang").sum("c_l").iter_batches(batch_format="pyarrow")
    ):
        for lang, n in zip(b["lang"].to_pylist(), b["sum(c_l)"].to_pylist()):
            totals[lang] = int(n)
    n_corpus = float(sum(totals.values()))

    def contrib(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        nl = np.array([totals[v] for v in langs], np.float64)
        c_l = batch["c_l"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_g = batch["c_g"].to_numpy(zero_copy_only=False).astype(np.float64)
        p_l = c_l / nl
        p_g = c_g / n_corpus
        q = np.floor(p_l * np.log2(p_l / p_g) * ENTROPY_SCALE).astype(np.int64)
        return pa.table(
            {"lang": batch["lang"], "q": pa.array(q, pa.int64())}
        )

    def finish(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        return pa.table(
            {
                "lang": batch["lang"],
                "n_tokens": pa.array(
                    [totals[v] for v in langs], pa.int64()
                ),
                "kl_bits": pa.array(
                    [
                        float(s) / ENTROPY_SCALE
                        for s in batch["sum(q)"].to_pylist()
                    ],
                    pa.float64(),
                ),
            }
        )

    return (
        reduced.map_batches(contrib, batch_format="pyarrow")
        .groupby("lang")
        .sum("q")
        .map_batches(finish, batch_format="pyarrow")
    )
