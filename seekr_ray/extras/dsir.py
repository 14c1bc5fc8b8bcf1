"""DSIR-style importance weights for data selection.

Data Selection with Importance Resampling (Xie et al. 2023, public
arXiv 2302.03169): score each raw document by the log-likelihood ratio
of a TARGET distribution vs the RAW distribution under a hashed-n-gram
bag-of-words model, then resample by weight.  This implements the
scoring operator with hashed UNIGRAM features:

    bucket(tok) = md5_le64(tok) % n_buckets
    p_T(b) = (c_T(b) + 1) / (N_T + B)      (add-one smoothing)
    p_R(b) = (c_R(b) + 1) / (N_R + B)
    score(doc) = sum_tok log10(p_T(bucket) / p_R(bucket))

Two streaming passes, no all-to-all over documents:

1. histogram — each block emits its nonzero (bucket, c_all, c_tgt)
   partial counts; ONE groupby over <= n_buckets int keys reduces them
   (exchange is O(blocks * B), never O(tokens)).
2. score — the <= B-row log-ratio table broadcasts via ``ray.put`` and
   every block scores its docs locally.

Per-bucket log-ratios are quantized ONCE to integer micro-units
(ROUND(lr*1e6), half away from zero) so the per-doc reduction is an
exact integer sum — order-free and bit-stable against the DuckDB
oracle (the bigram_lm discipline).  Output:
``(doc_id, n_tokens, dsir_score)`` with score = ROUND(sum/1e6, 6);
token-less docs score 0.0.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from .textstats import round6, simple_tokens

# token -> bucket memo, per worker process (md5 is the stable hash —
# Python's hash() is per-process salted; matches DuckDB md5_number_upper)
_BUCKET_MEMO: dict[int, dict[str, int]] = {}


def _bucket_of(tok: str, n_buckets: int, memo: dict[str, int]) -> int:
    b = memo.get(tok)
    if b is None:
        b = (
            int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            % n_buckets
        )
        memo[tok] = b
    return b


def dsir_weights(
    docs_ds,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1024,
    text_col: str = "text",
):
    """Per-doc DSIR importance score against the ``target_col ==
    target_value`` subset of the same corpus."""
    import ray
    import ray.data as rd  # noqa: F401

    memo = _BUCKET_MEMO.setdefault(n_buckets, {})

    def block_hist(batch: pa.Table) -> pa.Table:
        c_all = np.zeros(n_buckets, np.int64)
        c_tgt = np.zeros(n_buckets, np.int64)
        is_tgt = [v == target_value for v in batch[target_col].to_pylist()]
        for text, tgt in zip(batch[text_col].to_pylist(), is_tgt):
            for tok, c in Counter(simple_tokens(text or "")).items():
                b = _bucket_of(tok, n_buckets, memo)
                c_all[b] += c
                if tgt:
                    c_tgt[b] += c
        nz = np.flatnonzero(c_all)
        return pa.table(
            {
                "bkt": pa.array(nz, pa.int64()),
                "c_all": pa.array(c_all[nz], pa.int64()),
                "c_tgt": pa.array(c_tgt[nz], pa.int64()),
            }
        )

    hist = (
        docs_ds.map_batches(block_hist, batch_format="pyarrow")
        .groupby("bkt")
        .sum(["c_all", "c_tgt"])
        .to_pandas()
    )  # <= n_buckets rows by construction — bounded driver collect
    c_all = np.zeros(n_buckets, np.int64)
    c_tgt = np.zeros(n_buckets, np.int64)
    c_all[hist["bkt"].to_numpy()] = hist["sum(c_all)"].to_numpy()
    c_tgt[hist["bkt"].to_numpy()] = hist["sum(c_tgt)"].to_numpy()
    n_all = int(c_all.sum())
    n_tgt = int(c_tgt.sum())
    lr = np.log10(
        ((c_tgt + 1.0) / (n_tgt + n_buckets))
        / ((c_all + 1.0) / (n_all + n_buckets))
    )
    m = lr * 1e6
    micro = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
    micro_ref = ray.put(micro)

    def score(batch: pa.Table) -> pa.Table:
        mic = ray.get(micro_ref)
        out_n, out_s = [], []
        for text in batch[text_col].to_pylist():
            toks = simple_tokens(text or "")
            out_n.append(len(toks))
            s = 0
            for tok, c in Counter(toks).items():
                s += c * int(mic[_bucket_of(tok, n_buckets, memo)])
            out_s.append(round6(s / 1e6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(out_n, pa.int64()),
                "dsir_score": pa.array(out_s, pa.float64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")
