"""Deterministic dataset splitting for training pipelines.

``hash_split`` assigns every row to 'train'/'test' by hashing its id —
stable across runs, machines and partitionings (no RNG state, no
coordination), which is the property a 100-TB split needs: any worker
can compute any row's split independently.  The hash is md5's first 8
bytes little-endian — exactly DuckDB's ``md5_number_upper()`` — so the
assignment is SQL-replicable bit-for-bit (oracle entry ``hash_split``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _bucket100(ids: list, salt: str) -> np.ndarray:
    out = np.empty(len(ids), np.int64)
    for i, v in enumerate(ids):
        h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
        out[i] = int.from_bytes(h, "little") % 100
    return out


def hash_split(ds, id_col: str = "doc_id", train_pct: int = 80, salt: str = ""):
    """Label each row 'train' (hash bucket < ``train_pct``) or 'test'.

    Output: ``(id_col, split)``.  Pure per-row map — no shuffle, no
    state; composes with any downstream filter
    (``ds.filter(split == 'train')``) without re-reading the input.
    """

    def label(batch: pa.Table) -> pa.Table:
        b = _bucket100(batch[id_col].to_pylist(), salt)
        split = np.where(b < train_pct, "train", "test")
        return pa.table(
            {
                id_col: batch[id_col],
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def stratified_sample(
    ds,
    *,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    salt: str = "",
):
    """Deterministic per-group downsampling: a row of group g survives
    iff ``md5(salt + str(id)) % 1000 < rates[g] * 1000`` (groups absent
    from ``rates`` are dropped).  Same stateless-hash property as
    ``hash_split`` — any worker decides any row alone, no RNG state, no
    shuffle; the class-rebalancing primitive of a training pipeline.

    Output: the surviving rows' ``(id_col, group_col)``.
    """
    import pyarrow.compute as pc

    mille = {g: int(round(r * 1000)) for g, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        groups = batch[group_col].to_pylist()
        sel = []
        for i, g in enumerate(groups):
            lim = mille.get(g)
            sel.append(lim is not None and _mille(ids[i], salt) < lim)
        return pa.table(
            {
                id_col: pc.filter(batch[id_col], pa.array(sel)),
                group_col: pc.filter(batch[group_col], pa.array(sel)),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def _mod_hash(v, salt: str, mod: int) -> int:
    """md5(salt + str(v)) first 8 bytes little-endian, mod ``mod`` —
    DuckDB ``md5_number_upper(salt || v::VARCHAR) % mod``.  The single
    home of this convention in split.py (stats._md5_le64 is the
    vectorized array form); change them together or the SQL oracles
    silently diverge."""
    h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
    return int.from_bytes(h, "little") % mod


def _mille(v, salt: str) -> int:
    return _mod_hash(v, salt, 1000)


def mixture_sample(
    docs_ds,
    *,
    token_budget: int,
    weights_permille: dict[str, int],
    id_col: str = "doc_id",
    group_col: str = "lang",
    text_col: str = "text",
    salt: str = "",
):
    """Data-mixture sampling: downsample each source so the output
    approaches ``token_budget`` tokens mixed per ``weights_permille``
    (integer per-mille target shares) — the mixture-weighting step every
    LLM training pipeline runs over its source corpora.

    Two-phase plan:

    1. per-source token totals ``T_g`` via per-block partial sums
       (O(sources) exchange — the ``token_count_by_lang`` pattern);
    2. the driver turns targets into integer keep thresholds
          ``thresh_g = min(10^6, (budget · w_g · 10^6) // (1000 · T_g))``
       (pure BIGINT arithmetic — no float rates, so the decision
       replicates bit-for-bit in SQL), broadcasts the tiny map, and a
       stateless hash filter keeps rows with
       ``md5(salt + id) % 10^6 < thresh_g``.

    A source short of its target keeps everything (thresh capped at
    10^6); the expected kept tokens per surviving source g is
    ``T_g · thresh_g / 10^6 ≈ budget · w_g``.  No shuffle of the corpus,
    no RNG state; any worker decides any row alone.

    Output: ``(id_col, group_col, n_tokens)`` of surviving rows.
    """
    import ray

    from .textstats import simple_tokens

    def totals_partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for g, t in zip(
            batch[group_col].to_pylist(), batch[text_col].to_pylist()
        ):
            acc[g] = acc.get(g, 0) + len(simple_tokens(t or ""))
        return pa.table(
            {
                group_col: pa.array(list(acc.keys()), pa.string()),
                "t": pa.array(list(acc.values()), pa.int64()),
            }
        )

    totals = (
        docs_ds.select_columns([group_col, text_col])
        .map_batches(totals_partial, batch_format="pyarrow")
        .groupby(group_col)
        .sum("t")
        .to_pandas()
    )
    thresh: dict[str, int] = {}
    for g, t_g in zip(totals[group_col], totals["sum(t)"]):
        w = weights_permille.get(g)
        if w is None or t_g == 0:
            continue
        thresh[g] = min(
            1_000_000, (token_budget * w * 1_000_000) // (1000 * int(t_g))
        )
    thresh_ref = ray.put(thresh)

    def keep(batch: pa.Table) -> pa.Table:
        th = ray.get(thresh_ref)
        ids = batch[id_col].to_pylist()
        groups = batch[group_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_i, out_g, out_n = [], [], []
        for i, g in enumerate(groups):
            lim = th.get(g)
            if lim is None:
                continue
            if _mod_hash(ids[i], salt, 1_000_000) < lim:
                out_i.append(ids[i])
                out_g.append(g)
                out_n.append(len(simple_tokens(texts[i] or "")))
        return pa.table(
            {
                id_col: pa.array(out_i, pa.int64()),
                group_col: pa.array(out_g, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return docs_ds.map_batches(keep, batch_format="pyarrow")
