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


def _mille(v, salt: str) -> int:
    h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
    return int.from_bytes(h, "little") % 1000
