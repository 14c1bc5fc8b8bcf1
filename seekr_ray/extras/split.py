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


def global_shuffle(ds, id_col: str = "doc_id", salt: str = "", num_buckets: int = 256):
    """Deterministic epoch shuffle: every row gets its exact global rank
    in the md5-keyed permutation — the training-data "shuffle the corpus
    per epoch" primitive, with no RNG state and no full-corpus sort on
    any single worker.

    Exact three-phase rank (packing.py's prefix-sum discipline, but over
    the HASH order instead of doc_id order):

    1. **narrow pass** — project each row to ``(id, h, bucket)`` where
       ``h = md5(salt + str(id))`` first-8-bytes little-endian (DuckDB
       ``md5_number_upper``) and ``bucket = h >> (64 - log2(buckets))``
       — buckets are CONTIGUOUS key ranges, near-uniform because md5 is;
    2. **bucket counts** — ``groupby(bucket).count()`` (O(buckets)
       rows); the driver prefix-sums the sorted counts and broadcasts
       the per-bucket base ranks;
    3. **local rank** — ``groupby(bucket).map_groups`` sorts the
       bucket's rows by ``(h, id)`` and emits ``base + local_index``.

    The exchange carries ``(id, h)`` only; the driver holds O(buckets).
    Changing ``salt`` yields an independent permutation per epoch.
    Output: ``(id_col, shuffle_rank)``, one row per input row.
    """
    import ray

    from .stats import _md5_le64

    bits = int(num_buckets).bit_length() - 1
    if num_buckets < 2 or (1 << bits) != num_buckets:
        # bits == 0 would make the uint64 shift below 64 — a C-level-
        # undefined shift count whose result is platform-dependent
        raise ValueError("num_buckets must be a power of two >= 2")
    shift = np.uint64(64 - bits)

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = _md5_le64(ids, salt)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "_h": pa.array(h, pa.uint64()),
                "_bkt": pa.array((h >> shift).astype(np.int64), pa.int64()),
            }
        )

    keyed = (
        ds.select_columns([id_col])
        .map_batches(narrow, batch_format="pyarrow")
        .materialize()  # feeds two consumers: counts + the local rank
    )
    counts = keyed.groupby("_bkt").count().to_pandas().sort_values("_bkt")
    bases = dict(
        zip(
            counts["_bkt"].to_numpy(),
            np.concatenate(([0], np.cumsum(counts["count()"].to_numpy())[:-1])),
        )
    )
    bases_ref = ray.put(bases)

    def local_rank(group: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)[int(group["_bkt"][0].as_py())]
        h = group["_h"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        return pa.table(
            {
                id_col: pa.array(ids[order], group[id_col].type),
                "shuffle_rank": pa.array(
                    base + np.arange(len(order), dtype=np.int64), pa.int64()
                ),
            }
        )

    return keyed.groupby("_bkt").map_groups(local_rank, batch_format="pyarrow")


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


def weighted_sample(
    docs_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): row i survives with probability
    proportional to its weight (token count here) by keeping the k
    largest keys ``ln(u_i) / w_i`` where ``u_i ∈ (0,1)`` derives from
    the md5 hash of the id — no RNG state, SQL-replicable (the oracle
    orders by the same expression via ``md5_number_upper``).  ln(u)/w
    is the monotone log form of the paper's ``u^(1/w)`` key — same
    order, no pow().

    Top-k is distributive: each block keeps its own k best keys, so the
    merge sees O(blocks·k) rows — the weighted sibling of
    ``stats.hash_ksample``.  Zero-weight rows are excluded (their key
    is -inf in the limit, matching the oracle's WHERE w > 0).

    Output: ``(id_col, n_tokens)`` of the k sampled rows.
    """
    from .textstats import simple_tokens

    two64 = 18446744073709551616.0

    def _keys(ids: list, nt: np.ndarray) -> np.ndarray:
        h = np.empty(len(ids), np.uint64)
        for i, v in enumerate(ids):
            d = hashlib.md5(str(v).encode()).digest()[:8]
            h[i] = int.from_bytes(d, "little")
        u = (h.astype(np.float64) + 0.5) / two64
        return np.log(u) / nt

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        nt = np.fromiter(
            (len(simple_tokens(t or "")) for t in batch[text_col].to_pylist()),
            np.int64,
            len(ids),
        )
        keep = np.flatnonzero(nt > 0)
        key = _keys([ids[i] for i in keep], nt[keep].astype(np.float64))
        if len(key) > k:
            idx = np.argpartition(-key, k)[:k]
            top, key = keep[idx], key[idx]
        else:
            top = keep
        return pa.table(
            {
                "_b": pa.array(np.zeros(len(top), np.int32), pa.int32()),
                id_col: pa.array([ids[i] for i in top], pa.int64()),
                "n_tokens": pa.array(nt[top], pa.int64()),
                "_key": pa.array(key, pa.float64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        key = group["_key"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "n_tokens": pa.array(nt[order], pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )


def cap_per_key(
    ds,
    *,
    key_col: str,
    id_col: str = "doc_id",
    cap: int,
    salt: str = "",
    num_buckets: int = 64,
):
    """Deterministic per-key quota: keep each key's ``cap`` rows with the
    smallest ``(md5(salt + str(id)), id)`` — the C4/RefinedWeb "cap
    documents per domain" curation step, as a stateless uniform sample
    (the hash is a fixed random permutation of each key's rows, so the
    kept set is an exact uniform-without-replacement cap).

    Two-phase exact top-k (see extras/topk.py): every block keeps at
    most ``cap`` rows per key it sees, so the exchange moves
    O(keys-per-block * cap) rows; a hash-bucketed groupby finalizes.
    No RNG state, SQL-replicable: ``row_number() OVER (PARTITION BY key
    ORDER BY md5_number_upper(salt || id::VARCHAR), id) <= cap``.
    Output: (key_col, id_col)."""
    import hashlib as _hl

    from .stats import _md5_le64

    def _keep(keys: np.ndarray, ids: np.ndarray, h: np.ndarray) -> np.ndarray:
        codes, inverse = np.unique(keys, return_inverse=True)
        del codes
        order = np.lexsort((ids, h, inverse))
        ks = inverse[order]
        new = np.ones(len(ks), bool)
        if len(ks) > 1:
            new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(ks)) - np.repeat(
            starts, np.diff(np.r_[starts, len(ks)])
        )
        return order[rank < cap]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(batch[key_col].to_pylist(), object)
        h = _md5_le64(list(ids), salt)
        sel = _keep(keys, ids, h)
        # bucket by a stable hash of the key string (once per distinct
        # key per block), so all of a key's survivors co-locate
        uniq, inv = np.unique(keys[sel], return_inverse=True)
        bh = np.array(
            [
                int.from_bytes(_hl.md5(str(u).encode()).digest()[:8], "little")
                % num_buckets
                for u in uniq
            ],
            np.int32,
        )
        return pa.table(
            {
                "_b": pa.array(bh[inv], pa.int32()),
                key_col: pa.array(keys[sel], pa.string()),
                id_col: pa.array(ids[sel], pa.int64()),
                "_h": pa.array(h[sel], pa.uint64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        keys = np.asarray(group[key_col].to_pylist(), object)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        h = group["_h"].to_numpy(zero_copy_only=False)
        sel = _keep(keys, ids, h)
        sel = sel[np.lexsort((ids[sel], keys[sel].astype(str)))]
        return pa.table(
            {
                key_col: pa.array(keys[sel], pa.string()),
                id_col: pa.array(ids[sel], pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, id_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )


def negative_samples(
    ds,
    *,
    id_col: str,
    n_rows: int,
    k: int,
    salt: str = "",
):
    """k deterministic "random" negatives per anchor row — contrastive /
    metric-learning negative mining without RNG state: the j-th negative
    of id is ``md5(salt + str(id) + '#' + str(j)) % (n_rows - 1)``,
    shifted past the anchor itself (the classic sample-from-[0,n)\\{id}
    trick), assuming ids are dense 0..n_rows-1.  Map-only, shuffle-free,
    stateless — each task needs only (n_rows, k, salt); the negative ids
    are uniform over the corpus and reproducible row-for-row in SQL.
    Output: (id, j, neg_id)."""
    from .stats import _md5_le64

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id = np.repeat(ids, k)
        out_j = np.tile(np.arange(k, dtype=np.int64), len(ids))
        h = _md5_le64([f"{a}#{j}" for a, j in zip(out_id, out_j)], salt)
        m = (h % np.uint64(n_rows - 1)).astype(np.int64)
        neg = np.where(m >= out_id, m + 1, m)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "j": pa.array(out_j, pa.int64()),
                "neg_id": pa.array(neg, pa.int64()),
            }
        )

    return ds.select_columns([id_col]).map_batches(
        gen, batch_format="pyarrow"
    )


def interleave_order(
    ds,
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    num_buckets: int = 256,
):
    """Balanced deterministic source interleaving: every row gets its
    position in the (per-key md5 rank, key) lexicographic order — the
    "mix sources evenly through the epoch" primitive (round-robin while
    every key still has rows), with no RNG and no global sort.

    Per-key rank uses the global_shuffle three-phase prefix-sum, co-
    keyed by (key, hash-range bucket).  The GLOBAL position then needs
    no second exchange: in (rank, key) order, a row at (r, k) is
    preceded by exactly ``Σ_k' min(n_k', r)`` rows of lower rank plus
    ``#{k' < k : n_k' > r}`` same-rank rows of earlier keys — a closed
    form over the O(keys) size table, broadcast once and evaluated
    vectorized per batch (keys assumed ≤ ~thousands; at web scale the
    key domain is sources/datasets, not documents).

    Output: ``(id_col, key_col, src_rank, global_pos)``.
    """
    import ray

    from .stats import _md5_le64

    bits = int(num_buckets).bit_length() - 1
    if num_buckets < 2 or (1 << bits) != num_buckets:
        raise ValueError("num_buckets must be a power of two >= 2")
    shift = np.uint64(64 - bits)

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = _md5_le64(ids, salt)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                key_col: batch[key_col],
                "_h": pa.array(h, pa.uint64()),
                "_bkt": pa.array((h >> shift).astype(np.int64), pa.int64()),
            }
        )

    keyed = (
        ds.select_columns([id_col, key_col])
        .map_batches(narrow, batch_format="pyarrow")
        .materialize()  # two consumers: counts + local rank
    )
    counts = (
        keyed.groupby([key_col, "_bkt"])
        .count()
        .to_pandas()
        .sort_values([key_col, "_bkt"])
    )
    bases: dict = {}
    sizes: dict = {}
    for key, sub in counts.groupby(key_col, sort=True):
        c = sub["count()"].to_numpy()
        b = np.concatenate(([0], np.cumsum(c)[:-1]))
        for bkt, base in zip(sub["_bkt"].to_numpy(), b):
            bases[(key, int(bkt))] = int(base)
        sizes[key] = int(c.sum())
    keys_sorted = sorted(sizes)
    key_idx = {k: i for i, k in enumerate(keys_sorted)}
    n_arr = np.array([sizes[k] for k in keys_sorted], np.int64)
    n_sorted = np.sort(n_arr)
    n_prefix = np.concatenate(([0], np.cumsum(n_sorted)))
    bcast = ray.put((bases, key_idx, n_arr, n_sorted, n_prefix))

    def local_rank(group: pa.Table) -> pa.Table:
        bases_, key_idx_, n_arr_, n_sorted_, n_prefix_ = ray.get(bcast)
        key = group[key_col][0].as_py()
        base = bases_[(key, int(group["_bkt"][0].as_py()))]
        h = group["_h"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        r = base + np.arange(len(order), dtype=np.int64)
        # closed-form global position in (rank, key) order
        c = np.searchsorted(n_sorted_, r, side="right")
        lower = n_prefix_[c] + (len(n_arr_) - c) * r
        ki = key_idx_[key]
        ties = ((n_arr_[None, :ki] > r[:, None]).sum(axis=1)
                if ki else np.zeros(len(r), np.int64))
        return pa.table(
            {
                id_col: pa.array(ids[order], group[id_col].type),
                key_col: pa.array([key] * len(order), group[key_col].type),
                "src_rank": pa.array(r, pa.int64()),
                "global_pos": pa.array(lower + ties, pa.int64()),
            }
        )

    return keyed.groupby([key_col, "_bkt"]).map_groups(
        local_rank, batch_format="pyarrow"
    )
