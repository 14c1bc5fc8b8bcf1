"""Deduplication operators for training-data pipelines (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), expressed Ray-Data-first:

* exact      — hash column in ``map_batches`` -> ``groupby(hash)`` keep min
* minhash    — shingle->minhash per batch -> explode (band, band_hash) rows
               -> ``groupby(band, band_hash)`` -> candidate pairs -> verify
               Jaccard -> min-label clusters
* simhash    — 64-bit simhash per doc (vectorized bit counting)
* ngram      — token-shingle Jaccard verification over candidate pairs
* embedding  — cosine near-dup pairs over list<float> embeddings

All hashes are blake2b-derived (stable across processes; python ``hash()``
is salted and banned here).  Determinism: candidate pairs and clusters are
emitted sorted.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import round6, simple_tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs_ds, text_col: str = "text"):
    """(text_sha256, keep_doc_id, n_copies) per distinct content —
    the B6 analog over the documents table."""

    def add_sha(batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256((t or "").encode()).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_sha256": pa.array(shas, pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [int(s[:8], 16) % 64 for s in batch["text_sha256"].to_pylist()]
        return batch.append_column("_b", pa.array(buckets, pa.int64()))

    def per_bucket(group: pa.Table) -> pa.Table:
        # vectorized group stats within the bucket (one UDF call per
        # bucket; per-sha map_groups would pay Python overhead per doc)
        agg = (
            group.select(["text_sha256", "doc_id"])
            .group_by("text_sha256")
            .aggregate([("doc_id", "min"), ("doc_id", "count")])
        )
        return agg.rename_columns(["text_sha256", "keep_doc_id", "n_copies"])

    return (
        docs_ds.map_batches(add_sha, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    if len(tokens) < k:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in set(shingles)
        ],
        dtype=np.uint64,
    )


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    h = _shingle_hashes(tokens, k)
    if h.size == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (a*h + b) mod p, columnwise min — python ints to dodge uint64 overflow
    vals = (h[None, :].astype(object) * a[:, None].astype(object) + b[:, None].astype(object)) % _MERSENNE
    return np.array([int(min(row)) for row in vals], dtype=np.uint64)


class MinHashLSH:
    """map_batches stage: doc -> (band, band_hash, doc_id) rows.

    num_perm = bands * rows_per_band; docs sharing any band bucket become
    candidate pairs downstream.  The permutation params are built once per
    actor (stateful stage)."""

    def __init__(self, num_bands: int = 16, rows_per_band: int = 4, shingle_k: int = 3,
                 text_col: str = "text"):
        self.num_bands = num_bands
        self.rows_per_band = rows_per_band
        self.k = shingle_k
        self.text_col = text_col
        self.a, self.b = _minhash_params(num_bands * rows_per_band)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch[self.text_col].to_pylist()
        ):
            toks = simple_tokens(text or "")
            sig = minhash_signature(toks, self.a, self.b, self.k)
            for band in range(self.num_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                ) >> 1  # fit int64
                doc_ids.append(doc_id)
                bands.append(band)
                band_hashes.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
            }
        )


def _band_pairs(group: pa.Table) -> pa.Table:
    """All candidate pairs of one band (one UDF call per band, not per
    hash bucket): vectorized sort + run detection, Python only for the
    rare buckets that actually collide."""
    order = pc.sort_indices(
        group, sort_keys=[("band_hash", "ascending"), ("doc_id", "ascending")]
    )
    tbl = group.take(order)
    bh = tbl["band_hash"].to_numpy(zero_copy_only=False)
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    a_out, b_out = [], []
    if len(bh):
        change = np.empty(len(bh), dtype=bool)
        change[0] = True
        change[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(bh)]
        for s, e in zip(starts, ends):
            if e - s > 1:
                bucket_ids = sorted(set(ids[s:e].tolist()))
                for x, y in combinations(bucket_ids, 2):
                    a_out.append(x)
                    b_out.append(y)
    return pa.table(
        {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
    )


def minhash_candidate_pairs(docs_ds, num_bands=16, rows_per_band=4, shingle_k=3,
                            text_col: str = "text"):
    """docs -> distinct candidate (a < b) pairs via LSH banding."""
    band_rows = docs_ds.map_batches(
        MinHashLSH,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(
            num_bands=num_bands, rows_per_band=rows_per_band,
            shingle_k=shingle_k, text_col=text_col,
        ),
        concurrency=(1, 4),
    )
    pairs = band_rows.groupby("band").map_groups(
        _band_pairs, batch_format="pyarrow"
    )

    # distinct (a, b): bucket by a, vectorized unique within the bucket
    def add_bucket(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_b", pa.array((a % 64).astype(np.int64), pa.int64())
        )

    def distinct_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("a", "ascending"), ("b", "ascending")]
        )
        tbl = group.take(order)
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(a), dtype=bool)
        if len(a):
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return tbl.filter(pa.array(keep)).drop_columns(["_b"])

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(distinct_bucket, batch_format="pyarrow")
    )


def ngram_jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    def sh(toks):
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(tokens_a), sh(tokens_b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def minhash_dedup_clusters(docs_ds, threshold: float = 0.8, num_bands=16,
                           rows_per_band=4, shingle_k=3, text_col: str = "text"):
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify ->
    min-label connected components.

    The verify + clustering step broadcasts the candidate docs' token sets
    (candidate pairs are a tiny fraction of the corpus by LSH design); at
    extreme scale the verify becomes a co-grouped join on pair keys and the
    clustering an iterated min-label groupby (ray_guide 'Near-dup').
    Returns (doc_id, cluster_id) for docs in near-dup groups."""
    pairs = minhash_candidate_pairs(
        docs_ds, num_bands, rows_per_band, shingle_k, text_col
    ).to_pandas()
    need_ids = sorted(set(pairs["a"]) | set(pairs["b"])) if len(pairs) else []
    if not need_ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})
    need = set(need_ids)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], pa.array(need_ids, pa.int64()))
        return batch.filter(mask)

    toks = {}
    for b in docs_ds.map_batches(keep, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for d, t in zip(b["doc_id"].to_pylist(), b[text_col].to_pylist()):
            if d in need:
                toks[d] = simple_tokens(t or "")
    # union-find over verified pairs
    parent = {d: d for d in need_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_id, b_id in sorted(zip(pairs["a"], pairs["b"])):
        if ngram_jaccard(toks[a_id], toks[b_id], shingle_k) >= threshold:
            ra, rb = find(a_id), find(b_id)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    roots = {d: find(d) for d in need_ids}
    counts = Counter(roots.values())
    rows = sorted((d, r) for d, r in roots.items() if counts[r] > 1)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "cluster_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in set(tokens):
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_fingerprints(docs_ds, text_col: str = "text"):
    def fp(batch: pa.Table) -> pa.Table:
        vals = []
        for t in batch[text_col].to_pylist():
            v = simhash64(simple_tokens(t or ""))
            vals.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(vals, pa.int64())}
        )

    return docs_ds.map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(emb_ds, threshold: float = 0.9, id_limit: int | None = None):
    """Cosine >= threshold pairs (a < b) over the embeddings table.

    Batch side is vectorized (numpy matmul against the broadcast matrix);
    ``id_limit`` bounds the candidate universe for the SQL oracle.  Scale
    path: LSH-bucket by random hyperplane signs first (see similarity.py),
    then only intra-bucket matmuls."""
    import ray

    def load(batch: pa.Table) -> pa.Table:
        if id_limit is not None:
            batch = batch.filter(pc.less(batch["vec_id"], id_limit))
        return batch.select(["vec_id", "embedding"])

    small = emb_ds.map_batches(load, batch_format="pyarrow").to_pandas()
    ids = small["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in small["embedding"]])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    # dot/(|a|*|b|) — DuckDB list_cosine_similarity's formulation, so the
    # 6dp-rounded oracle compare is exact
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = (mat @ mat.T) / (norms[:, None] * norms[None, :])
    a_out, b_out, cos_out = [], [], []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            c = sims[i, j]
            if c >= threshold:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                cos_out.append(round6(float(c)))
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
            "cos": pa.array(cos_out, pa.float64()),
        }
    )
