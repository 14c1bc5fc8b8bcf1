"""Deduplication operators for training-data pipelines (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), expressed Ray-Data-first:

* exact      — hash column in ``map_batches`` -> ``groupby(hash)`` keep min
* minhash    — shingle->minhash per batch -> explode (band, band_hash) rows
               -> ``groupby(band, band_hash)`` -> candidate pairs -> verify
               Jaccard -> min-label clusters
* simhash    — 64-bit simhash per doc (vectorized bit counting)
* ngram      — token-shingle Jaccard verification over candidate pairs
* embedding  — cosine near-dup pairs over list<float> embeddings

Token-level hashes are md5-derived (stable across processes — python
``hash()`` is salted and banned here — and little-endian-first-8-bytes is
exactly DuckDB ``md5_number_upper``, which keeps simhash and the whole
minhash pipeline SQL-oracle-able); band bucketing stays blake2b (bucket
identity only).  Determinism: candidate pairs and clusters are emitted
sorted.
"""

from __future__ import annotations

import hashlib
import logging
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bucket_agg import bucketed_group_agg
from .textstats import round6, simple_tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _sha_bucket_rows(batch: pa.Table, text_col: str) -> pa.Table:
    """THE exact-dup identity law, in one place: sha256 of the raw
    text, hash-bucketed by the first 8 hex chars mod 64.  Both the
    oracled ``exact_dedup_groups`` report and the curation ACTION's
    loser pass (``exact_dedup_losers``) consume this — the law must not
    fork."""
    shas = [
        hashlib.sha256((t or "").encode()).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text_sha256": pa.array(shas, pa.string()),
            "_b": pa.array(
                [int(s[:8], 16) % 64 for s in shas], pa.int64()
            ),
        }
    )


def exact_dedup_losers(docs_ds, text_col: str = "text"):
    """LOSER doc_ids of the exact dedup (everything but each content
    group's min doc_id) as a narrow Dataset — the ACTION-side
    complement of ``exact_dedup_groups``, same identity law."""

    def losers(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("text_sha256", "ascending"), ("doc_id", "ascending")],
        )
        t = group.take(order)
        shas = np.asarray(t["text_sha256"].to_pylist(), dtype=object)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = shas[1:] != shas[:-1]
        return pa.table({"doc_id": pa.array(ids[~first], pa.int64())})

    return (
        docs_ds.map_batches(
            lambda b: _sha_bucket_rows(b, text_col), batch_format="pyarrow"
        )
        .groupby("_b")
        .map_groups(losers, batch_format="pyarrow")
    )


def exact_dedup_groups(docs_ds, text_col: str = "text"):
    """(text_sha256, keep_doc_id, n_copies) per distinct content —
    the B6 analog over the documents table."""

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
        docs_ds.map_batches(
            lambda b: _sha_bucket_rows(b, text_col), batch_format="pyarrow"
        )
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


_SHINGLE_BASE = np.uint64(1099511628211)
_SHINGLE_TOKEN_CACHE: dict[str, int] = {}
# per-worker memo cap: an OPEN vocabulary (ids, random strings) would
# otherwise grow these dicts without bound across a long-lived worker's
# batches (the tokenizer's _tok_cache has the same discipline)
_CACHE_MAX = 1_000_000


def _shingle_hashes_positional(tokens: list[str], k: int) -> np.ndarray:
    """64-bit hash PER WINDOW POSITION (len(tokens)-k+1 entries, NOT
    uniqued, no short-doc fallback): md5 once per DISTINCT token
    (memoized per worker process), then a polynomial combine of the k
    token hashes per window (uint64 wraparound).  The positional form
    is what span-level dedup consumes; ``_shingle_hashes`` is its
    uniqued set form."""
    if len(tokens) < k:
        return np.empty(0, dtype=np.uint64)
    cache = _SHINGLE_TOKEN_CACHE
    if len(cache) > _CACHE_MAX:  # bound worker RSS on open vocabularies
        cache.clear()
    th = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            # md5-LE == DuckDB md5_number_upper — keeps the whole minhash
            # pipeline SQL-oracle-able (see oracle_sql_map "minhash_clusters")
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            cache[t] = h
        th[i] = h
    n_sh = len(tokens) - k + 1
    powers = _window_powers(k)
    with np.errstate(over="ignore"):
        acc = np.zeros(n_sh, dtype=np.uint64)
        for w in range(k):
            acc += th[w : w + n_sh] * powers[w]
    return acc


def _batch_simple_token_hashes(
    texts: "pa.Array | pa.ChunkedArray",
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch form of ``simple_tokens`` + per-token md5-LE
    hashing (the per-doc loop's hot half): Arrow RE2 split of the
    lowered text into ``[a-z]+`` runs, dictionary-encode, one md5 per
    DISTINCT token through the worker cache, and the length/stopword
    predicate evaluated once per vocab entry.  Returns
    ``(flat kept-token hashes in stream order, kept count per doc)`` —
    value-identical to hashing ``simple_tokens(text)`` doc by doc
    (asserted by golden test; split on ``[^a-z]+`` minus empties ==
    ``findall('[a-z]+')``)."""
    from .textstats import MAX_LEN, MIN_LEN, STOPWORDS

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    content = pc.coalesce(
        pc.cast(texts, pa.string()), pa.scalar("", pa.string())
    )
    toks = pc.split_pattern_regex(pc.utf8_lower(content), pattern=r"[^a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    raw_lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    dict_arr = flat.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary.to_pylist()
    cache = _SHINGLE_TOKEN_CACHE
    if len(cache) > _CACHE_MAX:  # bound worker RSS on open vocabularies
        cache.clear()
    th_vocab = np.zeros(len(vocab), dtype=np.uint64)
    keep_vocab = np.zeros(len(vocab), dtype=bool)
    for i, t in enumerate(vocab):
        if MIN_LEN <= len(t) <= MAX_LEN and t not in STOPWORDS:
            keep_vocab[i] = True
            h = cache.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little"
                )
                cache[t] = h
            th_vocab[i] = h
    if codes.size:
        keep = keep_vocab[codes]
        th = th_vocab[codes][keep]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), raw_lens)
        kept_lens = np.bincount(doc_idx[keep], minlength=n_docs).astype(
            np.int64
        )
    else:
        th = np.empty(0, dtype=np.uint64)
        kept_lens = np.zeros(n_docs, dtype=np.int64)
    return th, kept_lens


def _window_powers(k: int) -> np.ndarray:
    """The polynomial-combine power vector of
    ``_shingle_hashes_positional`` (powers[w] = BASE^(k-1-w), uint64
    wraparound) — shared so the batch window kernel hashes to the same
    values."""
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[k - 1] = np.uint64(1)
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _SHINGLE_BASE
    return powers


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """64-bit hash per DISTINCT k-shingle (sorted unique), with the
    short-doc fallback (md5 of the joined tokens) the minhash oracle
    mirrors."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < k:
        s = " ".join(tokens)
        return np.array(
            [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")],
            dtype=np.uint64,
        )
    return np.unique(_shingle_hashes_positional(tokens, k))


def _fold61(x: np.ndarray) -> np.ndarray:
    """x mod 2^61-1 for x < 2^63 (one fold + conditional subtract)."""
    m = np.uint64(_MERSENNE)
    x = (x >> np.uint64(61)) + (x & m)
    x = (x >> np.uint64(61)) + (x & m)
    return np.where(x >= m, x - m, x)


def _mulmod61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(a * h) mod 2^61-1, fully vectorized in uint64 (no object dtype).

    Inputs must be < 2^61.  32-bit limb split keeps every partial below
    2^63; 2^64 ≡ 8 and 2^61 ≡ 1 (mod p) reduce the limbs."""
    mask32 = np.uint64(0xFFFFFFFF)
    a0, a1 = a & mask32, a >> np.uint64(32)
    h0, h1 = h & mask32, h >> np.uint64(32)
    hi = a1 * h1  # < 2^58
    mid = a1 * h0 + a0 * h1  # < 2^62
    lo = a0 * h0  # < 2^64 (uint64 wrap impossible: both < 2^32)
    # mid * 2^32 = (mid >> 29) * 2^61 + (mid & (2^29-1)) * 2^32
    #            ≡ (mid >> 29)        + (mid & (2^29-1)) * 2^32   (mod p)
    mid_hi = mid >> np.uint64(29)
    mid_lo = (mid & np.uint64((1 << 29) - 1)) << np.uint64(32)
    lo_folded = (lo >> np.uint64(61)) + (lo & np.uint64(_MERSENNE))
    total = (hi << np.uint64(3)) + mid_hi + mid_lo + lo_folded  # < 2^63
    return _fold61(total)


def _signature_from_hashes(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Permute-min over a precomputed (unique) shingle-hash array — the
    kernel of ``minhash_signature`` factored out so signatures can be
    derived from a persisted/collapsed shingle-set column without
    re-tokenizing the document."""
    if h.size == 0:
        return np.zeros(len(a), dtype=np.uint64)
    h61 = _fold61(h)  # (a*(h mod p) + b) mod p == (a*h + b) mod p
    prod = _mulmod61(a[:, None], h61[None, :])  # (num_perm, n_shingles)
    vals = prod + b[:, None]  # < 2^62
    vals = _fold61(vals)
    return vals.min(axis=1)


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Signature = min over shingles of (a_j * h + b_j) mod 2^61-1.

    Round-2 kernel: exact same values as the round-1 object-dtype python
    implementation (golden-tested), ~100x faster — the modular product
    runs as a vectorized uint64 outer product via ``_mulmod61``."""
    return _signature_from_hashes(_shingle_hashes(tokens, k), a, b)


def _band_hashes(sig: np.ndarray, num_bands: int, rows_per_band: int) -> list[int]:
    """Signature -> one 63-bit blake2b bucket hash per band.  The ONE
    banding kernel — ``MinHashLSH`` (tokenize path) and
    ``_BandsFromShingles`` (identity-collapse path) must bucket
    identically for the collapse pipeline's candidate graph to equal
    the uncollapsed / SQL-oracle form, so both call this."""
    out = []
    for band in range(num_bands):
        chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
        out.append(
            int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                "little",
            )
            >> 1  # fit int64
        )
    return out


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
            for band, bh in enumerate(
                _band_hashes(sig, self.num_bands, self.rows_per_band)
            ):
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


def _make_band_pairs(emit: str = "pairs", max_bucket: int | None = None):
    """Build the per-bucket candidate-edge map_groups fn.

    ``emit="pairs"``: full clique per (band, band_hash) bucket — O(m^2)
    edges for an m-doc bucket; this is the pair-REPORT form and the form
    the SQL oracle's self-join replicates.  ``max_bucket`` is the
    standard over-crowded-bucket guard: buckets with more than
    ``max_bucket`` distinct docs are DROPPED entirely (an over-crowded
    band bucket is as uninformative as a stopword shingle) with the drop
    logged — opt-in because it changes the pair set.

    ``emit="links"``: spanning links (bucket-min -> doc), O(m) edges —
    yields IDENTICAL connected components over the *candidate* graph,
    for consumers that cluster without a per-pair verify.  (The verified
    cluster pipeline keeps the pair form — its exact-Jaccard verify is
    defined on pairs — and defuses giant buckets upstream via
    shingle-set identity collapse instead; see
    ``minhash_dedup_clusters``.)"""

    def fn(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("band", "ascending"),
                ("band_hash", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        tbl = group.take(order)
        bd = tbl["band"].to_numpy(zero_copy_only=False)
        bh = tbl["band_hash"].to_numpy(zero_copy_only=False)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        dropped = 0
        if len(bh):
            change = np.empty(len(bh), dtype=bool)
            change[0] = True
            change[1:] = (bh[1:] != bh[:-1]) | (bd[1:] != bd[:-1])
            starts = np.flatnonzero(change)
            ends = np.r_[starts[1:], len(bh)]
            for s, e in zip(starts, ends):
                if e - s <= 1:
                    continue
                bucket_ids = sorted(set(ids[s:e].tolist()))
                m = len(bucket_ids)
                if max_bucket is not None and m > max_bucket:
                    # the cap applies to BOTH forms (an over-crowded
                    # bucket is uninformative either way) — links drop
                    # m-1 edges, pairs drop the full clique
                    dropped += (
                        m - 1 if emit == "links" else m * (m - 1) // 2
                    )
                    continue
                if emit == "links":
                    lo = bucket_ids[0]
                    for y in bucket_ids[1:]:
                        a_out.append(lo)
                        b_out.append(y)
                    continue
                for x, y in combinations(bucket_ids, 2):
                    a_out.append(x)
                    b_out.append(y)
        if dropped:
            logging.getLogger(__name__).warning(
                "minhash band bucket over max_bucket=%d: dropped %d candidate pairs",
                max_bucket, dropped,
            )
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
        )

    return fn


# back-compat name: the uncapped pair-report form
_band_pairs = _make_band_pairs("pairs", None)


def _pairs_from_band_rows(band_rows, emit: str = "pairs",
                          max_bucket: int | None = None):
    """(doc_id, band, band_hash) rows -> distinct candidate (a < b) edges."""
    # bucket by (band, band_hash) hash — NOT by band alone, which would
    # co-locate one row per document per band (O(n_docs) rows in a
    # single map_groups task; an OOM at the scale LSH exists for).
    # Equal (band, band_hash) rows always share a bucket, so the pair
    # set is identical.
    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        bd = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        bb = np.mod(bd * np.int64(1099511628211) + bh, 256)
        return batch.append_column("_bb", pa.array(bb, pa.int64()))

    pairs = (
        band_rows.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_bb")
        .map_groups(_make_band_pairs(emit, max_bucket), batch_format="pyarrow")
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


def minhash_candidate_pairs(docs_ds, num_bands=16, rows_per_band=4, shingle_k=3,
                            text_col: str = "text", emit: str = "pairs",
                            max_bucket: int | None = None):
    """docs -> distinct candidate (a < b) edges via LSH banding.

    ``emit`` / ``max_bucket`` control the per-bucket edge blow-up guard —
    see ``_make_band_pairs``; defaults reproduce the uncapped pair-report
    form the SQL oracle self-join replicates."""
    band_rows = docs_ds.map_batches(
        MinHashLSH,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(
            num_bands=num_bands, rows_per_band=rows_per_band,
            shingle_k=shingle_k, text_col=text_col,
        ),
        concurrency=(1, 4),
    )
    return _pairs_from_band_rows(band_rows, emit=emit, max_bucket=max_bucket)


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


def ngram_jaccard_pairs(
    docs_ds,
    k: int = 3,
    threshold: float = 0.5,
    id_limit: int | None = None,
    text_col: str = "text",
    chunk_rows: int = 2048,
) -> pa.Table:
    """Jaccard >= threshold pairs (a < b) over k-shingle sets of the
    documents table — EXACT, distributed block-pair form (the n-gram
    analog of ``embedding_neardup_pairs``).

    Shingling (``simple_tokens`` + ``_shingle_hashes``) runs distributed
    in ``map_batches`` and the shingled Dataset is MATERIALIZED in the
    object store; the driver then holds only its block refs plus
    (block, row-range) chunk descriptors — the (id, shingle) payload
    never passes through the driver process (round-4 fix: the round-3
    form pumped every row through a driver ``iter_batches`` loop).  One
    Ray task per (i <= j) chunk pair intersects the sorted unique hash
    arrays, and only the >= threshold pairs return.  The 6dp-rounded
    Jaccard is compared on BOTH sides so the result matches the
    string-set SQL oracle exactly (hashed shingles equal string shingles
    up to a ~2^-64 collision).  O(n^2) pairs total but embarrassingly
    parallel; the sub-quadratic scale path is MinHash LSH candidates
    (``minhash_dedup_clusters``) verified by this same Jaccard.  Pairs
    whose shingle union is empty (both docs token-free) are omitted,
    matching the oracle's NULL-division semantics.
    """
    import ray

    def to_shingles(batch: pa.Table) -> pa.Table:
        if id_limit is not None:
            batch = batch.filter(pc.less(batch["doc_id"], id_limit))
        ids = batch["doc_id"].to_pylist()
        offsets = [0]
        flats: list[np.ndarray] = []
        for text in batch[text_col].to_pylist():
            h = _shingle_hashes(simple_tokens(text or ""), k)
            flats.append(h)
            offsets.append(offsets[-1] + len(h))
        flat = (
            np.concatenate(flats) if flats else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(flat, pa.uint64())
                ),
            }
        )

    shingled = docs_ds.map_batches(to_shingles, batch_format="pyarrow").materialize()
    # chunk descriptors: (block_ref, lo, hi) row ranges — O(#chunks)
    # driver state; the same block ref passed to many tasks is fetched
    # once per node by the object store
    chunks: list[tuple] = []
    for bundle in shingled.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            n = meta.num_rows or 0
            for lo in range(0, n, chunk_rows):
                chunks.append((ref, lo, min(lo + chunk_rows, n)))
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if not chunks:
        return empty

    def _unpack(block: pa.Table, lo: int, hi: int):
        t = block.slice(lo, hi - lo)
        col = t["shingles"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        # flatten() respects the array offset: it returns exactly the
        # values of the logical [offs[0], offs[-1]) range
        return (
            t["doc_id"].to_numpy(zero_copy_only=False),
            (offs - offs[0]).astype(np.int64),
            col.flatten().to_numpy(zero_copy_only=False),
        )

    @ray.remote
    def pair_task(block_i, lo_i, hi_i, block_j, lo_j, hi_j, same: bool):
        ids_i, starts_i, flat_i = _unpack(block_i, lo_i, hi_i)
        if same:  # i == j chunk: both descriptors are the same range
            ids_j, starts_j, flat_j = ids_i, starts_i, flat_i
        else:
            ids_j, starts_j, flat_j = _unpack(block_j, lo_j, hi_j)
        out_a: list[int] = []
        out_b: list[int] = []
        out_jc: list[float] = []
        for x in range(len(ids_i)):
            sa = flat_i[starts_i[x] : starts_i[x + 1]]
            y0 = x + 1 if same else 0
            for y in range(y0, len(ids_j)):
                ia, ib = int(ids_i[x]), int(ids_j[y])
                if ia == ib:
                    continue
                sb = flat_j[starts_j[y] : starts_j[y + 1]]
                union_base = len(sa) + len(sb)
                if union_base == 0:
                    continue
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                jc = round6(inter / (union_base - inter))
                if jc >= threshold:
                    lo, hi = (ia, ib) if ia < ib else (ib, ia)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_jc.append(jc)
        return (
            np.array(out_a, dtype=np.int64),
            np.array(out_b, dtype=np.int64),
            np.array(out_jc, dtype=np.float64),
        )

    futures = []
    for i in range(len(chunks)):
        ri, li, hi_i = chunks[i]
        for j in range(i, len(chunks)):
            rj, lj, hj = chunks[j]
            futures.append(
                pair_task.remote(ri, li, hi_i, rj, lj, hj, i == j)
            )
    a_out, b_out, j_out = [], [], []
    for a_ids, b_ids, jcs in ray.get(futures):
        a_out.append(a_ids)
        b_out.append(b_ids)
        j_out.append(jcs)
    a_all = np.concatenate(a_out) if a_out else np.empty(0, dtype=np.int64)
    b_all = np.concatenate(b_out) if b_out else np.empty(0, dtype=np.int64)
    j_all = np.concatenate(j_out) if j_out else np.empty(0)
    order = np.lexsort((b_all, a_all))
    return pa.table(
        {
            "a": pa.array(a_all[order], pa.int64()),
            "b": pa.array(b_all[order], pa.int64()),
            "jaccard": pa.array(j_all[order], pa.float64()),
        }
    )


def jaccard_clusters(
    docs_ds,
    k: int = 3,
    threshold: float = 0.5,
    id_limit: int | None = None,
) -> pa.Table:
    """(doc_id, cluster_id) connected components over the EXACT n-gram
    Jaccard >= threshold pair graph — ``ngram_jaccard_pairs`` edges +
    the same min-label propagation the MinHash pipeline uses
    (``cluster_id`` = min doc_id in the component, so the result is
    SQL-oracle-comparable via a recursive-CTE transitive closure).
    Every emitted node has degree >= 1, so all clusters are
    non-singleton by construction."""
    pairs = ngram_jaccard_pairs(docs_ds, k=k, threshold=threshold, id_limit=id_limit)
    if pairs.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
            }
        )
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    if pairs.num_rows <= _CLUSTER_DRIVER_LIMIT:
        nodes, labels = _min_label_numpy(a, b)
    else:
        nodes, labels = _min_label_dataset(pairs)
    rows = sorted(zip(nodes.tolist(), labels.tolist()))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "cluster_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _min_label_numpy(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Connected components over edge arrays by iterated min-label
    propagation with pointer jumping — vectorized; the label that each
    component converges to is its minimum node id (identical to the
    round-1 union-find-with-min-root, which it replaces)."""
    nodes = np.unique(np.concatenate([a, b]))
    la = np.searchsorted(nodes, a)
    lb = np.searchsorted(nodes, b)
    labels = nodes.copy()
    while True:
        new = labels.copy()
        np.minimum.at(new, la, labels[lb])
        np.minimum.at(new, lb, labels[la])
        # pointer jump: labels are node ids, so chase one hop per round
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if np.array_equal(new, labels):
            return nodes, labels
        labels = new


def _min_label_dataset(pairs_tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Dataset-shaped min-label propagation over an edge TABLE (driver
    already holds the pairs); see ``_min_label_edges`` for the form that
    never collects the edges."""
    import ray.data as rd

    a = pairs_tbl["a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["b"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    edges = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.concatenate([a, b, nodes]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a, nodes]), pa.int64()),
            }
        )
    ).materialize()
    return _min_label_iterate(edges, nodes)


def _min_label_edges(edges_ds) -> tuple[np.ndarray, np.ndarray]:
    """Min-label propagation fed straight from an (a, b) edge Dataset —
    the 100-TB path: the edge set NEVER lands on the driver.  Driver
    memory is O(candidate nodes) (the label array — small by LSH
    design); per round one bucketed ``groupby(node).min`` exchange.
    Same fixpoint as ``_min_label_numpy`` (equal-by-test)."""
    import ray.data as rd

    def both_ways(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    bidir = edges_ds.map_batches(both_ways, batch_format="pyarrow").materialize()
    # distinct nodes via a bucketed exchange; its min(nbr) column is not
    # discarded — min(node, min_nbr) IS round 1 of the fixpoint (labels
    # start at identity), so seeding from it saves one full O(E)
    # exchange.  Only the O(nodes) arrays are collected.
    node_parts: list[np.ndarray] = []
    mnbr_parts: list[np.ndarray] = []
    for t in bucketed_group_agg(bidir, "node", [("nbr", "min")]).iter_batches(
        batch_format="pyarrow"
    ):
        if t.num_rows:
            node_parts.append(t["node"].to_numpy(zero_copy_only=False))
            mnbr_parts.append(t["min(nbr)"].to_numpy(zero_copy_only=False))
    if not node_parts:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty.copy()
    nodes_u = np.concatenate(node_parts)
    order = np.argsort(nodes_u)  # each node appears in exactly one bucket
    nodes = nodes_u[order]
    seed = np.minimum(nodes, np.concatenate(mnbr_parts)[order])
    # pointer-jump the seed once (round 1's jump): labels are node ids
    seed = np.minimum(seed, seed[np.searchsorted(nodes, seed)])
    # self-loops keep every node present in each round's agg output
    loops = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "nbr": pa.array(nodes, pa.int64()),
            }
        )
    )
    return _min_label_iterate(
        bidir.union(loops).materialize(), nodes, labels=seed
    )


def _min_label_iterate(
    edges, nodes: np.ndarray, labels: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Shared fixpoint loop: ``edges`` is a materialized (node, nbr)
    Dataset (bidirectional + self-loops), labels broadcast per round.
    ``labels`` may seed the iteration with any monotone-valid start
    (component-internal node ids <= identity) — the fixpoint (component
    min) is start-independent."""
    import ray

    if labels is None:
        labels = nodes.copy()
    while True:
        ref = ray.put((nodes, labels))

        def relabel(batch: pa.Table) -> pa.Table:
            bn, bl = ray.get(ref)
            nbr = batch["nbr"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch["node"],
                    "lbl": pa.array(bl[np.searchsorted(bn, nbr)], pa.int64()),
                }
            )

        # bucketed exchange: node cardinality is O(candidate nodes) and
        # Ray's native groupby walks groups in Python (see bucket_agg)
        agg = bucketed_group_agg(
            edges.map_batches(
                relabel, batch_format="pyarrow", batch_size=None
            ),
            "node",
            [("lbl", "min")],
        )
        new = labels.copy()
        for t in agg.iter_batches(batch_format="pyarrow"):
            ni = np.searchsorted(nodes, t["node"].to_numpy(zero_copy_only=False))
            new[ni] = np.minimum(new[ni], t["min(lbl)"].to_numpy(zero_copy_only=False))
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if np.array_equal(new, labels):
            return nodes, labels
        labels = new


_CLUSTER_DRIVER_LIMIT = 5_000_000

# expand-stage broadcast gate: below this many labeled nodes the
# (nodes, labels) arrays ship once via ray.put (<=64 MB at the default);
# above it the expand runs as a co-grouped join on rep id so no task
# ever fetches the whole label map (a 50%-dup corpus makes the map
# O(corpus/2) — too big for one broadcast object).
_EXPAND_BROADCAST_LIMIT = 4_000_000


def _spill_to_parquet(ds, prefix: str, registry: list | None = None) -> str:
    """Write a mid-pipeline Dataset to parquet shards under a temp dir
    and return the dir path for lazy re-reads.

    Replaces corpus-scale ``.materialize()`` for wide derived tables
    (e.g. the uint64-per-token shingle table, ~same order as the text
    itself): the object store holds only in-flight blocks during the
    write, and each consumer streams the shards back — with column
    pruning via ``read_parquet(columns=...)`` — instead of pinning
    corpus-scale bytes for the pipeline's lifetime.  The shards are
    lineage-free (no recompute for the second consumer) and the dir is
    removed at interpreter exit — or EAGERLY by terminal consumers that
    pass a ``registry`` list (they rmtree the collected dirs once the
    pipeline is fully drained, so repeated calls in a long-lived
    process don't accumulate corpus-scale spill under /tmp)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    ds.write_parquet(d)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    if registry is not None:
        registry.append(d)
    return d


class _ShingleDocs:
    """map_batches stage: doc -> (doc_id, skey1, skey2, shingles).

    ``shingles`` is the sorted unique 64-bit k-shingle hash array
    (``_shingle_hashes``); (skey1, skey2) is a 128-bit blake2b of the
    array bytes — the shingle-set IDENTITY key.  Docs with equal shingle
    sets have exact Jaccard 1.0 (>= any threshold) and identical minhash
    signatures, so they are provably always in one verified cluster; the
    cluster pipeline collapses them to one representative BEFORE banding,
    which turns the classic job-killer (a vendored license file repeated
    m times -> one band bucket -> O(m^2) candidate pairs) into O(m)."""

    def __init__(self, shingle_k: int = 3, text_col: str = "text"):
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        k1 = np.empty(len(ids), dtype=np.uint64)
        k2 = np.empty(len(ids), dtype=np.uint64)
        offsets = [0]
        flats: list[np.ndarray] = []
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            h = _shingle_hashes(simple_tokens(text or ""), self.k)
            d = hashlib.blake2b(h.tobytes(), digest_size=16).digest()
            k1[i] = int.from_bytes(d[:8], "little")
            k2[i] = int.from_bytes(d[8:], "little")
            flats.append(h)
            offsets.append(offsets[-1] + len(h))
        flat = np.concatenate(flats) if flats else np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "skey1": pa.array(k1, pa.uint64()),
                "skey2": pa.array(k2, pa.uint64()),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(flat, pa.uint64())
                ),
            }
        )


def _collapse_identity(shingle_ds, num_buckets: int = 256):
    """Collapse equal shingle sets to rep = min doc_id: one bucketed
    exchange on the 128-bit set key.  Output rows carry BOTH roles:
    every doc gets (doc_id, rep, gsize); rows with ``is_rep`` also carry
    the set's shingle array (once per distinct set).  The bucket count
    is higher than the narrow-row exchanges' 64 because these rows
    carry the shingle PAYLOAD — a bucket task materializes
    corpus/num_buckets of it; raise further for very large corpora."""
    from ..bucket_agg import _bucket_ids

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_b",
            pa.array(_bucket_ids(batch, ["skey1", "skey2"], num_buckets), pa.int64()),
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("skey1", "ascending"),
                ("skey2", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        tbl = group.take(order)
        k1 = tbl["skey1"].to_numpy(zero_copy_only=False)
        k2 = tbl["skey2"].to_numpy(zero_copy_only=False)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        rep = np.empty(n, dtype=np.int64)
        gsize = np.empty(n, dtype=np.int64)
        is_rep = np.zeros(n, dtype=bool)
        if n:
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
            starts = np.flatnonzero(change)
            ends = np.r_[starts[1:], n]
            for s, e in zip(starts, ends):
                rep[s:e] = ids[s]  # doc_id ascending within the run
                gsize[s:e] = e - s
                is_rep[s] = True
        col = tbl["shingles"].combine_chunks()
        lengths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        # blank the shingle payload on non-rep rows (one copy per set)
        keep_len = np.where(is_rep, lengths, 0)
        off = np.concatenate([[0], np.cumsum(keep_len)]).astype(np.int64)
        flat_src = col.flatten().to_numpy(zero_copy_only=False)
        src_starts = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        flat = np.empty(off[-1], dtype=np.uint64)
        for i in np.flatnonzero(is_rep):
            flat[off[i] : off[i + 1]] = flat_src[src_starts[i] : src_starts[i] + keep_len[i]]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "rep": pa.array(rep, pa.int64()),
                "gsize": pa.array(gsize, pa.int64()),
                "is_rep": pa.array(is_rep),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(off, pa.int64()).cast(pa.int32()),
                    pa.array(flat, pa.uint64()),
                ),
            }
        )

    return (
        shingle_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


class _BandsFromShingles:
    """map_batches stage: (doc_id, shingles) rep rows -> LSH band rows —
    ``MinHashLSH`` minus tokenize (signatures derive from the collapsed
    shingle-set column)."""

    def __init__(self, num_bands: int = 16, rows_per_band: int = 4):
        self.num_bands = num_bands
        self.rows_per_band = rows_per_band
        self.a, self.b = _minhash_params(num_bands * rows_per_band)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["shingles"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        doc_ids, bands, band_hashes = [], [], []
        for i, doc_id in enumerate(batch["doc_id"].to_pylist()):
            sig = _signature_from_hashes(flat[offs[i] : offs[i + 1]], self.a, self.b)
            for band, bh in enumerate(
                _band_hashes(sig, self.num_bands, self.rows_per_band)
            ):
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


def _jaccard_from_sorted(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 shingle-hash arrays —
    equal to the string-shingle-set Jaccard (and the SQL oracle's
    list_intersect/list_distinct form) up to a ~2^-64 hash collision."""
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _verify_pairs_driver(pairs_tbl: pa.Table, reps_ds,
                         threshold: float) -> pa.Table:
    """Below-limit verify: candidate rep ids fit the driver, so broadcast
    their shingle arrays once and verify in a map_batches stage."""
    import ray
    import ray.data as rd

    need_ids = np.unique(
        np.concatenate(
            [
                pairs_tbl["a"].to_numpy(zero_copy_only=False),
                pairs_tbl["b"].to_numpy(zero_copy_only=False),
            ]
        )
    )
    need_arr = pa.array(need_ids, pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], need_arr))

    sets: dict[int, np.ndarray] = {}
    for bt in reps_ds.map_batches(keep, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        col = bt["shingles"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        for i, d in enumerate(bt["doc_id"].to_pylist()):
            sets[d] = flat[offs[i] : offs[i + 1]]
    sets_ref = ray.put(sets)

    def verify(batch: pa.Table) -> pa.Table:
        smap = ray.get(sets_ref)
        keep_mask = [
            _jaccard_from_sorted(smap[x], smap[y]) >= threshold
            for x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist())
        ]
        return batch.filter(pa.array(keep_mask))

    parts = list(
        rd.from_arrow(pairs_tbl)
        .map_batches(verify, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return pa.concat_tables(parts) if parts else pairs_tbl.slice(0, 0)


def _verify_pairs_cogrouped(pairs_ds, reps_ds, threshold: float,
                            num_buckets: int = 256):
    """Above-limit verify — the co-grouped JOIN form: no driver pair
    collect, no token-set broadcast.  Two bucketed exchanges:

    1. by doc_id — each pair contributes a row per side; co-grouped with
       the rep shingle rows, each side row picks up its shingle array;
    2. by pair key — the two sides of each (a, b) meet and the exact
       Jaccard decides.

    Driver memory is O(1); shuffle volume is O(pairs x set size) on the
    second exchange (inherent to join-based verify)."""

    def sides(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        n = len(a)
        empty_sh = pa.ListArray.from_arrays(
            pa.array(np.zeros(2 * n + 1, dtype=np.int32), pa.int32()),
            pa.array(np.empty(0, dtype=np.uint64), pa.uint64()),
        )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "a": pa.array(np.concatenate([a, a]), pa.int64()),
                "b": pa.array(np.concatenate([b, b]), pa.int64()),
                "shingles": empty_sh,
            }
        )

    def rep_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        neg = pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "a": neg,
                "b": neg,
                "shingles": batch["shingles"],
            }
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        from ..bucket_agg import _splitmix64

        return batch.append_column(
            "_b",
            pa.array((_splitmix64(d) % np.uint64(num_buckets)).astype(np.int64)),
        )

    def attach(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("doc_id", "ascending"), ("a", "ascending")]
        )
        tbl = group.take(order)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        col = tbl["shingles"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        out_a: list[int] = []
        out_b: list[int] = []
        out_doc: list[int] = []
        out_off = [0]
        out_flat: list[np.ndarray] = []
        n = len(ids)
        i = 0
        while i < n:
            j = i
            while j < n and ids[j] == ids[i]:
                j += 1
            # the rep row (a == -1) sorts first within the doc run
            if a[i] == -1:
                sh = flat[offs[i] : offs[i + 1]]
                for r in range(i + 1, j):
                    out_a.append(int(a[r]))
                    out_b.append(int(b[r]))
                    out_doc.append(int(ids[r]))
                    out_flat.append(sh)
                    out_off.append(out_off[-1] + len(sh))
            i = j
        flat_all = (
            np.concatenate(out_flat) if out_flat else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(out_off, pa.int32()), pa.array(flat_all, pa.uint64())
                ),
            }
        )

    def tag_pair(batch: pa.Table) -> pa.Table:
        from ..bucket_agg import _bucket_ids

        return batch.append_column(
            "_b", pa.array(_bucket_ids(batch, ["a", "b"], num_buckets), pa.int64())
        )

    def judge(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("a", "ascending"),
                ("b", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        tbl = group.take(order)
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        col = tbl["shingles"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        out_a: list[int] = []
        out_b: list[int] = []
        n = len(a)
        i = 0
        while i < n:
            j = i
            while j < n and a[j] == a[i] and b[j] == b[i]:
                j += 1
            if j - i == 2:  # both sides present exactly once
                side_a = i if ids[i] == a[i] else i + 1
                side_b = i + 1 if side_a == i else i
                sa = flat[offs[side_a] : offs[side_a + 1]]
                sb = flat[offs[side_b] : offs[side_b + 1]]
                if _jaccard_from_sorted(sa, sb) >= threshold:
                    out_a.append(int(a[i]))
                    out_b.append(int(b[i]))
            i = j
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
        )

    both = pairs_ds.map_batches(sides, batch_format="pyarrow").union(
        reps_ds.map_batches(rep_rows, batch_format="pyarrow")
    )
    attached = (
        both.map_batches(tag_doc, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(attach, batch_format="pyarrow")
    )
    return (
        attached.map_batches(tag_pair, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(judge, batch_format="pyarrow")
    )


def _expand_cogrouped(narrow_ds, nodes: np.ndarray, labels: np.ndarray,
                      num_buckets: int = 64):
    """Above-gate expand — co-grouped join on rep id: the (node, label)
    map enters the exchange as ~1M-row blocks, each bucket task joins
    ONLY its hash slice of the map against its slice of the doc->rep
    rows, so no task ever holds the whole label array (the broadcast
    form ships it entirely to every expand task).  Same output as the
    broadcast path (asserted by test with the gate forced to 0)."""
    import ray.data as rd

    from ..bucket_agg import _bucket_ids

    lbl_tbl = pa.table(
        {
            "rep": pa.array(nodes, pa.int64()),
            "doc_id": pa.array(np.full(len(nodes), -1, np.int64), pa.int64()),
            "gsize": pa.array(np.full(len(nodes), -1, np.int64), pa.int64()),
            "lbl": pa.array(labels, pa.int64()),
        }
    )
    blocks = [
        lbl_tbl.slice(i, 1_000_000)
        for i in range(0, lbl_tbl.num_rows, 1_000_000)
    ] or [lbl_tbl]
    lbl_ds = rd.from_arrow(blocks)

    def doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rep": batch["rep"],
                "doc_id": batch["doc_id"],
                "gsize": batch["gsize"],
                "lbl": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
            }
        )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_b",
            pa.array(_bucket_ids(batch, ["rep"], num_buckets), pa.int64()),
        )

    def join(group: pa.Table) -> pa.Table:
        gsz = group["gsize"].to_numpy(zero_copy_only=False)
        is_lbl = gsz == -1
        rep = group["rep"].to_numpy(zero_copy_only=False)
        ln = rep[is_lbl]
        lv = group["lbl"].to_numpy(zero_copy_only=False)[is_lbl]
        o = np.argsort(ln)
        ln, lv = ln[o], lv[o]
        rep_d = rep[~is_lbl]
        ids = group["doc_id"].to_numpy(zero_copy_only=False)[~is_lbl]
        gs = gsz[~is_lbl]
        if ln.size:
            pos = np.searchsorted(ln, rep_d).clip(max=len(ln) - 1)
            in_graph = ln[pos] == rep_d
            cluster = np.where(in_graph, lv[pos], rep_d)
        else:
            in_graph = np.zeros(len(rep_d), dtype=bool)
            cluster = rep_d
        keepm = in_graph | (gs >= 2)
        return pa.table(
            {
                "doc_id": pa.array(ids[keepm], pa.int64()),
                "cluster_id": pa.array(cluster[keepm], pa.int64()),
            }
        )

    both = narrow_ds.map_batches(doc_rows, batch_format="pyarrow").union(
        lbl_ds
    )
    return (
        both.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(join, batch_format="pyarrow")
    )


def minhash_dedup_clusters_ds(docs_ds, threshold: float = 0.8, num_bands=16,
                              rows_per_band=4, shingle_k=3,
                              text_col: str = "text",
                              max_bucket: int | None = None,
                              spill_registry: list | None = None):
    """Dataset form of ``minhash_dedup_clusters`` — the (doc_id,
    cluster_id) assignment as a STREAMING Ray Dataset, for the 100-TB
    action path (``.write_parquet`` the assignment, or co-group it with
    the corpus to drop losers) where even the dup-cluster membership
    list is too large to collect.  Unsorted; same rows as the table
    form.

    Full near-dup pipeline: shingle-set identity collapse -> LSH
    candidates over distinct sets -> exact Jaccard verify -> min-label
    connected components -> expand identity groups back in.

    Semantics are IDENTICAL to banding every doc (the SQL oracle's form):
    equal shingle sets are mutual candidates in every band with Jaccard
    exactly 1.0, so a component of the full verified pair graph is the
    union of the identity groups of the corresponding rep-level
    component, and the min-doc_id cluster label is preserved (rep = min
    of its group).  The collapse is what bounds the band-bucket pair
    blow-up: m copies of one document cost O(m), not O(m^2).

    Under ``_CLUSTER_DRIVER_LIMIT`` candidate pairs the verify broadcasts
    the candidate shingle sets (driver fast path); above it the verify is
    a co-grouped JOIN (``_verify_pairs_cogrouped``) and clustering runs
    the Dataset min-label form fed straight from the verified-edge
    Dataset (``_min_label_edges``) — no corpus-sized or pair-sized driver
    state on that path.  Returns (doc_id, cluster_id) for docs in
    near-dup groups, cluster_id = min doc_id of the group."""
    import ray
    import ray.data as rd

    shingled = docs_ds.map_batches(
        _ShingleDocs,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(shingle_k=shingle_k, text_col=text_col),
        concurrency=(1, 4),
    )
    # the collapsed table is corpus-scale (uint64 per token on rep rows);
    # it feeds two consumers (rep shingles -> bands/verify, narrow
    # doc->rep map -> expand), so it spills to parquet shards instead of
    # a mid-pipeline materialize that would pin it in the object store —
    # and each consumer re-reads ONLY its columns
    spill = _spill_to_parquet(
        _collapse_identity(shingled),
        "seekr_minhash_collapsed_",
        registry=spill_registry,
    )

    def rep_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["is_rep"])
        return t.select(["doc_id", "shingles"])

    reps_ds = rd.read_parquet(
        spill, columns=["doc_id", "is_rep", "shingles"]
    ).map_batches(rep_only, batch_format="pyarrow")
    band_rows = reps_ds.map_batches(
        _BandsFromShingles,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_bands=num_bands, rows_per_band=rows_per_band),
        concurrency=(1, 4),
    )
    pairs_ds = _pairs_from_band_rows(
        band_rows, max_bucket=max_bucket
    ).materialize()
    n_pairs = pairs_ds.count()

    nodes = np.empty(0, dtype=np.int64)
    labels = np.empty(0, dtype=np.int64)
    if n_pairs:
        if n_pairs <= _CLUSTER_DRIVER_LIMIT:
            pairs_tbl = pa.concat_tables(
                pairs_ds.iter_batches(batch_format="pyarrow")
            )
            verified = _verify_pairs_driver(pairs_tbl, reps_ds, threshold)
            if verified.num_rows:
                nodes, labels = _min_label_numpy(
                    verified["a"].to_numpy(zero_copy_only=False),
                    verified["b"].to_numpy(zero_copy_only=False),
                )
        else:
            verified_ds = _verify_pairs_cogrouped(pairs_ds, reps_ds, threshold)
            nodes, labels = _min_label_edges(verified_ds)

    # expand: every doc joins its rep's component; identity groups of
    # >= 2 docs whose rep is in no rep-level component are their own
    # cluster (their pairwise Jaccard is exactly 1.0) with label = rep.
    # The narrow (doc_id, rep, gsize) map streams back column-pruned —
    # the shingle payload never re-enters memory for this pass.
    narrow = rd.read_parquet(spill, columns=["doc_id", "rep", "gsize"])
    if len(nodes) > _EXPAND_BROADCAST_LIMIT:
        # bounded form: no task fetches the whole label map
        return _expand_cogrouped(narrow, nodes, labels)
    lbl_ref = ray.put((nodes, labels))

    def expand(batch: pa.Table) -> pa.Table:
        bn, bl = ray.get(lbl_ref)
        rep = batch["rep"].to_numpy(zero_copy_only=False)
        gsz = batch["gsize"].to_numpy(zero_copy_only=False)
        if bn.size:
            pos = np.searchsorted(bn, rep).clip(max=len(bn) - 1)
            in_graph = bn[pos] == rep
            cluster = np.where(in_graph, bl[pos], rep)
        else:
            in_graph = np.zeros(len(rep), dtype=bool)
            cluster = rep
        keepm = in_graph | (gsz >= 2)
        return pa.table(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[keepm],
                "cluster_id": pa.array(cluster[keepm], pa.int64()),
            }
        )

    return narrow.map_batches(expand, batch_format="pyarrow")


def minhash_dedup_clusters(docs_ds, threshold: float = 0.8, num_bands=16,
                           rows_per_band=4, shingle_k=3,
                           text_col: str = "text",
                           max_bucket: int | None = None) -> pa.Table:
    """Table form of the near-dup pipeline (collects + doc_id-sorts the
    assignment — fine for reports and the oracle contract; the 100-TB
    write path is ``minhash_dedup_clusters_ds``).  See that function
    for the full plan and the exactness argument."""
    import shutil

    spills: list[str] = []
    ds = minhash_dedup_clusters_ds(
        docs_ds, threshold, num_bands, rows_per_band, shingle_k, text_col,
        max_bucket, spill_registry=spills,
    )
    parts = [
        t for t in ds.iter_batches(batch_format="pyarrow") if t.num_rows
    ]
    for d in spills:  # fully drained: reclaim the spill eagerly
        shutil.rmtree(d, ignore_errors=True)
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
            }
        )
    out = pa.concat_tables(parts)
    order = pc.sort_indices(
        out, sort_keys=[("doc_id", "ascending"), ("cluster_id", "ascending")]
    )
    return out.take(order)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


# per-worker memo: token -> 64-bit md5 hash (tokens repeat heavily
# across documents).  md5 little-endian-first-8-bytes is EXACTLY DuckDB's
# md5_number_upper(), which makes simhash SQL-oracle-able (the blake2b
# form of rounds 1-2 was not expressible in the oracle dialect).
_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hashes(tokens: set[str]) -> np.ndarray:
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _CACHE_MAX:  # bound worker RSS on open vocabularies
        cache.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            cache[t] = h
        out[i] = h
    return out


_SIMHASH_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash; one vectorized (n_tokens, 64) bit matrix per doc
    instead of a python loop per token (same values as round 1)."""
    uniq = set(tokens)
    if not uniq:
        return 0
    h = _token_hashes(uniq)
    bits = (h[:, None] >> _SIMHASH_SHIFTS[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    weights = (np.uint64(1) << _SIMHASH_SHIFTS)[acc > 0]
    return int(weights.sum(dtype=np.uint64))


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


def embedding_neardup_pairs(
    emb_ds,
    threshold: float = 0.9,
    id_limit: int | None = None,
    chunk_rows: int = 4096,
):
    """Cosine >= threshold pairs (a < b) over the embeddings table —
    EXACT, distributed block-pair form.

    The embeddings Dataset is materialized in the object store and the
    driver holds only block refs plus (block, row-range) chunk
    descriptors (round-4 fix: the round-3 form pumped every row through
    a driver ``iter_batches``+``ray.put`` loop); one Ray task per
    (i <= j) chunk pair runs the numpy matmul and emits only the
    >= threshold pairs.  Nothing corpus-sized touches the driver; the
    comparison uses the 6dp-rounded cosine on BOTH sides (matching the
    rounded SQL oracle) so matmul-vs-sequential FP order cannot flip a
    boundary pair.  O(n^2) flops total but embarrassingly parallel and
    memory-bounded by 2 chunks per task; the sub-quadratic scale path is
    ``embedding_neardup_lsh``.
    """
    import ray

    def load(batch: pa.Table) -> pa.Table:
        if id_limit is not None:
            batch = batch.filter(pc.less(batch["vec_id"], id_limit))
        return batch.select(["vec_id", "embedding"])

    loaded = emb_ds.map_batches(load, batch_format="pyarrow").materialize()
    chunks: list[tuple] = []
    for bundle in loaded.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            n = meta.num_rows or 0
            for lo in range(0, n, chunk_rows):
                chunks.append((ref, lo, min(lo + chunk_rows, n)))
    if not chunks:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )

    def _unpack(block: pa.Table, lo: int, hi: int):
        # zero-copy flatten+reshape (similarity._to_matrix), NOT a
        # per-row pylist stack: a chunk is unpacked by ~C pair tasks,
        # so the conversion must be near-free
        from .similarity import _to_matrix

        t = block.slice(lo, hi - lo)
        return (
            t["vec_id"].to_numpy(zero_copy_only=False),
            _to_matrix(t["embedding"]),
        )

    @ray.remote
    def pair_task(block_i, lo_i, hi_i, block_j, lo_j, hj, same: bool):
        ids_i, mat_i = _unpack(block_i, lo_i, hi_i)
        if same:
            ids_j, mat_j = ids_i, mat_i
        else:
            ids_j, mat_j = _unpack(block_j, lo_j, hj)
        ni = np.linalg.norm(mat_i, axis=1)
        nj = np.linalg.norm(mat_j, axis=1)
        ni[ni == 0] = 1.0
        nj[nj == 0] = 1.0
        # dot/(|a|*|b|) — DuckDB list_cosine_similarity's formulation
        sims = (mat_i @ mat_j.T) / (ni[:, None] * nj[None, :])
        # vectorized round6 (half-away-from-zero to 6dp)
        sims = np.copysign(np.floor(np.abs(sims) * 1e6 + 0.5), sims) / 1e6
        ii, jj = np.nonzero(sims >= threshold)
        a_ids = ids_i[ii]
        b_ids = ids_j[jj]
        keep = a_ids < b_ids if same else np.ones(len(a_ids), dtype=bool)
        if not same:
            lo = np.minimum(a_ids, b_ids)
            hi = np.maximum(a_ids, b_ids)
            a_ids, b_ids = lo, hi
        return (
            a_ids[keep],
            b_ids[keep],
            sims[ii[keep], jj[keep]],
        )

    futures = []
    for i in range(len(chunks)):
        ri, li, hi_i = chunks[i]
        for j in range(i, len(chunks)):
            rj, lj, hj = chunks[j]
            futures.append(pair_task.remote(ri, li, hi_i, rj, lj, hj, i == j))
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    c_out: list[np.ndarray] = []
    for a_ids, b_ids, cs in ray.get(futures):
        a_out.append(a_ids)
        b_out.append(b_ids)
        c_out.append(cs)
    a_all = np.concatenate(a_out) if a_out else np.empty(0, dtype=np.int64)
    b_all = np.concatenate(b_out) if b_out else np.empty(0, dtype=np.int64)
    c_all = np.concatenate(c_out) if c_out else np.empty(0)
    order = np.lexsort((b_all, a_all))
    return pa.table(
        {
            "a": pa.array(a_all[order].astype(np.int64), pa.int64()),
            "b": pa.array(b_all[order].astype(np.int64), pa.int64()),
            "cos": pa.array(c_all[order], pa.float64()),
        }
    )


def embedding_neardup_lsh(
    emb_ds,
    threshold: float = 0.9,
    id_limit: int | None = None,
    nbits: int = 6,
    seed: int = 13,
):
    """Approximate near-dup pairs: hyperplane-LSH bucket the vectors
    (reusing similarity.py's signature scheme), exact cosine only WITHIN
    each bucket — the sub-quadratic scale path of
    ``embedding_neardup_pairs``.  Recall < 1 by construction (pairs whose
    endpoints land in different buckets are missed); tests assert recall
    against the exact operator on the fixture table."""
    import ray

    from .similarity import _LshBucketer, _unit

    # infer dim from the first non-empty batch
    first = None
    for batch in emb_ds.iter_batches(batch_format="pyarrow"):
        if batch.num_rows:
            first = np.asarray(batch["embedding"][0].as_py(), dtype=np.float64)
            break
    if first is None:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, len(first)))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        if id_limit is not None:
            batch = batch.filter(pc.less(batch["vec_id"], id_limit))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch["embedding"] if "embedding" in batch.column_names else pa.array([], pa.list_(pa.float64())),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        b = _LshBucketer(planes_ref)
        return b(batch)

    bucketed = emb_ds.map_batches(bucketize, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in group["embedding"].to_pylist()]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ mat.T) / (norms[:, None] * norms[None, :])
        sims = np.copysign(np.floor(np.abs(sims) * 1e6 + 0.5), sims) / 1e6
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a_ids, b_ids = ids[ii], ids[jj]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pa.table(
            {
                "a": pa.array(lo.astype(np.int64), pa.int64()),
                "b": pa.array(hi.astype(np.int64), pa.int64()),
                "cos": pa.array(sims[ii, jj], pa.float64()),
            }
        )

    out_batches = list(
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    tbl = (
        pa.concat_tables(out_batches)
        if out_batches
        else pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
    )
    order = np.lexsort(
        (
            tbl["b"].to_numpy(zero_copy_only=False),
            tbl["a"].to_numpy(zero_copy_only=False),
        )
    )
    return tbl.take(order)


# ---------------------------------------------------------------------------
# exact duplicated-span detection (substring-level dedup)
# ---------------------------------------------------------------------------


def duplicate_ngram_spans(docs_ds, *, k: int = 5, min_docs: int = 2,
                          text_col: str = "text", id_col: str = "doc_id"):
    """Exact duplicated k-token spans across documents — the
    substring-level dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a span repeated across
    >= ``min_docs`` documents marks boilerplate/copied text that
    document-level dedup (exact sha / MinHash) cannot see.

    Per-block partial: each doc's k-token shingles are counted locally;
    because a document is exactly one input row, per-shingle DISTINCT-doc
    counts are additive across blocks, so (n_docs, n_occurrences,
    min_doc) all merge under sum/sum/min and the exchange carries one row
    per distinct shingle per block — never one per occurrence.

    Output: ``(shingle, n_docs, n_occ, keep_doc_id)`` for spans seen in
    >= ``min_docs`` distinct docs; ``keep_doc_id`` is the smallest doc id
    containing the span (the canonical copy under first-wins dedup,
    mirroring B6's winner rule).
    """
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, list] = {}
        for d, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = simple_tokens(text or "")
            if len(toks) < k:
                continue
            counts = Counter(
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
            for sh, n in counts.items():
                e = acc.get(sh)
                if e is None:
                    acc[sh] = [1, n, d]
                else:
                    e[0] += 1
                    e[1] += n
                    if d < e[2]:
                        e[2] = d
        return pa.table(
            {
                "shingle": pa.array(list(acc.keys()), pa.string()),
                "nd": pa.array([e[0] for e in acc.values()], pa.int64()),
                "no": pa.array([e[1] for e in acc.values()], pa.int64()),
                "md": pa.array([e[2] for e in acc.values()], pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        nd = batch["sum(nd)"]
        keep = pc.greater_equal(nd, pa.scalar(min_docs))
        tbl = batch.filter(keep)
        return pa.table(
            {
                "shingle": tbl["shingle"],
                "n_docs": pc.cast(tbl["sum(nd)"], pa.int64()),
                "n_occ": pc.cast(tbl["sum(no)"], pa.int64()),
                "keep_doc_id": pc.cast(tbl["min(md)"], pa.int64()),
            }
        )

    return bucketed_group_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        "shingle",
        [("nd", "sum"), ("no", "sum"), ("md", "min")],
    ).map_batches(finalize, batch_format="pyarrow")


def ngram_jaccard_pairs_prefix(
    docs_ds,
    k: int = 3,
    threshold_mille: int = 500,
    text_col: str = "text",
    num_buckets: int = 64,
    driver_rank_limit: int = 2_000_000,
    heavy_k: int = 100_000,
):
    """EXACT Jaccard >= t join via prefix filtering (PPJoin / Vernica et
    al. 2010) — the sub-quadratic scale path for what
    ``ngram_jaccard_pairs`` computes by brute-force block pairs.

    Prefix-filter theorem: order every shingle by one GLOBAL total order
    (rarity-first here); if two sets have Jaccard >= t they must share
    an element within their first ``n - ceil(t*n) + 1`` ordered elements.
    So each doc replicates (doc_id, ranked set) only under its PREFIX
    shingles, a ``groupby(prefix)`` co-locates candidates — rare-first
    ordering keeps those groups tiny — and pairs verify exactly
    in-group.  Compared to the O(n^2) block-pair form, work scales with
    candidate count, not document pairs.

    ``threshold_mille`` is the threshold in integer per-mille so the
    prefix length ``n - (t_mille*n + 999)//1000 + 1`` is exact integer
    arithmetic (an FP ceil that rounds up would shrink the prefix and
    silently MISS pairs).

    Global order, two regimes (correct with ANY global total order —
    rarity ordering is only the candidate-count heuristic, so the two
    regimes produce the SAME pair set, asserted by test):

    - vocab <= ``driver_rank_limit``: exact dense rarity ranks, the
      full df table collected once and broadcast (cheapest per-batch
      lookup when the vocabulary fits the driver).
    - vocab > ``driver_rank_limit`` (the 100-TB path): NO full-vocab
      driver collect.  Only the ``heavy_k`` highest-df shingles are
      collected (per-block partial top-k, then a driver top-k over
      O(blocks x heavy_k) rows) and broadcast as a (hash -> df) lookup;
      every other shingle gets df=0.  The total order is then
      (df_or_0, hash): the frequent shingles — the ones whose prefix
      groups would blow up quadratic verify — still sort LAST, and the
      unranked tail orders by hash.  Broadcast state is O(heavy_k),
      independent of vocabulary size.

    Output: a lazy Dataset of ``(a, b, jaccard)`` rows in shuffle order
    — the same PAIR SET and values as ``ngram_jaccard_pairs`` (asserted
    by test after sorting), which returns a lexsorted driver table
    instead.
    """
    import ray

    t = threshold_mille / 1000.0

    def to_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        offsets = [0]
        flats: list[np.ndarray] = []
        for text in batch[text_col].to_pylist():
            h = _shingle_hashes(simple_tokens(text or ""), k)
            flats.append(h)
            offsets.append(offsets[-1] + len(h))
        flat = (
            np.concatenate(flats) if flats else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(flat, pa.uint64())
                ),
            }
        )

    # the (doc_id, shingle hashes) table feeds two consumers (df pass +
    # prefix emit) but is corpus-scale (uint64 per token), so it spills
    # to parquet shards and each consumer streams it back — recomputing
    # would re-read and re-shingle the corpus, materializing would pin
    # ~corpus bytes in the object store for the pipeline's lifetime
    import ray.data as rd

    shingled = rd.read_parquet(
        _spill_to_parquet(
            docs_ds.map_batches(to_shingles, batch_format="pyarrow"),
            "seekr_ppjoin_shingles_",
        )
    )

    # global rarity order: df per shingle (sets are distinct per doc, so
    # block-local counts merge under sum), collected once — O(vocab)
    def df_partial(batch: pa.Table) -> pa.Table:
        col = batch["shingles"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        un, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "h": pa.array(un, pa.uint64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    # df per shingle (sets are distinct per doc, so block-local counts
    # merge under sum) — kept DISTRIBUTED; spilled to parquet because
    # two things consume it (the row count gate and whichever rank build
    # runs) and at open vocabularies it is ~distinct-shingle scale; the
    # count comes free from parquet metadata
    dfs_ds = rd.read_parquet(
        _spill_to_parquet(
            bucketed_group_agg(
                shingled.map_batches(df_partial, batch_format="pyarrow"),
                "h",
                [("c", "sum")],
            ),
            "seekr_ppjoin_dfs_",
        )
    )
    n_vocab = dfs_ds.count()
    if n_vocab <= driver_rank_limit:
        # small-vocab regime: exact dense rarity ranks, one O(vocab)
        # collect
        dfs = dfs_ds.to_pandas()
        hs = dfs["h"].to_numpy().astype(np.uint64)
        cs = dfs["sum(c)"].to_numpy()
        order = np.lexsort((hs, cs))  # rarity-first, hash tie-break
        rank_of = np.empty(len(hs), np.int64)
        rank_of[order] = np.arange(len(hs))
        keys_sorted = np.sort(hs)
        ranks_for_keys = rank_of[np.argsort(hs)]
        order_ref = ray.put(("dense", keys_sorted, ranks_for_keys))
    else:
        # scale regime: never collect the full vocab — take only the
        # heavy_k most frequent shingles (per-block partial top-k, then
        # driver top-k over O(blocks x heavy_k) rows; a tree merge
        # replaces the driver step when blocks x heavy_k outgrows it)
        def topk_block(batch: pa.Table) -> pa.Table:
            if batch.num_rows <= heavy_k:
                return batch
            c = batch["sum(c)"].to_numpy(zero_copy_only=False)
            idx = np.argpartition(c, batch.num_rows - heavy_k)[
                batch.num_rows - heavy_k :
            ]
            return batch.take(pa.array(idx))

        part = dfs_ds.map_batches(
            topk_block, batch_format="pyarrow"
        ).to_pandas()
        hs = part["h"].to_numpy().astype(np.uint64)
        cs = part["sum(c)"].to_numpy().astype(np.int64)
        if len(hs) > heavy_k:
            keep = np.argpartition(cs, len(cs) - heavy_k)[
                len(cs) - heavy_k :
            ]
            hs, cs = hs[keep], cs[keep]
        o = np.argsort(hs)
        order_ref = ray.put(("heavy", hs[o], cs[o]))

    def emit_prefix(batch: pa.Table) -> pa.Table:
        mode, keys, vals = ray.get(order_ref)
        col = batch["shingles"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_pref: list[int] = []
        out_id: list[int] = []
        out_sets: list[np.ndarray] = []
        set_offsets = [0]
        for x in range(len(ids)):
            s = flat[offs[x] : offs[x + 1]]
            n = len(s)
            if n == 0:
                continue
            if mode == "dense":
                r = np.sort(vals[np.searchsorted(keys, s)])
            else:
                # (df_or_0, hash) total order; set elements are the
                # hashes themselves (int64-viewed) — verify only needs
                # a consistent unique representation to intersect
                if len(keys):
                    pos = np.minimum(
                        np.searchsorted(keys, s), len(keys) - 1
                    )
                    dfv = np.where(keys[pos] == s, vals[pos], 0)
                else:
                    dfv = np.zeros(len(s), np.int64)
                r = s[np.lexsort((s, dfv))].view(np.int64)
            # prefix length at t - 1e-6 (micro units): the verify step —
            # like the brute-force form and the SQL oracle — accepts on
            # the 6dp-ROUNDED jaccard, so a pair with true J in
            # [t - 5e-7, t) can still be emitted; the slack keeps the
            # theorem's co-grouping guarantee covering that band
            t_micro = threshold_mille * 1000 - 1
            p = n - (t_micro * n + 999_999) // 1_000_000 + 1
            for pr in r[:p]:
                out_pref.append(int(pr))
                out_id.append(int(ids[x]))
                out_sets.append(r)
                set_offsets.append(set_offsets[-1] + n)
        flat_sets = (
            np.concatenate(out_sets)
            if out_sets
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "_b": pa.array(
                    np.asarray(out_pref, np.int64) % num_buckets, pa.int64()
                ),
                "pref": pa.array(out_pref, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "set": pa.ListArray.from_arrays(
                    pa.array(set_offsets, pa.int32()),
                    pa.array(flat_sets, pa.int64()),
                ),
            }
        )

    def verify_group(group: pa.Table) -> pa.Table:
        prefs = group["pref"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        col = group["set"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        order = np.argsort(prefs, kind="stable")
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and prefs[order[j]] == prefs[order[i]]:
                j += 1
            grp = order[i:j]
            for x in range(len(grp)):
                gx = grp[x]
                sa = flat[offs[gx] : offs[gx + 1]]
                for y in range(x + 1, len(grp)):
                    gy = grp[y]
                    ia, ib = int(ids[gx]), int(ids[gy])
                    if ia == ib:
                        continue
                    sb = flat[offs[gy] : offs[gy + 1]]
                    inter = np.intersect1d(sa, sb, assume_unique=True).size
                    union = len(sa) + len(sb) - inter
                    jc = round6(inter / union)
                    if jc >= t:
                        lo, hi = (ia, ib) if ia < ib else (ib, ia)
                        out_a.append(lo)
                        out_b.append(hi)
                        out_j.append(jc)
            i = j
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    def dedup_pair(group: pa.Table) -> pa.Table:
        return group.select(["a", "b", "jaccard"]).slice(0, 1)

    return (
        shingled.map_batches(emit_prefix, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(verify_group, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(dedup_pair, batch_format="pyarrow")
    )


def simhash_near_pairs(
    docs_ds,
    *,
    max_hamming: int = 3,
    num_bands: int = 4,
    text_col: str = "text",
):
    """Banded simhash near-dup pairs: ``(a, b, hamming)`` for doc pairs
    whose 64-bit simhash fingerprints differ in ≤ ``max_hamming`` bits.

    This is the SCALE PATH for simhash dedup (simhash_fingerprints
    computes the fingerprints; this finds the close pairs without an
    O(n²) cross join): the fingerprint splits into ``num_bands``
    16-bit bands and only docs sharing an exact band value in the same
    band position ever meet — by pigeonhole, any pair within hamming
    ``d < num_bands`` shares at least one intact band, so recall is
    exact (the oracle mirrors the same banding, so the compare is
    bit-equal by construction, not by probabilistic luck).

    Exchange: ONE groupby keyed by (band_idx, band_value) — candidate
    volume is O(Σ bucket²), tiny on fingerprint-diverse corpora; a
    follow-up bucketed distinct collapses pairs found in multiple
    bands.  Verify (xor + popcount) is vectorized per group.
    """
    fps = simhash_fingerprints(docs_ds, text_col=text_col)
    return banded_hamming_pairs(
        fps,
        max_hamming=max_hamming,
        num_bands=num_bands,
        id_col="doc_id",
        hash_col="simhash",
    )


def banded_hamming_pairs(
    fps_ds,
    *,
    max_hamming: int = 3,
    num_bands: int = 4,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
):
    """Generic banded hamming-pair finder over any 64-bit fingerprint
    column (signed int64 two's-complement) — shared by the simhash text
    path and the perceptual-hash image path (extras/multimodal).  Same
    pigeonhole recall guarantee and exchange shape as
    ``simhash_near_pairs``."""
    if num_bands * 16 != 64:
        raise ValueError("num_bands must split a 64-bit fingerprint")
    if max_hamming >= num_bands:
        raise ValueError("recall guarantee needs max_hamming < num_bands")

    def band(batch: pa.Table) -> pa.Table:
        doc = batch[id_col].to_numpy(zero_copy_only=False)
        u = batch[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        outs = []
        for j in range(num_bands):
            bv = ((u >> np.uint64(16 * j)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            outs.append(
                pa.table(
                    {
                        "key": pa.array(
                            np.int64(j) * np.int64(1 << 16) + bv, pa.int64()
                        ),
                        "doc_id": pa.array(doc, pa.int64()),
                        "u": pa.array(u.view(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        u = group["u"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(doc, kind="stable")
        doc, u = doc[order], u[order]
        ia, ib = np.triu_indices(len(doc), k=1)
        if not len(ia):
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        x = u[ia] ^ u[ib]
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(doc[ia[keep]], pa.int64()),
                "b": pa.array(doc[ib[keep]], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    def distinct_pairs(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_b"])
        order = pc.sort_indices(
            t, sort_keys=[("a", "ascending"), ("b", "ascending")]
        )
        t = t.take(order)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(a), bool)
        if len(a):
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return t.filter(pa.array(keep))

    def tag_pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_b", pa.array((a % 64).astype(np.int64), pa.int64())
        )

    return (
        fps_ds.map_batches(band, batch_format="pyarrow")
        .groupby("key")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .map_batches(tag_pair_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(distinct_pairs, batch_format="pyarrow")
    )


# -- containment join ---------------------------------------------------------


def containment_pairs(
    docs_ds,
    *,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Directed pairs where |S(src) ∩ S(dst)| / |S(src)| >= threshold
    over k-shingle sets — the ASYMMETRIC near-copy relation Jaccard
    misses: a short document quoted wholesale inside a long one has
    high containment but low Jaccard (the union is dominated by the
    long side), so quote / excerpt / template detection needs this
    form.  Output: (src_doc, in_doc, inter, size_src, containment).

    Shape is the APSS discipline (extras/apss.py), not the block-pair
    jaccard form: md5(shingle)-bucketed posting rows make per-bucket
    intersection partials globally correct; pairs_within_runs emits
    canonical pair partials per shingle run; one groupby sums them;
    two copart.attach_value passes stamp |S(a)| and |S(b)|; each
    canonical pair then yields up to two directed rows.  Intersection
    counts use 64-bit shingle hashes — equal to the string-set SQL
    oracle up to a ~2^-64 collision (the ngram_jaccard_pairs note).
    """
    from .copart import attach_value, pairs_within_runs

    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_b, out_h, out_d = [], [], []
        size_d, size_n = [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = np.unique(_shingle_hashes(simple_tokens(text or ""), k))
            out_h.append(h)
            out_d.append(np.full(len(h), did, np.int64))
            size_d.append(did)
            size_n.append(len(h))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        d = np.concatenate(out_d) if out_d else np.empty(0, np.int64)
        return pa.table(
            {
                "_sb": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "h": pa.array(h, pa.uint64()),
                "doc_id": pa.array(d, pa.int64()),
            }
        )

    def sizes(batch: pa.Table) -> pa.Table:
        ids, ns = [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            ids.append(did)
            ns.append(
                len(np.unique(_shingle_hashes(simple_tokens(text or ""), k)))
            )
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "value": pa.array(ns, pa.int64()),
            }
        )

    def inter_partials(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(
            np.concatenate(([True], h[1:] != h[:-1])) if len(h) else []
        )
        ends = np.append(starts[1:], len(h))
        x, y = pairs_within_runs(d, starts, ends)
        if len(x) and (x.max() >= (1 << 32) or y.max() >= (1 << 32)):
            raise ValueError(
                "containment_pairs packs doc ids into uint32 halves"
            )
        key = (x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "_pb": pa.array(
                    (uk % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(uk, pa.uint64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def sum_pairs(group: pa.Table) -> pa.Table:
        key = group["k"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, n)
        return pa.table(
            {
                "doc_a": pa.array(
                    (uk >> np.uint64(32)).astype(np.int64), pa.int64()
                ),
                "doc_b": pa.array(
                    (uk & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
                "inter": pa.array(tot, pa.int64()),
            }
        )

    size_ds = docs_ds.map_batches(sizes, batch_format="pyarrow").materialize()
    pairs = (
        docs_ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("_sb")
        .map_groups(inter_partials, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(sum_pairs, batch_format="pyarrow")
    )
    with_a = attach_value(
        pairs,
        size_ds,
        key_col="doc_a",
        out_col="size_a",
        carry=["doc_b", "inter"],
        num_buckets=num_buckets,
    )
    with_b = attach_value(
        with_a,
        size_ds,
        key_col="doc_b",
        out_col="size_b",
        carry=["doc_a", "inter", "size_a"],
        num_buckets=num_buckets,
    )

    def directed(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        it = batch["inter"].to_numpy(zero_copy_only=False)
        sa = batch["size_a"].to_numpy(zero_copy_only=False)
        sb = batch["size_b"].to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        inter = np.concatenate([it, it])
        ssz = np.concatenate([sa, sb])
        # one mirrored expression: inter::DOUBLE / size_src
        c = inter.astype(np.float64) / ssz.astype(np.float64)
        m = c >= threshold
        return pa.table(
            {
                "src_doc": pa.array(src[m], pa.int64()),
                "in_doc": pa.array(dst[m], pa.int64()),
                "inter": pa.array(inter[m], pa.int64()),
                "size_src": pa.array(ssz[m], pa.int64()),
                "containment": pa.array(np.round(c[m], 6), pa.float64()),
            }
        )

    return with_b.map_batches(directed, batch_format="pyarrow")
