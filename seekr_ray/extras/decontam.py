"""Benchmark decontamination — flag training docs that overlap an
evaluation set.

The standard LLM-training-data hygiene step (Brown et al. 2020 §C;
Dodge et al. 2021): a training document is *contaminated* if it shares
at least one k-token shingle with any benchmark document.  The
benchmark side is small by definition (eval sets are thousands of rows,
the corpus is billions), so this is the canonical broadcast semi-join:

1. benchmark shingle sets are computed where the benchmark rows live
   (``map_batches``), unioned into one frozenset on the driver
   (O(benchmark tokens) — bounded), and published ONCE with ``ray.put``;
2. the corpus streams through a single ``map_batches`` pass that counts
   each doc's distinct shingles hitting the broadcast set — no shuffle,
   no corpus materialization, and the corpus side never re-ships the
   set (every task reads the same object-store copy).

At 100 TB the corpus pass is embarrassingly parallel; only the
benchmark collect is driver-side, and it scales with the *eval* set.
Shingling follows extras/dedup.duplicate_ngram_spans: simplified shared
tokenization, docs shorter than ``k`` tokens produce no shingles (and
so can never be contaminated).

Reference anchor: the crawler's content-hash dedup (`Crawler.java:163-169`)
is the exact-duplicate special case of this filter; decontamination
generalizes it to cross-set partial overlap.
"""

from __future__ import annotations

import pyarrow as pa

from .textstats import simple_tokens


def _doc_shingles(text: str, k: int) -> set[str]:
    toks = simple_tokens(text or "")
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def benchmark_shingles(
    bench_ds, *, k: int = 5, text_col: str = "text"
) -> frozenset[str]:
    """Distinct k-token shingles of the benchmark set.  Shingle sets are
    built per block where the rows live; only the deduplicated string
    sets travel to the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for text in batch[text_col].to_pylist():
            out |= _doc_shingles(text, k)
        return pa.table({"shingle": pa.array(sorted(out), pa.string())})

    blocks = bench_ds.map_batches(partial, batch_format="pyarrow")
    acc: set[str] = set()
    for b in blocks.iter_batches(batch_format="pyarrow"):
        acc.update(b["shingle"].to_pylist())
    return frozenset(acc)


def decontaminate(
    docs_ds,
    bench_set: frozenset[str],
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_clean: bool = False,
):
    """Flag (or drop) corpus docs overlapping the benchmark shingle set.

    ``keep_clean=False`` (audit mode) returns the contamination report
    ``(doc_id, n_overlap)`` — one row per contaminated doc with the
    count of its distinct shingles found in the benchmark.
    ``keep_clean=True`` (filter mode) returns the clean docs unchanged
    (the production path: feed the survivors onward).
    """
    import ray

    bench_ref = ray.put(bench_set)

    def audit(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids, overlaps = [], []
        for d, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            n = sum(1 for s in _doc_shingles(text, k) if s in bench)
            if n:
                ids.append(d)
                overlaps.append(n)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_overlap": pa.array(overlaps, pa.int64()),
            }
        )

    def clean(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        mask = [
            not any(s in bench for s in _doc_shingles(text, k))
            for text in batch[text_col].to_pylist()
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    fn = clean if keep_clean else audit
    return docs_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the fixed-memory scale path
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16  # bits in the filter (8 KiB bitmap)
BLOOM_K = 4  # hash functions per shingle


def _bloom_pos(shingle: str, j: int, m_bits: int) -> int:
    """Bit position of hash j for a shingle: md5-LE first 8 bytes of the
    salted string ``f"{j}#{shingle}"`` mod m — equals DuckDB
    ``md5_number_upper(j::VARCHAR || '#' || s) % m``, which makes the
    whole filter (and therefore its false positives) bit-exact
    SQL-replicable."""
    import hashlib

    h = hashlib.md5(f"{j}#{shingle}".encode()).digest()
    return int.from_bytes(h[:8], "little") % m_bits


def benchmark_bloom(
    bench_ds,
    *,
    k: int = 5,
    text_col: str = "text",
    m_bits: int = BLOOM_M,
    k_hashes: int = BLOOM_K,
):
    """Bloom bitmap (numpy bool[m_bits]) over the benchmark's distinct
    k-token shingles.

    This is ``benchmark_shingles``'s 100-TB form: the broadcast state is
    a FIXED-SIZE bitmap (m/8 bytes — 8 KiB at the default) instead of an
    O(benchmark-shingles) string set, so the eval side can itself be
    arbitrarily large.  Per block each worker emits its DISTINCT bit
    positions (≤ m rows — the canonical mergeable-sketch exchange, same
    shape as hll_token_registers); the driver ORs them into the bitmap,
    O(m) bounded state regardless of input size.  Membership says
    "maybe" with false-positive rate ≈ (1−e^{−kn/m})^k — at the default
    m=65536, k=4 that is <1% up to ~6k distinct shingles; size m_bits to
    the eval set (the corpus size never matters)."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        pos: set[int] = set()
        for text in batch[text_col].to_pylist():
            for s in _doc_shingles(text, k):
                for j in range(k_hashes):
                    pos.add(_bloom_pos(s, j, m_bits))
        return pa.table({"pos": pa.array(sorted(pos), pa.int64())})

    bits = np.zeros(m_bits, np.bool_)
    blocks = bench_ds.map_batches(partial, batch_format="pyarrow")
    for b in blocks.iter_batches(batch_format="pyarrow"):
        bits[b["pos"].to_numpy()] = True
    return bits


def bloom_decontaminate(
    docs_ds,
    bits,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_hashes: int = BLOOM_K,
    keep_clean: bool = False,
):
    """Flag (or drop) corpus docs whose shingles hit the benchmark Bloom
    filter.  Audit mode returns ``(doc_id, n_maybe)`` — the count of the
    doc's DISTINCT shingles whose k_hashes positions are all set
    (deterministic, so the oracle reproduces even the false positives).
    Filter mode keeps only docs with zero maybe-hits: a conservative
    decontamination (false positives drop clean docs at the filter's fp
    rate, never the reverse).

    The bitmap broadcasts once via ``ray.put`` (m/8 bytes packed); every
    corpus task reads the same object-store copy — no shuffle, no
    per-batch re-ship, identical streaming shape to ``decontaminate``."""
    import numpy as np
    import ray

    m_bits = len(bits)
    bits_ref = ray.put(np.packbits(np.asarray(bits, np.bool_)))

    def _doc_hits(text: str, unpacked) -> int:
        n = 0
        for s in _doc_shingles(text, k):
            if all(
                unpacked[_bloom_pos(s, j, m_bits)] for j in range(k_hashes)
            ):
                n += 1
        return n

    def audit(batch: pa.Table) -> pa.Table:
        unpacked = np.unpackbits(ray.get(bits_ref)).view(np.bool_)
        ids, hits = [], []
        for d, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            n = _doc_hits(text, unpacked)
            if n:
                ids.append(d)
                hits.append(n)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_maybe": pa.array(hits, pa.int64()),
            }
        )

    def clean(batch: pa.Table) -> pa.Table:
        unpacked = np.unpackbits(ray.get(bits_ref)).view(np.bool_)
        mask = [
            _doc_hits(text, unpacked) == 0
            for text in batch[text_col].to_pylist()
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    fn = clean if keep_clean else audit
    return docs_ds.map_batches(fn, batch_format="pyarrow")
