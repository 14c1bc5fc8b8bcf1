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
