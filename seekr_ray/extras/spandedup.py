"""Exact duplicate-SPAN removal — the substring-level dedup of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022): a k-token window that occurs at two or more positions anywhere in
the corpus is boilerplate, and every token it covers is cut from every
document.  Catches the license headers / generated stubs / templated
blocks that doc-level (exact or MinHash) dedup leaves untouched.

Token-space semantics (documented, SQL-oracle-able): documents tokenize
with the shared ``simple_tokens`` law, duplication is decided on the
64-bit positional k-gram hashes (md5-token + polynomial combine — the
exact law DuckDB replays via ``md5_number_upper`` + UHUGEINT
arithmetic), a token is REMOVED iff some duplicated window covers it,
and the rewritten doc is the kept tokens joined by single spaces.

Plan (100 TB honest, three narrow exchanges, no broadcast of anything
corpus-sized):

1. docs -> (hash, doc_id, pos) positional k-gram rows (``map_batches``);
2. bucket by hash -> positions whose hash count across the corpus >= 2
   flow back out as (doc_id, pos) rows — the duplicated-window set
   never lands on the driver;
3. bucket by doc_id, co-grouped with the documents table -> per-doc
   coverage mask (vectorized difference array over flagged starts) and
   the rewritten text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bucket_agg import _splitmix64
from .dedup import _batch_simple_token_hashes, _window_powers
from .textstats import simple_tokens


def _span_pipeline(docs_ds, *, k: int, text_col: str,
                   num_buckets: int, emit: str):
    """Shared three-exchange span-dedup pipeline; ``emit="stats"``
    yields the per-doc report, ``emit="text"`` the rewritten corpus."""

    def kgram_rows(batch: pa.Table) -> pa.Table:
        """Vectorized: one Arrow-regex tokenize + dictionary md5 pass
        for the whole batch (``_batch_simple_token_hashes``), then ALL
        window hashes in k shifted uint64 multiplies over the flat
        token-hash stream; per-doc validity is offsets math (windows
        crossing a doc boundary are computed but never selected).
        Value-identical to the per-doc
        ``_shingle_hashes_positional(simple_tokens(text), k)`` loop
        (golden test)."""
        th, lens = _batch_simple_token_hashes(batch[text_col])
        nw = np.maximum(lens - k + 1, 0)
        total_w = int(nw.sum())
        if total_w == 0:
            flat = np.empty(0, dtype=np.uint64)
            return pa.table(
                {
                    "h": pa.array(flat, pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int64()),
                }
            )
        n_docs = len(lens)
        doc_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=doc_starts[1:])
        w_doc = np.repeat(np.arange(n_docs, dtype=np.int64), nw)
        w_off = np.cumsum(nw) - nw
        pos = np.arange(total_w, dtype=np.int64) - w_off[w_doc]
        g = doc_starts[w_doc] + pos
        n_global = len(th) - k + 1
        powers = _window_powers(k)
        with np.errstate(over="ignore"):
            acc = np.zeros(n_global, dtype=np.uint64)
            for w in range(k):
                acc += th[w : w + n_global] * powers[w]
        flat = acc[g]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[w_doc]
        return pa.table(
            {
                "h": pa.array(flat, pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "_b": pa.array(
                    (_splitmix64(flat) % np.uint64(num_buckets)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    def dup_positions(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("h", "ascending")])
        t = group.take(order)
        h = t["h"].to_numpy(zero_copy_only=False)
        n = len(h)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = h[1:] != h[:-1]
        run_ids = np.cumsum(change) - 1
        counts = np.bincount(run_ids)
        dup = counts[run_ids] >= 2
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(dup)),
                "pos": t["pos"].filter(pa.array(dup)),
            }
        )

    flagged = (
        docs_ds.map_batches(kgram_rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(dup_positions, batch_format="pyarrow")
    )

    # stage 3: co-group flagged starts with the documents by doc_id
    def tag_doc(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "_b",
            pa.array(
                (_splitmix64(d) % np.uint64(num_buckets)).astype(np.int64)
            ),
        )

    def flag_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pos": batch["pos"],
                text_col: pa.array([""] * batch.num_rows, pa.large_string()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pos": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
                text_col: pc.cast(batch[text_col], pa.large_string()),
            }
        )

    both = flagged.map_batches(flag_rows, batch_format="pyarrow").union(
        docs_ds.select_columns(["doc_id", text_col]).map_batches(
            doc_rows, batch_format="pyarrow"
        )
    )

    def rewrite(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("doc_id", "ascending"), ("pos", "ascending")]
        )
        t = group.take(order)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id: list[int] = []
        out_nt: list[int] = []
        out_nr: list[int] = []
        out_payload: list[str] = []
        n = len(ids)
        i = 0
        while i < n:
            j = i
            while j < n and ids[j] == ids[i]:
                j += 1
            # the doc row (pos == -1) sorts first within the run
            toks = simple_tokens(texts[i] or "")
            nt = len(toks)
            starts = pos[i + 1 : j]
            if starts.size and nt:
                # coverage via difference array: window s covers
                # [s, s+k-1]
                diff = np.zeros(nt + 1, dtype=np.int64)
                np.add.at(diff, starts, 1)
                ends = np.minimum(starts + k, nt)
                np.add.at(diff, ends, -1)
                covered = np.cumsum(diff[:nt]) > 0
            else:
                covered = np.zeros(nt, dtype=bool)
            kept = " ".join(w for w, c in zip(toks, covered) if not c)
            out_id.append(int(ids[i]))
            out_nt.append(nt)
            out_nr.append(int(covered.sum()))
            out_payload.append(
                kept
                if emit == "text"
                else hashlib.md5(kept.encode()).hexdigest()
            )
            i = j
        if emit == "text":
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    text_col: pa.array(out_payload, pa.large_string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_tokens": pa.array(out_nt, pa.int64()),
                "n_removed": pa.array(out_nr, pa.int64()),
                "kept_md5": pa.array(out_payload, pa.string()),
            }
        )

    return (
        both.map_batches(tag_doc, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(rewrite, batch_format="pyarrow")
    )


def span_dedup_stats(docs_ds, *, k: int = 8, text_col: str = "text",
                     num_buckets: int = 64):
    """Per-doc duplicate-span removal report:
    ``(doc_id, n_tokens, n_removed, kept_md5)`` where ``kept_md5`` is
    the md5 of the span-deduplicated rewrite (kept tokens joined by
    ' ').  Docs shorter than k tokens carry no windows and pass
    through whole."""
    return _span_pipeline(
        docs_ds, k=k, text_col=text_col, num_buckets=num_buckets,
        emit="stats",
    )


def span_dedup_rewrite_ds(docs_ds, *, k: int = 8, text_col: str = "text",
                          num_buckets: int = 64):
    """The ACTION form: the span-deduplicated corpus as a streaming
    Dataset of ``(doc_id, text)`` token-space rewrites — chain into
    ``write_parquet`` for the 100-TB path.  Same three exchanges as
    ``span_dedup_stats``; only the finalize emits the rewritten text
    instead of its digest."""
    return _span_pipeline(
        docs_ds, k=k, text_col=text_col, num_buckets=num_buckets,
        emit="text",
    )
