"""Gopher-style repetition signals — the quality family that catches
boilerplate and generator loops exact-dedup misses (a doc whose LINES
repeat internally, or whose text is one bigram stamped a thousand
times).

Ray-Data-first: one streaming ``map_batches`` pass, one result row per
doc, no shuffle.  All ratios are single IEEE divisions of exact integer
counts (round6), mirrored in the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import round6, simple_tokens


def doc_repetition_signals_with_tokens(
    text: str,
) -> tuple[tuple[int, int, int, int, int], list[str]]:
    """(signals, tokens): the integer sufficient statistics PLUS the
    token list they were computed from — callers that also gate on
    token count (``pipeline.curate_write``) tokenize once, not twice."""
    lines = text.split("\n")
    n_lines = len(lines)
    n_distinct = len(set(lines))
    toks = simple_tokens(text)
    if len(toks) < 2:
        return (n_lines, n_distinct, 0, 0, 0), toks
    bigrams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
    counts: dict[str, int] = {}
    for b in bigrams:
        counts[b] = counts.get(b, 0) + 1
    return (
        n_lines,
        n_distinct,
        len(bigrams),
        max(counts.values()),
        len(counts),
    ), toks


def doc_repetition_signals(text: str) -> tuple[int, int, int, int, int]:
    """Integer sufficient statistics for one doc:
    (n_lines, n_distinct_lines, n_bigrams, top_bigram_count,
    n_distinct_bigrams) — ratios happen once, at the edge."""
    return doc_repetition_signals_with_tokens(text)[0]


def repetition_signals(docs_ds, *, text_col: str = "text"):
    """Per-doc repetition profile:
    ``(doc_id, n_lines, dup_line_frac, n_bigrams, top_bigram_share)``.

    ``dup_line_frac`` = (lines - distinct lines) / lines (lines from a
    plain ``\\n`` split, so the count law matches SQL ``string_split``);
    ``top_bigram_share`` = most frequent token-bigram count / total
    bigrams, 0.0 for docs with < 2 kept tokens.  Both 6dp single
    divisions of exact integers."""

    def signals(batch: pa.Table) -> pa.Table:
        nl, dlf, nb, tbs = [], [], [], []
        for t in batch[text_col].to_pylist():
            n_lines, n_dist, n_big, top, _ = doc_repetition_signals(t or "")
            nl.append(n_lines)
            dlf.append(round6((n_lines - n_dist) / n_lines))
            nb.append(n_big)
            tbs.append(round6(top / n_big) if n_big else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(nl, pa.int64()),
                "dup_line_frac": pa.array(dlf, pa.float64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "top_bigram_share": pa.array(tbs, pa.float64()),
            }
        )

    return docs_ds.map_batches(signals, batch_format="pyarrow")


def repetition_gate(docs_ds, *, max_dup_line_frac: float,
                    max_top_bigram_share: float, text_col: str = "text"):
    """The ACTION form: keep ids whose repetition signals pass both
    thresholds (strict <=, UNROUNDED single-division ratios compared on
    both sides so the SQL gate is bit-identical).  Returns
    ``(doc_id, n_lines, n_bigrams)`` survivors."""

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        keep_i, nls, nbs = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            n_lines, n_dist, n_big, top, _ = doc_repetition_signals(t or "")
            if (n_lines - n_dist) / n_lines > max_dup_line_frac:
                continue
            if n_big and top / n_big > max_top_bigram_share:
                continue
            keep_i.append(i)
            nls.append(n_lines)
            nbs.append(n_big)
        idx = pa.array(np.asarray(keep_i, np.int64))
        return pa.table(
            {
                "doc_id": ids.take(idx),
                "n_lines": pa.array(nls, pa.int64()),
                "n_bigrams": pa.array(nbs, pa.int64()),
            }
        )

    return docs_ds.map_batches(gate, batch_format="pyarrow")
