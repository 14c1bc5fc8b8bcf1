"""End-to-end corpus curation — the composition the individual extras
exist for: exact dedup → quality filter → language filter, in one
streaming pipeline over the documents table.  This is the headline
100-TB use case (C4/Gopher-style cleaning): every stage is one of the
already-oracled operators, composed WITHOUT materializing the corpus
between steps.

Plan shape:

1. **winners** — ``dedup.exact_dedup_groups`` (per-content sha groupby,
   min doc_id wins) reduced to its keep ids;
2. **stats+filter** — ONE ``map_batches`` pass computes n_tokens /
   alpha_ratio / stopword_ratio (textstats kernels) and applies the
   quality + language thresholds; filter decisions compare UNROUNDED
   single-division ratios, which are bit-identical in SQL (same two
   integers divided once on both sides);
3. **semi join** — ``joins.key_filter_join`` keeps quality survivors
   whose doc_id is a dedup winner (broadcast distinct keys; the corpus
   never shuffles).

The only exchanges are the sha groupby (narrow: sha + id) and the
O(winners) key broadcast.  The corpus never shuffles and is never
materialized between steps; the text column is decoded in two narrow
streaming passes (once to hash for dedup, once to score) — the sha
pass is projected to (doc_id, text) so nothing else rides along.
"""

from __future__ import annotations

import pyarrow as pa

from ..text.stopwords import STOPWORDS
from .textstats import (
    _ASCII_ALPHA_RE,
    LANGID_THRESHOLD,
    MAX_LEN,
    MIN_LEN,
    raw_tokens,
)


def curate_corpus(
    docs_ds,
    *,
    min_tokens: int,
    min_alpha_ratio: float,
    text_col: str = "text",
):
    """Curated survivors: ``(doc_id, lang, n_tokens)`` of docs that are
    (a) their content group's dedup winner, (b) ≥ ``min_tokens`` kept
    tokens, (c) ≥ ``min_alpha_ratio`` ASCII-letter fraction, and
    (d) classified 'en' by the stopword-ratio heuristic."""
    from .dedup import exact_dedup_groups
    from .joins import key_filter_join

    def stats_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        langs = batch["lang"]
        out_idx = []
        out_n = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            t = t or ""
            raw = raw_tokens(t)
            kept = [
                w
                for w in raw
                if MIN_LEN <= len(w) <= MAX_LEN and w not in STOPWORDS
            ]
            if len(kept) < min_tokens:
                continue
            if not t or len(_ASCII_ALPHA_RE.findall(t)) / len(t) < min_alpha_ratio:
                continue
            if not raw or (
                sum(1 for w in raw if w in STOPWORDS) / len(raw)
                < LANGID_THRESHOLD
            ):
                continue
            out_idx.append(i)
            out_n.append(len(kept))
        return pa.table(
            {
                "doc_id": ids.take(pa.array(out_idx, pa.int64())),
                "lang": langs.take(pa.array(out_idx, pa.int64())),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    winners = exact_dedup_groups(
        docs_ds.select_columns(["doc_id", text_col]), text_col=text_col
    ).select_columns(["keep_doc_id"])
    survivors = docs_ds.select_columns(
        ["doc_id", "lang", text_col]
    ).map_batches(stats_filter, batch_format="pyarrow")
    return key_filter_join(
        survivors, winners, left_key="doc_id", right_key="keep_doc_id"
    )


def source_stats(docs_ds, *, source_col: str = "source", text_col: str = "text"):
    """Per-source curation profile: ``(source, n_docs, n_tokens,
    mean_tokens, doc_share)`` — the domain-level view a blocklist
    decision reads (a source whose mean token count collapses is
    boilerplate; one whose share explodes is a crawler trap).

    Plan (100 TB honest): classic combiner — per-block partial
    (source, docs, tokens) rows, ONE tiny groupby over O(sources)
    keys, then the two mirrored IEEE divisions on the reduced table
    with the exact global doc count broadcast from the same reduce.
    """
    import pyarrow as pa

    from .textstats import round6, simple_tokens

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for src, text in zip(
            batch[source_col].to_pylist(), batch[text_col].to_pylist()
        ):
            e = acc.setdefault(src, [0, 0])
            e[0] += 1
            e[1] += len(simple_tokens(text or ""))
        return pa.table(
            {
                source_col: pa.array(list(acc.keys()), pa.string()),
                "n_docs": pa.array([v[0] for v in acc.values()], pa.int64()),
                "n_tokens": pa.array([v[1] for v in acc.values()], pa.int64()),
            }
        )

    reduced = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(source_col)
        .sum(["n_docs", "n_tokens"])
    ).materialize()  # O(sources) rows; read twice below
    total = 0
    for b in reduced.iter_batches(batch_format="pyarrow"):
        total += int(pa.compute.sum(b["sum(n_docs)"]).as_py() or 0)
    total_f = float(total)

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["sum(n_docs)"].to_numpy(zero_copy_only=False)
        nt = batch["sum(n_tokens)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                source_col: batch[source_col],
                "n_docs": pa.array(nd, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "mean_tokens": pa.array(
                    [
                        round6(float(t) / float(d))
                        for t, d in zip(nt.tolist(), nd.tolist())
                    ],
                    pa.float64(),
                ),
                "doc_share": pa.array(
                    [round6(float(d) / total_f) for d in nd.tolist()],
                    pa.float64(),
                ),
            }
        )

    return reduced.map_batches(finish, batch_format="pyarrow")


def source_doc_cap(docs_ds, *, k: int, source_col: str = "source"):
    """Per-source document cap — the build-side analog of the crawler's
    per-domain page cap (``Crawler.java:140-153``: ``domainPageCounts``
    CAS loop against ``MAX_PAGES_PER_DOMAIN``): a boilerplate-heavy repo
    must not flood the curated corpus.  Deterministic keep-k: the k
    LOWEST doc_ids per source survive (doc ids are ingest-ordered, the
    batch analog of the crawler's first-come reservation).

    Plan (100 TB honest): two-phase keep-k.  Phase 1 is a per-batch
    combiner — each block keeps at most k rows per source via one
    vectorized sort + run-rank, so the exchange carries O(k · sources)
    narrow (doc_id, source) rows no matter how large the mega-repo is.
    Phase 2 hash-buckets sources (``bucket_agg`` discipline: the
    exchange runs over num_buckets int64 groups, never O(sources)
    Python groups) and re-applies the same kernel per source run.
    Returns ``(doc_id, source, source_rank)``, rank 1-based, the full
    kept set."""
    import numpy as np
    import pyarrow.compute as pc

    from ..bucket_agg import _bucket_ids

    def keep_k(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl,
            sort_keys=[(source_col, "ascending"), ("doc_id", "ascending")],
        )
        t = tbl.take(order)
        src = t[source_col]
        enc = pc.dictionary_encode(src.combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        n = len(codes)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    source_col: pa.array([], pa.string()),
                    "source_rank": pa.array([], pa.int64()),
                }
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        run_starts = np.flatnonzero(change)
        run_ids = np.cumsum(change) - 1
        rank = np.arange(n, dtype=np.int64) - run_starts[run_ids] + 1
        mask = rank <= k
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(mask)),
                source_col: src.filter(pa.array(mask)),
                "source_rank": pa.array(rank[mask], pa.int64()),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        return keep_k(batch.select(["doc_id", source_col]))

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_b", pa.array(_bucket_ids(batch, [source_col], 64), pa.int64())
        )

    def finalize(group: pa.Table) -> pa.Table:
        return keep_k(group.drop_columns(["_b", "source_rank"]))

    return (
        docs_ds.map_batches(combine, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(finalize, batch_format="pyarrow")
    )
