"""Byte-pair-encoding tokenizer training, Ray-Data-first.

The standard LLM tokenizer-training pipeline (Sennrich et al. 2016;
GPT-2; the shape HuggingFace ``tokenizers``' trainer uses):

1. ``word_frequencies`` — the ONLY pass over the corpus: a distributed
   word count (per-block ``Counter`` partials -> hash-bucketed exchange,
   so the shuffle moves O(distinct words per block), never O(tokens)).
2. ``bpe_train`` — merge-rule learning over the word-frequency TABLE,
   which is vocab-sized, not corpus-sized.  The table is capped to the
   deterministic ``top_v`` most frequent words (two-phase exact top-k:
   per-block partials -> driver final, O(top_v) driver state — at web
   scale the top 10^5..10^6 words carry >99.9% of token mass, which is
   exactly how production BPE trainers bound the problem), then the
   classic incremental merge loop runs on the driver: pick the most
   frequent adjacent symbol pair (ties -> lexicographically smallest),
   merge it in the affected words only, update pair counts in place.
   Corpus size only ever affects phase 1.
3. ``bpe_token_counts`` — apply trained merges to the corpus: merge
   ranks broadcast once via ``ray.put``; each block encodes its DISTINCT
   words once (per-block memo) and sums per-doc symbol counts.

Determinism: word order, top-v tie-breaks and merge tie-breaks are all
total orders ((freq desc, word asc) / (count desc, pair asc)), so the
trained table is identical across runs, block layouts and cpu counts.

``bpe_pair_counts`` (the first merge iteration's candidate table) is
SQL-replicable and oracled; the iterative ``bpe_train`` is rows-only +
pytest-pinned against a naive reference implementation.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ..bucket_agg import bucketed_group_agg
from .textstats import simple_tokens


def word_frequencies(docs_ds, *, text_col: str = "text", num_buckets: int = 64):
    """(word, freq) over the corpus — per-block Counter partials, then a
    bucketed sum exchange (O(distinct-per-block) rows, Arrow C++ reduce)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(simple_tokens(t or ""))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "freq": pa.array(list(c.values()), pa.int64()),
            }
        )

    wf = docs_ds.map_batches(partial, batch_format="pyarrow")
    out = bucketed_group_agg(wf, "word", [("freq", "sum")], num_buckets)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"word": batch["word"], "freq": batch["sum(freq)"]})

    return out.map_batches(rename, batch_format="pyarrow")


def bpe_pair_counts(docs_ds, *, text_col: str = "text") -> pa.Table:
    """First-iteration BPE candidate table: adjacent character-pair
    counts weighted by word frequency, over the whole corpus.  Output is
    bounded by the alphabet squared (<=676 rows for [a-z]+ words) — the
    per-block partial collapses to that bound before the exchange."""

    wf = word_frequencies(docs_ds, text_col=text_col)

    def pairs(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for w, f in zip(batch["word"].to_pylist(), batch["freq"].to_pylist()):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += f
        return pa.table(
            {
                "pair": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    out = (
        bucketed_group_agg(
            wf.map_batches(pairs, batch_format="pyarrow"),
            "pair",
            [("cnt", "sum")],
            num_buckets=16,
        )
        .to_pandas()
        .rename(columns={"sum(cnt)": "cnt"})
        .sort_values("pair")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "pair": pa.array(out["pair"], pa.string()),
            "cnt": pa.array(out["cnt"], pa.int64()),
        }
    )


def top_words(wf_ds, top_v: int) -> list[tuple[str, int]]:
    """Deterministic top-v words by (freq desc, word asc) — per-block
    partial top-v, then one driver-side final over O(blocks*top_v) rows
    (exact: the global top-v is contained in the union of block top-vs)."""

    def partial(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["word"].to_pylist(), object)
        f = batch["freq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, -f))[:top_v]
        return pa.table(
            {
                "word": pa.array(w[order], pa.string()),
                "freq": pa.array(f[order], pa.int64()),
            }
        )

    rows: list[tuple[int, str]] = []
    for b in wf_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        rows.extend(zip(b["freq"].to_pylist(), b["word"].to_pylist()))
    rows.sort(key=lambda t: (-t[0], t[1]))
    return [(w, f) for f, w in rows[:top_v]]


def _merge_loop(
    words: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Classic incremental BPE over a word-frequency dict.  Words are
    symbol tuples; each step merges the (count desc, pair asc)-best
    adjacent pair in the affected words only and updates pair counts in
    place — O(n_merges * affected), not O(n_merges * vocab)."""
    seqs: list[list[str]] = [list(w) for w, _ in words]
    freqs = [f for _, f in words]
    counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (seq, f) in enumerate(zip(seqs, freqs)):
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] += f
            where.setdefault((a, b), set()).add(idx)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt <= 0:
            break
        merges.append((rank, left, right, cnt))
        new_sym = left + right
        for idx in sorted(where.get((left, right), ())):
            seq, f = seqs[idx], freqs[idx]
            # remove this word's old pair contributions
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] -= f
                if counts[(a, b)] <= 0:
                    del counts[(a, b)]
                w = where.get((a, b))
                if w is not None:
                    w.discard(idx)
                    if not w:
                        del where[(a, b)]
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[idx] = out
            # add the new contributions
            for a, b in zip(out, out[1:]):
                counts[(a, b)] += f
                where.setdefault((a, b), set()).add(idx)
    return merges


def bpe_train(
    docs_ds,
    n_merges: int,
    *,
    text_col: str = "text",
    top_v: int = 50_000,
) -> pa.Table:
    """Learn ``n_merges`` BPE merge rules from the corpus.  Returns
    (rank, left, right, freq): freq is the pair's count at merge time.
    Driver state is O(top_v) words + O(alphabet + merges) pair counts —
    corpus-size-independent."""
    wf = word_frequencies(docs_ds, text_col=text_col)
    words = top_words(wf, top_v)
    merges = _merge_loop(words, n_merges)
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "freq": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word, best-rank-first (the standard
    BPE inference order — equivalent to replaying merges in rank order)."""
    seq = list(word)
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_token_counts(
    docs_ds,
    merges: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-doc BPE token count under the trained merges.  The rank table
    broadcasts once (``ray.put``); each block memoizes encodes per
    DISTINCT word, so the per-block cost is O(distinct words), not
    O(tokens)."""
    import ray

    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }
    ranks_ref = ray.put(ranks)

    def count(batch: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        memo: dict[str, int] = {}
        out = np.empty(batch.num_rows, np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            n = 0
            for w in simple_tokens(t or ""):
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, rk))
                    memo[w] = c
                n += c
            out[i] = n
        return pa.table(
            {id_col: batch[id_col], "n_bpe_tokens": pa.array(out, pa.int64())}
        )

    return docs_ds.map_batches(count, batch_format="pyarrow")
