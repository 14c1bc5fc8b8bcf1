"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All are vectorized ``map_batches`` stages over the
``documents`` table shape (doc_id, text, lang, source, n_chars).

A *simplified shared tokenization* is used by every operator in this
module: ``[a-z]+`` runs over the lowercased text, kept when
2 <= len <= 45 and not a stopword.  It is deliberately SQL-expressible so
each operator has an exact DuckDB oracle (``__ray_entry__.oracle_sql``);
the full reference tokenization (Porter stemming, ``\\b[\\w']+\\b``) is
exercised by the pytest rank-identity oracle instead (tests/).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

from ..text.stopwords import STOPWORDS

TOKEN_RE = re.compile(r"[a-z]+")
_ASCII_ALPHA_RE = re.compile(r"[a-zA-Z]")
MIN_LEN, MAX_LEN = 2, 45


def round6(x: float) -> float:
    """Half-away-from-zero rounding to 6dp — bit-exact replication of
    DuckDB ``ROUND(x, 6)`` on DOUBLE (std::round(x*1e6)/1e6), verified
    against DuckDB on a 12k-value sweep across magnitudes 1e-6..1e30.

    Two traps the naive ``floor(|x|*1e6 + 0.5)`` falls into (it broke
    value-hash compares on large money sums):
    - ``+ 0.5`` round-ties-to-even when ``|x|*1e6`` ≥ 2^52 (ulp ≥ 1),
      silently bumping integral products up one — std::round compares
      the fractional part instead, so we do too;
    - above 2^52 the product grid is integral: std::round is identity
      on it, and the result must be ``product/1e6`` (NOT x — the
      multiply-divide round trip is what DuckDB returns).
    Python's round() is banker's rounding and disagrees with DuckDB on
    exact halves (e.g. 0.8203125) — still avoided."""
    import math

    a = abs(x) * 1e6
    if a >= 2**52 or a != a:  # identity grid, inf, or NaN
        r = a
    else:
        f = math.floor(a)
        r = f + 1.0 if a - f >= 0.5 else f
    return math.copysign(r, x) / 1e6


def round6_arr(x: np.ndarray) -> np.ndarray:
    """Vectorized ``round6`` (same std::round replication) for O(rows)
    outputs where a per-element Python loop would dominate."""
    a = np.abs(x) * 1e6
    f = np.floor(a)
    with np.errstate(invalid="ignore"):  # inf - inf in the dead branch
        r = np.where(a - f >= 0.5, f + 1.0, f)
    r = np.where(a >= 2**52, a, r)  # also propagates inf; NaN via f
    return np.copysign(r, x) / 1e6


def simple_tokens(text: str) -> list[str]:
    return [
        t
        for t in TOKEN_RE.findall(text.lower())
        if MIN_LEN <= len(t) <= MAX_LEN and t not in STOPWORDS
    ]


def raw_tokens(text: str) -> list[str]:
    """Unfiltered [a-z]+ runs (the denominator for stopword_ratio)."""
    return TOKEN_RE.findall(text.lower())


# -- token counting ----------------------------------------------------------


def doc_token_counts(docs_ds, text_col: str = "text"):
    """(doc_id, n_tokens) per document."""

    def count(batch: pa.Table) -> pa.Table:
        n = [len(simple_tokens(t or "")) for t in batch[text_col].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())}
        )

    return docs_ds.map_batches(count, batch_format="pyarrow")


def token_count_by_lang(docs_ds, text_col: str = "text"):
    """Σ tokens grouped by the table's lang column (partial-aggregated
    per batch before the tiny groupby shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        texts = batch[text_col].to_pylist()
        acc: dict[str, int] = {}
        for lang, t in zip(langs, texts):
            acc[lang] = acc.get(lang, 0) + len(simple_tokens(t or ""))
        return pa.table(
            {
                "lang": pa.array(list(acc.keys()), pa.string()),
                "n": pa.array(list(acc.values()), pa.int64()),
            }
        )

    return docs_ds.map_batches(partial, batch_format="pyarrow").groupby("lang").sum("n")


ENTROPY_SCALE = 1_000_000


def token_entropy(docs_ds, text_col: str = "text"):
    """Per-doc Shannon entropy of the token distribution (bits) — a
    repetition/diversity quality signal: near-0 for degenerate repeated
    text, ~log2(n_tokens) for all-distinct text.

    Each term's contribution ``−p·log2(p)`` is floor-quantized at 1e-6
    and summed as an exact integer (the CENTROID_SCALE discipline), so
    the result is invariant to summation order; a last-ulp libm log2
    difference between numpy and DuckDB can still flip a floor only
    when a term's value sits within ~1e-16 of a 1e-6 boundary
    (probability ~1e-10 per term — negligible, not impossible).  The
    SQL oracle replicates the quantized expression term-for-term.

    Output: ``(doc_id, n_tokens, entropy)``.
    """
    from collections import Counter

    def ent(batch: pa.Table) -> pa.Table:
        out_n, out_e = [], []
        for t in batch[text_col].to_pylist():
            toks = simple_tokens(t or "")
            n = len(toks)
            out_n.append(n)
            if n == 0:
                out_e.append(0.0)
                continue
            cnt = np.fromiter(
                Counter(toks).values(), np.float64, -1
            )
            p = cnt / float(n)  # == SQL c::DOUBLE / n
            q = np.floor(-(p) * np.log2(p) * ENTROPY_SCALE)
            out_e.append(float(q.astype(np.int64).sum()) / ENTROPY_SCALE)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(out_n, pa.int64()),
                "entropy": pa.array(out_e, pa.float64()),
            }
        )

    return docs_ds.map_batches(ent, batch_format="pyarrow")


# -- quality scoring ---------------------------------------------------------


def quality_stats(docs_ds, text_col: str = "text"):
    """Per-doc quality features: token count, mean token length,
    stopword ratio, alpha ratio.  Ratios are rounded to 6dp so the DuckDB
    oracle hash-matches bit-for-bit."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_tokens, mean_len, stop_ratio, alpha_ratio = [], [], [], []
        for t in texts:
            t = t or ""
            raw = raw_tokens(t)
            kept = [
                w for w in raw if MIN_LEN <= len(w) <= MAX_LEN and w not in STOPWORDS
            ]
            n_tokens.append(len(kept))
            mean_len.append(
                round6(sum(len(w) for w in kept) / len(kept)) if kept else 0.0
            )
            stop_ratio.append(
                round6(sum(1 for w in raw if w in STOPWORDS) / len(raw))
                if raw
                else 0.0
            )
            # ASCII letters ONLY — the DuckDB oracle counts
            # regexp_replace(text,'[^a-zA-Z]','','g'); str.isalpha() is
            # Unicode-wide and would diverge on any non-ASCII letter
            n_alpha = len(_ASCII_ALPHA_RE.findall(t))
            alpha_ratio.append(round6(n_alpha / len(t)) if t else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
            }
        )

    return docs_ds.map_batches(stats, batch_format="pyarrow")


# -- language id -------------------------------------------------------------

LANGID_THRESHOLD = 0.05


def langid_heuristic(docs_ds, text_col: str = "text"):
    """N-gram-free language-ID heuristic: English stopword hit-ratio over
    raw tokens; >= LANGID_THRESHOLD -> 'en'.  (A real pipeline would use a
    char-n-gram model; the *shape* — stateful stage, per-doc label — is
    identical, and the formula is SQL-expressible for the oracle.)"""

    def classify(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch[text_col].to_pylist():
            raw = raw_tokens(t or "")
            ratio = (
                sum(1 for w in raw if w in STOPWORDS) / len(raw) if raw else 0.0
            )
            preds.append("en" if ratio >= LANGID_THRESHOLD else "other")
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )

    return docs_ds.map_batches(classify, batch_format="pyarrow")


# -- document fingerprinting -------------------------------------------------

_ROLL_BASE = np.uint64(1099511628211)  # FNV prime reused as the poly base


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Winnowing-style fingerprint: min over the document of a polynomial
    rolling hash of each ``window``-token shingle (token hashes combined
    as Σ h_i · base^(w-1-i), uint64 wraparound).  Deterministic and
    platform-stable (no python hash()); fully vectorized — round 1 ran
    byte-at-a-time FNV per shingle in python."""
    import hashlib

    toks = simple_tokens(text)
    if not toks:
        return 0
    if len(toks) < window:
        # md5-LE == DuckDB md5_number_upper — keeps the fingerprint
        # SQL-oracle-able (oracle_sql_map "fingerprints")
        return int.from_bytes(
            hashlib.md5(" ".join(toks).encode()).digest()[:8], "little"
        )
    th = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    with np.errstate(over="ignore"):
        powers = np.empty(window, dtype=np.uint64)
        powers[window - 1] = np.uint64(1)
        for i in range(window - 2, -1, -1):
            powers[i] = powers[i + 1] * _ROLL_BASE
        n_sh = len(toks) - window + 1
        acc = np.zeros(n_sh, dtype=np.uint64)
        for w in range(window):
            acc += th[w : w + n_sh] * powers[w]
    return int(acc.min())


def doc_fingerprints(docs_ds, text_col: str = "text", window: int = 8):
    def fp(batch: pa.Table) -> pa.Table:
        vals = [
            rolling_fingerprint(t or "", window)
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(
                    [v - (1 << 64) if v >= (1 << 63) else v for v in vals],
                    pa.int64(),
                ),
            }
        )

    return docs_ds.map_batches(fp, batch_format="pyarrow")


# -- term co-occurrence / PMI -------------------------------------------------


def term_cooccurrence_pmi(
    docs_ds,
    text_col: str = "text",
    min_docs: int = 2,
    top_v: int | None = None,
    num_buckets: int = 64,
):
    """Document-level term co-occurrence with pointwise mutual
    information — the classic collocation / related-term signal for
    corpus analysis (Church & Hanks 1990).

    Per block, each doc contributes its DISTINCT token pairs once
    (lexicographically ordered, a < b) plus per-term doc counts, both
    partial-aggregated before the exchange, so the shuffle carries one
    row per distinct pair per block — never one per occurrence.  Pair
    emission is vectorized: docs are token-CODED against the block
    vocabulary (``np.unique`` inverse — code order == lexicographic
    term order), grouped by distinct-token count m, and each m-group
    emits all its docs' pairs with ONE ``np.triu_indices`` fancy-index
    — no per-doc ``itertools.combinations``.  The exchange hash-buckets
    pairs into ``num_buckets`` groups and aggregates each with Arrow's
    C++ hash aggregate (Ray's native multi-column groupby walks groups
    in Python — measured ~80x slower at millions of distinct pairs).
    The final pass attaches ``pmi = log10(N · c_ab / (c_a · c_b))``
    with the per-term doc frequencies broadcast.

    ``top_v`` is the 100-TB pair-space cap: keep only the ``top_v``
    highest-df terms (ties by term, ascending — deterministic across
    block layouts; selected via per-block partial top-V so the driver
    never sees the full vocabulary) and pair only within that set.
    Pair space is then bounded by ``top_v**2`` regardless of
    vocabulary size and the broadcast df map is O(top_v).  PMI values
    of surviving pairs are unchanged (df and N stay corpus-global).

    Output: ``(term_a, term_b, n_docs, pmi)`` for pairs co-occurring in
    ≥ ``min_docs`` documents.
    """
    import pandas as pd
    import ray

    def term_partial(batch: pa.Table) -> pa.Table:
        term_acc: dict[str, int] = {}
        n = 0
        for t in batch[text_col].to_pylist():
            n += 1
            for tok in set(simple_tokens(t or "")):
                term_acc[tok] = term_acc.get(tok, 0) + 1
        # the "" sentinel row carries this block's doc count toward the
        # corpus N (simple_tokens never yields ""), so token-less blocks
        # still count
        terms = [("", 0), *term_acc.items()]
        return pa.table(
            {
                "term": pa.array([t for t, _ in terms], pa.string()),
                "c": pa.array([c for _, c in terms], pa.int64()),
                "n_docs": pa.array([n] + [0] * (len(terms) - 1), pa.int64()),
            }
        )

    from ..bucket_agg import bucketed_group_agg

    tstats_ds = bucketed_group_agg(
        docs_ds.map_batches(term_partial, batch_format="pyarrow"),
        "term",
        [("c", "sum"), ("n_docs", "sum")],
    )
    if top_v is None:
        # per-term doc counts + corpus N (O(vocab), collected and
        # broadcast — every distinct pair's dfs are needed)
        tstats = tstats_ds.to_pandas()
        keep_ref = None
    else:
        # exact distributed top-V by (df desc, term asc): the groupby
        # output partitions the term space, so the global top-V is
        # contained in the union of per-block top-Vs; "" sentinel rows
        # (block doc counts toward N) are always kept
        def topk_block(batch: pa.Table) -> pa.Table:
            terms = np.asarray(batch["term"].to_pylist(), dtype=object)
            nonsent = np.nonzero(terms != "")[0]
            if len(nonsent) <= top_v:
                return batch
            c = batch["sum(c)"].to_numpy(zero_copy_only=False)[nonsent]
            order = np.lexsort((terms[nonsent], -c))[:top_v]
            keep_idx = np.sort(
                np.concatenate(
                    [nonsent[order], np.nonzero(terms == "")[0]]
                )
            )
            return batch.take(pa.array(keep_idx))

        part = tstats_ds.map_batches(
            topk_block, batch_format="pyarrow"
        ).to_pandas()
        nonsent = part[part["term"] != ""]
        order = np.lexsort(
            (
                nonsent["term"].to_numpy(dtype=object),
                -nonsent["sum(c)"].to_numpy(),
            )
        )[:top_v]
        kept = nonsent.iloc[order]
        tstats = pd.concat([part[part["term"] == ""], kept])
        keep_ref = ray.put(np.sort(kept["term"].to_numpy(dtype="U")))

    dfs = dict(zip(tstats["term"], tstats["sum(c)"]))
    n_total = int(tstats["sum(n_docs)"].sum())
    stats_ref = ray.put((dfs, n_total))

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "term_a": pa.array([], pa.string()),
                "term_b": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        tok_lists = [
            simple_tokens(t or "") for t in batch[text_col].to_pylist()
        ]
        lens = np.fromiter(
            (len(ts) for ts in tok_lists), np.int64, len(tok_lists)
        )
        if int(lens.sum()) == 0:
            return empty
        flat = np.array([tok for ts in tok_lists for tok in ts])
        vocab, codes = np.unique(flat, return_inverse=True)
        if keep_ref is not None:
            keep_sorted = ray.get(keep_ref)
            if len(keep_sorted) == 0:
                return empty
            pos = np.minimum(
                np.searchsorted(keep_sorted, vocab), len(keep_sorted) - 1
            )
            keep_mask = keep_sorted[pos] == vocab
        else:
            keep_mask = None
        offs = np.concatenate(([0], np.cumsum(lens)))
        doc_codes: list[np.ndarray] = []
        for i in range(len(tok_lists)):
            dc = np.unique(codes[offs[i] : offs[i + 1]])
            if keep_mask is not None:
                dc = dc[keep_mask[dc]]
            if len(dc) >= 2:
                doc_codes.append(dc)
        if not doc_codes:
            return empty
        ms = np.fromiter(
            (len(dc) for dc in doc_codes), np.int64, len(doc_codes)
        )
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        for m in np.unique(ms):
            mat = np.stack(
                [doc_codes[i] for i in np.nonzero(ms == m)[0]]
            )
            ia, ib = np.triu_indices(int(m), 1)
            a_parts.append(mat[:, ia].ravel())
            b_parts.append(mat[:, ib].ravel())
        nv = len(vocab)
        key = np.concatenate(a_parts).astype(np.int64) * nv + np.concatenate(
            b_parts
        )
        uk, cnt = np.unique(key, return_counts=True)
        # decode pair codes through ONE O(vocab) Arrow string array —
        # pc.take is C-level; a per-pair .tolist() materialized millions
        # of Python strings and dominated the kernel
        vstr = pa.array(vocab.tolist(), pa.string())
        import hashlib

        import pyarrow.compute as pc

        # stable 64-bit hash per VOCAB term (O(vocab) scalar work),
        # combined vectorized into a per-pair exchange bucket —
        # Python's hash() is per-process-salted, hence md5
        hv = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                for t in vocab.tolist()
            ),
            np.uint64,
            nv,
        )
        with np.errstate(over="ignore"):
            ph = (hv[uk // nv] * np.uint64(0x100000001B3)) ^ hv[uk % nv]
        return pa.table(
            {
                "_b": pa.array(
                    (ph % np.uint64(num_buckets)).astype(np.int64)
                ),
                "term_a": pc.take(vstr, pa.array(uk // nv, pa.int64())),
                "term_b": pc.take(vstr, pa.array(uk % nv, pa.int64())),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def attach_pmi(batch: pa.Table) -> pa.Table:
        df_map, n = ray.get(stats_ref)
        a = batch["term_a"].to_pylist()
        b = batch["term_b"].to_pylist()
        c = batch["sum(c)"].to_numpy(zero_copy_only=False)
        keep = c >= min_docs
        a = [x for x, k in zip(a, keep) if k]
        b = [x for x, k in zip(b, keep) if k]
        c = c[keep]
        pmi = [
            round6(
                math.log10(n * cc / (df_map[x] * df_map[y]))
            )
            for x, y, cc in zip(a, b, c)
        ]
        return pa.table(
            {
                "term_a": pa.array(a, pa.string()),
                "term_b": pa.array(b, pa.string()),
                "n_docs": pa.array(c, pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    def agg_bucket(group: pa.Table) -> pa.Table:
        # Arrow's C++ hash aggregate per bucket: Ray Data's native
        # groupby().sum() walks groups in Python and measured ~170 s on
        # 1.5M string-pair groups where this path takes ~2 s
        t = group.select(["term_a", "term_b", "c"]).group_by(
            ["term_a", "term_b"]
        ).aggregate([("c", "sum")])
        return pa.table(
            {
                "term_a": t["term_a"],
                "term_b": t["term_b"],
                "sum(c)": t["c_sum"],
            }
        )

    return (
        docs_ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(agg_bucket, batch_format="pyarrow")
        .map_batches(attach_pmi, batch_format="pyarrow")
    )


# -- lexical diversity --------------------------------------------------------


def lexical_diversity(docs_ds, text_col: str = "text"):
    """Per-document lexical-diversity signals: ``(doc_id, n_tokens,
    n_types, n_hapax, ttr)`` — type-token ratio and hapax-legomenon
    count, the cheap vocabulary-richness quality filters (template/spam
    text scores low TTR; OCR noise scores anomalously high hapax).

    Map-only, stateless, shuffle-free; ``ttr = ROUND(types/tokens, 6)``
    is one mirrored IEEE division (0.0 for token-less docs)."""
    from collections import Counter

    def per_doc(batch: pa.Table) -> pa.Table:
        nt, ty, hp, tt = [], [], [], []
        for text in batch[text_col].to_pylist():
            c = Counter(simple_tokens(text or ""))
            n = sum(c.values())
            t = len(c)
            nt.append(n)
            ty.append(t)
            hp.append(sum(1 for v in c.values() if v == 1))
            tt.append(round6(t / n) if n else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(nt, pa.int64()),
                "n_types": pa.array(ty, pa.int64()),
                "n_hapax": pa.array(hp, pa.int64()),
                "ttr": pa.array(tt, pa.float64()),
            }
        )

    return docs_ds.map_batches(per_doc, batch_format="pyarrow")
