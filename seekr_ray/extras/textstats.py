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

import re

import numpy as np
import pyarrow as pa

from ..text.stopwords import STOPWORDS

TOKEN_RE = re.compile(r"[a-z]+")
_ASCII_ALPHA_RE = re.compile(r"[a-zA-Z]")
MIN_LEN, MAX_LEN = 2, 45


def round6(x: float) -> float:
    """Half-away-from-zero rounding to 6dp — matches SQL ROUND(x, 6).
    Python's round() is banker's rounding and disagrees with DuckDB on
    exact halves (e.g. 0.8203125), which broke value-hash compares."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


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
