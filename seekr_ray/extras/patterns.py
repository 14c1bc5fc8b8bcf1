"""Pattern-level text operators over Arrow string columns.

The curation primitives that run as pure RE2 kernels inside
``map_batches`` — zero Python per row in the hot path:

* ``regex_redact``   — replace every match of a pattern (PII-shaped
  scrubbing: digits, emails, keys) and fingerprint the redacted text, so
  downstream exact-dedup runs over the SCRUBBED form.
* ``json_int_field_agg`` — pull an integer field out of a JSON-ish
  string column with one vectorized regex extract and partial-aggregate
  per group; the semi-structured-metadata parse every event pipeline
  needs, without a per-row ``json.loads``.
* ``repetition_stats`` — Gopher-style repetition quality signals
  (Rae et al. 2021 §A1.1): fraction of duplicate tokens and the share of
  the most common bigram; high values mark degenerate/boilerplate text
  that document-level dedup misses.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import round6, simple_tokens


def regex_redact(ds, *, id_col: str, text_col: str, pattern: str, repl: str = "#"):
    """Vectorized redaction: count + replace every ``pattern`` match
    (RE2 via ``pyarrow.compute``), then sha256 the redacted text.

    Output: ``(id_col, n_matches, redacted_sha256)`` — the hash keys a
    scrubbed-form exact dedup without shipping the redacted payload.
    Only the sha leaves the task; the redacted strings are transient.
    """

    def redact(batch: pa.Table) -> pa.Table:
        txt = pc.coalesce(batch[text_col], pa.scalar("", pa.string()))
        n = pc.count_substring_regex(txt, pattern)
        red = pc.replace_substring_regex(txt, pattern, repl)
        shas = [
            hashlib.sha256(s.encode()).hexdigest() for s in red.to_pylist()
        ]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_matches": pc.cast(n, pa.int64()),
                "redacted_sha256": pa.array(shas, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        redact, batch_format="pyarrow"
    )


def json_int_field_agg(ds, *, group_col: str, json_col: str, field: str):
    """Extract integer ``field`` from a JSON-ish string column with ONE
    vectorized regex extract (no per-row json.loads) and aggregate
    (count, sum, max) per group — partials inside ``map_batches``, an
    O(groups) exchange.

    Rows where the field is absent/non-integer count toward ``n`` with
    value NULL-skipped, matching SQL aggregate semantics.
    Output: ``(group_col, n, sum_v, max_v)``.
    """
    pat = rf'"{field}":\s*(?P<v>-?\d+)'  # extract_regex requires named groups

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.coalesce(batch[json_col], pa.scalar("", pa.string()))
        ext = pc.extract_regex(txt, pat)  # struct<v: string> or null
        vals = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        tbl = pa.table({group_col: batch[group_col], "_v": vals})
        agg = tbl.group_by([group_col]).aggregate(
            [("_v", "count"), ("_v", "sum"), ("_v", "max")]
        )
        return pa.table(
            {
                group_col: agg[group_col],
                "n_p": pc.cast(agg["_v_count"], pa.int64()),
                "s_p": pc.cast(agg["_v_sum"], pa.int64()),
                "m_p": pc.cast(agg["_v_max"], pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: batch[group_col],
                "n": pc.cast(batch["sum(n_p)"], pa.int64()),
                "sum_v": pc.cast(batch["sum(s_p)"], pa.int64()),
                "max_v": pc.cast(batch["max(m_p)"], pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Sum

    return (
        ds.select_columns([group_col, json_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n_p"), Sum("s_p"), Max("m_p"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def repetition_stats(docs_ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition signals per document:

    * ``dup_token_frac``  = 1 − distinct_tokens / tokens
    * ``top_bigram_frac`` = count(most frequent bigram) / bigram count

    Pure per-row map over the shared simplified tokenization (the same
    ``toks`` form the SQL oracle uses); 0.0 when a doc is too short to
    have tokens/bigrams.  Output: ``(id_col, dup_token_frac,
    top_bigram_frac)``, 6dp-rounded.
    """
    from collections import Counter

    def stats(batch: pa.Table) -> pa.Table:
        dup_f, top_f = [], []
        for t in batch[text_col].to_pylist():
            toks = simple_tokens(t or "")
            n = len(toks)
            dup_f.append(round6(1.0 - len(set(toks)) / n) if n else 0.0)
            if n >= 2:
                bg = Counter(zip(toks, toks[1:]))
                top_f.append(round6(max(bg.values()) / (n - 1)))
            else:
                top_f.append(0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "dup_token_frac": pa.array(dup_f, pa.float64()),
                "top_bigram_frac": pa.array(top_f, pa.float64()),
            }
        )

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow"
    )
