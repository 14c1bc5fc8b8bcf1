"""Compression-ratio quality signal: per-doc zlib ratio — the
Gopher-style repetitiveness proxy (highly repetitive/template text
compresses far below natural text; random noise barely compresses).
Cheap, language-agnostic, and a standard pre-training filter feature.

Map-only, stateless, shuffle-free.  zlib level is pinned (6) so the
ratio is deterministic across workers and runs; DuckDB has no
compression scalar, so the contract entry is rows-only — semantics are
pinned by pytest against direct zlib.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from .textstats import round6

ZLIB_LEVEL = 6


def compression_ratio(docs_ds, *, text_col: str = "text"):
    """(doc_id, n_bytes, n_compressed, ratio) — ``ratio =
    round6(n_compressed / n_bytes)`` of the UTF-8 text under zlib
    level 6 (0.0 for empty docs).  Low ratio ⇒ repetitive/boilerplate;
    ~1.0 ⇒ incompressible noise."""

    def per_doc(batch: pa.Table) -> pa.Table:
        nb, nc, ratio = [], [], []
        for text in batch[text_col].to_pylist():
            raw = (text or "").encode("utf-8")
            comp = zlib.compress(raw, ZLIB_LEVEL) if raw else b""
            nb.append(len(raw))
            nc.append(len(comp))
            ratio.append(round6(len(comp) / len(raw)) if raw else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(nb, pa.int64()),
                "n_compressed": pa.array(nc, pa.int64()),
                "ratio": pa.array(ratio, pa.float64()),
            }
        )

    return docs_ds.map_batches(per_doc, batch_format="pyarrow")
