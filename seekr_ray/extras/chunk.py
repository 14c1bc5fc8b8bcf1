"""Fixed-size document chunking with overlap (LLM context-window prep).

Splits each document's text into character-window chunks of ``size``
advancing by ``size - overlap`` — the standard explode step before
tokenize-and-pack in a pretraining pipeline.  One input row fans out to
``ceil((n - size) / stride) + 1`` rows (1 for short docs), so the
operator is a pure ``map_batches`` explode: no shuffle, no state, and
the fan-out factor is bounded by the longest document in a block.

Kernel shape: counts/starts/lengths are numpy integer arithmetic over
the block; chunk TEXT is sliced with ``pc.utf8_slice_codeunits`` once
per chunk ordinal (all docs that have an i-th chunk are sliced in one
vectorized call), so the Python-level loop runs ``max_chunks_in_block``
times, not ``rows`` times.  At 100 TB the explode factor (~n/stride)
multiplies bytes, not rows-per-Python-step; blocks stay bounded because
Ray splits output blocks by target_max_block_size.

Mirrors reference document sectioning (Indexer.java splits docs into
weighted sections before tokenizing — /root/reference/Indexing/src/main/
java/com/Search/Engine/Indexing/Indexer.java) generalized to the
overlap-window form used for training-data prep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EMPTY_CHUNKS = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "chunk_idx": pa.array([], pa.int64()),
        "start_char": pa.array([], pa.int64()),
        "chunk_len": pa.array([], pa.int64()),
        "chunk_text": pa.array([], pa.string()),
    }
)


def chunk_documents(docs_ds, size: int, overlap: int):
    """Explode ``(doc_id, text, n_chars)`` into overlapping chunks.

    Output: ``(doc_id, chunk_idx, start_char, chunk_len, chunk_text)``
    with ``chunk_idx`` 0-based, ``start_char = chunk_idx * stride``
    (stride = size - overlap), ``chunk_len = min(size, n - start)``.
    Documents with ``n_chars <= size`` (including empty) emit exactly
    one chunk.  Offsets are codepoint-based (DuckDB ``substr`` parity).
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    def explode(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n) == 0:
            return EMPTY_CHUNKS
        counts = np.where(n <= size, 1, (n - size + stride - 1) // stride + 1)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        parts = []
        for ci in range(int(counts.max())):
            sel = np.flatnonzero(counts > ci)
            sub = text.take(pa.array(sel, pa.int64()))
            start = ci * stride
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(doc_ids[sel], pa.int64()),
                        "chunk_idx": pa.array(
                            np.full(len(sel), ci, np.int64), pa.int64()
                        ),
                        "start_char": pa.array(
                            np.full(len(sel), start, np.int64), pa.int64()
                        ),
                        "chunk_len": pa.array(
                            np.minimum(size, n[sel] - start), pa.int64()
                        ),
                        # slices by codepoint (matches python slicing and
                        # DuckDB substr on multi-byte text — pinned by test)
                        "chunk_text": pc.utf8_slice_codeunits(
                            sub, start=start, stop=start + size
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    return docs_ds.map_batches(explode, batch_format="pyarrow")
