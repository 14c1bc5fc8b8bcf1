"""Tokenizer stage: documents -> exploded postings (elastic tasks).

The Ray-Data equivalent of ``Indexer.index()``'s thread-pool fan-out
(``Indexer/Indexer.java:36-128``).  The stage state (stopword set +
memoized Porter stemmer + token cache) is held in a per-worker-process
module singleton, so it is built once per worker like an actor's
``__init__`` — but the stage runs as stateless TASKS, which the streaming
executor can interleave freely with the read and write stages (a fixed
actor pool here starved: reserved CPUs left too few slots to feed the
pool, capping throughput at 1/3 of the machine).

Output schema (one row per (doc, stem) — the ``InvertedIndex`` row analog,
``Indexer/SQLiteSearcher.java:63-73``):

    doc_id: int64, term: string, tf: float64, positions: binary

``positions`` is ALREADY delta+varbyte-encoded here (one blob per
posting, built vectorized per batch), so position bytes flow unchanged
from the tokenizer through the shuffle into the segment file — the wide
exchange moves ~2 bytes/position instead of an int32 list, and the chunk
writer just memcpy-slices blobs (stages/postings.py).

``tf`` is the normalized weighted frequency (SURVEY.md §1.3), so the
posting shuffle never needs doc-level data.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pyarrow as pa

from ..codec import delta_encode_lists, varbyte_encode_concat
from ..text.tokenizer import Tokenizer

POSTINGS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.float64()),
        ("positions", pa.binary()),
    ]
)

_TOKENIZER: Tokenizer | None = None


def _shared_tokenizer() -> Tokenizer:
    global _TOKENIZER
    if _TOKENIZER is None:
        _TOKENIZER = Tokenizer()
    return _TOKENIZER


def _positions_binary(pos_lists: list[list[int]]) -> pa.Array:
    """Vectorized: flat concat -> delta with per-list resets -> one
    varbyte buffer -> Arrow binary column built straight from buffers."""
    n = len(pos_lists)
    lens = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.fromiter(chain.from_iterable(pos_lists), dtype=np.uint64, count=total)
    deltas = delta_encode_lists(flat, offsets)
    buf, byte_lens = varbyte_encode_concat(deltas, offsets)
    boffs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(byte_lens, out=boffs[1:])
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(buf)]
    )


def tokenize_batch(
    batch: pa.Table, content_col: str = "content", store_positions: bool = True
) -> pa.Table:
    tokenizer = _shared_tokenizer()
    doc_ids = batch["doc_id"].to_pylist()
    contents = batch[content_col].to_pylist()
    out_doc: list[int] = []
    out_term: list[str] = []
    out_tf: list[float] = []
    out_pos: list[list[int]] = []
    tokenize = tokenizer.tokenize_document
    for doc_id, content in zip(doc_ids, contents):
        if not content:
            continue
        info, _total = tokenize(content)
        for term, (tf, positions) in info.items():
            out_doc.append(doc_id)
            out_term.append(term)
            out_tf.append(tf)
            out_pos.append(positions if store_positions else [])
    return pa.Table.from_arrays(
        [
            pa.array(out_doc, pa.int64()),
            pa.array(out_term, pa.string()),
            pa.array(out_tf, pa.float64()),
            _positions_binary(out_pos),
        ],
        schema=POSTINGS_SCHEMA,
    )


class TokenizeStem:
    """Actor-pool form of the same stage (kept for callers that want an
    explicit pool, e.g. when the tokenizer grows heavy model state)."""

    def __init__(self, content_col: str = "content", store_positions: bool = True):
        self.tokenizer = Tokenizer()
        self.content_col = content_col
        self.store_positions = store_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        global _TOKENIZER
        _TOKENIZER = self.tokenizer  # reuse the batch path
        return tokenize_batch(batch, self.content_col, self.store_positions)


def tokenize_documents(docs_ds, cfg, content_col: str = "content"):
    """documents Dataset -> postings Dataset."""
    if cfg.tokenize_concurrency is not None:
        return docs_ds.map_batches(
            TokenizeStem,
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            fn_constructor_kwargs={
                "content_col": content_col,
                "store_positions": cfg.store_positions,
            },
            concurrency=cfg.tokenize_concurrency,
        )
    return docs_ds.map_batches(
        tokenize_batch,
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        fn_kwargs={
            "content_col": content_col,
            "store_positions": cfg.store_positions,
        },
    )
