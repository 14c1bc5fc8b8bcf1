"""Tokenizer actor-pool stage: documents -> exploded postings.

The Ray-Data equivalent of ``Indexer.index()``'s thread-pool fan-out
(``Indexer/Indexer.java:36-128``): a callable class passed to
``map_batches`` so the stopword set and the memoized Porter stemmer are
built once per actor (SURVEY.md §2.3 T1), then every batch is pure python
over Arrow columns.

Output schema (one row per (doc, stem) — the ``InvertedIndex`` row analog,
``Indexer/SQLiteSearcher.java:63-73``, with the position child table
``WordPositions`` inlined as a list column):

    doc_id: int64, term: string, tf: float64, positions: list<int32>

``tf`` is already the normalized weighted frequency (SURVEY.md §1.3), so
the wide posting-build shuffle downstream never needs doc-level data.
"""

from __future__ import annotations

import pyarrow as pa

from ..text.tokenizer import Tokenizer

POSTINGS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.float64()),
        ("positions", pa.list_(pa.int32())),
    ]
)


class TokenizeStem:
    """Stateful tokenize+stem stage for ``map_batches(TokenizeStem, ...)``."""

    def __init__(self, content_col: str = "content", store_positions: bool = True):
        self.tokenizer = Tokenizer()
        self.content_col = content_col
        self.store_positions = store_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        contents = batch[self.content_col].to_pylist()
        out_doc: list[int] = []
        out_term: list[str] = []
        out_tf: list[float] = []
        out_pos: list[list[int]] = []
        tokenize = self.tokenizer.tokenize_document
        for doc_id, content in zip(doc_ids, contents):
            if not content:
                continue
            info, _total = tokenize(content)
            for term, (tf, positions) in info.items():
                out_doc.append(doc_id)
                out_term.append(term)
                out_tf.append(tf)
                out_pos.append(positions if self.store_positions else [])
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.float64()),
                "positions": pa.array(out_pos, pa.list_(pa.int32())),
            }
        )


def tokenize_documents(docs_ds, cfg, content_col: str = "content"):
    """documents Dataset -> postings Dataset via the actor pool."""
    # fixed-size actor pool at (almost) full width: an autoscaling (1, n)
    # pool ramps too slowly for a short stage; the -2 leaves CPUs for the
    # read/write task stages so the pool can always fully schedule
    concurrency = cfg.tokenize_concurrency
    if concurrency is None:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = max(1, n - 2)
    kwargs = {"concurrency": concurrency}
    return docs_ds.map_batches(
        TokenizeStem,
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        fn_constructor_kwargs={
            "content_col": content_col,
            "store_positions": cfg.store_positions,
        },
        **kwargs,
    )
