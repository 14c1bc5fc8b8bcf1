"""Per-document n-gram novelty: what fraction of a doc's distinct
k-shingles appear for the FIRST time in that doc (global first-seen
attribution = min doc_id over the corpus)?

The memorization / contribution metric of large-corpus curation (a doc
whose shingles are all already covered by earlier docs adds nothing to
the training mixture; novelty ~1.0 marks genuinely fresh content).
Reference scope analog: the corpus-wide term statistics pass of the
indexer (`Indexer/DBBuilder.java` df accounting) generalized from
unigrams to k-grams with first-seen attribution.

Scale shape (100 TB honest):
- stage 1 is a map: per-doc DISTINCT shingles (set built where the row
  lives); the exchange carries (shingle, doc_id) pairs — O(total
  distinct-per-doc shingles), the same volume any shingle dedup ships.
- ONE crc32-bucketed groupby over the shingle string resolves the
  global min-doc winner per shingle AND folds the per-doc totals/novel
  counts to per-bucket partials (O(docs x buckets) rows) in the same
  pass — no join back to the corpus, no second shuffle of the pairs.
- the final reduce is a tiny bucketed sum keyed by doc_id, unioned with
  per-doc zero rows so shingle-less docs still emit novelty 0.0 (the
  oracle's LEFT JOIN ... COALESCE).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..bucket_agg import bucketed_group_agg
from .decontam import _doc_shingles
from .textstats import round6


def ngram_novelty(
    docs_ds,
    *,
    k: int = 3,
    num_buckets: int = 64,
    text_col: str = "text",
):
    """(doc_id, n_ngrams, n_novel, novelty) per document.

    ``n_ngrams`` counts the doc's DISTINCT k-token shingles;
    ``n_novel`` those whose corpus-wide min doc_id is this doc;
    ``novelty = round6(n_novel / n_ngrams)`` (0.0 when shingle-less —
    docs shorter than k tokens).
    """

    def emit_pairs(batch: pa.Table) -> pa.Table:
        doc_ids, shingles, buckets = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch[text_col].to_pylist()
        ):
            for s in _doc_shingles(text or "", k):
                doc_ids.append(doc_id)
                shingles.append(s)
                buckets.append(zlib.crc32(s.encode()) % num_buckets)
        return pa.table(
            {
                "_b": pa.array(buckets, pa.int32()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "s": pa.array(shingles, pa.string()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        # all pairs of a shingle land in one bucket: the min doc_id here
        # IS the global winner.  Fold straight to per-doc partials.
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        # dictionary-encode the shingle strings once per bucket
        codes = pa.compute.dictionary_encode(
            group["s"].combine_chunks()
        ).indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, codes))
        doc, codes = doc[order], codes[order]
        first = np.ones(len(codes), bool)
        if len(codes) > 1:
            first[1:] = codes[1:] != codes[:-1]
        # winner of each shingle = first row of its run (min doc_id)
        win_doc = doc[first]
        tot_doc, tot_n = np.unique(doc, return_counts=True)
        nov_doc, nov_n = np.unique(win_doc, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([tot_doc, nov_doc]), pa.int64()
                ),
                "n_ngrams": pa.array(
                    np.concatenate([tot_n, np.zeros(len(nov_n), np.int64)]),
                    pa.int64(),
                ),
                "n_novel": pa.array(
                    np.concatenate([np.zeros(len(tot_n), np.int64), nov_n]),
                    pa.int64(),
                ),
            }
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_ngrams": z, "n_novel": z})

    partials = (
        docs_ds.map_batches(emit_pairs, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .union(
            docs_ds.select_columns(["doc_id"]).map_batches(
                zero_rows, batch_format="pyarrow"
            )
        )
    )
    summed = bucketed_group_agg(
        partials,
        "doc_id",
        [("n_ngrams", "sum"), ("n_novel", "sum")],
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["sum(n_ngrams)"].to_numpy(zero_copy_only=False)
        v = batch["sum(n_novel)"].to_numpy(zero_copy_only=False)
        nov = [
            round6(float(vi) / float(ni)) if ni else 0.0
            for ni, vi in zip(n.tolist(), v.tolist())
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ngrams": pa.array(n, pa.int64()),
                "n_novel": pa.array(v, pa.int64()),
                "novelty": pa.array(nov, pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
