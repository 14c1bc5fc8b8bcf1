"""Canonical-document selection: given near-dup clusters, keep ONE
winner per cluster — the dedup *action* that follows cluster discovery
(extras/dedup.minhash_dedup_clusters finds the groups; this picks the
survivor and sizes the drop set).

Winner law: most tokens first (keep the richest variant), doc_id
ascending as the deterministic tiebreak — the same keep-the-best rule
C4/Gopher-style curation applies after MinHash clustering.

Scale shape (100 TB honest): cluster membership is a tiny fraction of
the corpus by LSH design (only docs in near-dup groups appear).  Token
counts for members are computed WHERE THE DOCS LIVE behind a broadcast
membership filter (`pc.is_in` against a ray.put array — the corpus
never shuffles); the winner reduce is a groupby over member rows only.
At a scale where even the membership table outgrows a broadcast, swap
the filter for a bucketed semi-join on doc_id (extras/joins.semi_join)
— the winner reduce is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import simple_tokens


def dedup_cluster_winners(docs_ds, clusters_tbl: pa.Table, text_col: str = "text"):
    """(cluster_id, winner_doc_id, winner_tokens, n_docs) per cluster.

    ``clusters_tbl``: (doc_id, cluster_id) — e.g. the output of
    ``minhash_dedup_clusters``.  Winner = max token count, then min
    doc_id; token count is ``len(simple_tokens(text))`` (the filtered
    token law every textstats oracle uses).
    """
    if clusters_tbl.num_rows == 0:
        return pa.table(
            {
                "cluster_id": pa.array([], pa.int64()),
                "winner_doc_id": pa.array([], pa.int64()),
                "winner_tokens": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
    member_ids = pc.unique(clusters_tbl["doc_id"].combine_chunks())
    cluster_of = dict(
        zip(
            clusters_tbl["doc_id"].to_pylist(),
            clusters_tbl["cluster_id"].to_pylist(),
        )
    )

    def member_counts(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.is_in(batch["doc_id"], member_ids))
        ids = kept["doc_id"].to_pylist()
        n = [len(simple_tokens(t or "")) for t in kept[text_col].to_pylist()]
        return pa.table(
            {
                "cluster_id": pa.array(
                    [cluster_of[i] for i in ids], pa.int64()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    def pick_winner(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        n = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -n))
        w = order[0]
        return pa.table(
            {
                "cluster_id": group["cluster_id"].slice(0, 1),
                "winner_doc_id": pa.array([int(doc[w])], pa.int64()),
                "winner_tokens": pa.array([int(n[w])], pa.int64()),
                "n_docs": pa.array([len(doc)], pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(member_counts, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(pick_winner, batch_format="pyarrow")
    )
