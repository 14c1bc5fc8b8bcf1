"""End-to-end corpus curation ACTION with resumable sharded output —
the composition a 100-TB training-data run actually executes:

    exact dedup (corpus-global) -> PII scrub -> quality + repetition
    gates -> rewritten corpus parquet, one output shard per input
    fragment.

Resume contract (the build pipeline's discipline applied to curation):

* stage 0 (once): the exact-dup LOSER id set — sha256 bucketed groupby,
  min doc_id wins — lands in ``out_dir/_drops/`` behind a ``_SUCCESS``
  marker; a re-run reuses it without re-hashing the corpus.
* stage 1 (per input fragment): each fragment rewrites to
  ``out_dir/part-XXXXX.parquet`` via an atomic tmp+rename; a re-run
  SKIPS fragments whose shard already exists, so a failed run resumes
  from the crash point and never produces a torn shard.

Scale notes: the only exchange is the narrow (sha-bucket) dedup
groupby; fragments rewrite independently (embarrassingly parallel, one
Ray task each — the write-side-sink case where the Dataset API's
single-sink ``write_parquet`` cannot express per-fragment resume).  The
loser-id set broadcasts once via ``ray.put`` as a sorted int64 array
(O(losers); at a scale where losers outgrow a broadcast, swap for the
bucketed anti-join ``joins.key_filter_join`` demonstrates).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .repetition import doc_repetition_signals
from .scrub import scrub_text
from .textstats import simple_tokens


def _input_fragments(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


def _compute_drops(input_path: str, out_dir: str, text_col: str) -> np.ndarray:
    """Exact-dup LOSER ids (corpus-global, min doc_id wins — the build
    pipeline's first-wins law), cached under ``out_dir/_drops/`` behind
    a ``_SUCCESS`` marker.  One narrow (sha, doc_id) bucketed exchange;
    only the loser id column ever reaches the driver."""
    import hashlib

    import ray.data as rd

    drops_dir = os.path.join(out_dir, "_drops")
    done = os.path.join(drops_dir, "_SUCCESS")
    path = os.path.join(drops_dir, "drops.parquet")
    if os.path.exists(done):
        return pq.read_table(path)["doc_id"].to_numpy(zero_copy_only=False)
    os.makedirs(drops_dir, exist_ok=True)

    def add_sha(batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256((t or "").encode()).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        buckets = [int(s[:8], 16) % 64 for s in shas]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sha": pa.array(shas, pa.string()),
                "_b": pa.array(buckets, pa.int64()),
            }
        )

    def losers(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("sha", "ascending"), ("doc_id", "ascending")]
        )
        t = group.take(order)
        shas = np.asarray(t["sha"].to_pylist(), dtype=object)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = shas[1:] != shas[:-1]
        return pa.table({"doc_id": pa.array(ids[~first], pa.int64())})

    parts = [
        t["doc_id"].to_numpy(zero_copy_only=False)
        for t in (
            rd.read_parquet(input_path, columns=["doc_id", text_col])
            .map_batches(add_sha, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(losers, batch_format="pyarrow")
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    arr = (
        np.sort(np.concatenate(parts)).astype(np.int64)
        if parts
        else np.empty(0, dtype=np.int64)
    )
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(arr, pa.int64())}), tmp)
    os.replace(tmp, path)
    open(done, "w").close()
    return arr


def curate_write(
    input_path: str,
    out_dir: str,
    *,
    text_col: str = "text",
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.5,
    max_top_bigram_share: float = 0.5,
) -> dict:
    """Run the curation ACTION over ``input_path`` (parquet file or
    directory of fragments), writing the scrubbed surviving corpus to
    ``out_dir`` with per-fragment resume.  Returns
    ``{n_shards, shards_written, shards_skipped, n_in, n_out}``
    (n_in/n_out cover only the shards written THIS run)."""
    import ray

    from ..nputil import isin_sorted

    frags = _input_fragments(input_path)
    os.makedirs(out_dir, exist_ok=True)
    drops = _compute_drops(input_path, out_dir, text_col)
    drops_ref = ray.put(drops)

    @ray.remote
    def process(frag: str, out_path: str) -> tuple[int, int]:
        tbl = pq.read_table(frag)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        dr = ray.get(drops_ref)
        is_dup, _ = isin_sorted(dr, ids)
        tbl = tbl.filter(pa.array(~is_dup))
        out_ids: list[int] = []
        out_text: list[str] = []
        for doc_id, text in zip(
            tbl["doc_id"].to_pylist(), tbl[text_col].to_pylist()
        ):
            t = text or ""
            n_lines, n_dist, n_big, top, _ = doc_repetition_signals(t)
            if (n_lines - n_dist) / n_lines > max_dup_line_frac:
                continue
            if n_big and top / n_big > max_top_bigram_share:
                continue
            if len(simple_tokens(t)) < min_tokens:
                continue
            out_ids.append(doc_id)
            out_text.append(scrub_text(t)[0])
        out = pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                text_col: pa.array(out_text, pa.large_string()),
            }
        )
        tmp = out_path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, out_path)  # atomic: no torn shard survives
        return len(ids), out.num_rows

    futures = []
    skipped = 0
    for i, frag in enumerate(frags):
        out_path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if os.path.exists(out_path):
            skipped += 1  # resume: shard already committed
            continue
        futures.append(process.remote(frag, out_path))
    n_in = n_out = 0
    for a, b in ray.get(futures):
        n_in += a
        n_out += b
    return {
        "n_shards": len(frags),
        "shards_written": len(futures),
        "shards_skipped": skipped,
        "n_in": n_in,
        "n_out": n_out,
    }


def neardup_write(
    input_path: str,
    out_dir: str,
    *,
    text_col: str = "text",
    threshold: float = 0.8,
    num_bands: int = 16,
    rows_per_band: int = 4,
    shingle_k: int = 3,
) -> dict:
    """Near-dup ACTION with the same resume contract as
    ``curate_write``: MinHash-LSH clusters (identity collapse +
    verified pairs, see ``dedup.minhash_dedup_clusters_ds``) decide the
    LOSERS — every cluster member except its min-doc_id winner — and
    the corpus rewrites fragment-by-fragment without them.  The loser
    id set caches under ``out_dir/_neardrops/`` behind ``_SUCCESS``;
    shards commit atomically and re-runs skip finished ones."""
    import ray
    import ray.data as rd

    from ..nputil import isin_sorted
    from .dedup import minhash_dedup_clusters_ds

    frags = _input_fragments(input_path)
    os.makedirs(out_dir, exist_ok=True)
    drops_dir = os.path.join(out_dir, "_neardrops")
    done = os.path.join(drops_dir, "_SUCCESS")
    path = os.path.join(drops_dir, "drops.parquet")
    if os.path.exists(done):
        drops = pq.read_table(path)["doc_id"].to_numpy(zero_copy_only=False)
    else:
        os.makedirs(drops_dir, exist_ok=True)
        clusters = minhash_dedup_clusters_ds(
            rd.read_parquet(input_path, columns=["doc_id", text_col]),
            threshold=threshold,
            num_bands=num_bands,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
            text_col=text_col,
        )

        def losers(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            cl = batch["cluster_id"].to_numpy(zero_copy_only=False)
            # cluster_id IS the winner (min doc_id of the component)
            return pa.table(
                {"doc_id": pa.array(ids[ids != cl], pa.int64())}
            )

        parts = [
            t["doc_id"].to_numpy(zero_copy_only=False)
            for t in clusters.map_batches(
                losers, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            if t.num_rows
        ]
        drops = (
            np.sort(np.concatenate(parts)).astype(np.int64)
            if parts
            else np.empty(0, dtype=np.int64)
        )
        tmp = path + ".tmp"
        pq.write_table(
            pa.table({"doc_id": pa.array(drops, pa.int64())}), tmp
        )
        os.replace(tmp, path)
        open(done, "w").close()
    drops_ref = ray.put(drops)

    @ray.remote
    def process(frag: str, out_path: str) -> tuple[int, int]:
        tbl = pq.read_table(frag)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        dr = ray.get(drops_ref)
        is_dup, _ = isin_sorted(dr, ids)
        out = tbl.filter(pa.array(~is_dup))
        tmp = out_path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, out_path)
        return len(ids), out.num_rows

    futures = []
    skipped = 0
    for i, frag in enumerate(frags):
        out_path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if os.path.exists(out_path):
            skipped += 1
            continue
        futures.append(process.remote(frag, out_path))
    n_in = n_out = 0
    for a, b in ray.get(futures):
        n_in += a
        n_out += b
    return {
        "n_shards": len(frags),
        "shards_written": len(futures),
        "shards_skipped": skipped,
        "n_in": n_in,
        "n_out": n_out,
    }
