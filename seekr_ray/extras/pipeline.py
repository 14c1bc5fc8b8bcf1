"""End-to-end corpus curation ACTION with resumable sharded output —
the composition a 100-TB training-data run actually executes:

    exact dedup (corpus-global) -> repetition + min-token gates (on the
    ORIGINAL text — gate laws must match the oracled signal entries) ->
    PII scrub -> rewritten corpus parquet, one output shard per input
    fragment.

Resume contract (the build pipeline's discipline applied to curation):

* stage 0 (once): the exact-dup LOSER id set — sha256 bucketed groupby,
  min doc_id wins — lands in ``out_dir/_drops/`` behind a ``_SUCCESS``
  marker; a re-run reuses it without re-hashing the corpus.
* stage 1 (per input fragment): each fragment rewrites to
  ``out_dir/part-<fragment-basename>.parquet`` via an atomic
  tmp+rename; a re-run SKIPS fragments whose shard already exists, so a
  failed run resumes from the crash point and never produces a torn
  shard.  Shards are keyed by fragment NAME, not listing position —
  adding or removing a fragment cannot silently re-map existing shards
  — and the cached drop set records the fragment list it was computed
  over: if the inputs changed and the recomputed drop set differs, the
  run REFUSES to mix old shards with new drops rather than silently
  corrupting the output.

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

import hashlib
import json

from .repetition import doc_repetition_signals_with_tokens
from .scrub import scrub_text


def _input_fragments(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


def _shard_path(out_dir: str, frag: str) -> str:
    """Output shard keyed by the FRAGMENT's basename (stable under
    listing changes), never by its position in the sorted listing."""
    stem = os.path.splitext(os.path.basename(frag))[0]
    return os.path.join(out_dir, f"part-{stem}.parquet")


def _committed_shards(out_dir: str) -> list[str]:
    return [
        f
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    ]


def _load_or_compute_drops(
    drops_dir: str,
    frags: list[str],
    compute,
    *,
    params: dict | None = None,
    out_dir: str | None = None,
) -> np.ndarray:
    """Cached loser-id set with input validation: the ``_SUCCESS``
    marker records the fragment basenames, the drop-set sha256 AND the
    full parameter set that determined the output.  On resume with the
    same fragments and parameters the cache is reused.  With changed
    fragments the set recomputes, and if it DIFFERS from the recorded
    one the run refuses (old shards were filtered against different
    drops).  With changed PARAMETERS the run refuses whenever committed
    shards exist — they were written under the old gate/threshold
    settings and re-running would silently mix the two generations —
    and otherwise just recomputes (the stale cache is discarded)."""
    done = os.path.join(drops_dir, "_SUCCESS")
    path = os.path.join(drops_dir, "drops.parquet")
    frag_names = [os.path.basename(f) for f in frags]
    # JSON round-trip so the comparison sees the same normalization the
    # marker on disk went through (tuples->lists, int/float identity)
    params = json.loads(json.dumps(params or {}))
    if os.path.exists(done):
        with open(done) as f:
            marker = json.load(f)
        old_params = marker.get("params")
        if old_params is None:
            # legacy marker (written before params were recorded): the
            # old parameters are unknowable, so adopt the CURRENT call's
            # as recorded — but rewrite the marker below instead of
            # returning early from the cache hit, so the dir is
            # protected from the next parameter change onward
            if marker.get("fragments") == frag_names:
                arr = pq.read_table(path)["doc_id"].to_numpy(
                    zero_copy_only=False
                )
                sha = marker["drops_sha256"]
            else:
                arr = compute()
                sha = hashlib.sha256(arr.tobytes()).hexdigest()
                if sha != marker.get("drops_sha256"):
                    raise RuntimeError(
                        "input fragments changed AND the drop set "
                        "changed: existing shards were filtered against "
                        "different drops. Clear the output dir (or "
                        "restore the original inputs) and re-run."
                    )
        elif old_params != params:
            if out_dir is not None and _committed_shards(out_dir):
                raise RuntimeError(
                    f"curation parameters changed (recorded {old_params!r} "
                    f"!= current {params!r}) but committed shards exist: "
                    "they were written under the old parameters and would "
                    "silently mix with new output. Clear the output dir "
                    "and re-run."
                )
            # param-only change, nothing committed yet: the cached drop
            # set is stale — fall through and recompute it
            arr = compute()
            sha = hashlib.sha256(arr.tobytes()).hexdigest()
        elif marker.get("fragments") == frag_names:
            return pq.read_table(path)["doc_id"].to_numpy(
                zero_copy_only=False
            )
        else:
            arr = compute()
            sha = hashlib.sha256(arr.tobytes()).hexdigest()
            if sha != marker.get("drops_sha256"):
                raise RuntimeError(
                    "input fragments changed AND the drop set changed: "
                    "existing shards were filtered against different drops. "
                    "Clear the output dir (or restore the original inputs) "
                    "and re-run."
                )
    else:
        arr = compute()
        sha = hashlib.sha256(arr.tobytes()).hexdigest()
    os.makedirs(drops_dir, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(arr, pa.int64())}), tmp)
    os.replace(tmp, path)
    mtmp = done + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(
            {
                "fragments": frag_names,
                "drops_sha256": sha,
                "params": params,
            },
            f,
        )
    os.replace(mtmp, done)
    return arr


def _collect_ids(ds) -> np.ndarray:
    parts = [
        t["doc_id"].to_numpy(zero_copy_only=False)
        for t in ds.iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    return (
        np.sort(np.concatenate(parts)).astype(np.int64)
        if parts
        else np.empty(0, dtype=np.int64)
    )


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

    import ray.data as rd

    from .dedup import exact_dedup_losers

    frags = _input_fragments(input_path)
    os.makedirs(out_dir, exist_ok=True)
    drops = _load_or_compute_drops(
        os.path.join(out_dir, "_drops"),
        frags,
        lambda: _collect_ids(
            exact_dedup_losers(
                rd.read_parquet(input_path, columns=["doc_id", text_col]),
                text_col=text_col,
            )
        ),
        params={
            "text_col": text_col,
            "min_tokens": min_tokens,
            "max_dup_line_frac": max_dup_line_frac,
            "max_top_bigram_share": max_top_bigram_share,
        },
        out_dir=out_dir,
    )
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
            # one tokenization per doc: the signals helper returns the
            # token list it already computed for the bigram stats
            (n_lines, n_dist, n_big, top, _), toks = (
                doc_repetition_signals_with_tokens(t)
            )
            if (n_lines - n_dist) / n_lines > max_dup_line_frac:
                continue
            if n_big and top / n_big > max_top_bigram_share:
                continue
            if len(toks) < min_tokens:
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
    for frag in frags:
        out_path = _shard_path(out_dir, frag)
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

    def compute() -> np.ndarray:
        import shutil

        spills: list[str] = []
        clusters = minhash_dedup_clusters_ds(
            rd.read_parquet(input_path, columns=["doc_id", text_col]),
            threshold=threshold,
            num_bands=num_bands,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
            text_col=text_col,
            spill_registry=spills,
        )

        def losers(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            cl = batch["cluster_id"].to_numpy(zero_copy_only=False)
            # cluster_id IS the winner (min doc_id of the component)
            return pa.table(
                {"doc_id": pa.array(ids[ids != cl], pa.int64())}
            )

        out = _collect_ids(
            clusters.map_batches(losers, batch_format="pyarrow")
        )
        for d in spills:  # fully drained: reclaim the spill eagerly
            shutil.rmtree(d, ignore_errors=True)
        return out

    drops = _load_or_compute_drops(
        os.path.join(out_dir, "_neardrops"),
        frags,
        compute,
        params={
            "text_col": text_col,
            "threshold": threshold,
            "num_bands": num_bands,
            "rows_per_band": rows_per_band,
            "shingle_k": shingle_k,
        },
        out_dir=out_dir,
    )
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
    for frag in frags:
        out_path = _shard_path(out_dir, frag)
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
