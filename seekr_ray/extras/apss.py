"""All-pairs sparse cosine similarity (APSS) over bag-of-words vectors.

The lexical complement of the embedding near-dup family
(extras/dedup.py cosine / extras/similarity.py ANN): document pairs
whose raw-term-frequency vectors have cosine >= threshold, computed
EXACTLY with integer sufficient statistics — dot products and squared
norms are int64 sums, the final ``dot / sqrt(norm2_a * norm2_b)`` is
one IEEE-exact expression mirrored op-for-op by the SQL oracle.

Shape (term-partitioned, the classic inverted-index self-join):

1. token rows (md5(token)-bucketed) — every posting of a term lands in
   ONE bucket, so per-bucket df counts are globally correct;
2. fused per-bucket kernel: df filter (``max_df``) + pair partial dots
   (triu per term, locally combined by packed pair key) + per-doc
   norm partials, emitted as one tagged stream;
3. one groupby routes pair partials to hash(pair) buckets and norm
   partials to hash(doc) buckets and sums both;
4. two co-partition passes (the extras/joins.py union+groupby kernel)
   stamp norm2_a / norm2_b onto each pair; threshold filter last.

``max_df`` is the semantic scale lever: cosine is computed over the
term space with df <= max_df.  Stop-like terms contribute near-zero
angle information but O(df^2) pair partials — at 10^12 docs the
unfiltered self-join is quadratic in the hottest term's df, so the
df cap is load-bearing, not an optimization (PPJoin-style prefix
filtering, which stays exact, lives in extras/dedup.py for Jaccard).

Doc ids pack into uint64 halves (must fit uint32 — asserted; wider id
spaces would switch to the 128-bit md5 pairing the dedup modules use).
Squared norms are bounded by (max tf)^2 * doc terms, so the int64
``norm2_a * norm2_b`` product in the cosine stays far from overflow
for any document under ~2^15 tokens; the kernel asserts it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import simple_tokens


def _tok_bucket(token: str, num_buckets: int) -> int:
    return int.from_bytes(
        hashlib.md5(token.encode()).digest()[:8], "little"
    ) % num_buckets


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) and (a.max() >= (1 << 32) or b.max() >= (1 << 32)):
        raise ValueError("cosine_pairs packs doc ids into uint32 halves")
    return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)


def cosine_pairs(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
    max_df_frac: float | None = None,
    num_buckets: int = 64,
):
    """Pairs (doc_a < doc_b) with bag-of-words cosine >= ``threshold``
    over the df-capped term space.  ``max_df_frac`` is the
    corpus-size-relative form of the cap (df <= frac · N, one cheap
    parquet-footer count()) — the scale-correct default, since an
    absolute cap silently empties the term space as N grows.  Output:
    (doc_a, doc_b, dot, norm2_a, norm2_b, cosine[6dp])."""
    if max_df is not None and max_df_frac is not None:
        raise ValueError("pass max_df or max_df_frac, not both")
    df_cap: float | None = max_df
    if max_df_frac is not None:
        # float multiply mirrored exactly by the SQL oracle's
        # `count(*) <= frac * (SELECT count(*) FROM documents)`
        df_cap = max_df_frac * docs_ds.count()

    def tok_rows(batch: pa.Table) -> pa.Table:
        out_b, out_t, out_d, out_f = [], [], [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            acc: dict[str, int] = {}
            for t in simple_tokens(text or ""):
                acc[t] = acc.get(t, 0) + 1
            for t, c in acc.items():
                out_b.append(_tok_bucket(t, num_buckets))
                out_t.append(t)
                out_d.append(did)
                out_f.append(c)
        return pa.table(
            {
                "_tb": pa.array(out_b, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "tf": pa.array(out_f, pa.int64()),
            }
        )

    def per_term_bucket(group: pa.Table) -> pa.Table:
        """df filter + pair partial dots + norm partials, one pass."""
        terms = group["term"].to_numpy(zero_copy_only=False)
        docs = group["doc_id"].to_numpy(zero_copy_only=False)
        tfs = group["tf"].to_numpy(zero_copy_only=False)
        codes, inv = np.unique(terms, return_inverse=True)
        df = np.bincount(inv, minlength=len(codes))
        if df_cap is not None:
            keep = df[inv] <= df_cap
            inv, docs, tfs = inv[keep], docs[keep], tfs[keep]
        order = np.lexsort((docs, inv))
        inv, docs, tfs = inv[order], docs[order], tfs[order]

        # pair partials: triu per term run, vectorized by run-length
        # class (copart.pairs_within_runs) over positions so both the
        # doc ids and the tf products index the same pairs
        from .copart import pairs_within_runs

        starts = np.flatnonzero(
            np.concatenate(([True], inv[1:] != inv[:-1])) if len(inv) else []
        )
        ends = np.append(starts[1:], len(inv))
        posi = np.arange(len(inv), dtype=np.int64)
        px, py = pairs_within_runs(posi, starts, ends)
        if len(px):
            pk = _pack(docs[px], docs[py])
            pv = tfs[px] * tfs[py]
            upk, pinv = np.unique(pk, return_inverse=True)  # local combine
            pdot = np.zeros(len(upk), np.int64)
            np.add.at(pdot, pinv, pv)  # exact int64 accumulation
        else:
            upk = np.empty(0, np.uint64)
            pdot = np.empty(0, np.int64)

        # norm partials (over the SAME filtered term space)
        udoc, dinv = (
            np.unique(docs, return_inverse=True)
            if len(docs)
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        n2 = np.zeros(len(udoc), np.int64)
        np.add.at(n2, dinv, tfs * tfs)

        pa_arr = (upk >> np.uint64(32)).astype(np.int64)
        pb_arr = (upk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        kind = np.concatenate(
            [np.zeros(len(upk), np.int8), np.ones(len(udoc), np.int8)]
        )
        a = np.concatenate([pa_arr, udoc.astype(np.int64)])
        b = np.concatenate([pb_arr, np.full(len(udoc), -1, np.int64)])
        v = np.concatenate([pdot, n2])
        # route: pairs by hash(pair), norms by hash(doc)
        rb = np.concatenate(
            [
                (upk % np.uint64(num_buckets)).astype(np.int64),
                (udoc % num_buckets).astype(np.int64),
            ]
        )
        return pa.table(
            {
                "_rb": pa.array(rb, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def sum_bucket(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        out = {"kind": [], "a": [], "b": [], "v": []}
        for k in (0, 1):
            m = kind == k
            if not m.any():
                continue
            if k == 0:
                key = _pack(a[m], b[m])
            else:
                key = a[m].astype(np.uint64)
            uk, kinv = np.unique(key, return_inverse=True)
            sv = np.zeros(len(uk), np.int64)
            np.add.at(sv, kinv, v[m])  # exact int64 accumulation
            out["kind"].append(np.full(len(uk), k, np.int8))
            if k == 0:
                out["a"].append((uk >> np.uint64(32)).astype(np.int64))
                out["b"].append(
                    (uk & np.uint64(0xFFFFFFFF)).astype(np.int64)
                )
            else:
                out["a"].append(uk.astype(np.int64))
                out["b"].append(np.full(len(uk), -1, np.int64))
            out["v"].append(sv)
        if not out["kind"]:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "kind": pa.array(np.concatenate(out["kind"]), pa.int8()),
                "a": pa.array(np.concatenate(out["a"]), pa.int64()),
                "b": pa.array(np.concatenate(out["b"]), pa.int64()),
                "v": pa.array(np.concatenate(out["v"]), pa.int64()),
            }
        )

    summed = (
        docs_ds.map_batches(tok_rows, batch_format="pyarrow")
        .groupby("_tb")
        .map_groups(per_term_bucket, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(sum_bucket, batch_format="pyarrow")
        .materialize()  # consumed by the pair stream and both attach passes
    )

    def split(kind_val: int):
        def fn(batch: pa.Table) -> pa.Table:
            m = pa.compute.equal(batch["kind"], kind_val)
            return batch.filter(m)

        return fn

    pairs = summed.map_batches(split(0), batch_format="pyarrow")
    norms = summed.map_batches(split(1), batch_format="pyarrow")

    from .copart import attach_value

    pairs = pairs.map_batches(
        lambda t: t.select(["a", "b", "v"]).rename_columns(
            ["doc_a", "doc_b", "dot"]
        ),
        batch_format="pyarrow",
    )
    with_na = attach_value(
        pairs,
        norms,
        key_col="doc_a",
        out_col="norm2_a",
        carry=["doc_b", "dot"],
        num_buckets=num_buckets,
        lookup_key="a",
        lookup_value="v",
    )
    with_nb = attach_value(
        with_na,
        norms,
        key_col="doc_b",
        out_col="norm2_b",
        carry=["doc_a", "dot", "norm2_a"],
        num_buckets=num_buckets,
        lookup_key="a",
        lookup_value="v",
    )

    def finish(batch: pa.Table) -> pa.Table:
        dot = batch["dot"].to_numpy(zero_copy_only=False)
        na = batch["norm2_a"].to_numpy(zero_copy_only=False)
        nb = batch["norm2_b"].to_numpy(zero_copy_only=False)
        prod = na * nb  # int64; bounded — see module docstring
        assert (prod >= 0).all(), "norm2 product overflowed int64"
        # one mirrored expression: dot::DOUBLE / sqrt((na*nb)::DOUBLE)
        cos = dot.astype(np.float64) / np.sqrt(prod.astype(np.float64))
        m = cos >= threshold
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(m)),
                "doc_b": batch["doc_b"].filter(pa.array(m)),
                "dot": pa.array(dot[m], pa.int64()),
                "norm2_a": pa.array(na[m], pa.int64()),
                "norm2_b": pa.array(nb[m], pa.int64()),
                "cosine": pa.array(np.round(cos[m], 6), pa.float64()),
            }
        )

    return with_nb.map_batches(finish, batch_format="pyarrow")


def knn_graph(
    docs_ds,
    *,
    k: int = 3,
    eps: float = 0.1,
    max_df_frac: float = 0.2,
    num_buckets: int = 64,
):
    """ε-thresholded k-nearest-neighbor graph over bag-of-words cosine:
    each doc's top-``k`` neighbors (cosine ≥ ``eps``), ranked by
    (rounded cosine desc, neighbor id asc) — the doc-similarity graph
    near-dup clustering and diversity sampling consume.

    Built on :func:`cosine_pairs` (the inverted-index self-join does the
    heavy lifting; ε keeps the candidate set sub-quadratic the standard
    way), then symmetrized and reduced per source with one hash-bucketed
    vectorized segment-head-k — no per-doc Python, no global sort.
    Docs whose best neighbor sits below ε simply have < k rows.

    Output: ``(src, dst, rank, cosine)`` with rank 1-based.
    """
    pairs = cosine_pairs(docs_ds, threshold=eps, max_df_frac=max_df_frac)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b])
        return pa.table(
            {
                "_b": pa.array(
                    (src % num_buckets).astype(np.int64), pa.int64()
                ),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "cosine": pa.array(np.concatenate([c, c]), pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        cos = group["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, -cos, src))
        src, dst, cos = src[order], dst[order], cos[order]
        starts = np.zeros(len(src), bool)
        if len(src):
            starts[0] = True
            starts[1:] = src[1:] != src[:-1]
        run_start = np.maximum.accumulate(
            np.where(starts, np.arange(len(src)), 0)
        )
        rank = np.arange(len(src)) - run_start + 1
        keep = rank <= k
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
                "rank": pa.array(rank[keep].astype(np.int64), pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return (
        pairs.map_batches(sym, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(topk, batch_format="pyarrow")
    )
