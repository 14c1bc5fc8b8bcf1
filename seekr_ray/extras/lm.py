"""Corpus-statistics language-model operators over the shared simplified
tokenization: per-document TF-IDF keyword extraction and an add-one-
smoothed bigram-LM quality score.

Both are classic training-data curation signals: keywords give cheap
per-document topical metadata (tags, clustering features, index-time
boost terms), and the bigram log-probability is the CCNet/Gopher-style
"LM quality" filter — documents whose token transitions are improbable
under the corpus's own bigram model (boilerplate, minified code, OCR
noise) score low and can be dropped before training.

Reference parity note: the reference engine computes tf·idf with
idf = log10(N/df) per term (`Indexer.java` ranking); ``tfidf_keywords``
reuses exactly that weighting, reduced to the simplified shared
tokenization so the DuckDB oracle is expressible (the faithful
Porter-stemmed path is exercised by the corpus_* entries).

Scale notes
-----------
* The df/bigram count aggregations are hash-bucketed exchanges
  (``bucketed_group_agg``) — no O(vocab) groupby on the driver.
* ``tfidf_keywords`` scores with either a broadcast df map
  (``strategy="broadcast"``, O(vocab) object-store payload published
  once via ``ray.put`` — right up to ~10^7 terms) or a distributed
  co-partition join on term-hash buckets plus a bucketed per-doc top-k
  (``strategy="join"`` — the open-vocabulary path; the exchange is
  O(distinct (doc, term) pairs), the same magnitude the postings build
  already shuffles).  ``strategy=None`` auto-picks by materialized df
  row count.  Both paths are asserted equal in tests.
* ``bigram_lm_quality`` never broadcasts the bigram table (O(distinct
  bigrams) ~ O(tokens) at web scale): the per-bigram log-probability is
  attached by a distributed co-partition join, pre-quantized to integer
  micro-units so the per-doc reduction is an exact integer sum
  regardless of summation order.
* Joins here are the union + bucketed-groupby co-partition idiom of
  extras/joins.py, NOT ``Dataset.join``: Ray 2.49's hash-join
  aggregator intermittently builds a schema-less right partition when
  a partition receives no right-side shard (reproduced at 16 CPUs on
  sf0.01: ``ArrowInvalid: No match ... FieldRef.Name(w1)`` in
  ``HashShuffleAggregator.finalize``), which the sort-based exchange
  does not suffer from.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .textstats import round6, simple_tokens

# one block's docs always fit these partials: each document's text is a
# single row, so all per-doc state is block-local by construction


def _tok_codes(texts: list) -> tuple[list, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a block: (tok_lists, flat codes, block vocab, offsets)."""
    tok_lists = [simple_tokens(t or "") for t in texts]
    lens = np.fromiter((len(ts) for ts in tok_lists), np.int64, len(tok_lists))
    flat = [tok for ts in tok_lists for tok in ts]
    if flat:
        vocab, codes = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    else:
        vocab, codes = np.empty(0, dtype=object), np.empty(0, np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    return tok_lists, codes, vocab, offs


def _df_table(docs_ds, text_col: str):
    """(term, df) per distinct term + a ``""`` sentinel row carrying the
    corpus doc count N (``simple_tokens`` never yields "").  Bucketed
    distributed aggregate; output is materialized (O(vocab) rows —
    small next to the corpus) so callers can count and reuse it."""
    from ..bucket_agg import bucketed_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        n = 0
        for t in batch[text_col].to_pylist():
            n += 1
            for tok in set(simple_tokens(t or "")):
                acc[tok] = acc.get(tok, 0) + 1
        terms = [("", n), *acc.items()]
        return pa.table(
            {
                "term": pa.array([t for t, _ in terms], pa.string()),
                "c": pa.array([c for _, c in terms], pa.int64()),
            }
        )

    return bucketed_group_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        "term",
        [("c", "sum")],
    ).materialize()


_BROADCAST_VOCAB_LIMIT = 10_000_000  # ~160 MB of (term, df) — past this, join


def tfidf_keywords(
    docs_ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str | None = None,
    num_buckets: int = 64,
):
    """Top-``k`` TF-IDF keywords per document.

    score = (c / doclen) · log10(N / df), ranked per doc by
    (raw score desc, term asc); output ``(doc_id, rank, term, score)``
    with rank 1-based and score rounded to 6dp.  Docs with no tokens
    emit nothing.  The float expression mirrors the DuckDB oracle
    operation-for-operation, so ranking and 6dp outputs are bit-equal.
    """
    import ray
    import ray.data  # noqa: F401

    dfs_ds = _df_table(docs_ds, text_col)
    if strategy is None:
        strategy = (
            "broadcast" if dfs_ds.count() <= _BROADCAST_VOCAB_LIMIT else "join"
        )

    if strategy == "broadcast":
        df_tbl = dfs_ds.to_pandas()
        sent = df_tbl["term"] == ""
        n_docs = int(df_tbl.loc[sent, "sum(c)"].iloc[0]) if sent.any() else 0
        keys = df_tbl.loc[~sent, "term"].to_numpy(dtype=object)
        vals = df_tbl.loc[~sent, "sum(c)"].to_numpy(dtype=np.int64)
        order = np.argsort(keys)
        stats_ref = ray.put((keys[order], vals[order], n_docs))

        def score_block(batch: pa.Table) -> pa.Table:
            skeys, sdfs, n = ray.get(stats_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            tok_lists, codes, vocab, offs = _tok_codes(
                batch[text_col].to_pylist()
            )
            # block-vocab -> global df, one searchsorted per block
            if len(vocab):
                pos = np.minimum(
                    np.searchsorted(skeys, vocab), max(len(skeys) - 1, 0)
                )
                vdf = np.where(
                    len(skeys) and skeys[pos] == vocab, sdfs[pos], 1
                ).astype(np.int64)
            else:
                vdf = np.empty(0, np.int64)
            out_d, out_r, out_t, out_s = [], [], [], []
            for i in range(len(tok_lists)):
                dc, cnt = np.unique(
                    codes[offs[i] : offs[i + 1]], return_counts=True
                )
                if len(dc) == 0:
                    continue
                dl = int(offs[i + 1] - offs[i])
                s = (cnt / dl) * np.log10(n / vdf[dc])
                top = np.lexsort((dc, -s))[:k]
                out_d.extend([int(ids[i])] * len(top))
                out_r.extend(range(1, len(top) + 1))
                out_t.extend(vocab[dc[top]])
                out_s.extend(round6(float(x)) for x in s[top])
            return pa.table(
                {
                    id_col: pa.array(out_d, pa.int64()),
                    "rank": pa.array(out_r, pa.int64()),
                    "term": pa.array(out_t, pa.string()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

        return docs_ds.map_batches(score_block, batch_format="pyarrow")

    if strategy != "join":
        raise ValueError(f"unknown strategy: {strategy!r}")

    # open-vocabulary path: per-doc (term, c, dl) rows co-partition with
    # the df table on a term-hash bucket (the repo's union + bucketed
    # groupby join idiom — Ray's JoinOperator intermittently loses the
    # right-side schema on sparse partitions — reproduced on a 16-CPU
    # sf0.01 run: ArrowInvalid FieldRef w1 in HashShuffleAggregator), a
    # bucketed per-doc top-k
    import pyarrow.compute as pc

    from ..bucket_agg import _bucket_ids

    n_docs = int(
        dfs_ds.map_batches(
            lambda b: b.filter(pc.equal(b["term"], "")),
            batch_format="pyarrow",
        ).to_pandas()["sum(c)"].sum()
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tok_lists, codes, vocab, offs = _tok_codes(batch[text_col].to_pylist())
        out_d, out_t, out_c, out_l = [], [], [], []
        for i in range(len(tok_lists)):
            dc, cnt = np.unique(codes[offs[i] : offs[i + 1]], return_counts=True)
            dl = int(offs[i + 1] - offs[i])
            out_d.extend([int(ids[i])] * len(dc))
            out_t.extend(vocab[dc])
            out_c.extend(int(x) for x in cnt)
            out_l.extend([dl] * len(dc))
        return pa.table(
            {
                id_col: pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "c": pa.array(out_c, pa.int64()),
                "dl": pa.array(out_l, pa.int64()),
            }
        )

    rows = docs_ds.map_batches(tf_rows, batch_format="pyarrow")

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "_b": pa.array(_bucket_ids(batch, ["term"], num_buckets)),
                "_side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "term": batch["term"],
                id_col: batch[id_col],
                "c": batch["c"],
                "dl": batch["dl"],
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.invert(pc.equal(batch["term"], "")))
        n = b.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "_b": pa.array(_bucket_ids(b, ["term"], num_buckets)),
                "_side": pa.array(np.ones(n, np.int8), pa.int8()),
                "term": b["term"],
                id_col: z,
                "c": b["sum(c)"],  # df rides in c on the right side
                "dl": z,
            }
        )

    tagged = rows.map_batches(tag_left, batch_format="pyarrow").union(
        dfs_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def joined_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        cs = group["c"].to_numpy(zero_copy_only=False)
        right = side == 1
        rterms, rdf = terms[right], cs[right]
        ro = np.argsort(rterms)
        rterms, rdf = rterms[ro], rdf[ro]
        lm = ~right
        lt, lc = terms[lm], cs[lm]
        ld = group["dl"].to_numpy(zero_copy_only=False)[lm]
        lids = group[id_col].to_numpy(zero_copy_only=False)[lm]
        if len(rterms) == 0 or len(lt) == 0:
            return pa.table(
                {
                    "_b2": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "s": pa.array([], pa.float64()),
                }
            )
        pos = np.minimum(np.searchsorted(rterms, lt), len(rterms) - 1)
        found = rterms[pos] == lt  # always true: the df pass saw every term
        sel = np.flatnonzero(found)
        s = (lc[sel] / ld[sel]) * np.log10(n_docs / rdf[pos[sel]])
        return pa.table(
            {
                "_b2": pa.array(
                    (lids[sel] % num_buckets).astype(np.int64), pa.int64()
                ),
                id_col: pa.array(lids[sel], pa.int64()),
                "term": pa.array(lt[sel], pa.string()),
                "s": pa.array(s, pa.float64()),
            }
        )

    joined = tagged.groupby("_b").map_groups(
        joined_bucket, batch_format="pyarrow"
    )

    def final(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        # string tie-break via block codes (code order == lexicographic)
        _, tcodes = np.unique(terms, return_inverse=True)
        order = np.lexsort((tcodes, -s, ids))
        oid = ids[order]
        new = np.ones(len(oid), bool)
        if len(oid) > 1:
            new[1:] = oid[1:] != oid[:-1]
        starts = np.flatnonzero(new)
        rank = (
            np.arange(len(oid))
            - np.repeat(starts, np.diff(np.r_[starts, len(oid)]))
        )
        keep = order[rank < k]
        kr = rank[rank < k] + 1
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "rank": pa.array(kr, pa.int64()),
                "term": pa.array(terms[keep], pa.string()),
                "score": pa.array(
                    [round6(float(x)) for x in s[keep]], pa.float64()
                ),
            }
        )

    return joined.groupby("_b2").map_groups(final, batch_format="pyarrow")


def _round_micro(x: np.ndarray) -> np.ndarray:
    """DuckDB ROUND(x*1e6) — half away from zero on the PRODUCT."""
    m = x * 1e6
    return (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)


def bigram_lm_quality(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Per-document mean bigram log10-probability under the corpus's own
    add-one-smoothed bigram model.

    For each consecutive token pair (w1, w2):
        lp = log10((c2(w1,w2) + 1) / (c1(w1) + V))
    with c2 = corpus bigram count, c1 = corpus count of w1 as a bigram
    prefix, and V = number of distinct prefix tokens.  Each distinct
    bigram's lp is quantized ONCE to integer micro-units (ROUND(lp·1e6)
    half-away-from-zero — the DuckDB ROUND), so the per-doc reduction
    Σ c·micro is an exact integer sum — order-free, hash-stable.

    Output: ``(doc_id, n_bigrams, lm_score)`` where
    lm_score = ROUND((Σ c·micro / 1e6) / n_bigrams, 6); docs with fewer
    than 2 tokens emit nothing.
    """
    import ray.data  # noqa: F401

    from ..bucket_agg import bucketed_group_agg

    def bigram_rows(batch: pa.Table) -> pa.Table:
        """(doc_id, big, w1, c) — per-doc distinct bigram counts."""
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tok_lists, codes, vocab, offs = _tok_codes(batch[text_col].to_pylist())
        out_d, out_b, out_w, out_c = [], [], [], []
        nv = max(len(vocab), 1)
        for i in range(len(tok_lists)):
            seg = codes[offs[i] : offs[i + 1]]
            if len(seg) < 2:
                continue
            pair_key = seg[:-1] * nv + seg[1:]
            uk, cnt = np.unique(pair_key, return_counts=True)
            a, b = uk // nv, uk % nv
            out_d.extend([int(ids[i])] * len(uk))
            out_b.extend(
                f"{vocab[x]} {vocab[y]}" for x, y in zip(a, b)
            )
            out_w.extend(vocab[a])
            out_c.extend(int(x) for x in cnt)
        return pa.table(
            {
                id_col: pa.array(out_d, pa.int64()),
                "big": pa.array(out_b, pa.string()),
                "w1": pa.array(out_w, pa.string()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    from ..bucket_agg import _bucket_ids

    rows = docs_ds.map_batches(bigram_rows, batch_format="pyarrow").materialize()

    c2 = bucketed_group_agg(
        rows.select_columns(["big", "w1", "c"]), ["big", "w1"], [("c", "sum")]
    ).map_batches(
        lambda b: b.select(["big", "w1", "sum(c)"]).rename_columns(
            ["big", "w1", "c2"]
        ),
        batch_format="pyarrow",
    )
    c1 = bucketed_group_agg(
        rows.select_columns(["w1", "c"]), "w1", [("c", "sum")]
    ).map_batches(
        lambda b: b.rename_columns(["w1", "c1"]), batch_format="pyarrow"
    ).materialize()
    v = c1.count()

    # params: one row per distinct bigram with its pre-quantized lp.
    # Both joins below use the union + bucketed-groupby co-partition
    # idiom (extras/joins.py) — never a broadcast (O(distinct bigrams)
    # is O(corpus tokens) at web scale) and never Ray's JoinOperator
    # (intermittent right-side schema loss on sparse partitions).
    def tag_pair(side_id: int, big_col, w1_col, x_col):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "_b": pa.array(_bucket_ids(batch, [w1_col], num_buckets)),
                    "_side": pa.array(
                        np.full(n, side_id, np.int8), pa.int8()
                    ),
                    "w1": batch[w1_col],
                    "big": batch[big_col]
                    if big_col is not None
                    else pa.array([""] * n, pa.string()),
                    "x": batch[x_col],
                }
            )

        return fn

    tagged_a = c2.map_batches(
        tag_pair(0, "big", "w1", "c2"), batch_format="pyarrow"
    ).union(
        c1.map_batches(tag_pair(1, None, "w1", "c1"), batch_format="pyarrow")
    )

    def lp_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        w1 = np.asarray(group["w1"].to_pylist(), dtype=object)
        x = group["x"].to_numpy(zero_copy_only=False)
        right = side == 1
        rw, rc1 = w1[right], x[right]
        ro = np.argsort(rw)
        rw, rc1 = rw[ro], rc1[ro]
        lm = ~right
        if len(rw) == 0 or not lm.any():
            return pa.table(
                {
                    "big": pa.array([], pa.string()),
                    "micro": pa.array([], pa.int64()),
                }
            )
        lw, lc2 = w1[lm], x[lm]
        bigs = np.asarray(group["big"].to_pylist(), dtype=object)[lm]
        pos = np.minimum(np.searchsorted(rw, lw), len(rw) - 1)
        sel = np.flatnonzero(rw[pos] == lw)  # always all: c1 saw every w1
        lp = np.log10((lc2[sel] + 1) / (rc1[pos[sel]] + v))
        return pa.table(
            {
                "big": pa.array(bigs[sel], pa.string()),
                "micro": pa.array(_round_micro(lp), pa.int64()),
            }
        )

    lp_tbl = tagged_a.groupby("_b").map_groups(
        lp_bucket, batch_format="pyarrow"
    )

    def tag_row(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "_b": pa.array(_bucket_ids(batch, ["big"], num_buckets)),
                "_side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "big": batch["big"],
                id_col: batch[id_col],
                "x": batch["c"],
            }
        )

    def tag_lp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "_b": pa.array(_bucket_ids(batch, ["big"], num_buckets)),
                "_side": pa.array(np.ones(n, np.int8), pa.int8()),
                "big": batch["big"],
                id_col: pa.array(np.zeros(n, np.int64), pa.int64()),
                "x": batch["micro"],
            }
        )

    tagged_b = rows.map_batches(tag_row, batch_format="pyarrow").union(
        lp_tbl.map_batches(tag_lp, batch_format="pyarrow")
    )

    def weight_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        big = np.asarray(group["big"].to_pylist(), dtype=object)
        x = group["x"].to_numpy(zero_copy_only=False)
        right = side == 1
        rb, rm = big[right], x[right]
        ro = np.argsort(rb)
        rb, rm = rb[ro], rm[ro]
        lm = ~right
        if len(rb) == 0 or not lm.any():
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "wm": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        lb, lc = big[lm], x[lm]
        lids = group[id_col].to_numpy(zero_copy_only=False)[lm]
        pos = np.minimum(np.searchsorted(rb, lb), len(rb) - 1)
        sel = np.flatnonzero(rb[pos] == lb)  # always all: c2 saw every bigram
        return pa.table(
            {
                id_col: pa.array(lids[sel], pa.int64()),
                "wm": pa.array(lc[sel] * rm[pos[sel]], pa.int64()),
                "c": pa.array(lc[sel], pa.int64()),
            }
        )

    per_doc = bucketed_group_agg(
        tagged_b.groupby("_b").map_groups(weight_bucket, batch_format="pyarrow"),
        id_col,
        [("wm", "sum"), ("c", "sum")],
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        sm = batch["sum(wm)"].to_numpy(zero_copy_only=False)
        nb = batch["sum(c)"].to_numpy(zero_copy_only=False)
        score = np.array(
            [round6((float(s) / 1e6) / int(n)) for s, n in zip(sm, nb)],
            np.float64,
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(nb, pa.int64()),
                "lm_score": pa.array(score, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")
