"""Scale-path tests for the MinHash near-dup pipeline (round-4 items):

* the DISTRIBUTED tail — co-grouped-join Jaccard verify + Dataset
  min-label clustering — forced end-to-end via ``_CLUSTER_DRIVER_LIMIT=0``
  and asserted bit-equal to the driver fast path;
* the identity-collapse guard: a 10k-doc identical-content corpus (the
  vendored-license band-bucket blow-up) finishes in bounded time because
  it collapses to ONE representative before banding (O(m), not O(m^2));
* spanning-link band emission: identical connected components over the
  candidate graph at O(m) edges per bucket;
* the over-crowded-bucket cap for the pair-report form.
"""

import time

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.extras import dedup
from seekr_ray.extras.dedup import (
    _min_label_numpy,
    minhash_candidate_pairs,
    minhash_dedup_clusters,
)


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )


BASE = (
    "streaming executors schedule pipelined blocks with backpressure while "
    "actor pools hold tokenizer state across batches of arrow memory"
)


@pytest.fixture
def corpus():
    near = BASE.replace("memory", "ram")
    far = "unrelated treatise about birds migrating across continents yearly"
    far2 = "unrelated treatise about birds migrating across continents monthly"
    return [BASE, near, far, BASE, "", "", far2, BASE + " extra tokens here"]


def test_distributed_path_equals_driver_path(ray_session, corpus, monkeypatch):
    ds = _docs_ds(corpus)
    want = minhash_dedup_clusters(ds, threshold=0.4)
    monkeypatch.setattr(dedup, "_CLUSTER_DRIVER_LIMIT", 0)
    got = minhash_dedup_clusters(ds, threshold=0.4)
    assert want.num_rows > 0
    assert got.equals(want)


def test_min_label_edges_equals_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    a = rng.integers(0, 500, size=2000).astype(np.int64)
    b = (a + rng.integers(1, 50, size=2000)).astype(np.int64)
    nodes_np, labels_np = _min_label_numpy(a, b)
    edges_ds = rd.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b)})
    )
    nodes_ds, labels_ds = dedup._min_label_edges(edges_ds)
    assert np.array_equal(nodes_np, nodes_ds)
    assert np.array_equal(labels_np, labels_ds)


def test_identical_doc_bucket_is_bounded(ray_session):
    # 10k identical docs: pre-collapse this is ONE band bucket of 10k
    # docs in every band -> ~16 * 5e7 candidate pairs (a job-killer);
    # with identity collapse it is one rep, zero pairs, O(m) expansion.
    texts = [BASE] * 10_000 + ["solitary document about nothing shared"]
    ds = _docs_ds(texts)
    t0 = time.monotonic()
    out = minhash_dedup_clusters(ds, threshold=0.8)
    elapsed = time.monotonic() - t0
    assert out.num_rows == 10_000
    assert set(out["cluster_id"].to_pylist()) == {0}
    assert 10_000 not in set(out["doc_id"].to_pylist())
    # generous bound: the pre-collapse form would emit ~800M pairs and
    # not finish; the collapsed form is seconds
    assert elapsed < 120


def test_spanning_links_same_components(ray_session, corpus):
    ds = _docs_ds(corpus)
    pair_tbl = pa.concat_tables(
        minhash_candidate_pairs(ds).iter_batches(batch_format="pyarrow")
    )
    link_tbl = pa.concat_tables(
        minhash_candidate_pairs(ds, emit="links").iter_batches(
            batch_format="pyarrow"
        )
    )
    assert pair_tbl.num_rows >= link_tbl.num_rows > 0

    def comps(tbl):
        nodes, labels = _min_label_numpy(
            tbl["a"].to_numpy(zero_copy_only=False),
            tbl["b"].to_numpy(zero_copy_only=False),
        )
        return dict(zip(nodes.tolist(), labels.tolist()))

    assert comps(pair_tbl) == comps(link_tbl)


def test_pair_baseline_chunking_invariant(ray_session, corpus):
    # the exact O(n^2) baselines now ship block refs + row ranges to the
    # pair tasks (no driver payload loop); the result must not depend on
    # the chunk granularity
    from seekr_ray.extras.dedup import ngram_jaccard_pairs

    ds = _docs_ds(list(corpus) + [t + " tail" for t in corpus])
    fine = ngram_jaccard_pairs(ds, threshold=0.3, chunk_rows=3)
    coarse = ngram_jaccard_pairs(ds, threshold=0.3, chunk_rows=10_000)
    assert fine.num_rows > 0
    assert fine.equals(coarse)


def test_embedding_pairs_chunking_invariant(ray_session):
    import ray.data as rd

    from seekr_ray.extras.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(size=(12, 8))
    vecs = np.vstack([base, base + rng.normal(scale=0.01, size=(12, 8))])
    ds = rd.from_items(
        [
            {"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(len(vecs))
        ]
    )
    fine = embedding_neardup_pairs(ds, threshold=0.9, chunk_rows=5)
    coarse = embedding_neardup_pairs(ds, threshold=0.9, chunk_rows=10_000)
    assert fine.num_rows >= 12
    assert fine.equals(coarse)


def test_max_bucket_cap_drops_crowded_buckets(ray_session):
    # 40 identical docs -> every band bucket has 40 members; cap 8 drops
    # them all, leaving zero candidate pairs (and a logged drop count)
    ds = _docs_ds([BASE] * 40)
    capped_rows = sum(
        t.num_rows
        for t in minhash_candidate_pairs(ds, max_bucket=8).iter_batches(
            batch_format="pyarrow"
        )
    )
    assert capped_rows == 0
    full = pa.concat_tables(
        minhash_candidate_pairs(ds).iter_batches(batch_format="pyarrow")
    )
    assert full.num_rows == 40 * 39 // 2


def test_distributed_path_medium_corpus(ray_session, monkeypatch):
    """Distributed tail at a few hundred docs with heavy duplication:
    multi-batch co-grouped verify + Dataset min-label end-to-end, equal
    to the driver fast path, and the Dataset form streams the same rows."""
    import ray.data as rd

    from seekr_ray.extras.dedup import minhash_dedup_clusters_ds

    rng = np.random.default_rng(17)
    words = [f"token{w}" for w in range(50)]
    base_texts = [
        " ".join(rng.choice(words, size=30)) for _ in range(40)
    ]
    texts = []
    for i in range(600):
        b = base_texts[i % 40]
        if i % 3 == 1:
            b = b + " extra suffix tokens appended here"
        texts.append(b)
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
        override_num_blocks=8,
    )
    want = minhash_dedup_clusters(ds, threshold=0.6)
    assert want.num_rows > 500  # heavy duplication by construction
    monkeypatch.setattr(dedup, "_CLUSTER_DRIVER_LIMIT", 0)
    got = minhash_dedup_clusters(ds, threshold=0.6)
    assert got.equals(want)
    # Dataset form: same rows, unsorted
    got_ds = minhash_dedup_clusters_ds(ds, threshold=0.6)
    rows = sorted(
        (r["doc_id"], r["cluster_id"])
        for t in got_ds.iter_batches(batch_format="pyarrow")
        for r in t.to_pylist()
    )
    assert rows == list(
        zip(want["doc_id"].to_pylist(), want["cluster_id"].to_pylist())
    )


def test_span_dedup_semantics(ray_session):
    """Exact duplicate-span removal: shared k-gram windows are cut from
    EVERY occurrence (cross-doc and within-doc), short docs pass
    through whole, fully-boilerplate docs empty out."""
    import hashlib

    from seekr_ray.extras.spandedup import span_dedup_stats
    from seekr_ray.extras.textstats import simple_tokens

    header = (
        "licensed under apache version obtain copy of license "
        "distributed software basis"
    )
    docs = [
        (0, header + " unique alpha body retains tokens beyond boilerplate"),
        (1, header + " unique beta content differs after shared header"),
        (2, "entirely original text without shared window content anywhere"),
        (3, header),  # pure boilerplate: empties out
        (4, "tiny doc"),  # < k tokens: no windows, untouched
        (5, (
            "repeat cycle tokens forming identical windows repeat cycle "
            "tokens forming identical windows"
        )),  # WITHIN-doc duplication also counts
    ]
    ds = _docs_ds([t for _, t in docs])
    out = span_dedup_stats(ds, k=4).to_pandas().set_index("doc_id")
    # untouched docs keep their full token stream
    for d in (2, 4):
        toks = simple_tokens(docs[d][1])
        assert out.loc[d, "n_removed"] == 0
        assert (
            out.loc[d, "kept_md5"]
            == hashlib.md5(" ".join(toks).encode()).hexdigest()
        )
    # the shared header's windows are cut from docs 0, 1, 3
    hdr_len = len(simple_tokens(header))
    assert out.loc[3, "n_removed"] == hdr_len  # fully covered
    assert out.loc[3, "kept_md5"] == hashlib.md5(b"").hexdigest()
    assert out.loc[0, "n_removed"] >= hdr_len - 3  # prefix windows cut
    # within-doc repetition: the doc duplicates its own windows
    assert out.loc[5, "n_removed"] > 0


def test_span_dedup_rewrite_ds_matches_stats(ray_session):
    """The ACTION form's rewritten text must hash to exactly the stats
    form's kept_md5, row for row."""
    import hashlib

    from seekr_ray.extras.spandedup import (
        span_dedup_rewrite_ds,
        span_dedup_stats,
    )

    header = "shared prefix tokens repeated across documents everywhere"
    ds = _docs_ds(
        [header + " alpha tail", header + " beta tail", "standalone words"]
    )
    stats = span_dedup_stats(ds, k=3).to_pandas().set_index("doc_id")
    text = span_dedup_rewrite_ds(ds, k=3).to_pandas().set_index("doc_id")
    assert sorted(stats.index) == sorted(text.index)
    for d in stats.index:
        assert (
            hashlib.md5(text.loc[d, "text"].encode()).hexdigest()
            == stats.loc[d, "kept_md5"]
        )


def test_cogrouped_expand_equals_broadcast(ray_session, corpus, monkeypatch):
    """Round-5: the expand stage's label map no longer has to broadcast —
    above ``_EXPAND_BROADCAST_LIMIT`` it joins co-grouped on rep id.
    Force the gate to 0 and assert bit-equal output, alone and composed
    with the fully-distributed verify/cluster tail."""
    ds = _docs_ds(corpus)
    want = minhash_dedup_clusters(ds, threshold=0.4)
    assert want.num_rows > 0
    monkeypatch.setattr(dedup, "_EXPAND_BROADCAST_LIMIT", 0)
    got = minhash_dedup_clusters(ds, threshold=0.4)
    assert got.equals(want)
    monkeypatch.setattr(dedup, "_CLUSTER_DRIVER_LIMIT", 0)
    got2 = minhash_dedup_clusters(ds, threshold=0.4)
    assert got2.equals(want)


def test_batch_token_hashes_golden():
    """Vectorized batch tokenize+hash == per-doc simple_tokens + md5
    loop, including stopwords, length gates, unicode, empties, nulls."""
    import hashlib

    from seekr_ray.extras.dedup import (
        _batch_simple_token_hashes,
        _shingle_hashes_positional,
        _window_powers,
    )
    from seekr_ray.extras.textstats import simple_tokens

    texts = [
        BASE,
        "the and of a an",  # all stopwords
        "x " + "q" * 50 + " ok words here",  # 1-char + overlong dropped
        "",
        None,
        "Émile café naïve touché mixed ascii runs",  # non-ascii separators
        "short",
        "don't under_score CamelCase42 splits on every nonletter",
    ]
    arr = pa.array(texts, pa.string())
    th, lens = _batch_simple_token_hashes(arr)
    flat_want = []
    for t in texts:
        toks = simple_tokens(t or "")
        flat_want.extend(
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            for w in toks
        )
    assert th.tolist() == flat_want
    assert lens.tolist() == [len(simple_tokens(t or "")) for t in texts]

    # window kernel: global shifted-multiply acc equals the per-doc form
    k = 3
    powers = _window_powers(k)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    for i, t in enumerate(texts):
        want = _shingle_hashes_positional(simple_tokens(t or ""), k)
        seg = th[starts[i] : starts[i] + lens[i]]
        n = max(int(lens[i]) - k + 1, 0)
        with np.errstate(over="ignore"):
            acc = np.zeros(n, dtype=np.uint64)
            for w in range(k):
                acc += seg[w : w + n] * powers[w]
        assert acc.tolist() == want.tolist(), t
