"""Semantic tests for the training-data extras: dedup families find the
injected duplicates, ANN-LSH recalls the brute-force results, multimodal
plumbing round-trips, Trie/suggestion structures behave."""

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.extras.dedup import (
    embedding_neardup_pairs,
    exact_dedup_groups,
    minhash_dedup_clusters,
    ngram_jaccard,
    simhash64,
    simhash_fingerprints,
)
from seekr_ray.extras.similarity import ann_topk_bruteforce, ann_topk_lsh
from seekr_ray.extras.textstats import rolling_fingerprint, simple_tokens
from seekr_ray.query.suggestions import Trie, trie_from_counts


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


BASE = (
    "spark cluster scheduling overview with executors tasks stages shuffle "
    "partitions caching lineage recovery drivers workers memory disk spill"
)


def test_exact_dedup_groups(ray_session):
    ds = _docs_ds([BASE, BASE, "other text entirely", BASE + " extra"])
    out = exact_dedup_groups(ds).to_pandas().sort_values("keep_doc_id")
    assert len(out) == 3
    dup_row = out[out["n_copies"] == 2].iloc[0]
    assert dup_row["keep_doc_id"] == 0


def test_minhash_clusters_find_near_dups(ray_session):
    near = BASE.replace("memory", "ram")  # one-token change
    far = "completely different content about databases and indexes and trees"
    ds = _docs_ds([BASE, near, far, BASE])
    out = minhash_dedup_clusters(ds, threshold=0.5).to_pandas()
    clustered = set(out["doc_id"])
    assert {0, 1, 3} <= clustered
    assert 2 not in clustered
    roots = dict(zip(out["doc_id"], out["cluster_id"]))
    assert roots[0] == roots[1] == roots[3]


def test_ngram_jaccard_bounds():
    a = simple_tokens(BASE)
    assert ngram_jaccard(a, a) == 1.0
    assert ngram_jaccard(a, simple_tokens("nothing in common here at all")) == 0.0


def test_ngram_jaccard_pairs_distributed(ray_session):
    from seekr_ray.extras.dedup import ngram_jaccard_pairs

    near = BASE.replace("memory", "ram")
    far = "completely different content about databases and indexes and trees"
    ds = _docs_ds([BASE, near, far, BASE])
    out = ngram_jaccard_pairs(ds, k=3, threshold=0.5).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 3) in pairs  # exact copies
    assert (0, 1) in pairs and (1, 3) in pairs  # one-token change
    assert not any(2 in p for p in pairs)  # unrelated doc excluded
    # hashed-shingle jaccard equals the string-set scalar kernel
    row03 = out[(out["a"] == 0) & (out["b"] == 3)].iloc[0]
    assert row03["jaccard"] == 1.0
    row01 = out[(out["a"] == 0) & (out["b"] == 1)].iloc[0]
    expect = ngram_jaccard(simple_tokens(BASE), simple_tokens(near), k=3)
    assert abs(row01["jaccard"] - expect) < 1e-6
    # multi-chunk block-pair path emits each pair exactly once
    out2 = ngram_jaccard_pairs(
        ds.repartition(4), k=3, threshold=0.5, chunk_rows=1
    ).to_pandas()
    assert set(zip(out2["a"], out2["b"])) == pairs
    assert len(out2) == len(out)


def test_jaccard_clusters_transitive(ray_session):
    from seekr_ray.extras.dedup import jaccard_clusters

    # chain: 0 ~ 1 and 1 ~ 2 but 0 !~ 2 — transitive closure puts all
    # three in one cluster labeled by the min doc_id
    mid = BASE.replace("memory", "ram")
    end = mid.replace("tokens", "words")
    far = "completely different content about databases and indexes and trees"
    ds = _docs_ds([BASE, mid, end, far])
    out = jaccard_clusters(ds, k=3, threshold=0.5).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {0: 0, 1: 0, 2: 0}  # 3 excluded (no edges)


def test_simhash_near_dup_hamming(ray_session):
    near = BASE.replace("memory", "ram")
    h1 = simhash64(simple_tokens(BASE))
    h2 = simhash64(simple_tokens(near))
    h3 = simhash64(simple_tokens("totally unrelated words about gardening tulips"))
    ham12 = bin(h1 ^ h2).count("1")
    ham13 = bin(h1 ^ h3).count("1")
    assert ham12 < ham13
    ds = _docs_ds([BASE, BASE])
    out = simhash_fingerprints(ds).to_pandas()
    assert out["simhash"][0] == out["simhash"][1]


def test_rolling_fingerprint_stability():
    assert rolling_fingerprint(BASE) == rolling_fingerprint(BASE)
    # a MIDDLE token appears in every window, so changing it must change
    # the min-shingle fingerprint (appending text may legitimately keep
    # the same minimum window)
    toks = BASE.split()
    toks[2] = "zzreplaced"  # early token: disturbs the leading windows
    toks[-3] = "qqreplaced"  # late token: disturbs the trailing windows
    assert rolling_fingerprint(BASE) != rolling_fingerprint(" ".join(toks))
    assert rolling_fingerprint("") == 0


def _emb_ds(n=100, dim=16, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ), mat


def test_ann_brute_exact(ray_session):
    ds, mat = _emb_ds()
    q = mat[0]
    out = ann_topk_bruteforce(ds, q[None, :], k=5).to_pandas()
    assert list(out["rank"]) == [0, 1, 2, 3, 4]
    assert out["vec_id"][0] == 0  # self is nearest
    assert out["cos"][0] == pytest.approx(1.0, abs=1e-6)
    # verify against direct numpy on the float32-rounded vectors
    m32 = mat.astype(np.float32).astype(np.float64)
    q32 = m32[0]
    sims = (m32 @ q32) / (np.linalg.norm(m32, axis=1) * np.linalg.norm(q32))
    want = np.argsort(-sims, kind="stable")[:5]
    assert list(out["vec_id"]) == [int(w) for w in want]


def test_ann_lsh_recall(ray_session):
    ds, mat = _emb_ds()
    q = mat[0]
    brute = ann_topk_bruteforce(ds, q[None, :], k=5).to_pandas()
    lsh = ann_topk_lsh(ds, q[None, :], k=5, nbits=4).to_pandas()
    assert len(lsh) > 0
    # the query's own bucket contains vec 0 -> top hit found
    assert lsh["vec_id"][0] == 0
    recall = len(set(lsh["vec_id"]) & set(brute["vec_id"])) / 5
    assert recall >= 0.2  # bucketing prunes; exactness not expected


def test_ann_ivf_full_probe_equals_brute(ray_session):
    from seekr_ray.extras.similarity import ann_topk_ivf

    ds, mat = _emb_ds()
    q = mat[:2]
    brute = ann_topk_bruteforce(ds, q, k=5).to_pandas()
    ivf = ann_topk_ivf(ds, q, k=5, n_lists=8, nprobe=8).to_pandas()
    # probing every list degenerates to exact brute force
    assert ivf.equals(brute)


def test_ann_ivf_pruned_probe_recall(ray_session):
    from seekr_ray.extras.similarity import ann_topk_ivf

    ds, mat = _emb_ds()
    q = mat[0]
    brute = ann_topk_bruteforce(ds, q[None, :], k=5).to_pandas()
    ivf = ann_topk_ivf(ds, q[None, :], k=5, n_lists=8, nprobe=2).to_pandas()
    assert len(ivf) > 0
    assert ivf["vec_id"][0] == 0  # self lands in the query's own list
    recall = len(set(ivf["vec_id"]) & set(brute["vec_id"])) / 5
    assert recall >= 0.4
    # determinism: identical second run
    again = ann_topk_ivf(ds, q[None, :], k=5, n_lists=8, nprobe=2).to_pandas()
    assert again.equals(ivf)


def test_to_matrix_zero_copy_paths():
    from seekr_ray.extras.similarity import _to_matrix

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((7, 5)).astype(np.float32)
    rows = [r.tolist() for r in mat]
    want = np.stack([np.asarray(r, dtype=np.float64) for r in rows])
    # uniform list<float32> — the flatten/reshape fast path
    col = pa.array(rows, pa.list_(pa.float32()))
    np.testing.assert_array_equal(_to_matrix(col), want)
    # fixed_size_list
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), pa.float32()), 5
    )
    np.testing.assert_array_equal(_to_matrix(fsl), want)
    # large_list
    ll = pa.array(rows, pa.large_list(pa.float64()))
    np.testing.assert_array_equal(_to_matrix(ll), want)
    # sliced array (offsets must be honored, .values would over-read)
    np.testing.assert_array_equal(_to_matrix(col.slice(2, 3)), want[2:5])
    # chunked
    ch = pa.chunked_array([col.slice(0, 3), col.slice(3, 4)])
    np.testing.assert_array_equal(_to_matrix(ch), want)


def test_to_matrix_ragged_fallback():
    from seekr_ray.extras.similarity import _to_matrix

    # ragged / null-bearing input must NOT take the flatten/reshape path
    # (which would silently misalign); the row-wise fallback either
    # converts or raises loudly
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        _to_matrix(ragged)
    withnull = pa.array([[1.0, 2.0], None, [5.0, 6.0]], pa.list_(pa.float64()))
    try:
        _to_matrix(withnull)
    except (TypeError, ValueError):
        pass


def test_ivf_persisted_index(ray_session, tmp_path):
    from seekr_ray.extras.similarity import (
        ann_topk_bruteforce,
        ivf_build,
        ivf_query,
    )

    ds, mat = _emb_ds()
    idx = str(tmp_path / "ivf_index")
    meta = ivf_build(ds, idx, n_lists=8)
    assert meta["n_lists"] == 8
    assert meta["n_vectors"] == 100
    assert meta["dim"] == 16
    q = mat[:2]
    brute = ann_topk_bruteforce(ds, q, k=5).to_pandas()
    # probing every list over the PERSISTED index == brute force
    full = ivf_query(idx, q, k=5, nprobe=8).to_pandas()
    assert full.equals(brute)
    # pruned probe: deterministic across calls, decent recall
    p1 = ivf_query(idx, mat[0][None, :], k=5, nprobe=2).to_pandas()
    p2 = ivf_query(idx, mat[0][None, :], k=5, nprobe=2).to_pandas()
    assert p1.equals(p2)
    assert p1["vec_id"][0] == 0
    recall = len(set(p1["vec_id"]) & set(brute[brute.query_i == 0]["vec_id"])) / 5
    assert recall >= 0.4


def test_ivf_query_requires_success_marker(ray_session, tmp_path):
    from seekr_ray.extras.similarity import ivf_query

    with pytest.raises(FileNotFoundError):
        ivf_query(str(tmp_path / "nope"), np.zeros((1, 4)), k=3)


def test_embedding_neardup_pairs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    v = rng.standard_normal(8)
    near = v + rng.standard_normal(8) * 0.01
    far = rng.standard_normal(8)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [x.astype(np.float32).tolist() for x in (v, near, far)],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = embedding_neardup_pairs(ds, threshold=0.99).to_pandas()
    assert len(out) == 1
    assert (out["a"][0], out["b"][0]) == (0, 1)


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from seekr_ray.extras.multimodal import (
        DeterministicFakeDecoder,
        decode_image,
        extract_media_features,
        synthesize_media_table,
    )

    media = synthesize_media_table(30)
    out = extract_media_features(rd.from_arrow(media)).to_pandas()
    assert len(out) == 30
    assert set(out.columns) == {"media_id", "kind", "n_bytes", "features"}
    assert all(len(f) == 16 for f in out["features"])
    # determinism: same payload -> same features
    d = DeterministicFakeDecoder()
    t = d(media.slice(0, 2))
    t2 = d(media.slice(0, 2))
    assert t.equals(t2)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8")


def test_trie_topk():
    trie = Trie()
    trie.insert("spark", 10)
    trie.insert("spawn", 3)
    trie.insert("spill", 7)
    assert trie.lookup("sp") == ["spark", "spill", "spawn"]
    assert trie.lookup("spa") == ["spark", "spawn"]
    assert trie.lookup("z") == []
    # frequency update replaces the old entry
    trie.insert("spawn", 99)
    assert trie.lookup("sp")[0] == "spawn"
    # top-10 truncation
    t2 = trie_from_counts([(f"w{i:02d}", i) for i in range(15)])
    assert len(t2.lookup("w")) == 10
    assert t2.lookup("w")[0] == "w14"


def test_aggregate_query_log(ray_session):
    import datetime

    import ray.data as rd

    from seekr_ray.query.suggestions import aggregate_query_log

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(10):
        rows.append({"query": "hot", "ts": base + datetime.timedelta(hours=i)})
    rows.append({"query": "old", "ts": base - datetime.timedelta(hours=24)})
    ds = rd.from_items(rows)
    out = aggregate_query_log(ds).to_pandas()
    got = dict(zip(out["query"], out[out.columns[1]]))
    # max ts = base+9h, cutoff = base-3h -> all 10 "hot" rows kept
    assert got.get("hot") == 10
    assert "old" not in got


def test_minhash_kernel_golden_vs_object_dtype():
    """The vectorized uint64 mulmod kernel reproduces the round-1
    object-dtype modular arithmetic exactly."""
    from seekr_ray.extras.dedup import (
        _MERSENNE,
        _minhash_params,
        _shingle_hashes,
        minhash_signature,
    )

    a, b = _minhash_params(64)
    rng = np.random.default_rng(5)
    for trial in range(3):
        toks = [f"w{int(x)}" for x in rng.integers(0, 50, size=40)]
        sig = minhash_signature(toks, a, b, 3)
        h = _shingle_hashes(toks, 3)
        want = (
            h[None, :].astype(object) * a[:, None].astype(object)
            + b[:, None].astype(object)
        ) % _MERSENNE
        want = np.array([int(min(row)) for row in want], dtype=np.uint64)
        assert np.array_equal(sig, want), trial


def test_mulmod61_golden_random():
    from seekr_ray.extras.dedup import _MERSENNE, _fold61, _mulmod61

    rng = np.random.default_rng(11)
    a = rng.integers(0, _MERSENNE, size=1000, dtype=np.uint64)
    h = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    h61 = _fold61(h)
    got = _mulmod61(a, h61)
    want = np.array(
        [(int(x) * int(y)) % _MERSENNE for x, y in zip(a, h)], dtype=np.uint64
    )
    assert np.array_equal(got, want)


def test_min_label_paths_agree(ray_session):
    import pyarrow as pa

    from seekr_ray.extras.dedup import _min_label_dataset, _min_label_numpy

    rng = np.random.default_rng(4)
    a = rng.integers(0, 60, size=120).astype(np.int64)
    b = rng.integers(0, 60, size=120).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    n1, l1 = _min_label_numpy(a, b)
    n2, l2 = _min_label_dataset(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    assert np.array_equal(n1, n2) and np.array_equal(l1, l2)


def test_embedding_neardup_lsh_recall(ray_session):
    from seekr_ray.extras.dedup import embedding_neardup_lsh, embedding_neardup_pairs

    ds, _mat = _emb_ds(n=150, dim=16, seed=9)
    exact = embedding_neardup_pairs(ds, threshold=0.6)
    approx = embedding_neardup_lsh(ds, threshold=0.6, nbits=2)
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    approx_pairs = set(zip(approx["a"].to_pylist(), approx["b"].to_pylist()))
    assert approx_pairs <= exact_pairs, "LSH must not invent pairs"
    if exact_pairs:
        recall = len(approx_pairs) / len(exact_pairs)
        assert recall >= 0.3, recall


def test_ppm_and_wav_roundtrip():
    from seekr_ray.extras.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(12, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # header comments per netpbm spec
    with_comment = b"P6\n# a comment\n7 12\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(with_comment), px)

    s = (rng.standard_normal(500) * 1000).astype(np.int16)
    got, rate = decode_wav_pcm16(encode_wav_pcm16(s, 16000))
    assert rate == 16000 and np.array_equal(got, s)


def test_ppmv_demux_and_frame_sampling():
    from seekr_ray.extras.multimodal import (
        demux_ppmv,
        encode_ppmv,
        sample_ppmv_frames,
    )

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8) for _ in range(9)
    ]
    payload = encode_ppmv(frames, fps=12.5)
    n, fps, spans = demux_ppmv(payload)
    assert n == 9 and fps == 12.5 and len(spans) == 9
    # spans tile the payload exactly after the 12-byte container header
    assert spans[0][0] == 12
    assert spans[-1][0] + spans[-1][1] == len(payload)
    # sampling k of N decodes the evenly-spaced subset, first/last included
    got = sample_ppmv_frames(payload, 3)
    assert len(got) == 3
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[-1], frames[8])
    # k >= N decodes every frame
    assert len(sample_ppmv_frames(payload, 99)) == 9
    with pytest.raises(NotImplementedError):
        demux_ppmv(b"\x00\x00\x00\x00mp4?")


def test_media_features_real_decode(ray_session):
    import ray.data as rd

    from seekr_ray.extras.multimodal import (
        MediaFeatureExtractor,
        extract_media_features,
        synthesize_media_table,
    )

    media = synthesize_media_table(30)
    out = extract_media_features(rd.from_arrow(media)).to_pandas()
    assert len(out) == 30
    by_kind = dict(zip(media["media_id"].to_pylist(), media["kind"].to_pylist()))
    for _, row in out.iterrows():
        f = row["features"]
        assert len(f) == 16
        if by_kind[row["media_id"]] == "image":
            assert f[0] > 0 and f[1] > 0  # real decoded dimensions
            assert 0.3 < f[3] < 0.7  # uniform-random pixels: mean ~0.5
        elif by_kind[row["media_id"]] == "audio":
            assert f[0] == 16000 and f[3] > 0.1  # rate + sine rms
        else:  # video: real demux + sampled decode
            assert f[0] >= 4 and f[1] >= 5  # frame count, fps
            assert f[2] > 0 and f[3] > 0  # frame dims
            assert 0.3 < f[5] < 0.7  # uniform-random luma mean
            assert f[7] > 0.1  # motion energy between random frames
    # determinism
    d = MediaFeatureExtractor()
    assert d(media.slice(0, 3)).equals(d(media.slice(0, 3)))


def test_tumbling_agg_window_boundaries(ray_session):
    import datetime as dt

    import ray.data as rd

    from seekr_ray.extras.windows import tumbling_agg

    rows = [
        (dt.datetime(2024, 1, 1, 10, 59, 59), "a", 1.0),
        (dt.datetime(2024, 1, 1, 11, 0, 0), "a", 2.0),  # next window
        (dt.datetime(2024, 1, 1, 11, 30, 0), "a", 3.0),
        (dt.datetime(2024, 1, 1, 11, 30, 0), "b", 4.0),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows]),
            }
        )
    )
    out = tumbling_agg(ds, unit="hour").to_pandas()
    key = {
        (str(w), t): (n, v)
        for w, t, n, v in zip(
            out["window"], out["event_type"], out["n"], out["value_sum"]
        )
    }
    assert key[("2024-01-01 10:00:00", "a")] == (1, 1.0)
    assert key[("2024-01-01 11:00:00", "a")] == (2, 5.0)
    assert key[("2024-01-01 11:00:00", "b")] == (1, 4.0)


def test_tfidf_keywords_paths_equal(ray_session):
    """broadcast-df and distributed-join strategies must be row-identical
    (same scores, ranks, tie-breaks) — the join path is the open-vocab
    100-TB shape, the broadcast path the small-vocab fast path."""
    import ray.data as rd

    from seekr_ray.extras.lm import tfidf_keywords

    docs = [
        "spark join merge spark window",
        "merge merge batch stream stream stream",
        "window spark",
        "",  # token-less doc must emit nothing
        "singleton uniqueterm appears once here",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    a = (
        tfidf_keywords(rd.from_arrow(tbl), k=3, strategy="broadcast")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        tfidf_keywords(rd.from_arrow(tbl), k=3, strategy="join")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert 3 not in set(a["doc_id"])  # empty doc emits nothing
    # rank 1 for doc 1 is the tf-dominant rare term
    assert a[(a.doc_id == 1) & (a["rank"] == 1)]["term"].iloc[0] == "stream"


def test_bigram_lm_quality_basic(ray_session):
    """Repetitive (high-probability) docs must outscore a doc of unique
    transitions; <2-token docs emit nothing; n_bigrams is exact."""
    import ray.data as rd

    from seekr_ray.extras.lm import bigram_lm_quality

    docs = [
        "alpha beta alpha beta alpha beta alpha beta",
        "gamma delta epsilon zeta theta iota kappa",
        "solo",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = (
        bigram_lm_quality(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1]  # "solo" has no bigrams
    assert out.loc[0, "n_bigrams"] == 7
    assert out.loc[1, "n_bigrams"] == 6
    assert out.loc[0, "lm_score"] > out.loc[1, "lm_score"]


def test_semdedup_pairs_subset_of_bruteforce(ray_session):
    """Within-cluster pairs are exactly the brute-force >= tau pairs
    whose endpoints share a cluster — no extras, nothing fabricated,
    and identical across block layouts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.similarity import (
        _cosine,
        semdedup_centroids,
        semdedup_dropped,
        semdedup_pairs,
    )
    from seekr_ray.extras.textstats import round6_arr

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    # make 5 deliberate near-dup pairs (tiny perturbations)
    dups = base[:5] + rng.standard_normal((5, 16)) * 1e-3
    mat = np.vstack([base, dups])
    df = pd.DataFrame(
        {"vec_id": range(len(mat)), "embedding": [list(map(float, v)) for v in mat]}
    )
    cents = semdedup_centroids(4, 16)
    tau = 0.95

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        out = semdedup_pairs(ds, cents, tau=tau).to_pandas()
        return sorted(zip(out["cid"], out["a"], out["b"], out["cos"]))

    got = run(3)
    assert got == run(1)  # layout-independent

    sims = round6_arr(_cosine(mat, mat))
    cid = np.argmax(round6_arr(_cosine(mat, cents)), axis=1)
    want = sorted(
        (int(cid[i]), i, j, float(sims[i, j]))
        for i in range(len(mat))
        for j in range(i + 1, len(mat))
        if sims[i, j] >= tau and cid[i] == cid[j]
    )
    assert got == want
    assert len(got) >= 5  # the planted dups land in the same cluster

    import pyarrow as pa

    dropped = semdedup_dropped(
        pa.table(
            {
                "b": pa.array([b for _, _, b, _ in got], pa.int64()),
            }
        )
    )
    assert dropped["vec_id"].to_pylist() == sorted({b for _, _, b, _ in got})


def _pq_fixture_df(n=160, dim=16, seed=3):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    # clustered data so PQ recall is meaningful (pure noise has no
    # neighbors to find)
    cents = rng.standard_normal((8, dim)) * 3
    mat = cents[rng.integers(0, 8, n)] + rng.standard_normal((n, dim)) * 0.3
    return pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [list(map(float, v)) for v in mat],
        }
    )


def test_pq_encode_shape_and_determinism(ray_session):
    import numpy as np
    import ray.data as rd

    from seekr_ray.extras.similarity import pq_encode, pq_train

    df = _pq_fixture_df()
    ds = rd.from_pandas(df).repartition(4)
    books = pq_train(ds, m_subspaces=4, n_codes=8)
    assert books.shape == (4, 8, 4)
    # training is layout-independent (deterministic sample + seeded init)
    books2 = pq_train(rd.from_pandas(df).repartition(1), m_subspaces=4, n_codes=8)
    assert np.array_equal(books, books2)

    codes = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert len(codes) == len(df)
    assert all(len(c) == 4 for c in codes["code"])  # m bytes per vector
    codes2 = (
        pq_encode(rd.from_pandas(df).repartition(1), books)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert [list(c) for c in codes["code"]] == [list(c) for c in codes2["code"]]


def test_pq_adc_score_equals_reconstruction(ray_session):
    """ADC approx score == q · (concatenated assigned codewords) — the
    defining identity of asymmetric distance computation."""
    import numpy as np
    import ray.data as rd

    from seekr_ray.extras.similarity import (
        _unit,
        ann_topk_pq,
        pq_encode,
        pq_train,
    )

    df = _pq_fixture_df(n=60)
    ds = rd.from_pandas(df).repartition(3)
    books = pq_train(ds, m_subspaces=4, n_codes=8)
    codes_df = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    q = np.asarray(df["embedding"][0], np.float64)[None, :]
    out = ann_topk_pq(pq_encode(ds, books), books, q, k=60).to_pandas()

    q_unit = _unit(q)[0]
    m, n_codes, dsub = books.shape
    recon = {}
    for vid, code in zip(codes_df["vec_id"], codes_df["code"]):
        xhat = np.concatenate([books[i][code[i]] for i in range(m)])
        recon[vid] = float(q_unit @ xhat)
    for vid, cos in zip(out["vec_id"], out["cos"]):
        assert abs(recon[vid] - cos) < 1e-6, vid


def test_pq_recall_vs_bruteforce(ray_session):
    import numpy as np
    import ray.data as rd

    from seekr_ray.extras.similarity import (
        ann_topk_bruteforce,
        ann_topk_pq,
        pq_encode,
        pq_train,
    )

    df = _pq_fixture_df()
    ds = rd.from_pandas(df).repartition(4)
    q = np.asarray(df["embedding"][5], np.float64)[None, :]
    exact = set(ann_topk_bruteforce(ds, q, k=10)["vec_id"].to_pylist())
    books = pq_train(ds, m_subspaces=4, n_codes=16)
    approx = set(
        ann_topk_pq(pq_encode(ds, books), books, q, k=10)["vec_id"].to_pylist()
    )
    assert len(exact & approx) >= 6  # recall@10 >= 0.6 on clustered data


def test_random_projection_preserves_distances(ray_session):
    """JL sanity: projected pairwise distances track the originals
    (correlation, not exactness), output is layout-invariant, and the
    quantized kernel matches a direct numpy mirror."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.similarity import (
        RP_SCALE,
        projection_matrix,
        random_projection,
    )
    from seekr_ray.extras.textstats import round6_arr

    rng = np.random.default_rng(5)
    # clustered data: iid-Gaussian pairwise distances are nearly constant
    # (correlation would be noise); cluster offsets make them vary
    centers = rng.standard_normal((4, 32)) * 6.0
    mat = centers[np.arange(60) % 4] + rng.standard_normal((60, 32))
    df = pd.DataFrame(
        {
            "vec_id": range(60),
            "embedding": [list(map(float, v)) for v in mat],
        }
    )
    proj = projection_matrix(32, 8)

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        out = random_projection(ds, proj).to_pandas()
        return out.sort_values(["vec_id", "dim"]).reset_index(drop=True)

    a, b = run(1), run(6)
    pd.testing.assert_frame_equal(a, b)

    terms = np.floor((mat[:, :, None] * proj[None, :, :]) * RP_SCALE)
    want = round6_arr(terms.sum(axis=1) / float(RP_SCALE))
    got = a["y"].to_numpy().reshape(60, 8)
    assert np.array_equal(got, want)

    # distance preservation (the JL use-case): same-cluster pairs stay
    # much closer than cross-cluster pairs after projection
    within, cross = [], []
    for i in range(0, 60, 3):
        for j in range(i + 1, 60, 7):
            d = ((got[i] - got[j]) ** 2).sum()
            (within if i % 4 == j % 4 else cross).append(d)
    assert np.mean(within) < 0.5 * np.mean(cross), (
        np.mean(within),
        np.mean(cross),
    )


def test_user_type_profile_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.features import user_type_profile

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, size=2500),
            "event_type": rng.choice(
                ["view", "click", "purchase", "share", "login"], size=2500
            ),
        }
    )
    got = (
        user_type_profile(rd.from_pandas(df).repartition(6))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = (
        df.groupby("user_id")["event_type"]
        .agg(lambda s: "|".join(sorted(set(s))))
        .reset_index(name="type_profile")
    )
    assert got["user_id"].tolist() == ref["user_id"].tolist()
    assert got["type_profile"].tolist() == ref["type_profile"].tolist()
    assert got["n_types"].tolist() == [
        p.count("|") + 1 for p in ref["type_profile"]
    ]
