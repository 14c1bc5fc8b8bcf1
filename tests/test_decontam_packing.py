"""Unit semantics for extras/decontam.py and extras/packing.py (the
DuckDB equivalence runs in tests/test_entry_contract.py; these cover
edges the fixture data lacks: short docs, empty benchmark, pack
boundaries, multi-range vs single-range scan identity)."""

import numpy as np
import pandas as pd

from seekr_ray.extras.textstats import simple_tokens


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(3)


def _words(seq):
    # stopword-free 4+ letter pseudo-words so simple_tokens keeps them all
    return " ".join(seq)


DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            _words(["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]),
            # shares the 3-shingle "bravo charlie delta" with doc 1
            _words(["zulu", "bravo", "charlie", "delta", "yankee"]),
            # disjoint
            _words(["golf", "hotel", "india", "juliet", "kilo"]),
            # too short for k=3 after tokenization -> no shingles
            _words(["lima", "mike"]),
            # empty text
            "",
        ],
    }
)


def test_benchmark_shingles_and_audit(ray_session):
    from seekr_ray.extras.decontam import benchmark_shingles, decontaminate

    bench = _ds(DOCS[DOCS.doc_id == 1])
    rest = _ds(DOCS[DOCS.doc_id != 1])
    bset = benchmark_shingles(bench, k=3)
    toks = simple_tokens(DOCS.loc[0, "text"])
    assert len(bset) == len(toks) - 2  # all shingles distinct here

    audit = decontaminate(rest, bset, k=3).to_pandas()
    # doc 2 overlaps on exactly 2 shingles: "zulu bravo charlie" is not
    # in bench; "bravo charlie delta" and "charlie delta echo"? doc 2
    # has no "echo" -> only "bravo charlie delta"
    assert audit.doc_id.tolist() == [2]
    assert audit.n_overlap.tolist() == [1]


def test_decontaminate_keep_clean_partitions(ray_session):
    from seekr_ray.extras.decontam import benchmark_shingles, decontaminate

    bench = _ds(DOCS[DOCS.doc_id == 1])
    rest = _ds(DOCS[DOCS.doc_id != 1])
    bset = benchmark_shingles(bench, k=3)
    clean = decontaminate(rest, bset, k=3, keep_clean=True).to_pandas()
    flagged = decontaminate(rest, bset, k=3).to_pandas()
    assert set(clean.doc_id) | set(flagged.doc_id) == {2, 3, 4, 5}
    assert set(clean.doc_id) & set(flagged.doc_id) == set()
    # short/empty docs can never be contaminated
    assert {4, 5} <= set(clean.doc_id)


def test_empty_benchmark_flags_nothing(ray_session):
    from seekr_ray.extras.decontam import decontaminate

    out = decontaminate(_ds(DOCS), frozenset(), k=3).to_pandas()
    assert len(out) == 0


def test_pack_offsets_matches_numpy_cumsum(ray_session):
    from seekr_ray.extras.packing import pack_offsets

    rng = np.random.RandomState(7)
    n = 200
    words = ["alpha", "bravo", "delta", "omega", "sigma"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=rng.randint(0, 30)))
                for _ in range(n)
            ],
        }
    )
    cap = 37
    got = (
        pack_offsets(_ds(docs), capacity=cap, range_size=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = np.array(
        [len(simple_tokens(t)) for t in docs.text], dtype=np.int64
    )
    starts = np.concatenate(([0], np.cumsum(toks)[:-1]))
    assert got.doc_id.tolist() == list(range(n))
    assert got.n_tokens.tolist() == toks.tolist()
    assert got.start_offset.tolist() == starts.tolist()
    assert got.pack_id.tolist() == (starts // cap).tolist()
    assert got.pack_offset.tolist() == (starts % cap).tolist()


def test_pack_offsets_range_size_invariant(ray_session):
    """The distributed multi-range scan equals the single-range scan."""
    from seekr_ray.extras.packing import pack_offsets

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64) * 3 + 1,  # sparse ids
            "text": [
                " ".join(["delta"] * (i % 7)) for i in range(50)
            ],
        }
    )
    a = (
        pack_offsets(_ds(docs), capacity=10, range_size=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_offsets(_ds(docs), capacity=10, range_size=1 << 40)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_bloom_matches_exact_decontaminate(ray_session):
    """At default sizing the filter has ~0 fp on this tiny set, so the
    bloom audit must equal the exact audit; keep_clean must drop exactly
    the flagged docs."""
    from seekr_ray.extras.decontam import (
        benchmark_bloom,
        benchmark_shingles,
        bloom_decontaminate,
        decontaminate,
    )

    bench = _ds(DOCS[DOCS.doc_id == 1])
    rest = _ds(DOCS[DOCS.doc_id != 1])
    bits = benchmark_bloom(bench, k=3)
    assert bits.sum() > 0
    audit = (
        bloom_decontaminate(rest, bits, k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exact = (
        decontaminate(rest, benchmark_shingles(bench, k=3), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(audit["doc_id"]) == list(exact["doc_id"])
    assert list(audit["n_maybe"]) == list(exact["n_overlap"])
    clean = bloom_decontaminate(rest, bits, k=3, keep_clean=True).to_pandas()
    assert set(clean["doc_id"]) == set(rest.to_pandas()["doc_id"]) - set(
        audit["doc_id"]
    )


def test_bloom_false_positive_is_conservative(ray_session):
    """A deliberately tiny filter (m=16 bits, k=1) saturates and flags
    disjoint docs — maybe-hits are a superset of true hits, never a
    subset (the safe direction for decontamination)."""
    import numpy as np

    from seekr_ray.extras.decontam import (
        benchmark_bloom,
        benchmark_shingles,
        bloom_decontaminate,
        decontaminate,
    )

    bench = _ds(DOCS[DOCS.doc_id == 1])
    rest = _ds(DOCS[DOCS.doc_id != 1])
    bits = benchmark_bloom(bench, k=3, m_bits=16, k_hashes=1)
    flagged = set(
        bloom_decontaminate(rest, bits, k=3, k_hashes=1)
        .to_pandas()["doc_id"]
    )
    true_hits = set(
        decontaminate(rest, benchmark_shingles(bench, k=3), k=3)
        .to_pandas()["doc_id"]
    )
    assert true_hits <= flagged


def test_bloom_bitmap_is_fixed_size(ray_session):
    """The broadcast state is m/8 bytes regardless of benchmark size."""
    import numpy as np

    from seekr_ray.extras.decontam import BLOOM_M, benchmark_bloom

    bits = benchmark_bloom(_ds(DOCS), k=3)
    assert len(bits) == BLOOM_M
    assert np.packbits(bits).nbytes == BLOOM_M // 8


def test_pack_offsets_by_key_streams_are_key_pure(ray_session):
    """Each key's offsets are an independent exact prefix sum in doc_id
    order, identical across block layouts and range widths."""
    import ray.data as rd

    from seekr_ray.extras.packing import pack_offsets_by_key
    from seekr_ray.extras.textstats import simple_tokens

    df = pd.DataFrame(
        {
            "doc_id": range(12),
            "lang": ["aa", "bb"] * 6,
            "text": [
                _words(["alpha", "bravo", "charlie"][: (i % 3) + 1])
                for i in range(12)
            ],
        }
    )

    def run(parts, rng):
        ds = rd.from_pandas(df).repartition(parts)
        out = pack_offsets_by_key(
            ds, capacity=4, key_col="lang", range_size=rng
        ).to_pandas()
        return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)

    a = run(1, 4)
    b = run(5, 2)
    pd.testing.assert_frame_equal(a, b)
    for lang, sub in a.groupby("lang"):
        toks = [
            len(simple_tokens(df.loc[df.doc_id == d, "text"].iloc[0]))
            for d in sub["doc_id"]
        ]
        want = np.concatenate(([0], np.cumsum(toks)[:-1]))
        assert list(sub["start_offset"]) == list(want), lang
        assert list(sub["pack_id"]) == [o // 4 for o in want]
        assert list(sub["pack_offset"]) == [o % 4 for o in want]
