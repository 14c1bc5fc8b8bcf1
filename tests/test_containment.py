"""Containment join: matches set brute force; asymmetry; invariance."""

import numpy as np
import pyarrow as pa

from seekr_ray.extras.dedup import _shingle_hashes, containment_pairs
from seekr_ray.extras.textstats import simple_tokens

DOCS = [
    # 0 is fully contained in 1 (1 = 0 + extra tail)
    "alpha bravo charlie delta echo foxtrot golf",
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo",
    # 2 shares nothing
    "zulu yankee xray whiskey victor uniform",
    # 3 == 0 exactly
    "alpha bravo charlie delta echo foxtrot golf",
]


def _tbl():
    return pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS, pa.string()),
        }
    )


def _brute(threshold, k=3):
    sets = [
        set(np.unique(_shingle_hashes(simple_tokens(t), k)).tolist())
        for t in DOCS
    ]
    out = []
    for i in range(len(DOCS)):
        for j in range(len(DOCS)):
            if i == j or not sets[i]:
                continue
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            c = inter / len(sets[i])
            if c >= threshold:
                out.append((i, j, inter, len(sets[i]), round(c, 6)))
    return sorted(out)


def _run(threshold, repartition=None):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    if repartition:
        ds = ds.repartition(repartition)
    out = containment_pairs(ds, threshold=threshold).to_pandas()
    if len(out) == 0:
        return []
    return sorted(
        zip(
            out["src_doc"],
            out["in_doc"],
            out["inter"],
            out["size_src"],
            out["containment"],
        )
    )


def test_matches_brute_force(ray_session):
    for t in (0.5, 0.9, 1.0):
        assert _run(t) == _brute(t)


def test_asymmetry(ray_session):
    got = dict(
        ((s, d), c) for s, d, _, _, c in _run(0.0 + 1e-9)
    )
    # doc 0 fully contained in doc 1; doc 1 only partially in doc 0
    assert got[(0, 1)] == 1.0
    assert got[(1, 0)] < 1.0
    # exact duplicates contain each other fully
    assert got[(0, 3)] == 1.0 and got[(3, 0)] == 1.0


def test_partitioning_invariance(ray_session):
    assert _run(0.5) == _run(0.5, repartition=3)
