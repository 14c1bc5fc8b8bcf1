"""All-pairs cosine: distributed == brute force; df cap; invariance."""

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.extras.apss import cosine_pairs
from seekr_ray.extras.textstats import simple_tokens

DOCS = [
    "spark table merge join query plan executor fast scan",
    "spark table merge join query plan executor fast scan",  # dup of 0
    "window agg rollup cube lattice pivot grouping sets",
    "window agg rollup pivot grouping sets spark table",
    "zeta epsilon theta iota kappa",  # disjoint
    "merge merge merge join join query",  # skewed tf
]


def _tbl():
    return pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS, pa.string()),
        }
    )


def _brute(threshold, max_df=None):
    tfs = []
    for t in DOCS:
        acc = {}
        for tok in simple_tokens(t):
            acc[tok] = acc.get(tok, 0) + 1
        tfs.append(acc)
    if max_df is not None:
        df = {}
        for acc in tfs:
            for tok in acc:
                df[tok] = df.get(tok, 0) + 1
        tfs = [
            {t: c for t, c in acc.items() if df[t] <= max_df} for acc in tfs
        ]
    out = []
    for i in range(len(DOCS)):
        for j in range(i + 1, len(DOCS)):
            dot = sum(c * tfs[j].get(t, 0) for t, c in tfs[i].items())
            if dot == 0:
                continue
            na = sum(c * c for c in tfs[i].values())
            nb = sum(c * c for c in tfs[j].values())
            cos = float(dot) / np.sqrt(float(na * nb))
            if cos >= threshold:
                out.append((i, j, dot, na, nb, round(cos, 6)))
    return sorted(out)


def _run(ds, **kw):
    out = cosine_pairs(ds, **kw).to_pandas()
    if len(out) == 0:
        return []
    return sorted(
        zip(
            out["doc_a"],
            out["doc_b"],
            out["dot"],
            out["norm2_a"],
            out["norm2_b"],
            out["cosine"],
        )
    )


def test_matches_brute_force(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    assert _run(ds, threshold=0.1) == _brute(0.1)
    # the exact duplicate pair scores 1.0
    full = dict(((a, b), c) for a, b, _, _, _, c in _brute(0.0))
    assert full[(0, 1)] == 1.0


def test_max_df_cap_bounds_pair_space(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    # df cap 1 removes every shared term -> no pairs at all
    assert _run(ds, threshold=0.0, max_df=1) == []
    assert _run(ds, threshold=0.1, max_df=2) == _brute(0.1, max_df=2)
    capped = _run(ds, threshold=0.0, max_df=2)
    uncapped = _run(ds, threshold=0.0)
    assert len(capped) <= len(uncapped)


def test_max_df_frac_matches_absolute(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    # frac * 6 docs = 2.4 -> same kept set as absolute cap 2
    assert _run(ds, threshold=0.1, max_df_frac=0.4) == _brute(
        0.1, max_df=2
    )
    with pytest.raises(ValueError):
        cosine_pairs(ds, threshold=0.1, max_df=2, max_df_frac=0.5)


def test_threshold_filters(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    assert all(c >= 0.9 for *_, c in _run(ds, threshold=0.9))
    assert _run(ds, threshold=1.000001) == []


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    one = _run(rd.from_arrow(_tbl()), threshold=0.1)
    many = _run(rd.from_arrow(_tbl()).repartition(5), threshold=0.1)
    assert one == many


def test_wide_doc_ids_rejected(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1 << 40], pa.int64()),
            "text": pa.array(["alpha beta", "alpha beta"], pa.string()),
        }
    )
    with pytest.raises(Exception):
        cosine_pairs(rd.from_arrow(tbl), threshold=0.1).to_pandas()


def test_knn_graph_topk_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from seekr_ray.extras.apss import cosine_pairs, knn_graph

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "window agg rollup cube lattice pivot grouping sets",
                "window agg rollup pivot grouping sets spark table",
                "window agg rollup cube lattice pivot sets",
                "streaming shuffle exchange backpressure spill",
                "streaming shuffle exchange spill operators",
                "vector index quantize probe recall",
                "vector index quantize recall centroid",
                "totally unrelated prose about gardening flowers",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    got = (
        knn_graph(ds, k=2, eps=0.05, max_df_frac=1.0)
        .to_pandas()
        .sort_values(["src", "rank"])
        .reset_index(drop=True)
    )
    # reference: symmetrize the pair set, take top-2 per src
    pairs = cosine_pairs(
        rd.from_pandas(docs).repartition(3), threshold=0.05, max_df_frac=1.0
    ).to_pandas()
    sym = pd.concat(
        [
            pairs.rename(columns={"doc_a": "src", "doc_b": "dst"}),
            pairs.rename(columns={"doc_b": "src", "doc_a": "dst"}),
        ]
    )[["src", "dst", "cosine"]]
    ref = (
        sym.sort_values(["src", "cosine", "dst"],
                        ascending=[True, False, True])
        .groupby("src")
        .head(2)
        .reset_index(drop=True)
    )
    assert got["src"].tolist() == ref["src"].tolist()
    assert got["dst"].tolist() == ref["dst"].tolist()
    assert got["cosine"].tolist() == ref["cosine"].tolist()
    # ranks are 1-based and dense per src
    for _, sub in got.groupby("src"):
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))
    # per-src fanout never exceeds k
    assert got.groupby("src").size().max() <= 2
