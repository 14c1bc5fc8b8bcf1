"""Unit tests for skipgram_pair_counts, top_terms_per_group, and
zipf_fit."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(rows, extra_col=None):
    import ray.data as rd

    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }
    if extra_col:
        cols[extra_col] = pa.array([r[2] for r in rows], pa.string())
    return rd.from_arrow(pa.table(cols)).repartition(3)


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def test_skipgram_counts_window2():
    from seekr_ray.extras.skipgram import skipgram_pair_counts

    # "alpha beta gamma": pairs (a,b) (b,g) at d=1, (a,g) at d=2
    # second doc repeats (alpha, beta) once more
    rows = [(1, "alpha beta gamma"), (2, "beta alpha")]
    out = (
        _collect(skipgram_pair_counts(_docs(rows), window=2))
        .to_pandas()
        .set_index(["tok_a", "tok_b"])["n"]
        .to_dict()
    )
    assert out == {
        ("alpha", "beta"): 2,  # unordered: (beta, alpha) folds in
        ("beta", "gamma"): 1,
        ("alpha", "gamma"): 1,
    }


def test_skipgram_no_cross_doc_pairs():
    from seekr_ray.extras.skipgram import skipgram_pair_counts

    rows = [(1, "alpha beta"), (2, "gamma delta")]
    out = _collect(skipgram_pair_counts(_docs(rows), window=2)).to_pandas()
    pairs = set(zip(out["tok_a"], out["tok_b"]))
    assert ("beta", "gamma") not in pairs and ("gamma", "beta") not in pairs


def test_top_terms_per_group_order_and_cap():
    from seekr_ray.extras.topk_terms import top_terms_per_group

    rows = [
        (1, "alpha alpha alpha beta beta gamma", "en"),
        (2, "delta delta epsilon", "de"),
    ]
    out = (
        _collect(
            top_terms_per_group(
                _docs(rows, extra_col="lang"), group_col="lang", k=2
            )
        )
        .to_pandas()
        .sort_values(["lang", "rn"])
        .reset_index(drop=True)
    )
    en = out[out["lang"] == "en"]
    assert list(en["token"]) == ["alpha", "beta"]
    assert list(en["c"]) == [3, 2]
    assert list(en["rn"]) == [1, 2]
    de = out[out["lang"] == "de"]
    assert list(de["token"]) == ["delta", "epsilon"]
    assert len(out) == 4  # k caps each group


def test_zipf_fit_matches_direct_numpy():
    from seekr_ray.extras.textstats import round6, simple_tokens
    from seekr_ray.extras.zipf import ZIPF_SCALE, zipf_fit

    rng = np.random.default_rng(23)
    # letters only: simple_tokens is [a-z]+ and would strip digits
    vocab = [
        "word" + chr(97 + i // 5) + chr(97 + i % 5) for i in range(30)
    ]
    # zipf-ish draw
    p = 1.0 / np.arange(1, 31)
    p /= p.sum()
    rows = [
        (i, " ".join(rng.choice(vocab, size=50, p=p))) for i in range(40)
    ]
    out = zipf_fit(_docs(rows)).to_pandas().iloc[0]

    # direct reference
    cnt: dict = {}
    for _, text in rows:
        for t in simple_tokens(text):
            cnt[t] = cnt.get(t, 0) + 1
    items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    sx = sy = sxy = sxx = 0
    for r0, (_, c) in enumerate(items):
        lr, lc = np.log(float(r0 + 1)), np.log(float(c))
        sx += int(np.floor(lr * ZIPF_SCALE))
        sy += int(np.floor(lc * ZIPF_SCALE))
        sxy += int(np.floor(lr * lc * ZIPF_SCALE))
        sxx += int(np.floor(lr * lr * ZIPF_SCALE))
    v = float(len(items))
    fx, fy, fxy, fxx = (s / ZIPF_SCALE for s in (sx, sy, sxy, sxx))
    slope_raw = (v * fxy - fx * fy) / (v * fxx - fx * fx)
    assert out["n_terms"] == len(items)
    assert out["slope"] == round6(slope_raw)
    assert out["intercept"] == round6((fy - slope_raw * fx) / v)
    assert -2.0 < out["slope"] < -0.3  # zipf-ish corpus
