"""token_budget_sample: exact per-group token-budget prefix."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.extras.budget import token_budget_sample
from seekr_ray.extras.textstats import simple_tokens


def _docs_table(n=400, langs=("en", "fr", "de")):
    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = {"doc_id": [], "lang": [], "text": []}
    for i in range(n):
        rows["doc_id"].append(i)
        rows["lang"].append(langs[i % len(langs)])
        k = int(rng.integers(3, 40))
        rows["text"].append(" ".join(rng.choice(words, k).tolist()))
    return pa.table(rows)


def _expected(tbl, budget):
    by_lang = {}
    for d, l, t in zip(
        tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist(), tbl["text"].to_pylist()
    ):
        h = int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little")
        by_lang.setdefault(l, []).append((h, d, len(simple_tokens(t))))
    keep = []
    for l, rows in by_lang.items():
        cum = 0
        for h, d, nt in sorted(rows):
            cum += nt
            if cum > budget:
                break
            keep.append((l, d, nt))
    return sorted(keep)


@pytest.mark.parametrize("budget", [0, 50, 500, 10**9])
def test_matches_serial_oracle(ray_session, budget):
    import ray.data as rd

    tbl = _docs_table()
    out = token_budget_sample(
        rd.from_arrow(tbl), budget=budget, group_col="lang"
    ).to_pandas()
    got = (
        []
        if out.empty
        else sorted(zip(out["lang"], out["doc_id"], out["n_tokens"]))
    )
    assert got == _expected(tbl, budget)


def test_budget_is_inclusive_and_exact(ray_session):
    import ray.data as rd

    tbl = _docs_table()
    budget = 300
    out = token_budget_sample(
        rd.from_arrow(tbl), budget=budget, group_col="lang"
    ).to_pandas()
    per_lang = out.groupby("lang")["n_tokens"].sum()
    assert (per_lang <= budget).all()
    # adding the next doc in hash order would exceed the budget (the
    # prefix is maximal) — checked via the serial oracle already, but
    # assert non-vacuity: every group actually selected something
    assert set(per_lang.index) == {"en", "fr", "de"}
    assert (per_lang > 0).all()


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    tbl = _docs_table()
    a = token_budget_sample(
        rd.from_arrow(tbl), budget=777, group_col="lang"
    ).to_pandas()
    b = token_budget_sample(
        rd.from_arrow(tbl).repartition(13), budget=777, group_col="lang"
    ).to_pandas()
    key = lambda df: sorted(zip(df["lang"], df["doc_id"], df["n_tokens"]))
    assert key(a) == key(b)
