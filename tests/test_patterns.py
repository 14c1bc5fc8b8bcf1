"""Unit semantics for extras/patterns.py (the DuckDB equivalence runs in
tests/test_entry_contract.py; these cover edges the fixture data lacks:
missing JSON fields, empty/None text, redaction counts vs python re)."""

import hashlib
import re

import pandas as pd
import pytest


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(3)


def test_regex_redact_matches_python_re(ray_session):
    from seekr_ray.extras.patterns import regex_redact

    rows = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "t": ["a1b22c333", "no digits", "", None],
        }
    )
    got = (
        regex_redact(_ds(rows), id_col="id", text_col="t", pattern="[0-9]+")
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    for i, t in zip(rows["id"], rows["t"]):
        t = t or ""
        assert got.loc[i, "n_matches"] == len(re.findall(r"[0-9]+", t))
        red = re.sub(r"[0-9]+", "#", t)
        assert got.loc[i, "redacted_sha256"] == hashlib.sha256(
            red.encode()
        ).hexdigest()


def test_json_int_field_agg_handles_missing_fields(ray_session):
    from seekr_ray.extras.patterns import json_int_field_agg

    rows = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b"],
            "j": ['{"k": 5}', '{"other": 1}', '{"k": -3}', '{"k": 10}', None],
        }
    )
    got = (
        json_int_field_agg(_ds(rows), group_col="g", json_col="j", field="k")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    # group a: values 5 and -3 (middle row has no k field)
    assert got.loc["a", "n"] == 2
    assert got.loc["a", "sum_v"] == 2
    assert got.loc["a", "max_v"] == 5
    assert got.loc["b", "n"] == 1
    assert got.loc["b", "sum_v"] == 10


def test_repetition_stats_golden(ray_session):
    from seekr_ray.extras.patterns import repetition_stats

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha alpha alpha alpha",  # one token repeated
                "alpha bravo charlie delta",  # all distinct
                "",  # empty
            ],
        }
    )
    got = (
        repetition_stats(_ds(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: 4 tokens 1 distinct -> dup 0.75; bigrams all ("alpha","alpha")
    assert got.loc[1, "dup_token_frac"] == pytest.approx(0.75)
    assert got.loc[1, "top_bigram_frac"] == pytest.approx(1.0)
    assert got.loc[2, "dup_token_frac"] == 0.0
    assert got.loc[2, "top_bigram_frac"] == pytest.approx(1 / 3)
    assert got.loc[3, "dup_token_frac"] == 0.0
    assert got.loc[3, "top_bigram_frac"] == 0.0
