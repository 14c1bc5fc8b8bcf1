"""Driver-contract conformance: every ``queries()`` entry runs, and every
``oracle_sql()`` entry matches the Ray result via DuckDB (row count,
column names, order-insensitive values) — the same comparison shape the
driver applies at sf0.01."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return (
        df.sort_values(by=list(df.columns))
        .reset_index(drop=True)
    )


QUERY_NAMES = sorted(entrymod.queries().keys())
ORACLE = entrymod.oracle_sql()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs_and_matches_oracle(ray_session, con, name):
    fn = entrymod.queries()[name]
    got = _to_pandas(fn(SF_DIR))
    assert got is not None
    sql = ORACLE.get(name)
    if sql is None:
        # rows-only contract: runs, has stable schema
        assert list(got.columns)
        return
    want = con.sql(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: cols {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    g = _normalize(got)
    w = _normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col].astype(g[col].dtype, errors="ignore") if hasattr(w[col], "astype") else w[col]
        try:
            pd.testing.assert_series_equal(
                g[col], w[col], check_dtype=False, check_names=False
            )
        except AssertionError as e:
            raise AssertionError(f"{name}: column {col} mismatch\n{e}") from None


def test_entry_smoke(ray_session):
    out = _to_pandas(entrymod.entry())
    assert len(out) >= 0
    assert list(out.columns) == ["query_id", "rank", "doc_id", "score"]
