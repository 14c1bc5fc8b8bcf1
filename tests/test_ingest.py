"""Corpus ingestion (stages/ingest.py): CSV / JSONL / parquet sources
normalize to the canonical corpus parquet layout."""

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seekr_ray.stages.ingest import detect_format, ingest_corpus


@pytest.fixture(scope="module")
def small_corpus():
    from seekr_ray.fixtures import corpus_batch

    return corpus_batch(np.arange(60))


def _read_sorted(out_dir: str) -> pa.Table:
    tbl = pq.read_table(out_dir)
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl, [(c, "ascending") for c in cols]))


def test_detect_format():
    assert detect_format("/x/y.csv") == "csv"
    assert detect_format("/x/y.jsonl") == "jsonl"
    assert detect_format("/x/y.parquet") == "parquet"
    with pytest.raises(ValueError):
        detect_format("/x/y.xml")


def test_ingest_csv_roundtrip(ray_session, tmp_path, small_corpus):
    src = str(tmp_path / "corpus.csv")
    pacsv.write_csv(small_corpus, src)
    out = str(tmp_path / "out_csv")
    m = ingest_corpus(src, out)
    assert m == {"format": "csv", "n_rows": 60, "skipped": False}
    got = _read_sorted(out)
    want = _read_sorted_table(small_corpus)
    assert got.equals(want)


def test_ingest_jsonl_roundtrip(ray_session, tmp_path, small_corpus):
    src = str(tmp_path / "corpus.jsonl")
    with open(src, "w") as f:
        for row in small_corpus.to_pylist():
            f.write(json.dumps(row) + "\n")
    out = str(tmp_path / "out_jsonl")
    m = ingest_corpus(src, out)
    assert m == {"format": "jsonl", "n_rows": 60, "skipped": False}
    assert _read_sorted(out).equals(_read_sorted_table(small_corpus))


def _read_sorted_table(tbl: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    return tbl.take(pc.sort_indices(tbl, [(c, "ascending") for c in cols]))


def test_ingest_rename_and_overtyped_column(ray_session, tmp_path):
    """A CSV whose commit column is all digits (inferred int64) and whose
    content lives under a different name still normalizes to canonical
    string columns."""
    src_tbl = pa.table(
        {
            "repo": pa.array(["r0", "r1"], pa.string()),
            "path": pa.array(["a.py", "b.py"], pa.string()),
            "commit": pa.array([1234, 5678], pa.int64()),
            "body": pa.array(["hello world", "foo bar"], pa.string()),
        }
    )
    src = str(tmp_path / "weird.csv")
    pacsv.write_csv(src_tbl, src)
    out = str(tmp_path / "out_weird")
    m = ingest_corpus(src, out, column_map={"body": "content"})
    assert m["n_rows"] == 2
    got = pq.read_table(out)
    assert set(got.column_names) == {"repo", "path", "commit", "content"}
    assert got.schema.field("commit").type == pa.string()
    assert sorted(got["commit"].to_pylist()) == ["1234", "5678"]


def test_ingest_missing_column_fails_fast(ray_session, tmp_path):
    src_tbl = pa.table({"repo": pa.array(["r0"], pa.string())})
    src = str(tmp_path / "bad.csv")
    pacsv.write_csv(src_tbl, src)
    with pytest.raises(ValueError, match="lacks required columns"):
        ingest_corpus(src, str(tmp_path / "out_bad"))


def test_ingest_resume_skips(ray_session, tmp_path, small_corpus):
    src = str(tmp_path / "corpus.csv")
    pacsv.write_csv(small_corpus, src)
    out = str(tmp_path / "out_resume")
    ingest_corpus(src, out)
    m2 = ingest_corpus(src, out)
    assert m2 == {"format": "csv", "n_rows": 60, "skipped": True}
    m3 = ingest_corpus(src, out, resume=False)
    assert m3["skipped"] is False


def test_build_over_ingested_equals_parquet_build(
    ray_session, tmp_path, small_corpus
):
    """End-to-end: index built from an ingested JSONL corpus is
    query-identical to one built from the original parquet."""
    from seekr_ray.build import build_index
    from seekr_ray.config import IndexConfig
    from seekr_ray.query.engine import QueryEngine

    src_pq = str(tmp_path / "corpus.parquet")
    pq.write_table(small_corpus, src_pq)
    src_jl = str(tmp_path / "corpus.jsonl")
    with open(src_jl, "w") as f:
        for row in small_corpus.to_pylist():
            f.write(json.dumps(row) + "\n")
    ing_dir = str(tmp_path / "ingested")
    ingest_corpus(src_jl, ing_dir)

    import ray.data as rd

    cfg = IndexConfig(num_term_partitions=4, num_id_partitions=4)
    idx_a = str(tmp_path / "idx_pq")
    idx_b = str(tmp_path / "idx_jl")
    keys = ["repo", "path", "commit"]
    build_index(
        rd.read_parquet(src_pq), idx_a, cfg=cfg,
        key_cols=keys, input_path=src_pq,
    )
    build_index(
        rd.read_parquet(ing_dir), idx_b, cfg=cfg,
        key_cols=keys, input_path=ing_dir,
    )

    ea, eb = QueryEngine(idx_a), QueryEngine(idx_b)
    for q in ("parse AND buffer", "token", '"parse buffer"'):
        ra = ea.search(q, page=0, size=10)
        rb = eb.search(q, page=0, size=10)
        assert ra["total_count"] == rb["total_count"]
        assert [
            (r["url"], round(r["score"], 9)) for r in ra["results"]
        ] == [(r["url"], round(r["score"], 9)) for r in rb["results"]]
