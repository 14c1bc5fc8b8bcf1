"""Per-posting ``importance`` parity (reference stores
``getPositionWeight(best_section)`` per InvertedIndex row,
``Indexer/SQLiteSearcher.java:69,273``; it is never read at query time,
so scoring stays importance==1.0 — SURVEY.md §2.9).

The rebuild carries it end-to-end: tokenizer -> postings column ->
segment chunk ``importance_enc`` (null when the chunk is all 1.0, so the
single-section corpus pays ~zero bytes) -> ``TermPostings.importances``.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.stages.postings import CHUNK_SCHEMA, build_partition_chunks
from seekr_ray.stages.tokenize import postings_from_sections, tokenize_batch
from seekr_ray.text.tokenizer import SECTION_WEIGHTS


def test_single_section_importance_is_one():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "content": ["parse the buffer", "buffer overflow parse"],
        }
    )
    out = tokenize_batch(batch)
    assert "importance" in out.column_names
    assert set(out["importance"].to_pylist()) == {1.0}


def test_sections_importance_is_best_section_weight():
    tbl = postings_from_sections(
        7,
        [
            ("title", "parse"),
            ("content", "parse buffer buffer"),
        ],
    )
    imp = dict(zip(tbl["term"].to_pylist(), tbl["importance"].to_pylist()))
    # "parse" appears in title (best section) -> title weight
    assert imp["pars"] == SECTION_WEIGHTS["title"]
    # "buffer" only in content -> content weight (1.0)
    assert imp["buffer"] == SECTION_WEIGHTS.get("content", 1.0)


def _postings_tbl(doc_ids, terms, imps):
    n = len(doc_ids)
    pos = pa.array([b"\x00"] * n, pa.binary())
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array([0.5] * n, pa.float64()),
            "positions": pos,
            "importance": pa.array(imps, pa.float64()),
            "salt": pa.array([0] * n, pa.int32()),
            "term_part": pa.array([0] * n, pa.int64()),
        }
    )


def test_chunk_importance_enc_null_iff_all_ones():
    tbl = _postings_tbl(
        [1, 2, 3, 4],
        ["aa", "aa", "bb", "bb"],
        [1.0, 1.0, 1.0, 2.0],
    )
    chunks = build_partition_chunks(tbl, postings_per_chunk=16)
    assert "importance_enc" in chunks.column_names
    by_term = dict(
        zip(chunks["term"].to_pylist(), chunks["importance_enc"].to_pylist())
    )
    assert by_term["aa"] is None  # all-1.0 chunk stores nothing
    from seekr_ray.codec import unpack_f64

    assert list(unpack_f64(by_term["bb"])) == [1.0, 2.0]


def test_store_roundtrip_importances(tmp_path):
    from seekr_ray.query.store import SegmentStore
    from seekr_ray.stages.segments import (
        STATS_SCHEMA,
        _atomic_write,
        _write_stats_partition,
        partition_file,
    )

    tbl = _postings_tbl(
        [10, 11, 12, 20, 21],
        ["aa", "aa", "aa", "bb", "bb"],
        [1.0, 3.0, 1.0, 1.0, 1.0],
    )
    chunks = build_partition_chunks(tbl, postings_per_chunk=2)
    chunks = chunks.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
    index_dir = str(tmp_path)
    seg_dir = os.path.join(index_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    # both terms hash into P=1 partition 0
    _atomic_write(chunks, partition_file(seg_dir, 0))
    stats = pa.table(
        {
            "term": ["aa", "bb"],
            "df": pa.array([3, 2], pa.int64()),
            "idf": pa.array([0.1, 0.2], pa.float64()),
            "n_salts": pa.array([1, 1], pa.int32()),
        },
        schema=STATS_SCHEMA,
    )
    _write_stats_partition(os.path.join(index_dir, "term_stats"), 0, stats)

    store = SegmentStore(index_dir, num_term_partitions=1)
    aa = store.postings("aa")
    assert aa is not None
    np.testing.assert_array_equal(aa.doc_ids, [10, 11, 12])
    np.testing.assert_array_equal(aa.importances, [1.0, 3.0, 1.0])
    bb = store.postings("bb")
    # all-ones term: decodes to ones without stored bytes
    np.testing.assert_array_equal(bb.importances, [1.0, 1.0])


def test_full_build_serves_constant_importance(ray_session):
    """End-to-end: a standard (single-section) build stores NO importance
    bytes yet serves all-1.0 importances for every term."""
    import os

    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.config import IndexConfig
    from seekr_ray.fixtures import cached_corpus_path
    from seekr_ray.query.store import SegmentStore

    d = "/tmp/seekr_importance_idx"
    if not os.path.exists(os.path.join(d, "meta.json")):
        build_index(
            rd.read_parquet(cached_corpus_path(80)),
            d,
            IndexConfig(
                num_term_partitions=4,
                num_id_partitions=2,
                hot_df_threshold=40,
                postings_per_chunk=16,
            ),
            key_cols=["repo", "path", "commit"],
        )
    store = SegmentStore(d, num_term_partitions=4)
    tp = store.postings("pars")
    assert tp is not None and tp.df > 0
    assert tp.importances.shape == tp.doc_ids.shape
    assert (tp.importances == 1.0).all()
    # null-encoded: the chunk rows carry no importance bytes
    assert tp.imp_chunks is not None and all(e is None for e in tp.imp_chunks)


def test_store_reads_legacy_segment_without_importance(tmp_path):
    """Round-1 segment files (no importance_enc column) still serve."""
    from seekr_ray.query.store import SegmentStore
    from seekr_ray.stages.segments import (
        STATS_SCHEMA,
        _atomic_write,
        _write_stats_partition,
        partition_file,
    )

    tbl = _postings_tbl([1, 2], ["aa", "aa"], [1.0, 1.0])
    chunks = build_partition_chunks(tbl, postings_per_chunk=16)
    legacy = chunks.drop_columns(["importance_enc"])
    index_dir = str(tmp_path)
    seg_dir = os.path.join(index_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    _atomic_write(legacy, partition_file(seg_dir, 0))
    stats = pa.table(
        {
            "term": ["aa"],
            "df": pa.array([2], pa.int64()),
            "idf": pa.array([0.1], pa.float64()),
            "n_salts": pa.array([1], pa.int32()),
        },
        schema=STATS_SCHEMA,
    )
    _write_stats_partition(os.path.join(index_dir, "term_stats"), 0, stats)

    store = SegmentStore(index_dir, num_term_partitions=1)
    aa = store.postings("aa")
    assert aa is not None
    np.testing.assert_array_equal(aa.importances, [1.0, 1.0])
