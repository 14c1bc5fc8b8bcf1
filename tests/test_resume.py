"""Checkpoint/resume: a build interrupted after some segment partitions
must resume, rebuild only the missing partitions, and produce
byte-identical segment files (FIXTURES.md §5 "Resume", SURVEY.md §7.5.4)."""

import hashlib
import json
import os
import shutil

import pytest

from seekr_ray.build import build_index
from seekr_ray.config import IndexConfig
from seekr_ray.fixtures import cached_corpus_path
from seekr_ray.stages.segments import partition_file, read_manifest

INDEX_DIR = "/tmp/seekr_resume_index"


def _cfg():
    return IndexConfig(
        num_term_partitions=4,
        num_id_partitions=4,
        hot_df_threshold=40,
        postings_per_chunk=16,
    )


def _file_sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


@pytest.fixture(scope="module")
def full_build(ray_session):
    import ray.data as rd

    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    docs = rd.read_parquet(cached_corpus_path(80))
    build_index(
        docs, INDEX_DIR, _cfg(), key_cols=["repo", "path", "commit"]
    )
    seg_dir = os.path.join(INDEX_DIR, "segments")
    shas = {
        p: _file_sha(partition_file(seg_dir, p)) for p in range(4)
    }
    return INDEX_DIR, shas


def test_resume_rebuilds_only_missing_and_is_byte_identical(full_build):
    import ray.data as rd

    index_dir, shas_before = full_build
    seg_dir = os.path.join(index_dir, "segments")

    # simulate a crash that lost partitions 1 and 3 (file gone)
    for part in (1, 3):
        os.remove(partition_file(seg_dir, part))

    docs = rd.read_parquet(cached_corpus_path(80))
    metrics = build_index(
        docs, index_dir, _cfg(), key_cols=["repo", "path", "commit"], resume=True
    )
    seg = metrics["stages"]["segments"]
    assert seg["partitions_built"] == 2
    assert seg["partitions_skipped"] == 2

    for part in range(4):
        assert _file_sha(partition_file(seg_dir, part)) == shas_before[part], part

    manifest = read_manifest(index_dir)
    assert set(manifest) == {0, 1, 2, 3}
    for part, row in manifest.items():
        assert row["file_sha256"] == shas_before[part]


def test_noop_resume_skips_everything(full_build):
    import ray.data as rd

    index_dir, shas_before = full_build
    docs = rd.read_parquet(cached_corpus_path(80))
    metrics = build_index(
        docs, index_dir, _cfg(), key_cols=["repo", "path", "commit"], resume=True
    )
    assert metrics["stages"]["segments"]["partitions_built"] == 0
    seg_dir = os.path.join(index_dir, "segments")
    for part in range(4):
        assert _file_sha(partition_file(seg_dir, part)) == shas_before[part]


def test_rebuild_from_scratch_is_deterministic(ray_session):
    """Two independent full builds produce identical segment bytes."""
    import ray.data as rd

    dir_a, dir_b = "/tmp/seekr_det_a", "/tmp/seekr_det_b"
    for d in (dir_a, dir_b):
        shutil.rmtree(d, ignore_errors=True)
        docs = rd.read_parquet(cached_corpus_path(80))
        build_index(docs, d, _cfg(), key_cols=["repo", "path", "commit"])
    for part in range(4):
        a = _file_sha(partition_file(os.path.join(dir_a, "segments"), part))
        b = _file_sha(partition_file(os.path.join(dir_b, "segments"), part))
        assert a == b, part


def test_manifest_lineage_fields(full_build):
    index_dir, _ = full_build
    manifest = read_manifest(index_dir)
    for row in manifest.values():
        assert {"partition", "path", "n_chunks", "n_terms", "n_postings",
                "file_sha256", "duration_s"} <= set(row)
    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    assert meta["n_docs"] > 0 and "config" in meta
