"""Resume with changed partition-affecting config must hard-fail
(build.py ``_check_config``): a resume under a different
num_term_partitions would route ``hash(term) % new_P`` lookups into
files physically partitioned by old_P and silently lose postings."""

import shutil

import pytest

from seekr_ray.config import IndexConfig

INDEX_DIR = "/tmp/seekr_cfg_check_index"


def _build(cfg, resume=False):
    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.fixtures import cached_corpus_path

    return build_index(
        rd.read_parquet(cached_corpus_path(60)),
        INDEX_DIR,
        cfg,
        key_cols=["repo", "path", "commit"],
        resume=resume,
    )


def _cfg(P):
    return IndexConfig(
        num_term_partitions=P,
        num_id_partitions=2,
        hot_df_threshold=40,
        postings_per_chunk=16,
    )


def test_resume_with_changed_partitions_fails(ray_session):
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    _build(_cfg(4))
    with pytest.raises(ValueError, match="partition-affecting"):
        _build(_cfg(8), resume=True)
    # unchanged config still resumes cleanly
    _build(_cfg(4), resume=True)
    # non-resume rebuild under the new config is allowed
    _build(_cfg(8))
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
