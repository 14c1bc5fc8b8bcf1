"""Segment-store predicate pushdown: a single-term lookup decodes only
the row groups covering that term's chunk rows, never the whole
partition file."""

import os
import shutil

import numpy as np
import pytest

INDEX_DIR = "/tmp/seekr_prune_index"


@pytest.fixture(scope="module")
def pruned_index(ray_session):
    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.config import IndexConfig
    from seekr_ray.fixtures import cached_corpus_path
    from seekr_ray.stages import segments as seg_mod

    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    # tiny row groups so one partition file has MANY groups: pruning is
    # observable (chunk rows per term ~1-2 at postings_per_chunk=16)
    old_opts = dict(seg_mod._PARQUET_OPTS)
    seg_mod._PARQUET_OPTS["row_group_size"] = 4
    try:
        build_index(
            rd.read_parquet(cached_corpus_path(200)),
            INDEX_DIR,
            IndexConfig(
                num_term_partitions=2,
                num_id_partitions=2,
                postings_per_chunk=16,
            ),
            key_cols=["repo", "path", "commit"],
        )
    finally:
        seg_mod._PARQUET_OPTS.clear()
        seg_mod._PARQUET_OPTS.update(old_opts)
    return INDEX_DIR


def test_single_term_lookup_reads_only_covering_row_groups(pruned_index):
    from seekr_ray.query.store import SegmentStore

    store = SegmentStore(pruned_index, 2)
    stem = "pars"  # stem of "parse" — present in the fixture corpus
    stat = store.term_stat(stem)
    assert stat is not None

    part = None
    pidx = None
    from seekr_ray.stages.postings import term_partition

    part = term_partition(stem, 2)
    idxs = store._partition_indexes(part)
    assert idxs, "no partition files"
    pidx = idxs[0]
    n_groups_total = pidx.pf.metadata.num_row_groups
    assert n_groups_total > 3, "fixture should produce many row groups"

    read_groups = []
    orig = pidx.pf.read_row_groups

    def spy(groups, columns=None):
        read_groups.append(list(groups))
        return orig(groups, columns=columns)

    pidx.pf.read_row_groups = spy
    tp = store.postings(stem)
    assert tp is not None and tp.df == stat[0]
    assert read_groups, "lookup did not go through row-group reads"
    n_read = sum(len(g) for g in read_groups)
    lo, hi = pidx.term_range(stem)
    max_needed = (hi - lo) // 4 + 2  # covering groups at row_group_size=4
    assert n_read <= max_needed < n_groups_total


def test_term_range_is_exact(pruned_index):
    from seekr_ray.query.store import SegmentStore

    store = SegmentStore(pruned_index, 2)
    for part in range(2):
        idxs = store._partition_indexes(part)
        if not idxs:
            continue
        pidx = idxs[0]
        terms = pidx.terms
        assert (terms[:-1] <= terms[1:]).all(), "segment terms not sorted"
        for t in np.unique(terms)[:20]:
            lo, hi = pidx.term_range(str(t))
            assert (terms[lo:hi] == t).all()
            if lo > 0:
                assert terms[lo - 1] != t
            if hi < len(terms):
                assert terms[hi] != t


def test_prefix_terms_bisect_matches_linear(pruned_index):
    from seekr_ray.query.store import SegmentStore

    store = SegmentStore(pruned_index, 2)
    allt = store.all_terms()
    for prefix in ("pa", "tok", "zz", "s"):
        want = [t for t in allt if t.startswith(prefix)]
        assert store.prefix_terms(prefix) == want


def test_memtune_idempotent():
    """tune_allocator applies once per process and reports success on
    glibc (the sandbox); the second call is a cheap no-op."""
    import time

    from seekr_ray.memtune import tune_allocator

    assert tune_allocator(prefault_mb=1) is True
    t0 = time.monotonic()
    assert tune_allocator(prefault_mb=1024) is True  # no second prefault
    assert time.monotonic() - t0 < 0.1
