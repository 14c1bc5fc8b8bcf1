"""Hot-term skew handling: salted terms spread across partitions and
decode back to exactly their df postings."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from seekr_ray.fixtures import HOT_TERMS
from seekr_ray.query.store import SegmentStore
from seekr_ray.stages.postings import term_partition
from seekr_ray.text.porter import stem


@pytest.fixture(scope="module")
def store(ray_session):
    # the salted shuffle path is opt-in (shuffle_strategy="salted_groupby");
    # hot_df_threshold=40 makes the fixture HOT_TERMS salted
    index_dir = "/tmp/seekr_salted_index"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        import ray.data as rd

        from seekr_ray.build import build_index
        from seekr_ray.config import IndexConfig
        from seekr_ray.fixtures import cached_corpus_path

        build_index(
            rd.read_parquet(cached_corpus_path(120)),
            index_dir,
            IndexConfig(
                num_term_partitions=4,
                num_id_partitions=4,
                hot_df_threshold=40,
                postings_per_chunk=16,
                shuffle_strategy="salted_groupby",
            ),
            key_cols=["repo", "path", "commit"],
        )
    return SegmentStore(index_dir, 4)


def _indexed_hot_stems(store):
    # "everywhere" is itself a stopword -> never indexed; use the rest
    out = []
    for t in HOT_TERMS:
        s = stem(t)
        if store.term_stat(s) is not None:
            out.append(s)
    return out


def test_hot_terms_are_salted(store):
    salted = 0
    stems = _indexed_hot_stems(store)
    assert len(stems) >= 2
    for s in stems:
        df, _idf, n_salts = store.term_stat(s)
        if df > 40:
            assert n_salts == -(-df // 40)
            salted += 1
    assert salted >= 1, "fixture hot terms should exceed the salt threshold"


def test_salted_postings_decode_complete(store):
    """Union of salted partitions yields exactly df unique sorted ids."""
    for s in _indexed_hot_stems(store):
        df, _idf, n_salts = store.term_stat(s)
        tp = store.postings(s)
        assert tp is not None
        assert len(tp.doc_ids) == df
        assert len(np.unique(tp.doc_ids)) == df
        assert (np.diff(tp.doc_ids) > 0).all()
        assert len(tp.tfs) == df and len(tp.positions) == df


def test_salted_chunks_span_partitions(store):
    """A salted term's chunks live in more than one partition file when
    its salts hash apart (P=4, so collisions are possible but at least
    one fixture hot term should spread)."""
    spread = 0
    for s in _indexed_hot_stems(store):
        _df, _idf, n_salts = store.term_stat(s)
        if n_salts < 2:
            continue
        parts = {term_partition(s, 4, salt) for salt in range(n_salts)}
        found = set()
        for p in parts:
            seg = os.path.join(store.seg_dir, f"part-{p:05d}.parquet")
            if os.path.exists(seg):
                tbl = pq.read_table(seg, columns=["term"])
                if s in set(tbl["term"].to_pylist()):
                    found.add(p)
        if len(found) > 1:
            spread += 1
    assert spread >= 1, "no salted term spread across partitions"
