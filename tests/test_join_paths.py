"""Join-based scale paths equal the broadcast paths: doc-id attach via
Dataset.join on the key hash, and link resolution via the two-sided url
join (the reference's J1 SQL form)."""

import shutil

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.config import IndexConfig
from seekr_ray.fixtures import cached_corpus_path, cached_links_path

N = 150
KEY_COLS = ["repo", "path", "commit"]


def _sorted_tbl(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names))
    import pyarrow.compute as pc

    return t.take(
        pc.sort_indices(t, sort_keys=[("doc_id", "ascending"), ("content_sha256", "ascending")])
    )


def test_attach_join_equals_broadcast(ray_session):
    import ray.data as rd

    from seekr_ray.stages.doc_table import (
        assign_ids_dataset,
        assign_ids_driver,
        attach_documents,
        attach_documents_via_join,
    )
    import pyarrow.parquet as pq

    path = cached_corpus_path(N)
    src_tbl = pq.read_table(path)
    id_map = assign_ids_driver(src_tbl.select(KEY_COLS), KEY_COLS, 4)
    broadcast = attach_documents(
        rd.read_parquet(path), KEY_COLS, "content", id_map
    )
    b_tables = list(broadcast.iter_batches(batch_format="pyarrow"))

    id_map_ds = assign_ids_dataset(
        rd.read_parquet(path, columns=KEY_COLS), KEY_COLS, 4
    )
    joined = attach_documents_via_join(
        rd.read_parquet(path), KEY_COLS, "content", id_map_ds, 4
    )
    j_tables = list(joined.iter_batches(batch_format="pyarrow"))

    bt = _sorted_tbl(pa.concat_tables(b_tables))
    jt = _sorted_tbl(pa.concat_tables(j_tables).select(bt.column_names))
    assert bt.num_rows == jt.num_rows == N
    assert bt.equals(jt)


def test_build_join_path_same_index_content(ray_session, monkeypatch):
    """A full build forced through the join attach produces the same
    segment bytes and doc rows as the broadcast build."""
    import hashlib
    import os

    import ray.data as rd

    from seekr_ray.build import build_index, read_docs_table
    from seekr_ray.stages import doc_table as dt

    cfg = dict(num_term_partitions=4, num_id_partitions=4, postings_per_chunk=16)
    path = cached_corpus_path(N)

    d_a, d_b = "/tmp/seekr_join_a", "/tmp/seekr_join_b"
    shutil.rmtree(d_a, ignore_errors=True)
    shutil.rmtree(d_b, ignore_errors=True)
    build_index(
        rd.read_parquet(path), d_a, IndexConfig(**cfg),
        key_cols=KEY_COLS, input_path=path,
    )
    monkeypatch.setattr(dt, "DRIVER_TABLE_LIMIT", 0)  # force the join path
    build_index(
        rd.read_parquet(path), d_b, IndexConfig(**cfg),
        key_cols=KEY_COLS, input_path=path,
    )

    def seg_shas(d):
        out = {}
        seg = os.path.join(d, "segments")
        for f in sorted(os.listdir(seg)):
            with open(os.path.join(seg, f), "rb") as fh:
                out[f] = hashlib.sha256(fh.read()).hexdigest()
        return out

    assert seg_shas(d_a) == seg_shas(d_b)
    ta = _sorted_tbl(read_docs_table(d_a))
    tb = _sorted_tbl(read_docs_table(d_b).select(ta.column_names))
    assert ta.equals(tb)


def test_resolve_links_join_equals_broadcast(ray_session):
    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.graph.pagerank import resolve_links, resolve_links_join

    path = cached_corpus_path(N)
    links = cached_links_path(N)
    d = "/tmp/seekr_join_a"  # built by the test above (or build now)
    import os

    if not os.path.exists(os.path.join(d, "meta.json")):
        shutil.rmtree(d, ignore_errors=True)
        build_index(
            rd.read_parquet(path), d,
            IndexConfig(num_term_partitions=4, num_id_partitions=4, postings_per_chunk=16),
            key_cols=KEY_COLS, input_path=path,
        )
    docs_ds = rd.read_parquet(os.path.join(d, "docs"), columns=["url", "doc_id"])

    def edge_set(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            out |= set(zip(b["src"].to_pylist(), b["dst"].to_pylist()))
        return out

    e1 = edge_set(resolve_links(rd.read_parquet(links), docs_ds))
    e2 = edge_set(resolve_links_join(rd.read_parquet(links), docs_ds, 4))
    assert e1 == e2 and len(e1) > 0
