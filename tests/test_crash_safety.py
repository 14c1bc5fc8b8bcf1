"""Crash-safety of the extension/compaction path (review 2026-08-18):

* compaction commits via a marker protocol — a crash between the merged
  base rename and the delta unlinks must NOT leave double-counted
  postings (recovery runs in compact_index, extend_index AND
  SegmentStore.__init__);
* compacting while an extension is pending must refuse;
* the per-partition stats rewrite is derived purely from on-disk
  segment files, so a Ray task retry reproduces identical bytes;
* load_doclens dedupes by doc_id, so a rolled-back generation's
  residual sidecar rows cannot skew avgdl/BM25.
"""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from seekr_ray.build import build_index
from seekr_ray.config import IndexConfig
from seekr_ray.fixtures import cached_corpus_path
from seekr_ray.query.engine import QueryEngine
from seekr_ray.stages.extend import (
    _compact_marker_path,
    _rebuild_partition_stats,
    compact_index,
    extend_index,
    partition_files,
    recover_compaction,
)

N_DOCS = 120
BASE = "/tmp/seekr_crash_base"


def _cfg():
    return IndexConfig(
        num_term_partitions=4, num_id_partitions=4, postings_per_chunk=16
    )


@pytest.fixture(scope="module")
def extended_index(ray_session):
    import ray.data as rd

    corpus = pq.read_table(cached_corpus_path(N_DOCS))
    half = N_DOCS // 2
    h1, h2 = "/tmp/seekr_crash_h1.parquet", "/tmp/seekr_crash_h2.parquet"
    pq.write_table(corpus.slice(0, half), h1)
    pq.write_table(corpus.slice(half), h2)
    shutil.rmtree(BASE, ignore_errors=True)
    build_index(
        rd.read_parquet(h1), BASE, _cfg(),
        key_cols=["repo", "path", "commit"], input_path=h1,
    )
    extend_index(
        rd.read_parquet(h2), BASE, key_cols=["repo", "path", "commit"]
    )
    return BASE


def _results(index_dir, query="parse buffer", k=50):
    e = QueryEngine(index_dir)
    return e.search_topk(query, k=k), e.bm25_topk(query, k=k)


def _delta_of_some_partition(seg_dir):
    for p in range(4):
        files = partition_files(seg_dir, p)
        if len(files) > 1:
            return p, files[0], files[1]
    raise AssertionError("no partition with a delta")


def test_compact_crash_after_rename_is_recovered(extended_index, ray_session):
    """Crash window: merged base renamed into place, deltas NOT yet
    unlinked.  Without recovery every query double-counts the delta's
    postings; recovery (run by SegmentStore.__init__) must unlink them."""
    cdir = "/tmp/seekr_crash_after"
    shutil.rmtree(cdir, ignore_errors=True)
    shutil.copytree(extended_index, cdir)
    seg_dir = os.path.join(cdir, "segments")
    part, base, delta = _delta_of_some_partition(seg_dir)
    delta_bytes = open(delta, "rb").read()
    compact_index(cdir)
    want = _results(cdir)
    # fabricate the crash state: delta back on disk + committed marker
    with open(delta, "wb") as f:
        f.write(delta_bytes)
    import hashlib

    sha = hashlib.sha256(open(base, "rb").read()).hexdigest()
    with open(_compact_marker_path(seg_dir, part), "w") as f:
        json.dump(
            {
                "base": os.path.basename(base),
                "merged_sha256": sha,
                "deltas": [os.path.basename(delta)],
            },
            f,
        )
    # a fresh store runs recovery before reading segments
    got = _results(cdir)
    assert got == want
    assert not os.path.exists(delta)
    assert not os.path.exists(_compact_marker_path(seg_dir, part))


def test_compact_crash_before_rename_is_recovered(extended_index, ray_session):
    """Crash window: marker written but the merged base never renamed —
    the original base + deltas are intact; recovery must DISCARD the
    marker (not unlink the deltas) and a later compaction succeeds."""
    cdir = "/tmp/seekr_crash_before"
    shutil.rmtree(cdir, ignore_errors=True)
    shutil.copytree(extended_index, cdir)
    want = _results(cdir)
    seg_dir = os.path.join(cdir, "segments")
    part, base, delta = _delta_of_some_partition(seg_dir)
    with open(base + ".compact-tmp", "wb") as f:
        f.write(b"partial garbage")
    with open(_compact_marker_path(seg_dir, part), "w") as f:
        json.dump(
            {
                "base": os.path.basename(base),
                "merged_sha256": "0" * 64,  # rename never happened
                "deltas": [os.path.basename(delta)],
            },
            f,
        )
    assert recover_compaction(seg_dir) == 1
    assert os.path.exists(delta)  # postings NOT lost
    assert not os.path.exists(base + ".compact-tmp")
    assert _results(cdir) == want
    compact_index(cdir)
    assert _results(cdir) == want


def test_compact_refuses_pending_extension(extended_index, ray_session):
    cdir = "/tmp/seekr_crash_pending"
    shutil.rmtree(cdir, ignore_errors=True)
    shutil.copytree(extended_index, cdir)
    with open(os.path.join(cdir, "_extend_pending.json"), "w") as f:
        json.dump({"generation": 99}, f)
    with pytest.raises(RuntimeError, match="incomplete extension"):
        compact_index(cdir)


def test_stats_rebuild_is_idempotent(extended_index, ray_session):
    """A Ray retry of the per-partition extend task re-derives stats from
    the same on-disk segment files — byte-identical output."""
    from seekr_ray.build import load_meta

    seg_dir = os.path.join(extended_index, "segments")
    stats_dir = os.path.join(extended_index, "term_stats")
    n = int(load_meta(extended_index)["n_docs"])
    for p in range(4):
        path = os.path.join(stats_dir, f"term_part={p}", "stats.parquet")
        cands = (
            [path]
            if os.path.exists(path)
            else [
                os.path.join(stats_dir, f"term_part={p}", f)
                for f in os.listdir(os.path.join(stats_dir, f"term_part={p}"))
                if f.endswith(".parquet")
            ]
        )
        before = {c: open(c, "rb").read() for c in cands}
        _rebuild_partition_stats(seg_dir, stats_dir, p, n)
        for c, b in before.items():
            assert open(c, "rb").read() == b, f"partition {p} not idempotent"


def test_load_doclens_dedupes_residual_rows(ray_session, tmp_path):
    from seekr_ray.query.store import load_doclens

    idx = tmp_path / "idx"
    dl_dir = idx / "doclen"
    dl_dir.mkdir(parents=True)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "dl": pa.array([10, 20, 30], pa.int64())}),
        dl_dir / "a.parquet",
    )
    # residual re-emission of docs 2 and 3 (identical values)
    pq.write_table(
        pa.table({"doc_id": pa.array([2, 3, 4], pa.int64()),
                  "dl": pa.array([20, 30, 40], pa.int64())}),
        dl_dir / "b.parquet",
    )
    ids, dls, avgdl = load_doclens(str(idx))
    assert ids.tolist() == [1, 2, 3, 4]
    assert dls.tolist() == [10, 20, 30, 40]
    assert avgdl == 25.0
