"""The postings write-side shuffle must work against a NON-local
pyarrow filesystem (object-store stand-in): URIs resolve through
fsio, writes take the direct-PUT path (no POSIX rename), and the
segment builder reads the partition back through the same filesystem —
byte-identical segment output to a plain local-path build."""

import os

import pyarrow.parquet as pq
import ray.data as rd
from pyarrow import fs as pafs

from seekr_ray import fsio
from seekr_ray.config import IndexConfig
from seekr_ray.stages.segments import build_partition_fused
from seekr_ray.stages.tokenize import write_postings_partitioned


def _docs(n=120):
    import pyarrow as pa

    rows = {
        "doc_id": list(range(1, n + 1)),
        "content": [
            f"parse buffer stream token cluster shard doc{i} "
            f"{'alpha' if i % 2 else 'omega'} merge walk"
            for i in range(1, n + 1)
        ],
    }
    return rd.from_arrow(pa.table(rows))


def test_mock_scheme_resolution(tmp_path):
    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    fsio.register_scheme("mockfs", sub, "")
    try:
        f, p = fsio.resolve_fs("mockfs://postings")
        assert f is sub and p == "postings"
        assert not fsio.is_posix_atomic(f)
    finally:
        fsio.unregister_scheme("mockfs")


def test_postings_shuffle_on_non_posix_fs(ray_session, tmp_path):
    cfg = IndexConfig(num_term_partitions=4, num_id_partitions=4)

    # local reference build
    local_post = str(tmp_path / "local" / "postings")
    local_dl = str(tmp_path / "local" / "doclen")
    write_postings_partitioned(
        _docs(), cfg, "content", local_post, doclen_dir=local_dl
    )

    # object-store stand-in: SubTreeFileSystem is NOT LocalFileSystem,
    # so fsio takes the direct-write branch (no tmp+rename)
    remote_root = tmp_path / "remote"
    remote_root.mkdir()
    sub = pafs.SubTreeFileSystem(str(remote_root), pafs.LocalFileSystem())
    fsio.register_scheme("mockfs", sub, "")
    try:
        write_postings_partitioned(
            _docs(), cfg, "content", "mockfs://postings",
            doclen_dir="mockfs://doclen",
        )
        # no .tmp leftovers, partitions populated
        for p in range(4):
            d = remote_root / "postings" / f"term_part={p}"
            assert d.is_dir()
            assert not list(d.glob("*.tmp"))
        assert list((remote_root / "doclen").glob("*.parquet"))

        # the fused segment task reads the URI partition back and
        # produces a segment byte-identical to the local-path build
        for tag in ("a", "b"):
            os.makedirs(tmp_path / tag / "segments", exist_ok=True)
            os.makedirs(tmp_path / tag / "term_stats", exist_ok=True)
        for p in range(4):
            for tag, post_dir in [
                ("a", local_post),
                ("b", "mockfs://postings"),
            ]:
                build_partition_fused(
                    p,
                    post_dir,
                    str(tmp_path / tag / "segments"),
                    str(tmp_path / tag / "term_stats"),
                    postings_per_chunk=256,
                    n_docs=120,
                )
            fa = tmp_path / "a" / "segments" / f"part-{p:05d}.parquet"
            fb = tmp_path / "b" / "segments" / f"part-{p:05d}.parquet"
            ta = pq.read_table(str(fa))
            tb = pq.read_table(str(fb))
            assert ta.equals(tb)
    finally:
        fsio.unregister_scheme("mockfs")


def test_doclen_totals_match_across_fs(ray_session, tmp_path):
    """Same doclen row multiset through both write paths."""
    import pandas as pd

    cfg = IndexConfig(num_term_partitions=2, num_id_partitions=2)
    local_dl = str(tmp_path / "l_dl")
    write_postings_partitioned(
        _docs(40), cfg, "content", str(tmp_path / "l_post"),
        doclen_dir=local_dl,
    )
    remote_root = tmp_path / "r"
    remote_root.mkdir()
    sub = pafs.SubTreeFileSystem(str(remote_root), pafs.LocalFileSystem())
    fsio.register_scheme("mockfs", sub, "")
    try:
        write_postings_partitioned(
            _docs(40), cfg, "content", "mockfs://post", doclen_dir="mockfs://dl"
        )
    finally:
        fsio.unregister_scheme("mockfs")

    def load(d):
        files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
        return (
            pq.read_table(files)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(load(local_dl), load(str(remote_root / "dl")))
