"""v2 doc-table path: driver and dataset forms of id assignment and
dedup-loser detection are equivalent, and the drop filter masks exactly
the loser rows (key-dup min-sha winner, content-dup min-id winner)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from seekr_ray.config import DOC_ID_PARTITION_SHIFT
from seekr_ray.stages.doc_table import (
    DropFilter,
    _drops_from_arrays,
    assign_ids_driver,
    assign_ids_from_keys,
    key_hashes,
)


def _keys_table(n=200):
    return pa.table(
        {
            "repo": pa.array([f"o/r{i % 7}" for i in range(n)]),
            "path": pa.array([f"src/f{i}.py" for i in range(n)]),
            "commit": pa.array([f"c{i % 3}" for i in range(n)]),
        }
    )


KEY_COLS = ["repo", "path", "commit"]


def test_driver_and_dataset_id_assignment_agree(ray_session):
    import ray.data as rd

    tbl = _keys_table()
    kh_d, ids_d = assign_ids_driver(tbl, KEY_COLS, 4)
    kh_s, ids_s = assign_ids_from_keys(rd.from_arrow(tbl), KEY_COLS, 4)
    assert np.array_equal(kh_d, kh_s)
    assert np.array_equal(ids_d, ids_s)


def test_id_assignment_ignores_input_order_and_dups(ray_session):
    tbl = _keys_table()
    # shuffled + duplicated input produces the identical id map
    idx = np.random.default_rng(0).permutation(tbl.num_rows)
    shuffled = pa.concat_tables([tbl.take(idx), tbl.take(idx[:50])])
    kh_a, ids_a = assign_ids_driver(tbl, KEY_COLS, 4)
    kh_b, ids_b = assign_ids_driver(shuffled, KEY_COLS, 4)
    assert np.array_equal(kh_a, kh_b)
    assert np.array_equal(ids_a, ids_b)
    # ids are dense ranks under their pid
    pids = ids_a >> DOC_ID_PARTITION_SHIFT
    for p in np.unique(pids):
        ranks = ids_a[pids == p] & ((1 << DOC_ID_PARTITION_SHIFT) - 1)
        assert np.array_equal(np.sort(ranks), np.arange(len(ranks)))


def _sha(s):
    return hashlib.sha256(s.encode()).hexdigest()


def test_drops_winner_rules():
    # doc 10 has a key-dup (two shas) -> min sha wins; docs 20/21 share
    # content -> min doc_id wins; doc 30 clean
    ids = np.array([10, 10, 20, 21, 30], dtype=np.int64)
    shas = np.asarray(
        [_sha("b"), _sha("a"), _sha("x"), _sha("x"), _sha("y")], dtype=object
    )
    drops = _drops_from_arrays(ids, shas)
    rows = set(
        zip(
            drops["doc_id"].to_pylist(),
            drops["content_sha256"].to_pylist(),
            drops["reason"].to_pylist(),
        )
    )
    assert (10, max(_sha("a"), _sha("b")), "key_dup") in rows
    assert (21, _sha("x"), "content_dup") in rows
    assert len(rows) == 2


def test_drop_filter_masks_losers():
    ids = np.array([10, 10, 20, 21, 30], dtype=np.int64)
    shas = np.asarray(
        [_sha("b"), _sha("a"), _sha("x"), _sha("x"), _sha("y")], dtype=object
    )
    drops = _drops_from_arrays(ids, shas)
    f = DropFilter(drops)
    keep = f.keep_mask(ids, shas.tolist())
    kept = list(zip(ids[keep].tolist(), shas[keep].tolist()))
    assert (10, min(_sha("a"), _sha("b"))) in kept
    assert (20, _sha("x")) in kept
    assert (30, _sha("y")) in kept
    assert len(kept) == 3


def test_dataset_drops_match_driver(ray_session, tmp_path):
    """compute_drops' dataset path (forced) equals the driver path."""
    import pyarrow.parquet as pq

    from seekr_ray.stages import doc_table as dt

    ids = np.array([10, 10, 20, 21, 30, 31, 31, 40], dtype=np.int64)
    shas = np.asarray(
        [
            _sha("b"), _sha("a"), _sha("x"), _sha("x"),
            _sha("y"), _sha("q"), _sha("p"), _sha("y"),
        ],
        dtype=object,
    )
    docs_dir = str(tmp_path / "docs")
    import os

    os.makedirs(docs_dir)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "content_sha256": pa.array(shas.tolist(), pa.string()),
            }
        ),
        os.path.join(docs_dir, "part-0.parquet"),
    )
    want = _drops_from_arrays(ids, shas)
    old_limit = dt.DRIVER_TABLE_LIMIT
    dt.DRIVER_TABLE_LIMIT = 0  # force the dataset-shaped path
    try:
        got = dt.compute_drops(docs_dir)
    finally:
        dt.DRIVER_TABLE_LIMIT = old_limit

    def norm(t):
        return sorted(
            zip(
                t["doc_id"].to_pylist(),
                t["content_sha256"].to_pylist(),
                t["reason"].to_pylist(),
            )
        )

    assert norm(got) == norm(want)


def test_config_checkpoint_blocks_partition_change(ray_session, tmp_path):
    """Resume with a changed num_term_partitions hard-fails instead of
    silently mis-routing lookups (ADVICE round 1)."""
    import ray.data as rd

    from seekr_ray.build import build_index
    from seekr_ray.config import IndexConfig

    rows = pa.table(
        {
            "repo": pa.array(["o/r"] * 4),
            "path": pa.array([f"src/f{i}.py" for i in range(4)]),
            "commit": pa.array(["c"] * 4),
            "content": pa.array([f"alpha beta w{i}" for i in range(4)]),
        }
    )
    d = str(tmp_path / "idx")
    build_index(
        rd.from_arrow(rows),
        d,
        IndexConfig(num_term_partitions=4, num_id_partitions=2),
        key_cols=KEY_COLS,
    )
    with pytest.raises(ValueError, match="partition-affecting"):
        build_index(
            rd.from_arrow(rows),
            d,
            IndexConfig(num_term_partitions=8, num_id_partitions=2),
            key_cols=KEY_COLS,
        )
    # resume=False (full rebuild) is the sanctioned way out
    build_index(
        rd.from_arrow(rows),
        d,
        IndexConfig(num_term_partitions=8, num_id_partitions=2),
        key_cols=KEY_COLS,
        resume=False,
    )
