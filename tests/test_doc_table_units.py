"""Doc-table unit semantics: deterministic ids, duplicate-key collapse,
duplicate-content drop, invariant column."""

import hashlib

import pyarrow as pa
import pytest

from seekr_ray.config import DOC_ID_PARTITION_SHIFT
from seekr_ray.stages.doc_table import prepare_documents


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "commit": pa.array([r[2] for r in rows]),
                "content": pa.array([r[3] for r in rows]),
            }
        )
    )


ROWS = [
    ("o/r", "src/a.py", "c1", "alpha beta"),
    ("o/r", "src/b.py", "c1", "gamma delta"),
    ("o/r", "src/c.py", "c1", "alpha beta"),  # duplicate content of a.py
    ("o/x", "src/d.py", "c2", "epsilon"),
]


def _prepare(rows):
    return (
        prepare_documents(
            _ds(rows),
            key_cols=["repo", "path", "commit"],
            content_col="content",
            num_id_partitions=4,
        )
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )


def test_ids_deterministic_and_dedup(ray_session):
    out1 = _prepare(ROWS)
    out2 = _prepare(ROWS)
    assert list(out1["doc_id"]) == list(out2["doc_id"])
    # duplicate content dropped: which copy survives is the min doc_id
    paths = set(out1["path"])
    assert len(paths) == 3
    assert ("src/a.py" in paths) != ("src/c.py" in paths)
    # sha invariant
    for _, r in out1.iterrows():
        assert (
            hashlib.sha256(r["content"].encode()).hexdigest()
            == r["content_sha256"]
        )
    # id layout: pid in high bits
    for d in out1["doc_id"]:
        assert 0 <= (d >> DOC_ID_PARTITION_SHIFT) < 4


def test_duplicate_keys_collapse(ray_session):
    rows = ROWS + [("o/r", "src/a.py", "c1", "DIFFERENT content")]
    out = _prepare(rows)
    # the duplicate key keeps exactly one row, deterministically (min sha)
    assert (out["path"] == "src/a.py").sum() <= 1
    a_rows = out[out["path"] == "src/a.py"]
    if len(a_rows):
        want = min(
            hashlib.sha256(b"alpha beta").hexdigest(),
            hashlib.sha256(b"DIFFERENT content").hexdigest(),
        )
        assert a_rows.iloc[0]["content_sha256"] == want


def test_title_and_url(ray_session):
    out = _prepare(ROWS)
    row = out[out["path"] == "src/b.py"].iloc[0]
    assert row["title"] == "b.py"
    assert row["url"] == "repo://o/r/src/b.py"


def test_id_col_passthrough_dedup(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "text": pa.array(["same", "same", "other"]),
            }
        )
    )
    out = (
        prepare_documents(
            ds, key_cols=None, content_col="text", num_id_partitions=4,
            id_col="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["doc_id"]) == [10, 12]  # min doc_id per content wins
