"""Unit tests for extras/funnel.py and extras/chunk.py edge cases.

The sf0.001 contract parity (Ray vs DuckDB oracle) is covered by
tests/test_entry_contract.py's parameterized sweep; these pin the edge
semantics the oracle data never hits.
"""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seekr_ray.extras.chunk import chunk_documents
from seekr_ray.extras.funnel import funnel_stages

HOUR_US = 3_600_000_000


def _ts(h):
    # hours since a fixed epoch-ish base, as timestamp[us]
    base = 1_700_000_000_000_000
    return base + h * HOUR_US


def _events(rows):
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([_ts(r[1]) for r in rows], "datetime64[us]"),
                pa.timestamp("us"),
            ),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _funnel(ray_session, rows, window_h=24):
    import ray.data as rd

    ds = funnel_stages(
        rd.from_arrow(_events(rows)),
        ("view", "click", "purchase"),
        window_us=window_h * HOUR_US,
        num_buckets=4,
    )
    out = ds.to_pandas().set_index("user_id")["funnel_stage"].sort_index()
    return dict(out)


def test_funnel_depths(ray_session):
    rows = [
        # u1: full funnel in order, inside window
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # u2: purchase BEFORE click -> depth 2 (order matters)
        (2, 0, "view"), (2, 2, "click"), (2, 1, "purchase"),
        # u3: no view at all -> 0 even with click+purchase
        (3, 0, "click"), (3, 1, "purchase"),
        # u4: click outside the 24h window of first view -> depth 1
        (4, 0, "view"), (4, 30, "click"), (4, 31, "purchase"),
        # u5: first view gates; a LATER view does not reopen the window
        (5, 0, "view"), (5, 10, "view"), (5, 40, "click"),
        # u6: purchase at exactly t1 + 24h (inclusive deadline)
        (6, 0, "view"), (6, 1, "click"), (6, 24, "purchase"),
        # u7: click at the same microsecond as view counts (>= gate)
        (7, 0, "view"), (7, 0, "click"),
    ]
    assert _funnel(None, rows) == {1: 3, 2: 2, 3: 0, 4: 1, 5: 1, 6: 3, 7: 2}


def test_funnel_min_ts_gates_next_stage(ray_session):
    # two clicks: the FIRST qualifying click (h=1) is the gate, so a
    # purchase at h=2 counts even though a later click (h=3) follows it
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 3, "click"), (1, 2, "purchase")]
    assert _funnel(None, rows) == {1: 3}


def _chunks(texts, size, overlap):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    df = chunk_documents(rd.from_arrow(tbl), size=size, overlap=overlap).to_pandas()
    return df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def test_chunk_explode_matches_python_slicing(ray_session):
    texts = ["", "a" * 5, "abcdefghij", "x" * 11, "y" * 25, "hello world, hello"]
    size, overlap = 10, 3
    stride = size - overlap
    df = _chunks(texts, size, overlap)
    expect = []
    for i, t in enumerate(texts):
        n = len(t)
        cnt = 1 if n <= size else -(-(n - size) // stride) + 1
        for ci in range(cnt):
            s = ci * stride
            expect.append((i, ci, s, min(size, n - s), t[s : s + size]))
    assert len(df) == len(expect)
    for row, (d, ci, s, ln, txt) in zip(df.itertuples(index=False), expect):
        assert (row.doc_id, row.chunk_idx, row.start_char, row.chunk_len) == (
            d, ci, s, ln,
        )
        assert row.chunk_text == txt


def test_chunk_boundaries(ray_session):
    # n == size -> exactly one chunk; n == size+1 -> two
    df = _chunks(["a" * 10, "b" * 11], size=10, overlap=4)
    counts = df.groupby("doc_id").size().to_dict()
    assert counts == {0: 1, 1: 2}
    # second chunk of doc 1 starts at stride=6 and has len 5
    last = df[(df.doc_id == 1) & (df.chunk_idx == 1)].iloc[0]
    assert last.start_char == 6 and last.chunk_len == 5
    assert last.chunk_text == "b" * 5


def test_chunk_unicode_codepoint_offsets(ray_session):
    # multi-byte codepoints: offsets count characters, not bytes
    df = _chunks(["héllo wörld çà" * 2], size=10, overlap=0)
    text = "héllo wörld çà" * 2
    got = "".join(df.chunk_text)
    assert got == text
    assert list(df.chunk_len) == [10, 10, 8]
