"""curate_write: the resumable end-to-end curation ACTION — exact
dedup (first-wins) + scrub + gates + per-fragment atomic shards, with
crash-resume semantics (finished shards skipped, drops cached)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from seekr_ray.extras.pipeline import curate_write

GOOD = (
    "rivers flowed through ancient forests while mountain passes "
    "carried travellers toward distant harbours every spring"
)


def _write_fragments(dir_path, frags):
    os.makedirs(dir_path, exist_ok=True)
    for i, rows in enumerate(frags):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            os.path.join(dir_path, f"frag-{i}.parquet"),
        )


def _read_out(out_dir):
    rows = []
    for f in sorted(os.listdir(out_dir)):
        if f.startswith("part-") and f.endswith(".parquet"):
            t = pq.read_table(os.path.join(out_dir, f))
            rows.extend(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    return sorted(rows)


def test_curate_write_end_to_end_and_resume(ray_session, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    dup = GOOD + " again"
    _write_fragments(
        src,
        [
            [(1, GOOD), (2, dup), (3, "short text")],  # 3 gated: <5 tokens
            [(4, dup), (5, GOOD + " reach me at alice@example.com today")],
            [(6, "loop\nloop\nloop\nloop\nunique")],  # dup-line gate
        ],
    )
    m = curate_write(src, out, min_tokens=5)
    assert m["n_shards"] == 3 and m["shards_written"] == 3
    rows = _read_out(out)
    ids = [r[0] for r in rows]
    # 2 beats 4 (first wins), 3 too short, 6 too repetitive
    assert ids == [1, 2, 5]
    scrubbed = dict(rows)[5]
    assert "<EMAIL>" in scrubbed and "@" not in scrubbed.replace("<EMAIL>", "")

    # resume: drop one shard, re-run -> only that shard rewritten,
    # drops cache reused, identical final output
    os.remove(os.path.join(out, "part-frag-1.parquet"))
    m2 = curate_write(src, out, min_tokens=5)
    assert m2["shards_written"] == 1 and m2["shards_skipped"] == 2
    assert _read_out(out) == rows

    # full re-run from scratch equals the resumed output
    out2 = str(tmp_path / "out2")
    curate_write(src, out2, min_tokens=5)
    assert _read_out(out2) == rows
    shutil.rmtree(out2)


def test_neardup_write_resume(ray_session, tmp_path):
    from seekr_ray.extras.pipeline import neardup_write

    src = str(tmp_path / "nd_in")
    out = str(tmp_path / "nd_out")
    near = GOOD.replace("spring", "summer")
    far = "entirely different narrative about machines weaving copper threads"
    _write_fragments(
        src,
        [
            [(1, GOOD), (2, near)],
            [(3, far), (4, GOOD)],
        ],
    )
    m = neardup_write(src, out, threshold=0.5)
    assert m["shards_written"] == 2
    rows = _read_out(out)
    # 1 is the winner of the {1, 2, 4} near-dup component; 3 unrelated
    assert [r[0] for r in rows] == [1, 3]
    # resume skips finished shards and reuses the cached drop set
    os.remove(os.path.join(out, "part-frag-0.parquet"))
    m2 = neardup_write(src, out, threshold=0.5)
    assert m2["shards_written"] == 1 and m2["shards_skipped"] == 1
    assert _read_out(out) == rows


def test_resume_is_fragment_name_keyed_and_drop_validated(ray_session, tmp_path):
    """Adding a fragment must NOT silently re-map shards: shards are
    keyed by fragment basename, and if the recomputed drop set differs
    from the cached one the run refuses instead of mixing."""
    import pytest as _pytest

    src = str(tmp_path / "rin")
    out = str(tmp_path / "rout")
    a = GOOD + " alpha"
    b = GOOD + " beta entirely different ending tokens here"
    _write_fragments(src, [[(1, a)], [(2, b)]])
    curate_write(src, out, min_tokens=5)
    before = _read_out(out)
    assert [r[0] for r in before] == [1, 2]

    # new fragment with a NEW unique doc: drop set unchanged (no dups),
    # so the run proceeds and only the new fragment's shard is written
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3], pa.int64()),
                "text": pa.array(
                    [GOOD + " gamma wholly novel suffix words"], pa.string()
                ),
            }
        ),
        os.path.join(src, "frag-9.parquet"),
    )
    m = curate_write(src, out, min_tokens=5)
    assert m["shards_written"] == 1 and m["shards_skipped"] == 2
    assert [r[0] for r in _read_out(out)] == [1, 2, 3]

    # a new fragment that CHANGES the drop set (duplicates doc 1's
    # text under a higher id) must refuse, not silently corrupt
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([9], pa.int64()),
                "text": pa.array([a], pa.string()),
            }
        ),
        os.path.join(src, "frag-z.parquet"),
    )
    with _pytest.raises(RuntimeError, match="drop set changed"):
        curate_write(src, out, min_tokens=5)


def test_resume_refuses_parameter_change(ray_session, tmp_path):
    """Re-running into the same out_dir with different gate/threshold
    parameters must refuse while committed shards exist (they were
    written under the old parameters), and proceed once the output dir
    is cleared — the _SUCCESS marker records the full parameter set."""
    import pytest as _pytest

    from seekr_ray.extras.pipeline import neardup_write

    src = str(tmp_path / "pin")
    out = str(tmp_path / "pout")
    _write_fragments(
        src,
        [[(1, GOOD + " alpha")], [(2, GOOD + " beta ending tokens here")]],
    )
    curate_write(src, out, min_tokens=5)
    with _pytest.raises(RuntimeError, match="parameters changed"):
        curate_write(src, out, min_tokens=7)
    # unchanged parameters still resume cleanly
    m = curate_write(src, out, min_tokens=5)
    assert m["shards_skipped"] == 2 and m["shards_written"] == 0

    # param change with NO committed shards: stale drops cache is
    # recomputed, run proceeds (marker is upgraded in place)
    for f in os.listdir(out):
        if f.startswith("part-"):
            os.remove(os.path.join(out, f))
    m = curate_write(src, out, min_tokens=7)
    assert m["shards_written"] == 2

    # same contract on the near-dup ACTION (threshold recorded)
    nout = str(tmp_path / "npout")
    near = GOOD.replace("spring", "summer")
    nsrc = str(tmp_path / "npin")
    _write_fragments(nsrc, [[(1, GOOD), (2, near)]])
    neardup_write(nsrc, nout, threshold=0.5)
    with _pytest.raises(RuntimeError, match="parameters changed"):
        neardup_write(nsrc, nout, threshold=0.9)
    m = neardup_write(nsrc, nout, threshold=0.5)
    assert m["shards_skipped"] == 1


def test_legacy_marker_upgrades_with_params(ray_session, tmp_path):
    """A pre-round-5 _SUCCESS marker (no recorded params) must be
    upgraded in place on the next resume — cached drops reused, the
    current call's parameters stamped — so later parameter changes
    refuse like any round-5 dir."""
    import json

    import pytest as _pytest

    src = str(tmp_path / "lin")
    out = str(tmp_path / "lout")
    _write_fragments(
        src, [[(1, GOOD + " alpha")], [(2, GOOD + " beta tail words here")]]
    )
    curate_write(src, out, min_tokens=5)
    done = os.path.join(out, "_drops", "_SUCCESS")
    with open(done) as f:
        marker = json.load(f)
    assert marker["params"]["min_tokens"] == 5
    del marker["params"]  # simulate a legacy marker
    with open(done, "w") as f:
        json.dump(marker, f)
    before = _read_out(out)
    m = curate_write(src, out, min_tokens=5)  # resume upgrades in place
    assert m["shards_skipped"] == 2
    with open(done) as f:
        assert json.load(f)["params"]["min_tokens"] == 5
    assert _read_out(out) == before
    # and the upgraded dir now refuses parameter changes
    with _pytest.raises(RuntimeError, match="parameters changed"):
        curate_write(src, out, min_tokens=9)
