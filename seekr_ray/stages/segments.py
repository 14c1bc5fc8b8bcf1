"""Segment partition writer / reader + per-partition manifest.

Layout under ``index_dir``::

    meta.json                     # N, config, schema version
    docs/*.parquet                # document metadata + content (+ sha)
    postings/*.parquet            # tokenized postings intermediate (resume
                                  # checkpoint for the tokenize stage; also
                                  # feeds both the stats and segment passes
                                  # without recomputing tokenization)
    term_stats/part-{K}.parquet   # (term, df, idf) per hash(term)%P
    segments/part-{K}.parquet     # chunk rows per hash(term)%P
    pagerank/*.parquet            # (doc_id, page_rank)
    manifest.jsonl                # one line per completed segment partition
                                  # (lineage + metrics)

The segment partition (``hash(term) % P``) is the checkpoint/resume unit
the north rule asks for: each partition file is written atomically
(tmp + rename) by a ``groupby(term_part).map_groups`` task, sorted by
(term, salt, chunk_seq) first so the bytes are a pure function of the
input rows; the manifest line records row counts, file sha256 and timing.
A resumed build filters postings to the missing partitions only (the
upstream lineage — tokenize — is recomputed by Ray, but completed
partitions are neither rebuilt nor rewritten; see build.py).

This replaces the SQLite posting-writer (``Indexer/SQLiteSearcher.java:
100-337``) whose rerun semantics were "duplicate every posting row"
(SURVEY.md §4 checkpoint row).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .postings import CHUNK_SCHEMA

# row_group_size bounds how much a query-side row-group-pruned read must
# decode around one term's chunk rows (query/store.py _PartitionIndex);
# 128 chunk rows ~ 0.5M postings per group
_PARQUET_OPTS = dict(compression="zstd", use_dictionary=True, row_group_size=128)


def partition_file(dir_: str, part: int) -> str:
    return os.path.join(dir_, f"part-{part:05d}.parquet")


def _atomic_write(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp, **_PARQUET_OPTS)
    os.replace(tmp, path)


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def write_segment_partition(
    group: pa.Table, segments_dir: str, postings_per_chunk: int
) -> pa.Table:
    """map_groups UDF over term_part: chunk-build the partition's postings
    (vectorized, stages/postings.py) and write one segment file atomically;
    returns the partition's manifest row.  Fusing build+write here keeps
    the pipeline at ONE wide shuffle (the groupby on term_part).  A plain
    function, so the reduce side runs as elastic tasks — no pool startup,
    no CPU reservation contention."""
    from .postings import build_partition_chunks

    t0 = time.monotonic()
    part = int(group["term_part"][0].as_py())
    chunks = build_partition_chunks(group, postings_per_chunk)
    # rows come out (term, salt, chunk_seq)-ordered by construction;
    # schema is pinned so file bytes never depend on upstream inference
    chunks = chunks.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
    path = partition_file(segments_dir, part)
    _atomic_write(chunks, path)
    return manifest_row_table(
        part=part,
        path=path,
        n_chunks=chunks.num_rows,
        n_terms=len(pc.unique(chunks["term"])),
        n_postings=int(pc.sum(chunks["n_docs"]).as_py() or 0),
        file_sha256=_sha256_file(path),
        duration_s=time.monotonic() - t0,
    )


MANIFEST_SCHEMA = pa.schema(
    [
        ("partition", pa.int64()),
        ("path", pa.string()),
        ("n_chunks", pa.int64()),
        ("n_terms", pa.int64()),
        ("n_postings", pa.int64()),
        ("file_sha256", pa.string()),
        ("duration_s", pa.float64()),
    ]
)


def manifest_row_table(
    part: int,
    path: str,
    n_chunks: int,
    n_terms: int,
    n_postings: int,
    file_sha256: str,
    duration_s: float,
) -> pa.Table:
    return pa.table(
        {
            "partition": [part],
            "path": [path],
            "n_chunks": [n_chunks],
            "n_terms": [n_terms],
            "n_postings": [n_postings],
            "file_sha256": [file_sha256],
            "duration_s": [duration_s],
        },
        schema=MANIFEST_SCHEMA,
    )


def write_empty_segment(segments_dir: str, part: int) -> dict:
    """Marker file for a term_part with no terms (keeps resume logic
    uniform: file-exists == partition complete)."""
    path = partition_file(segments_dir, part)
    empty = CHUNK_SCHEMA.empty_table()
    _atomic_write(empty, path)
    return {
        "partition": part,
        "path": path,
        "n_chunks": 0,
        "n_terms": 0,
        "n_postings": 0,
        "file_sha256": _sha256_file(path),
        "duration_s": 0.0,
    }


# ---------------------------------------------------------------------------
# fused per-partition build (partitioned-write shuffle strategy)
#
# The tokenize stage hive-partitions its output by hash(term) % P at WRITE
# time (write-side shuffle, like a sort-based external shuffle's map-side
# files), so every posting of a term already sits under
# ``postings/term_part=K/``.  Each partition then builds independently:
# one elastic task reads ITS files (a local/shared-FS columnar read — no
# object-store all-to-all), chunk-encodes the segment AND derives the
# term stats (df = posting rows per term, since postings are one row per
# (doc, term)) in the same pass, eliminating the separate stats read +
# groupby of the round-1 design.  idf needs only the scalar N.
#
# Skew: hot terms are NOT salted on this path (df is unknown at write
# time).  The bounds instead are (a) P >> cores so one hot partition is a
# straggler, not a stall, (b) chunk rows cap any Arrow row at
# postings_per_chunk postings, (c) the manifest records per-partition
# n_postings so stragglers are observable, (d) the salted groupby path
# (shuffle_strategy="salted_groupby") remains available when a corpus is
# known to carry df ~ N terms.
# ---------------------------------------------------------------------------

STATS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("idf", pa.float64()),
        ("n_salts", pa.int32()),
    ]
)


def stats_partition_file(stats_dir: str, part: int) -> str:
    return os.path.join(stats_dir, f"term_part={part}", f"part-{part:05d}.parquet")


def _write_stats_partition(stats_dir: str, part: int, stats: pa.Table) -> None:
    path = stats_partition_file(stats_dir, part)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _atomic_write(stats, path)


def build_partition_fused(
    part: int,
    postings_dir: str,
    seg_dir: str,
    stats_dir: str,
    postings_per_chunk: int,
    n_docs: int,
) -> pa.Table:
    """One task: read postings/term_part=K/ locally, write the segment
    file AND its term-stats partition, return the manifest row."""
    import posixpath

    import numpy as np

    from ..fsio import list_parquet, resolve_fs
    from .postings import build_partition_chunks

    t0 = time.monotonic()
    # postings_dir may be an object-store URI (see fsio.py) — the
    # segment/stats OUTPUT dirs stay on the index filesystem
    post_fs, post_root = resolve_fs(postings_dir)
    part_dir = posixpath.join(post_root, f"term_part={part}")
    files = list_parquet(post_fs, part_dir)
    tbl = None
    if files:
        cols = ["doc_id", "term", "tf", "positions"]
        # round-1 postings intermediates lack the importance column
        if "importance" in pq.read_schema(files[0], filesystem=post_fs).names:
            cols.append("importance")
        tbl = pq.read_table(files, columns=cols, filesystem=post_fs)
    if tbl is None or tbl.num_rows == 0:
        _write_stats_partition(stats_dir, part, STATS_SCHEMA.empty_table())
        row = write_empty_segment(seg_dir, part)
        return manifest_row_table(
            part=row["partition"],
            path=row["path"],
            n_chunks=0,
            n_terms=0,
            n_postings=0,
            file_sha256=row["file_sha256"],
            duration_s=time.monotonic() - t0,
        )
    n = tbl.num_rows
    tbl = tbl.append_column(
        "salt", pa.array(np.zeros(n, dtype=np.int32), pa.int32())
    ).append_column(
        "term_part", pa.array(np.full(n, part, dtype=np.int64), pa.int64())
    )
    chunks = build_partition_chunks(tbl, postings_per_chunk)
    chunks = chunks.select(CHUNK_SCHEMA.names).cast(CHUNK_SCHEMA)
    seg_path = partition_file(seg_dir, part)
    _atomic_write(chunks, seg_path)

    # term stats from the in-hand postings (sorted for determinism)
    agg = tbl.select(["term"]).group_by("term").aggregate([("term", "count")])
    # name-based access: pyarrow's aggregate column ORDER differs across
    # release lines (keys-first vs aggregates-first)
    agg = agg.sort_by("term")
    df = pc.cast(agg["term_count"], pa.int64())
    idf = pc.log10(pc.divide(float(n_docs), pc.cast(df, pa.float64())))
    stats = pa.table(
        {
            "term": agg["term"],
            "df": df,
            "idf": idf,
            "n_salts": pa.array(
                np.ones(agg.num_rows, dtype=np.int32), pa.int32()
            ),
        },
        schema=STATS_SCHEMA,
    )
    _write_stats_partition(stats_dir, part, stats)
    return manifest_row_table(
        part=part,
        path=seg_path,
        n_chunks=chunks.num_rows,
        n_terms=agg.num_rows,
        n_postings=n,
        file_sha256=_sha256_file(seg_path),
        duration_s=time.monotonic() - t0,
    )


# ---------------------------------------------------------------------------
# manifest io
# ---------------------------------------------------------------------------


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.jsonl")


def read_manifest(index_dir: str) -> dict[int, dict]:
    path = manifest_path(index_dir)
    out: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    row = json.loads(line)
                    out[int(row["partition"])] = row
    return out


def write_manifest(index_dir: str, rows: dict[int, dict]) -> None:
    path = manifest_path(index_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for part in sorted(rows):
            f.write(json.dumps(rows[part], sort_keys=True) + "\n")
    os.replace(tmp, path)


def completed_partitions(index_dir: str, require_stats: bool = False) -> set[int]:
    """A partition counts as complete only if both its manifest line and
    its file exist (a crash between write and manifest flush re-runs it).
    The fused path additionally requires the partition's stats file."""
    seg_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "term_stats")
    done = set()
    for part, row in read_manifest(index_dir).items():
        if not os.path.exists(partition_file(seg_dir, part)):
            continue
        if require_stats and not os.path.isdir(
            os.path.join(stats_dir, f"term_part={part}")
        ):
            continue
        done.add(part)
    return done
