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

_PARQUET_OPTS = dict(compression="zstd", use_dictionary=True)


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


def completed_partitions(index_dir: str) -> set[int]:
    """A partition counts as complete only if both its manifest line and
    its file exist (a crash between write and manifest flush re-runs it)."""
    seg_dir = os.path.join(index_dir, "segments")
    done = set()
    for part, row in read_manifest(index_dir).items():
        if os.path.exists(partition_file(seg_dir, part)):
            done.add(part)
    return done
