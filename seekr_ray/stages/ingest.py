"""Corpus ingestion: normalize CSV / JSONL / parquet sources into the
canonical corpus parquet directory ``build_index`` consumes.

The reference crawls HTML into its document store
(`Crawler/Crawler.java` seed CSV -> visited pages -> DB rows); this repo
takes the corpus as a table instead (SURVEY §2.1 S1), and this stage is
the table-side analog of that edge normalization: whatever the source
format, everything downstream (two-pass id/dedup, predicate-pruned
reads, parquet-footer row counts) runs against ONE canonical parquet
layout.  Keeping format conversion at the edge — instead of teaching
``build_index`` to read three formats — preserves the build's
column-pruned, footer-counted read paths unchanged.

Streaming end-to-end: ``ray.data.read_csv`` / ``read_json`` /
``read_parquet`` -> per-batch rename/project/validate (zero-copy Arrow)
-> ``write_parquet`` into sharded files.  No driver materialization, so
a 100 TB JSONL dump ingests under the same backpressure as everything
else.  Output is marked with ``_SUCCESS``; re-runs skip completed
output (resume at the directory level — sources carry no stable shard
identity before ingestion, so this is all-or-nothing by design).
"""

from __future__ import annotations

import os

import pyarrow as pa

_SUCCESS = "_SUCCESS"

_EXT_FORMATS = {
    ".csv": "csv",
    ".jsonl": "jsonl",
    ".json": "jsonl",  # line-delimited: ray.data.read_json is JSONL
    ".parquet": "parquet",
    ".pq": "parquet",
}


def detect_format(input_path: str) -> str:
    """Format by extension; a directory is probed by its first entry."""
    p = input_path
    if os.path.isdir(p):
        entries = sorted(
            e for e in os.listdir(p)
            if not e.startswith((".", "_"))
            and os.path.splitext(e)[1].lower() in _EXT_FORMATS
        )
        if not entries:
            raise ValueError(f"no ingestable files in directory {p!r}")
        p = entries[0]
    ext = os.path.splitext(p)[1].lower()
    fmt = _EXT_FORMATS.get(ext)
    if fmt is None:
        raise ValueError(
            f"cannot detect format of {input_path!r} (ext {ext!r}); "
            "pass fmt='csv'|'jsonl'|'parquet'"
        )
    return fmt


def _read(input_path: str, fmt: str):
    import ray.data as rd

    if fmt == "csv":
        return rd.read_csv(input_path)
    if fmt == "jsonl":
        return rd.read_json(input_path)
    if fmt == "parquet":
        return rd.read_parquet(input_path)
    raise ValueError(f"unknown format {fmt!r}")


def ingest_corpus(
    input_path: str,
    out_dir: str,
    fmt: str = "auto",
    column_map: dict[str, str] | None = None,
    required_cols: tuple[str, ...] = ("repo", "path", "commit", "content"),
    resume: bool = True,
) -> dict:
    """Convert a CSV/JSONL/parquet source into the canonical corpus
    parquet directory.  ``column_map`` renames source columns to the
    canonical names (e.g. ``{"body": "content"}``); extra columns pass
    through untouched.  Missing required columns fail fast — on the
    dataset SCHEMA, before any data moves.
    """
    if fmt == "auto":
        fmt = detect_format(input_path)
    if resume and os.path.exists(os.path.join(out_dir, _SUCCESS)):
        import pyarrow.dataset as pads

        n = sum(
            f.metadata.num_rows
            for f in pads.dataset(out_dir, format="parquet").get_fragments()
        )
        return {"format": fmt, "n_rows": n, "skipped": True}

    ds = _read(input_path, fmt)
    column_map = dict(column_map or {})

    schema_names = ds.schema().names
    renamed = [column_map.get(c, c) for c in schema_names]
    missing = [c for c in required_cols if c not in renamed]
    if missing:
        raise ValueError(
            f"source {input_path!r} ({fmt}) lacks required columns "
            f"{missing} after renames {column_map}; have {schema_names}"
        )

    def normalize(batch: pa.Table) -> pa.Table:
        out = batch.rename_columns(
            [column_map.get(c, c) for c in batch.column_names]
        )
        # string-ify required cols a CSV reader may have over-typed
        # (e.g. an all-digit commit column inferred as int64)
        cols = {}
        for name in out.column_names:
            col = out[name]
            if name in required_cols and not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            cols[name] = col
        return pa.table(cols)

    out = ds.map_batches(normalize, batch_format="pyarrow")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)  # drop a failed prior run
    os.makedirs(out_dir, exist_ok=True)
    out.write_parquet(out_dir)
    # count from the written footers — out.count() would re-run the read
    import pyarrow.dataset as pads

    n = sum(
        f.metadata.num_rows
        for f in pads.dataset(out_dir, format="parquet").get_fragments()
    )
    with open(os.path.join(out_dir, _SUCCESS), "w") as f:
        f.write("")
    return {"format": fmt, "n_rows": n, "skipped": False}
