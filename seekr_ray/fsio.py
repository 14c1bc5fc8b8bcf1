"""Filesystem abstraction for the postings write-side shuffle.

The build's hot intermediate (``postings_dir``) is written by every
tokenize task and re-read by every segment task.  On a single node that
is a local directory; on a real multi-node cluster there is no shared
POSIX filesystem, so the path must be an object-store URI
(``s3://...``) resolved through ``pyarrow.fs``.  This module is the one
place that resolution lives.

Atomicity contract:

* ``LocalFileSystem`` — write to ``<path>.tmp`` then atomic rename
  (POSIX semantics; a crashed task never leaves a half-written file
  under the final name).
* any other filesystem — write DIRECTLY to the final name.  Object
  stores expose atomic-visible single-object PUTs (the object appears
  only when complete), so tmp+rename is unnecessary — and rename is not
  atomic (or not cheap) there anyway.  A filesystem that is neither
  POSIX nor PUT-atomic is outside the contract; the salted-groupby
  build strategy (``cfg.shuffle_strategy="groupby"``) is the fallback
  that needs no shared intermediate directory at all.

Tests can register a scheme mapping to any ``pyarrow.fs.FileSystem``
(e.g. a ``SubTreeFileSystem`` wrapping local) to exercise the
direct-write path without a real object store.
"""

from __future__ import annotations

import posixpath

import pyarrow.parquet as pq
from pyarrow import fs as pafs

_SCHEME_OVERRIDES: dict[str, tuple[pafs.FileSystem, str]] = {}


def register_scheme(scheme: str, filesystem: pafs.FileSystem, root: str) -> None:
    """Map ``<scheme>://rest`` to ``(filesystem, root/rest)`` — test hook
    for exercising non-local filesystems without network access."""
    _SCHEME_OVERRIDES[scheme] = (filesystem, root.rstrip("/"))


def unregister_scheme(scheme: str) -> None:
    _SCHEME_OVERRIDES.pop(scheme, None)


def resolve_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """``path`` or URI -> (FileSystem, fs-internal path)."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        if scheme in _SCHEME_OVERRIDES:
            f, root = _SCHEME_OVERRIDES[scheme]
            return f, posixpath.join(root, rest) if rest else root
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def is_posix_atomic(filesystem: pafs.FileSystem) -> bool:
    return isinstance(filesystem, pafs.LocalFileSystem)


def ensure_dir(filesystem: pafs.FileSystem, path: str) -> None:
    filesystem.create_dir(path, recursive=True)


def write_table_atomic(tbl, filesystem: pafs.FileSystem, path: str, **pq_kw) -> None:
    """Parquet write that is never observed half-written under ``path``
    (see module docstring for the per-filesystem mechanism)."""
    if is_posix_atomic(filesystem):
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, filesystem=filesystem, **pq_kw)
        filesystem.move(tmp, path)
    else:
        pq.write_table(tbl, path, filesystem=filesystem, **pq_kw)


def list_parquet(filesystem: pafs.FileSystem, dir_path: str) -> list[str]:
    """Sorted .parquet file paths directly under ``dir_path`` (empty if
    the directory does not exist); ``.tmp`` spill from a crashed local
    writer is excluded by construction."""
    try:
        infos = filesystem.get_file_info(
            pafs.FileSelector(dir_path, allow_not_found=True)
        )
    except FileNotFoundError:
        return []
    return sorted(
        i.path
        for i in infos
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )
