"""Doc-keyed value sidecars (``pagerank/``, ``doclen/``) — sharded form.

Round-2 served these as full sorted arrays per actor: 16 B/doc, fine to
~10^9 docs, a ceiling at 10^10.  The sharded form removes the ceiling:

* ``compact_sidecar_shards`` (build-side) merges a sidecar directory's
  task-parquet spill into doc_id-sorted shard files with small row
  groups, dedupes by doc_id (keep first in (file-name, row) order — the
  same rule the eager loader applied), and records a ``_sidecar_meta``
  manifest with per-row-group (lo, hi) doc_id bounds plus the exact
  n / sum / max the serving paths need as scalars.
* ``ShardedSidecar`` (serve-side) faults individual row groups in on
  demand, keyed by the manifest bounds, under a bounded LRU — actor
  memory is O(touched row groups), not O(corpus).  Parquet files that
  appear AFTER compaction (incremental ``extend`` doclen deltas) load
  eagerly as a small overlay checked for ids the shards miss.

Crash-safety: the manifest is written tmp+rename AFTER every shard file
lands; a reader either sees the complete sharded generation or (no
manifest) falls back to the eager loader over whatever parquet files
exist — identical values either way, since compaction only re-arranges
rows.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SIDECAR_META = "_sidecar_meta.json"
_ROWS_PER_GROUP = 16384  # fault granularity: 256 KiB of (id, value)
_GROUPS_PER_FILE = 64  # ~16 MB shard files


def _read_raw(dir_: str, val_col: str, skip: set[str] | None = None):
    """(ids, vals) from every .parquet in dir_ (minus ``skip``), stable
    doc_id sort in sorted-file-name order, keep-first dedupe."""
    files = [
        f
        for f in sorted(os.listdir(dir_))
        if f.endswith(".parquet") and (skip is None or f not in skip)
    ]
    if not files:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    t = pq.read_table(
        [os.path.join(dir_, f) for f in files], columns=["doc_id", val_col]
    )
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = t[val_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, vals = ids[order], vals[order]
    if len(ids) > 1:
        keep = np.ones(len(ids), bool)
        keep[1:] = ids[1:] != ids[:-1]
        ids, vals = ids[keep], vals[keep]
    return ids, vals


def compact_sidecar_shards(
    dir_: str,
    val_col: str,
    *,
    rows_per_group: int = _ROWS_PER_GROUP,
    groups_per_file: int = _GROUPS_PER_FILE,
) -> dict | None:
    """Rewrite ``dir_`` as doc_id-sorted shard files + manifest; returns
    the manifest (None when the directory is missing/empty).  Values are
    only re-arranged, never changed, so a crash at any point leaves a
    readable state (see module docstring)."""
    if not os.path.isdir(dir_):
        return None
    ids, vals = _read_raw(dir_, val_col)
    if not len(ids):
        return None
    val_arr = pa.array(vals)
    is_int = pa.types.is_integer(val_arr.type)
    rows_per_file = rows_per_group * groups_per_file
    shard_files: list[str] = []
    groups: list[list[int]] = []
    for fi, start in enumerate(range(0, len(ids), rows_per_file)):
        stop = min(start + rows_per_file, len(ids))
        name = f"sharded-{fi:05d}.parquet"
        tbl = pa.table(
            {
                "doc_id": pa.array(ids[start:stop], pa.int64()),
                val_col: val_arr.slice(start, stop - start),
            }
        )
        tmp = os.path.join(dir_, name + ".tmp")
        pq.write_table(
            tbl,
            tmp,
            row_group_size=rows_per_group,
            compression="zstd",
            compression_level=1,
        )
        os.replace(tmp, os.path.join(dir_, name))
        shard_files.append(name)
        for rg, g0 in enumerate(range(start, stop, rows_per_group)):
            g1 = min(g0 + rows_per_group, stop)
            # 6th element (round-3+): the group's max value — the
            # serving-side range_max bound; older readers slice [:4]
            groups.append(
                [fi, rg, int(ids[g0]), int(ids[g1 - 1]), g1 - g0,
                 float(vals[g0:g1].max())]
            )
    meta = {
        "val_col": val_col,
        "n": int(len(ids)),
        "sum": int(vals.sum()) if is_int else float(vals.sum()),
        "max": (int(vals.max()) if is_int else float(vals.max()))
        if len(vals)
        else 0,
        "files": shard_files,
        "groups": groups,
    }
    tmp = os.path.join(dir_, SIDECAR_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(dir_, SIDECAR_META))
    for f in os.listdir(dir_):
        if f.endswith(".parquet") and f not in shard_files:
            os.unlink(os.path.join(dir_, f))
    return meta


class EagerSidecar:
    """Full sorted arrays in memory — the legacy (un-compacted) layout."""

    def __init__(self, ids: np.ndarray, vals: np.ndarray):
        self._ids = ids
        self._vals = vals
        self.n = int(len(ids))
        self.value_sum = float(vals.sum()) if len(vals) else 0.0
        self.value_max = float(vals.max()) if len(vals) else 0.0

    @property
    def avg(self) -> float:
        return self.value_sum / self.n if self.n else 0.0

    def get(self, ids: np.ndarray, default: float = 0.0) -> np.ndarray:
        out = np.full(len(ids), default, np.float64)
        if self.n and len(ids):
            pos = np.minimum(np.searchsorted(self._ids, ids), self.n - 1)
            hit = self._ids[pos] == ids
            out[hit] = self._vals[pos[hit]]
        return out

    def get_one(self, doc_id: int, default: float = 0.0) -> float:
        i = int(np.searchsorted(self._ids, doc_id))
        if i < self.n and self._ids[i] == doc_id:
            return float(self._vals[i])
        return default

    _RM_BLOCK = 4096

    def range_max(self, lo: int, hi: int) -> float:
        """Exact max value over doc ids in [lo, hi] — the block-max WAND
        window bound for the blended additive term (engine._pr_window_ub).
        Lazy 4096-block maxima make wide windows O(range / 4096)."""
        if not self.n:
            return 0.0
        i0 = int(np.searchsorted(self._ids, lo, side="left"))
        i1 = int(np.searchsorted(self._ids, hi, side="right"))
        if i1 <= i0:
            return 0.0
        B = self._RM_BLOCK
        if i1 - i0 <= 2 * B:
            return float(self._vals[i0:i1].max())
        blk = getattr(self, "_rm_blkmax", None)
        if blk is None:
            nb = (self.n + B - 1) // B
            pad = nb * B - self.n
            v = self._vals
            if pad:
                v = np.concatenate([v, np.full(pad, -np.inf)])
            blk = v.reshape(nb, B).max(axis=1)
            self._rm_blkmax = blk
        fb = (i0 + B - 1) // B
        lb = i1 // B
        m = float(blk[fb:lb].max()) if lb > fb else -np.inf
        if i0 < fb * B:
            m = max(m, float(self._vals[i0 : fb * B].max()))
        if lb * B < i1:
            m = max(m, float(self._vals[lb * B : i1].max()))
        return m

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        return self._ids, self._vals


class ShardedSidecar:
    """Row-group-faulting reader over a compacted sidecar: actor memory
    is bounded by ``cache_groups`` x rows_per_group, not corpus size."""

    def __init__(self, dir_: str, meta: dict, cache_groups: int = 256):
        self.dir = dir_
        self.val_col = meta["val_col"]
        self.n = int(meta["n"])
        self.value_sum = float(meta["sum"])
        self.value_max = float(meta["max"])
        self._files = [os.path.join(dir_, f) for f in meta["files"]]
        g = np.asarray(
            [row[:4] for row in meta["groups"]], dtype=np.int64
        ).reshape(-1, 4)
        self._gfile = g[:, 0]
        self._grg = g[:, 1]
        self._glo = g[:, 2]
        self._ghi = g[:, 3]
        # per-group max (manifest element 6, round-3+); pre-round-3
        # manifests fall back to the global max — still a valid bound
        self._gmax = np.asarray(
            [
                float(row[5]) if len(row) > 5 else float(meta["max"])
                for row in meta["groups"]
            ],
            dtype=np.float64,
        )
        self._cache: OrderedDict[int, tuple[np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self._cache_max = cache_groups
        self._readers: dict[int, pq.ParquetFile] = {}
        # parquet files written after compaction (extend deltas): small
        # eager overlay, consulted for ids the shards miss
        overlay_ids, overlay_vals = _read_raw(
            dir_, self.val_col, skip=set(meta["files"])
        )
        self._overlay = (
            EagerSidecar(overlay_ids, overlay_vals)
            if len(overlay_ids)
            else None
        )
        if self._overlay is not None:
            # overlay rows whose doc_id already exists in the shards are
            # residuals with identical values (the extend crash-rule) —
            # counting only genuinely new ids keeps n/sum/avg exact
            fresh = ~self._hit_mask(overlay_ids)
            self.n += int(fresh.sum())
            self.value_sum += float(overlay_vals[fresh].sum())
            if len(overlay_vals):
                self.value_max = max(
                    self.value_max, float(overlay_vals.max())
                )

    @property
    def avg(self) -> float:
        return self.value_sum / self.n if self.n else 0.0

    def _group(self, gi: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(gi)
        if hit is not None:
            self._cache.move_to_end(gi)
            return hit
        fi = int(self._gfile[gi])
        reader = self._readers.get(fi)
        if reader is None:
            reader = pq.ParquetFile(self._files[fi])
            self._readers[fi] = reader
        t = reader.read_row_group(
            int(self._grg[gi]), columns=["doc_id", self.val_col]
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        vals = t[self.val_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        self._cache[gi] = (ids, vals)
        if len(self._cache) > self._cache_max:
            self._cache.popitem(last=False)
        return ids, vals

    def _locate(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(group index, in-range mask) per id."""
        gi = np.searchsorted(self._ghi, ids)
        gi_c = np.minimum(gi, len(self._ghi) - 1)
        ok = (gi < len(self._ghi)) & (ids >= self._glo[gi_c])
        return gi_c, ok

    def _hit_mask(self, ids: np.ndarray) -> np.ndarray:
        out = np.zeros(len(ids), bool)
        if not len(ids) or not len(self._ghi):
            return out
        gi, ok = self._locate(ids)
        for g in np.unique(gi[ok]):
            sel = ok & (gi == g)
            g_ids, _ = self._group(int(g))
            pos = np.minimum(
                np.searchsorted(g_ids, ids[sel]), len(g_ids) - 1
            )
            out[np.flatnonzero(sel)] = g_ids[pos] == ids[sel]
        return out

    def get(self, ids: np.ndarray, default: float = 0.0) -> np.ndarray:
        out = np.full(len(ids), default, np.float64)
        if not len(ids):
            return out
        missing = np.ones(len(ids), bool)
        if len(self._ghi):
            gi, ok = self._locate(ids)
            for g in np.unique(gi[ok]):
                sel = ok & (gi == g)
                g_ids, g_vals = self._group(int(g))
                pos = np.minimum(
                    np.searchsorted(g_ids, ids[sel]), len(g_ids) - 1
                )
                hit = g_ids[pos] == ids[sel]
                idx = np.flatnonzero(sel)
                out[idx[hit]] = g_vals[pos[hit]]
                missing[idx[hit]] = False
        if self._overlay is not None and missing.any():
            idx = np.flatnonzero(missing)
            ov = self._overlay.get(ids[idx], default=np.nan)
            found = ~np.isnan(ov)
            out[idx[found]] = ov[found]
        return out

    def get_one(self, doc_id: int, default: float = 0.0) -> float:
        return float(
            self.get(np.asarray([doc_id], np.int64), default=default)[0]
        )

    def range_max(self, lo: int, hi: int) -> float:
        """Upper bound on the value over doc ids in [lo, hi] from the
        manifest's per-group maxima — NO IO, no faulting.  Groups are
        doc-range-sorted, so the overlapping set is one contiguous slice;
        the bound covers whole groups (slightly loose at the edges,
        always safe).  Overlay (post-compaction extend deltas) folds in
        its exact in-memory range max."""
        j0 = int(np.searchsorted(self._ghi, lo, side="left"))
        j1 = int(np.searchsorted(self._glo, hi, side="right"))
        m = float(self._gmax[j0:j1].max()) if j1 > j0 else 0.0
        if self._overlay is not None:
            m = max(m, self._overlay.range_max(lo, hi))
        return m

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Full (ids, vals) — offline/batch consumers only."""
        parts_i, parts_v = [], []
        for fi, path in enumerate(self._files):
            t = pq.read_table(path, columns=["doc_id", self.val_col])
            parts_i.append(
                t["doc_id"].to_numpy(zero_copy_only=False)
            )
            parts_v.append(
                t[self.val_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        ids = (
            np.concatenate(parts_i) if parts_i else np.empty(0, np.int64)
        )
        vals = (
            np.concatenate(parts_v)
            if parts_v
            else np.empty(0, np.float64)
        )
        if self._overlay is not None:
            o_ids, o_vals = self._overlay.to_arrays()
            fresh = ~self._hit_mask(o_ids)
            ids = np.concatenate([ids, o_ids[fresh]])
            vals = np.concatenate([vals, o_vals[fresh].astype(np.float64)])
            order = np.argsort(ids, kind="stable")
            ids, vals = ids[order], vals[order]
        return ids, vals


def open_sidecar(
    dir_: str, val_col: str, cache_groups: int = 256
) -> EagerSidecar | ShardedSidecar | None:
    """Sharded reader when a compaction manifest exists, eager loader
    otherwise; None when the directory has no parquet at all."""
    meta_path = os.path.join(dir_, SIDECAR_META)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return ShardedSidecar(dir_, json.load(f), cache_groups)
    if not os.path.isdir(dir_):
        return None
    ids, vals = _read_raw(dir_, val_col)
    if not len(ids):
        return None
    return EagerSidecar(ids, vals)
