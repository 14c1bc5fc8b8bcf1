"""K-minimum-values (bottom-k) sketches: merge-order-invariant sampling
for quantile estimates and distinct-set intersections.

The KMV sketch of a set is the k smallest md5 hashes of its DISTINCT
members (Beyer et al., SIGMOD'07).  Two properties make it the right
sketch shape for a Ray pipeline:

* **merge-order invariance** — bottom-k of a union is the bottom-k of
  the parts' bottom-ks, under ANY grouping/order of the parts.  Every
  block contributes its local bottom-k, the exchange is O(k x blocks),
  and the result is bit-identical at any parallelism (unlike KLL /
  reservoir sketches, whose state depends on merge order).
* **SQL replicability** — "k smallest md5_number_upper values" is an
  ORDER BY + LIMIT; every estimator below is a closed-form expression
  over integers and one or two float divisions, mirrored exactly in the
  oracle entries (``sketch_quantiles``, ``kmv_user_overlap``).

At 100 TB the sketches are the POINT: per-type distinct-user overlap
needs no pairwise distinct count over the raw stream — each type keeps
k uint64s, pairs combine on the driver in O(types^2 k).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import round6_arr

TWO64 = 18446744073709551616.0  # 2^64 as an exact double


def _md5_hashes(ids: list, salt: str) -> np.ndarray:
    out = np.empty(len(ids), np.uint64)
    for i, v in enumerate(ids):
        h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
        out[i] = int.from_bytes(h, "little")
    return out


def bottomk_quantiles(
    ds,
    *,
    id_col: str,
    val_col: str,
    id_expr=None,
    k: int = 1024,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    salt: str = "",
):
    """Quantile ESTIMATES from a bottom-k uniform sample: rows whose
    md5(salt + id) ranks in the global k smallest form the sample (ids
    unique => a true uniform k-sample, identical from any block
    arrangement), and the estimate applies the repo's exact
    quantile-interpolation expression to the sample's sorted values.

    The bounded-state companion to the exact ``quantile_cont`` family:
    state is k rows regardless of input size, vs O(n) for exactness.

    Output: ``(q, value)`` — value rounded to 6dp like the exact ops.
    """

    def partial(batch: pa.Table) -> pa.Table:
        if id_expr is not None:
            rid = id_expr(batch).tolist()
        else:
            rid = batch[id_col].to_pylist()
        h = _md5_hashes(rid, salt)
        v = batch[val_col].to_numpy(zero_copy_only=False)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            h, v = h[idx], v[idx]
        return pa.table(
            {
                "_one": pa.array(np.zeros(len(h), np.int32)),
                "h": pa.array(h, pa.uint64()),
                "v": pa.array(v, pa.float64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            v = v[idx]
        arr = np.sort(v)
        n = len(arr)
        out_q = np.asarray(qs, np.float64)
        p = out_q * (n - 1)
        lo = np.floor(p).astype(np.int64)
        hi = np.ceil(p).astype(np.int64)
        frac = p - np.floor(p)
        # the same FP expression as the exact quantile ops / SQL oracle
        est = arr[lo] * (1.0 - frac) + arr[hi] * frac
        return pa.table(
            {
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(round6_arr(est), pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_one")
        .map_groups(final, batch_format="pyarrow")
    )


def kmv_user_overlap(
    events_ds,
    *,
    type_col: str = "event_type",
    user_col: str = "user_id",
    k: int = 256,
    salt: str = "",
):
    """Estimated distinct-user intersection for every type pair from
    per-type KMV sketches — no pairwise distinct count ever runs over
    the raw stream.

    Per type t: ``S_t`` = k smallest md5 hashes of t's distinct users
    (exact set when the type has < k distinct users).  For a pair (a, b)
    with union sketch U = bottom-k of ``S_a ∪ S_b`` (m = |U| <= k):

    * ``est_union``  = m < k ? m : (k - 1) / (theta / 2^64), theta = max(U)
    * ``jaccard``    = |S_a ∩ S_b ∩ U| / m
    * ``est_common`` = round(jaccard * est_union, 6)

    Per-block per-type bottom-k partials cut the exchange to
    O(types x k x blocks); the pair combine runs on the driver over
    O(types x k) uint64s (the sketches ARE the small side — that is the
    sketch's job).  Output: ``(type_a, type_b, est_common_users)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch[type_col].to_pylist(), dtype=object)
        uid = batch[user_col].to_pylist()
        h = _md5_hashes(uid, salt)
        types_out, h_out = [], []
        for t in np.unique(et):
            ht = np.unique(h[et == t])  # distinct + sorted
            ht = ht[:k]
            types_out.extend([t] * len(ht))
            h_out.append(ht)
        return pa.table(
            {
                type_col: pa.array(types_out, pa.string()),
                "h": pa.array(
                    np.concatenate(h_out) if h_out else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        t = group[type_col][0].as_py()
        h = np.unique(group["h"].to_numpy(zero_copy_only=False))[:k]
        return pa.table(
            {
                type_col: pa.array([t] * len(h), pa.string()),
                "h": pa.array(h, pa.uint64()),
            }
        )

    sketches = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(type_col)
        .map_groups(per_type, batch_format="pyarrow")
    )
    # driver combine over O(types x k) sketch rows — the sketches are
    # the designed-small side, never the raw stream
    tbl = pa.concat_tables(
        list(sketches.iter_batches(batch_format="pyarrow"))
    )
    by_type: dict[str, np.ndarray] = {}
    et = np.asarray(tbl[type_col].to_pylist(), dtype=object)
    hh = tbl["h"].to_numpy(zero_copy_only=False)
    for t in np.unique(et):
        by_type[t] = np.sort(hh[et == t])
    types = sorted(by_type)
    ta_out, tb_out, est_out = [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            sa, sb = by_type[a], by_type[b]
            union = np.unique(np.concatenate([sa, sb]))
            m = min(len(union), k)
            u = union[:m]
            if m == 0:
                est = 0.0
            else:
                theta = float(u[-1])
                if len(union) < k:
                    est_union = float(m)
                else:
                    est_union = (k - 1) / (theta / TWO64)
                inter = np.intersect1d(sa, sb, assume_unique=True)
                n_inter = int(np.searchsorted(inter, u[-1], side="right"))
                jac = n_inter / float(m)
                est = jac * est_union
            ta_out.append(a)
            tb_out.append(b)
            est_out.append(est)
    return pa.table(
        {
            "type_a": pa.array(ta_out, pa.string()),
            "type_b": pa.array(tb_out, pa.string()),
            "est_common_users": pa.array(
                round6_arr(np.asarray(est_out, np.float64)), pa.float64()
            ),
        }
    )
