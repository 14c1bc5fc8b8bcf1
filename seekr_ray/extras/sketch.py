"""Distributed sketches, Ray-Data-first.

``hll_token_registers`` — a HyperLogLog sketch of the corpus vocabulary
size (distinct-token count).  The sketch state is a table of (bucket,
max-rho) registers: per block each worker hashes its DISTINCT tokens and
partial-aggregates to ≤ m rows, so the exchange is O(m)=4096 rows per
block regardless of corpus size — the canonical mergeable-sketch shape
(register max is commutative/associative, so block-partial max → global
max is exact).  The hash is md5-LE (== DuckDB ``md5_number_upper``),
which makes the REGISTER TABLE bit-exact SQL-replicable — the oracle
compares integer sketch state, not the float estimate, so no
transcendental-function ulp risk.

``hll_estimate`` — the classic HLL estimator (raw harmonic mean with
linear-counting small-range correction) over a register table; accuracy
vs the true distinct count is pytest-asserted (σ ≈ 1.04/√m ≈ 1.6 %).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _token_hashes
from .textstats import simple_tokens

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_MASK52 = (np.uint64(1) << np.uint64(64 - HLL_P)) - np.uint64(1)


def _bit_length(w: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length (floor(log2)+1; 0 for 0) — branchless
    shift ladder, no float log2 (which rounds 2^k−1 up at k≈52)."""
    v = w.astype(np.uint64).copy()
    bl = np.zeros(len(v), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    return bl


def hll_token_registers(docs_ds, text_col: str = "text"):
    """HLL register table (bucket, rho) over the corpus's distinct
    tokens.  Output ≤ 4096 rows however large the corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for t in batch[text_col].to_pylist():
            toks.update(simple_tokens(t or ""))
        if not toks:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        h = _token_hashes(toks)
        bucket = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        w = h & _MASK52
        rho = (64 - HLL_P + 1) - _bit_length(w)  # w==0 → 53
        reg = np.zeros(HLL_M, np.int64)
        np.maximum.at(reg, bucket, rho)
        nz = np.flatnonzero(reg)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "rho": pa.array(reg[nz], pa.int64()),
            }
        )

    out = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .max("rho")
    )
    return out.map_batches(
        lambda b: b.rename_columns(["bucket", "rho"]), batch_format="pyarrow"
    )


def hll_estimate(registers: pa.Table | "pa.lib.Table") -> float:
    """Classic HLL estimate from a (bucket, rho) register table."""
    rho = np.zeros(HLL_M, np.float64)
    b = registers["bucket"].to_numpy(zero_copy_only=False)
    r = registers["rho"].to_numpy(zero_copy_only=False)
    rho[b] = r
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-rho))
    zeros = int(np.sum(rho == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return float(raw)


def hll_registers(ds, col: str):
    """HLL register table over the distinct values of an integer/string
    column (values hashed as md5-LE of their decimal/string form — the
    form ``md5_number_upper(col::VARCHAR)`` produces in the oracle
    dialect).  Same mergeable O(m)-per-block partial-agg plan as
    ``hll_token_registers``."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        vals = {str(v) for v in batch[col].to_pylist() if v is not None}
        if not vals:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "little")
                for v in vals
            ),
            dtype=np.uint64,
            count=len(vals),
        )
        bucket = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rho = (64 - HLL_P + 1) - _bit_length(h & _MASK52)
        reg = np.zeros(HLL_M, np.int64)
        np.maximum.at(reg, bucket, rho)
        nz = np.flatnonzero(reg)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "rho": pa.array(reg[nz], pa.int64()),
            }
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("bucket").max("rho")
    return out.map_batches(
        lambda b: b.rename_columns(["bucket", "rho"]), batch_format="pyarrow"
    )


# -- exact heavy hitters (two-pass: local-threshold prune + recount) ---------

_HH_SENTINEL = ""  # simple_tokens never yields "" (length filter), so the
# empty string is a safe in-band carrier for per-block token totals


def heavy_hitters_exact(docs_ds, phi_ppm: int, text_col: str = "text"):
    """EXACT frequent tokens: every token whose corpus-wide occurrence
    count satisfies ``count * 1_000_000 >= phi_ppm * N`` (N = total
    token count), as ``(term, n_occurrences)``.

    The classic two-pass distributed heavy-hitters plan:

    * **Pass 1 (prune).**  Each block emits only its LOCALLY frequent
      tokens — ``count_b * 1e6 >= phi_ppm * n_b`` — plus one sentinel
      row carrying ``n_b``.  If a token fails that test in EVERY block
      then summing over blocks gives ``count < phi * N``, so the union
      of local survivors is a guaranteed superset of the global heavy
      hitters, at most ``1e6/phi_ppm`` rows per block, for ANY block
      layout (the result is parallelism-invariant; only the candidate
      superset varies).  The exchange is O(blocks/phi), never O(vocab).
    * **Pass 2 (exact recount).**  The candidate set is collected once
      (small by the bound above), broadcast via ``ray.put``, and every
      block re-counts ONLY candidate tokens; a tiny groupby-sum plus
      the integer threshold filter yields the exact answer.  All
      arithmetic is int64 (ppm rational, no float threshold), so the
      operator is bit-exact SQL-replicable.

    The reference's analog is the df table consumed by idf
    (`Indexer/SQLiteSearcher.java` word stats); this generalizes it to
    threshold-frequent mining without materializing O(vocab) rows.
    """
    import ray
    from collections import Counter

    def local_frequent(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(simple_tokens(t or ""))
        n_b = sum(c.values())
        terms = [t for t, n in c.items() if n * 1_000_000 >= phi_ppm * n_b]
        terms.append(_HH_SENTINEL)
        counts = [0] * (len(terms) - 1) + [n_b]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    pass1 = (
        docs_ds.map_batches(local_frequent, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
        .to_pandas()  # ≤ blocks/phi rows — bounded, not O(vocab)
    )
    n_total = 0
    cand: set[str] = set()
    if "term" not in pass1.columns:  # zero input blocks → schemaless frame
        pass1 = pass1.reindex(columns=["term", "sum(n)"])
    for term, n in zip(pass1["term"], pass1["sum(n)"]):
        if term == _HH_SENTINEL:
            n_total = int(n)
        else:
            cand.add(term)
    if n_total == 0 or not cand:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "n_occurrences": pa.array([], pa.int64()),
            }
        )

    cand_ref = ray.put(frozenset(cand))

    def recount(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            for tok in simple_tokens(t or ""):
                if tok in wanted:
                    c[tok] += 1
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(recount, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
        .to_pandas()
    )
    keep = [
        (t, int(n))
        for t, n in zip(agg["term"], agg["sum(n)"])
        if int(n) * 1_000_000 >= phi_ppm * n_total
    ]
    keep.sort()
    return pa.table(
        {
            "term": pa.array([t for t, _ in keep], pa.string()),
            "n_occurrences": pa.array([n for _, n in keep], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch (frequency estimation)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row


def _cms_indices(tokens: list[str], j: int) -> np.ndarray:
    """Row-j counter index per token: ``md5-LE(f"{j}:{t}") % W`` — equal
    to DuckDB ``md5_number_upper(j::VARCHAR || ':' || t) % W``, the same
    salted-md5 discipline as extras/split."""
    import hashlib

    out = np.empty(len(tokens), np.int64)
    pre = f"{j}:".encode()
    for i, t in enumerate(tokens):
        h = hashlib.md5(pre + t.encode()).digest()[:8]
        out[i] = int.from_bytes(h, "little") % CMS_W
    return out


def cms_token_registers(docs_ds, text_col: str = "text"):
    """Count-Min Sketch of corpus token frequencies: a (j, idx, c)
    register table — HLL's sibling for COUNTS instead of cardinality
    (Cormode & Muthukrishnan 2005).  Per block the worker folds its
    token counts into a d×w counter matrix and emits the ≤ d·w nonzero
    cells, so the exchange is O(d·w) per block regardless of corpus
    size; counters merge under + (exact integers ⇒ parallelism-
    invariant, bit-exact SQL-replicable).

    Point estimate: ``cms_estimate`` takes min over the d rows —
    guaranteed ≥ the true count, equal w.h.p. for non-colliding terms.
    """
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch[text_col].to_pylist():
            counts.update(simple_tokens(t or ""))
        if not counts:
            return pa.table(
                {
                    "j": pa.array([], pa.int64()),
                    "idx": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        terms = list(counts.keys())
        cvec = np.fromiter(counts.values(), np.int64, len(terms))
        out_j, out_i, out_c = [], [], []
        for j in range(CMS_D):
            reg = np.zeros(CMS_W, np.int64)
            np.add.at(reg, _cms_indices(terms, j), cvec)
            nz = np.flatnonzero(reg)
            out_j.append(np.full(len(nz), j, np.int64))
            out_i.append(nz)
            out_c.append(reg[nz])
        return pa.table(
            {
                "j": pa.array(np.concatenate(out_j), pa.int64()),
                "idx": pa.array(np.concatenate(out_i), pa.int64()),
                "c": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    out = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["j", "idx"])
        .sum("c")
    )
    return out.map_batches(
        lambda b: b.rename_columns(["j", "idx", "c"]), batch_format="pyarrow"
    )


def cms_estimate(registers: pa.Table, term: str) -> int:
    """Point frequency estimate: min over rows of the term's counter."""
    j = registers["j"].to_numpy(zero_copy_only=False)
    idx = registers["idx"].to_numpy(zero_copy_only=False)
    c = registers["c"].to_numpy(zero_copy_only=False)
    est = []
    for row in range(CMS_D):
        want = int(_cms_indices([term], row)[0])
        hit = c[(j == row) & (idx == want)]
        est.append(int(hit[0]) if len(hit) else 0)
    return min(est)


def hll_registers_by_key(ds, *, key_col: str, col: str):
    """Per-key HLL register table — COUNT(DISTINCT col) GROUP BY key as
    a mergeable sketch: output is (key, bucket, rho), ≤ m rows per key
    however many rows the key has.  Per block each worker partial-maxes
    its (key, bucket) registers, so the exchange carries O(keys·m) —
    the sketch-as-group-aggregate shape that replaces an exact
    per-key distinct shuffle (O(keys·distincts)) at 100 TB.  Hashing
    matches ``hll_registers`` (md5-LE of the value's string form), so
    the per-key register STATE is SQL-replicable bit-for-bit."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        pairs = {
            (k, str(v))
            for k, v in zip(batch[key_col].to_pylist(), batch[col].to_pylist())
            if v is not None and k is not None
        }
        if not pairs:
            return pa.table(
                {
                    key_col: pa.array([], batch[key_col].type),
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        keys, out_b, out_r = [], [], []
        bykey: dict = {}
        for k, v in pairs:
            h = int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "little")
            bucket = h >> (64 - HLL_P)
            w = np.uint64(h) & _MASK52
            rho = int(
                (64 - HLL_P + 1) - _bit_length(np.array([w], np.uint64))[0]
            )
            reg = bykey.setdefault(k, {})
            if rho > reg.get(bucket, 0):
                reg[bucket] = rho
        for k, reg in bykey.items():
            for bucket, rho in reg.items():
                keys.append(k)
                out_b.append(bucket)
                out_r.append(rho)
        return pa.table(
            {
                key_col: pa.array(keys),
                "bucket": pa.array(out_b, pa.int64()),
                "rho": pa.array(out_r, pa.int64()),
            }
        )

    from ..bucket_agg import bucketed_group_agg

    out = bucketed_group_agg(
        ds.select_columns([key_col, col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        [key_col, "bucket"],
        [("rho", "max")],
        num_buckets=32,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "bucket": batch["bucket"],
                "rho": batch["max(rho)"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")
