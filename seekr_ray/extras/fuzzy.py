"""Edit-distance-1 fuzzy self-join over the corpus vocabulary.

The typo-mining / query-correction primitive (the reference's suggestion
Trie serves prefix matches — Suggestions/src/.../Trie.java; this adds
the fuzzy-match counterpart a search or curation pipeline needs for
spelling variants): all unordered pairs of DISTINCT corpus tokens at
Levenshtein distance exactly 1.

Algorithm: FastSS / SymSpell deletion neighborhoods (Bocek et al. 2007,
public): if lev(a, b) <= 1 then a and b share a string in their
delete-at-most-one-char neighborhoods, so grouping by deletion variant
finds every true pair while generating only O(V * maxlen) candidate
rows instead of the O(V^2) cross join.  Sharing a variant is NOT
sufficient ("ab"/"ba" share "a" at distance 2), so candidates are
verified with an exact O(len) distance-1 check — the filter+verify
discipline of the PPJoin path (dedup.py).

Plan shape (three narrow exchanges, all on bounded keys):
1. per-block DISTINCT tokens (map_batches; most cross-block duplication
   collapses here, the variant groupby absorbs the rest),
2. vectorized variant fan-out — one Arrow slice+concat per deletion
   POSITION (loop runs maxlen<=45 times per block, not once per token),
   bucketed by crc32(variant) (process-independent, unlike hash()),
3. groupby(bucket) -> sort by variant -> per-run verified pair
   emission, then a bucketed distinct on (tok_a, tok_b) since a pair
   can share several variants ("aab"/"ab" via two deletions of "aab").

Partitioning assumption: a variant bucket fits in a worker —
num_buckets scales out; a single variant's group is O(alphabet) rows.
"""

from __future__ import annotations

import zlib
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import simple_tokens

EMPTY_PAIRS = pa.table(
    {"tok_a": pa.array([], pa.string()), "tok_b": pa.array([], pa.string())}
)


def _is_edit1(a: str, b: str) -> bool:
    """Exact check lev(a, b) == 1 for a != b (candidates guarantee
    |len(a) - len(b)| <= 2)."""
    la, lb = len(a), len(b)
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return seen
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    # one insertion into a yields b: skip the first mismatch in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _crc_bucket(col: pa.Array, num_buckets: int) -> pa.Array:
    """crc32-based bucket id per string — deterministic across worker
    processes (Python hash() is per-process salted) and cheap C code.
    Hashed per DISTINCT value via dictionary encoding (the tokenizer's
    per-distinct-token trick)."""
    d = pc.dictionary_encode(col)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    buckets = np.array(
        [zlib.crc32(v.encode()) % num_buckets for v in d.dictionary.to_pylist()],
        np.int64,
    )
    return pa.array(buckets[d.indices.to_numpy(zero_copy_only=False)], pa.int64())


def fuzzy_token_pairs(docs_ds, text_col: str = "text", num_buckets: int = 256):
    """All (tok_a < tok_b) distinct-corpus-token pairs with
    Levenshtein(tok_a, tok_b) == 1."""

    def block_distinct(batch: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for text in batch[text_col].to_pylist():
            toks.update(simple_tokens(text or ""))
        return pa.table({"t": pa.array(sorted(toks), pa.string())})

    def variants(batch: pa.Table) -> pa.Table:
        t = batch["t"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if len(t) == 0:
            return pa.table(
                {
                    "var": pa.array([], pa.string()),
                    "t": pa.array([], pa.string()),
                    "_bb": pa.array([], pa.int64()),
                }
            )
        lens = pc.utf8_length(t).to_numpy(zero_copy_only=False)
        vars_out = [t]  # deletion-0: the token itself
        toks_out = [t]
        for i in range(int(lens.max())):
            mask = pa.array(lens > i)
            sub = t.filter(mask)
            # delete char i: [0, i) ++ [i+1, end) — tokens are [a-z]+ so
            # codeunits == codepoints
            head = pc.utf8_slice_codeunits(sub, start=0, stop=i)
            tail = pc.utf8_slice_codeunits(sub, start=i + 1, stop=1 << 30)
            vars_out.append(pc.binary_join_element_wise(head, tail, ""))
            toks_out.append(sub)
        var = pa.concat_arrays(vars_out)
        tok = pa.concat_arrays(toks_out)
        return pa.table(
            {"var": var, "t": tok, "_bb": _crc_bucket(var, num_buckets)}
        )

    def var_pairs(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("var", "ascending"), ("t", "ascending")]
        )
        tbl = group.take(order)
        var = tbl["var"].to_pylist()
        tok = tbl["t"].to_pylist()
        n = len(var)
        a_out: list[str] = []
        b_out: list[str] = []
        s = 0
        while s < n:
            e = s
            while e < n and var[e] == var[s]:
                e += 1
            if e - s > 1:
                run = sorted(set(tok[s:e]))
                for x, y in combinations(run, 2):
                    if _is_edit1(x, y):
                        a_out.append(x)
                        b_out.append(y)
            s = e
        return pa.table(
            {
                "tok_a": pa.array(a_out, pa.string()),
                "tok_b": pa.array(b_out, pa.string()),
            }
        )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_b", pa.array([], pa.int64()))
        return batch.append_column("_b", _crc_bucket(batch["tok_a"], 64))

    def distinct_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("tok_a", "ascending"), ("tok_b", "ascending")]
        )
        tbl = group.take(order).drop_columns(["_b"])
        if tbl.num_rows == 0:
            return EMPTY_PAIRS
        a = tbl["tok_a"].to_numpy(zero_copy_only=False)
        b = tbl["tok_b"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(a), bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return tbl.filter(pa.array(keep))

    return (
        docs_ds.map_batches(block_distinct, batch_format="pyarrow")
        .map_batches(variants, batch_format="pyarrow")
        .groupby("_bb")
        .map_groups(var_pairs, batch_format="pyarrow")
        .map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(distinct_bucket, batch_format="pyarrow")
    )
