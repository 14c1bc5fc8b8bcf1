"""Side-by-side audit of every SQL-oracled driver-contract entry.

Replicates the driver's compare (row count, sorted-column schema,
row-sorted values) at an arbitrary scale factor and parallelism:

    python tools/audit_contract.py [--sf /root/testdata/sf0.01] [--cpus 16]

Exits non-zero on any mismatch.  Run at sf0.01 with two different
--cpus values before shipping new entries: sf0.001 contract tests have
missed (a) 6dp money-sum rounding that sat inside summation-order ulp
noise at ~6e8 magnitudes, and (b) dtype drift (timestamp[s] vs [us],
int32 vs int64) that only dtype-strict equality catches.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument(
        "--skip",
        default="",
        help="comma-separated entries to skip (e.g. O(n^2)-oracle entries "
        "at sf0.1: jaccard_clusters,ngram_jaccard,minhash_clusters)",
    )
    ap.add_argument("--only", default="", help="comma-separated allowlist")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    import duckdb
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    def to_df(r) -> pd.DataFrame:
        if isinstance(r, rd.Dataset):
            return r.to_pandas()
        if isinstance(r, pa.Table):
            return r.to_pandas()
        return r

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    qs, osql = entry.queries(), entry.oracle_sql()
    bad = []
    names = [
        n
        for n in sorted(osql)
        if n not in skip and (not only or n in only)
    ]
    import time

    for name in names:
        try:
            t0 = time.monotonic()
            t = norm(to_df(qs[name](args.sf)))
            t1 = time.monotonic()
            o = norm(con.execute(osql[name]).df())
            t2 = time.monotonic()
            timing = f" [ray {t1 - t0:.1f}s sql {t2 - t1:.1f}s]"
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"ERROR     {name}: {e!r}"[:200], flush=True)
            continue
        if len(t) != len(o):
            bad.append(name)
            print(f"ROWS      {name}: {len(t)} vs {len(o)}", flush=True)
        elif list(t.columns) != list(o.columns):
            bad.append(name)
            print(f"SCHEMA    {name}: {list(t.columns)} vs {list(o.columns)}", flush=True)
        elif dict(t.dtypes.astype(str)) != dict(o.dtypes.astype(str)):
            bad.append(name)
            print(
                f"DTYPES    {name}: {dict(t.dtypes.astype(str))} vs "
                f"{dict(o.dtypes.astype(str))}",
                flush=True,
            )
        elif not t.equals(o):
            bad.append(name)
            print(f"VALUES    {name}", flush=True)
        else:
            print(f"ok        {name} ({len(t)} rows){timing}", flush=True)
    print(f"\n{len(names) - len(bad)}/{len(names)} entries bit-equal; bad: {bad}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
