"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf_dir,
compare row count + column set + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    # schema strictness: numeric KIND must match (int vs float), mirroring
    # a schema-sensitive driver comparison
    for c in sorted(ray_df.columns):
        a, b = ray_df[c].dtype, sql_df[c].dtype
        ka = "f" if np.issubdtype(a, np.floating) else (
            "i" if np.issubdtype(a, np.integer) else "o")
        kb = "f" if np.issubdtype(b, np.floating) else (
            "i" if np.issubdtype(b, np.integer) else "o")
        if ka != kb:
            problems.append(f"dtype kind differs on {c}: {a} vs {b}")
    if len(ray_df) != len(sql_df):
        problems.append(f"row count {len(ray_df)} vs {len(sql_df)}")
    a, b = canonical(ray_df), canonical(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                ok = np.allclose(av.astype(float), bv.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
                if not ok:
                    bad = np.flatnonzero(av.astype(float) != bv.astype(float))[:3]
                    problems.append(f"col {c}: {len(np.flatnonzero(av != bv))} mismatches, e.g. rows {bad.tolist()}: {av[bad]} vs {bv[bad]}")
            else:
                if not (av == bv).all():
                    bad = np.flatnonzero(av != bv)[:3]
                    problems.append(f"col {c}: mismatch rows {bad.tolist()}: {av[bad]} vs {bv[bad]}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(ray_df)} rows ({dt:.1f}s) [rows-only]")
            continue
        sql_df = con.execute(oracles[name]).df()
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(ray_df)} rows match ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
