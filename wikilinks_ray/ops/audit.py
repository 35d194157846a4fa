"""Data-quality audit operators — the validation pass a 100 TB ingest
runs before anything downstream trusts the tables: referential
integrity (orphaned foreign keys), primary-key uniqueness, null / NaN
rates. Each check is a combiner-first distributed count; the audit
report is a tiny (check, n) table, value-hash oracle-able.

Plans:

- ``referential_orphans``: child FK values and parent PK values
  co-bucket by key hash (a key lives in exactly one bucket); per bucket
  one ``np.isin``-style sorted-membership test counts child rows whose
  key has no parent — the distributed anti-join, combiner-complete
  (child side pre-collapses to (key, count) per batch, so raw child
  rows never shuffle).
- ``pk_duplicates``: grouped count on the key, count keys with n > 1
  and surplus rows (n - 1 summed) — one bucketed pass over per-batch
  combined pairs.
- ``null_counts``: pure map — per-batch Arrow ``null_count`` plus NaN
  test for float columns, summed per column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.agg import _bucket_of, grouped_agg


def referential_orphans(child: "ray.data.Dataset", parent: "ray.data.Dataset",
                        *, fk: str, pk: str,
                        num_buckets: int = 64) -> int:
    """Number of child rows whose ``fk`` value has no matching parent
    ``pk`` value (NULL fk rows count as orphans — they reference
    nothing)."""
    def child_pairs(t: pa.Table) -> pa.Table:
        col = t.column(fk)
        n_null = col.null_count
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        ks, cnt = np.unique(v, return_counts=True)
        out = pa.table({
            "k": pa.array(np.concatenate((ks, [-1] if n_null else [])),
                          pa.int64()),
            "n": pa.array(np.concatenate((cnt, [n_null] if n_null else []))
                          .astype(np.int64), pa.int64()),
            "side": pa.array(np.zeros(len(ks) + (1 if n_null else 0),
                                      np.int64)),
        })
        return out

    def parent_keys(t: pa.Table) -> pa.Table:
        v = t.column(pk).drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ks = np.unique(v)
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "n": pa.array(np.zeros(len(ks), np.int64)),
                         "side": pa.array(np.ones(len(ks), np.int64))})

    def bucket(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(
            _bucket_of(k, num_buckets=num_buckets)))

    def orphans(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        ck = g["k"].to_numpy()[side == 0].astype(np.int64)
        cn = g["n"].to_numpy()[side == 0].astype(np.int64)
        pk_s = np.unique(g["k"].to_numpy()[side == 1].astype(np.int64))
        if len(pk_s):
            idx = np.minimum(np.searchsorted(pk_s, ck), len(pk_s) - 1)
            hit = (pk_s[idx] == ck) & (ck >= 0)
        else:
            hit = np.zeros(len(ck), bool)
        return pd.DataFrame({"orphans": [int(cn[~hit].sum())]})

    both = (child.map_batches(child_pairs, batch_format="pyarrow")
            .union(parent.map_batches(parent_keys, batch_format="pyarrow"))
            .map_batches(bucket, batch_format="pyarrow"))
    parts = both.groupby("__b").map_groups(orphans, batch_format="pandas")
    return int(parts.to_pandas()["orphans"].sum())


def pk_duplicates(ds: "ray.data.Dataset", *, pk: str,
                  num_buckets: int = 64) -> tuple[int, int]:
    """(n_keys_with_duplicates, n_surplus_rows) for the key column."""
    counts = grouped_agg(ds.select_columns([pk]), [pk], None, "count",
                         num_buckets=num_buckets, out_col="n")

    def summarize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        dup = n > 1
        return pa.table({
            "dup_keys": pa.array([int(dup.sum())], pa.int64()),
            "surplus": pa.array([int((n[dup] - 1).sum())], pa.int64()),
        })

    s = counts.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return int(s["dup_keys"].sum()), int(s["surplus"].sum())


def null_counts(ds: "ray.data.Dataset", columns: list[str]
                ) -> dict[str, int]:
    """Per-column null (+ float NaN) counts — one pure-map pass."""
    def partial(t: pa.Table) -> pa.Table:
        out = {}
        for c in columns:
            col = t.column(c)
            n = col.null_count
            if pa.types.is_floating(col.type):
                v = col.drop_null().to_numpy(zero_copy_only=False)
                n += int(np.isnan(v).sum())
            out[c] = pa.array([n], pa.int64())
        return pa.table(out)

    df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return {c: int(df[c].sum()) for c in columns}
