"""Per-key z-score outlier detection over an event stream, in exact
integer arithmetic.

The classic "flag events more than 3 sigma from the user's own mean"
monitor, re-derived so the distributed pipeline is value-hash
oracle-comparable (``events_anomaly``): with per-user integer moments
n = count, s = sum(x), s2 = sum(x*x) over cents x,

    |x - s/n| > t * sigma      (population sigma)
<=> (n*x - s)^2 > t^2 * (n*s2 - s^2)

— both sides exact int64, no division, no sqrt. Values enter as cents
(``floor(value*100 + 0.5)``, round-half-up — DuckDB's ``round`` twin
for the positive amounts this gates).

Plan (combiner-first, one moment shuffle + one stateless scan):

1. per-batch per-user partial (n, s, s2) rows — events collapse to one
   row per user per batch before anything shuffles;
2. one bucketed reduce -> per-user moments (O(users) rows);
3. moments attach back to the event scan: sorted-array broadcast under
   ``user_broadcast_limit`` (24 B/user), bucketed hash join past it
   (the retention_cohorts plan, ops/retention.py);
4. the outlier predicate is a vectorized int64 comparison per batch.

int64 headroom: (n*x - s)^2 needs n*max_cents < 2^31.5; the build
asserts it from the reduced moments rather than silently wrapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _moments_batch(t: pa.Table, user_col: str, cents: np.ndarray,
                   num_buckets: int) -> pa.Table:
    from ..stages.agg import _bucket_of

    u = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame({"u": u, "s": cents, "s2": cents * cents,
                       "mx": np.abs(cents)})
    g = df.groupby("u", sort=False).agg(
        n=("s", "size"), s=("s", "sum"), s2=("s2", "sum"),
        mx=("mx", "max")).reset_index()
    return pa.table({
        "u": pa.array(g["u"].to_numpy(), pa.int64()),
        "n": pa.array(g["n"].to_numpy().astype(np.int64)),
        "s": pa.array(g["s"].to_numpy().astype(np.int64)),
        "s2": pa.array(g["s2"].to_numpy().astype(np.int64)),
        "mx": pa.array(g["mx"].to_numpy().astype(np.int64)),
        "__part": pa.array(_bucket_of(
            g["u"].to_numpy().astype(np.int64), num_buckets=num_buckets)),
    })


def _cents(t: pa.Table, value_col: str) -> np.ndarray:
    v = t.column(value_col).to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def zscore_outliers(events: "ray.data.Dataset", *,
                    user_col: str = "user_id", value_col: str = "value",
                    id_col: str = "event_id", min_events: int = 5,
                    t_sigma: int = 3, num_buckets: int = 64,
                    user_broadcast_limit: int = 50_000_000,
                    num_partitions: int = 8) -> pd.DataFrame:
    """Events whose value sits more than ``t_sigma`` population
    standard deviations from the emitting user's own mean (users with
    fewer than ``min_events`` events never flag). Returns (event_id,
    user_id, cents) sorted by event_id — exact integers."""

    def partial(t: pa.Table) -> pa.Table:
        return _moments_batch(t, user_col, _cents(t, value_col),
                              num_buckets)

    def reduce_(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("u", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
            mx=("mx", "max")).reset_index()

    ev = events.select_columns([id_col, user_col, value_col]).materialize()
    moments = (ev.map_batches(partial, batch_format="pyarrow")
               .groupby("__part").map_groups(reduce_, batch_format="pandas"))

    t2 = t_sigma * t_sigma

    mdf = moments.to_pandas()
    # int64 headroom: |n*x - s| <= n*max|x| + |s|, squared must fit;
    # the rhs needs t^2 * n * s2 to fit
    if len(mdf):
        lhs_bound = int(mdf["n"].max()) * int(mdf["mx"].max()) \
            + int(mdf["s"].abs().max())
        rhs_bound = t2 * int((mdf["n"] * mdf["s2"]).max())
        assert lhs_bound < 3_000_000_000 and rhs_bound < 2 ** 63, \
            "zscore_outliers int64 headroom: rescale cents for this stream"
    if len(mdf) <= user_broadcast_limit:
        order = np.argsort(mdf["u"].to_numpy())
        ref = ray.put((mdf["u"].to_numpy().astype(np.int64)[order],
                       mdf["n"].to_numpy().astype(np.int64)[order],
                       mdf["s"].to_numpy().astype(np.int64)[order],
                       mdf["s2"].to_numpy().astype(np.int64)[order]))

        def flag(t: pa.Table) -> pa.Table:
            su, sn, ss, ss2 = ray.get(ref)
            u = t.column(user_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            x = _cents(t, value_col)
            i = np.searchsorted(su, u)  # every event's user has moments
            n, s, s2 = sn[i], ss[i], ss2[i]
            lhs = (n * x - s)
            keep = (n >= min_events) & (lhs * lhs > t2 * (n * s2 - s * s))
            return pa.table({
                "event_id": pa.array(
                    t.column(id_col).to_numpy(
                        zero_copy_only=False)[keep].astype(np.int64)),
                "user_id": pa.array(u[keep], pa.int64()),
                "cents": pa.array(x[keep], pa.int64()),
            })

        out = ev.map_batches(flag, batch_format="pyarrow")
    else:
        from ..stages.util import rename_cols

        # reduce_ already drops __part (groupby-agg output is u/n/s/s2/mx)
        joined = ev.join(
            rename_cols(moments, {"u": "m_u"}),
            "inner", num_partitions,
            on=(user_col,), right_on=("m_u",))

        def flag_joined(t: pa.Table) -> pa.Table:
            u = t.column(user_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            x = _cents(t, value_col)
            n = t.column("n").to_numpy(zero_copy_only=False)
            s = t.column("s").to_numpy(zero_copy_only=False)
            s2 = t.column("s2").to_numpy(zero_copy_only=False)
            lhs = (n * x - s)
            keep = (n >= min_events) & (lhs * lhs > t2 * (n * s2 - s * s))
            return pa.table({
                "event_id": pa.array(
                    t.column(id_col).to_numpy(
                        zero_copy_only=False)[keep].astype(np.int64)),
                "user_id": pa.array(u[keep], pa.int64()),
                "cents": pa.array(x[keep], pa.int64()),
            })

        out = joined.map_batches(flag_joined, batch_format="pyarrow")

    df = out.to_pandas()
    if not len(df):
        df = pd.DataFrame({c: pd.Series(dtype="int64")
                           for c in ("event_id", "user_id", "cents")})
    return df.sort_values("event_id").reset_index(drop=True)
