"""Retention cohort analysis over an event stream.

The standard product-analytics retention matrix (events-family
extension alongside ops/windows.py and ops/funnel.py): bucket users
into daily cohorts by their FIRST event day, then for each (cohort,
day-offset) count how many of the cohort's users were active that day.

All arithmetic is integer (day = microseconds-since-epoch floor-divided
by 86_400_000_000), so the distributed pipeline is value-hash
oracle-comparable (``events_retention``).

Plan (combiner-first):

1. project events -> (user, day) and dedup via ``grouped_agg`` count
   (per-batch combine collapses a user's many same-day events before
   the shuffle — the natural compression: what moves is bounded by
   active user-days, not events);
2. cohort(user) = ``grouped_agg`` min day — a second small pass over
   the deduped pairs;
3. attach cohorts: broadcast dense user->cohort map under
   ``user_broadcast_limit`` (8 B/user), hash join past it; offset =
   day - cohort;
4. ``grouped_agg`` count by (cohort, offset) — output is O(days²)
   rows, tiny by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

US_PER_DAY = 86_400_000_000


def retention_cohorts(events: "ray.data.Dataset", *,
                      user_col: str = "user_id", ts_col: str = "ts",
                      num_buckets: int = 64,
                      user_broadcast_limit: int = 50_000_000,
                      num_partitions: int = 8) -> "ray.data.Dataset":
    """Cohort retention counts: Dataset (cohort_day, day_offset,
    n_users), one row per (cohort, offset) with >= 1 active user.
    Days are integer days since the Unix epoch."""
    from ..stages.agg import grouped_agg

    def project(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column(ts_col)
        if pa.types.is_timestamp(col.type):  # normalize s/ms/us inputs
            col = col.cast(pa.timestamp("us"))
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "day": pa.array(ts // US_PER_DAY, pa.int64()),
        })

    pairs = events.select_columns([user_col, ts_col]).map_batches(
        project, batch_format="pyarrow")
    active = grouped_agg(pairs, ["u", "day"], None, "count",
                         num_buckets=num_buckets, out_col="__n"
                         ).drop_columns(["__n"]).materialize()
    cohort = grouped_agg(active, ["u"], "day", "min",
                         num_buckets=num_buckets, out_col="cohort")

    cdf = cohort.to_pandas()
    if len(cdf) <= user_broadcast_limit:
        users = cdf["u"].to_numpy().astype(np.int64)
        order = np.argsort(users)
        ref = ray.put((users[order],
                       cdf["cohort"].to_numpy().astype(np.int64)[order]))

        def attach(t: pa.Table) -> pa.Table:
            su, sc = ray.get(ref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            day = t.column("day").to_numpy(zero_copy_only=False)
            co = sc[np.searchsorted(su, u)]  # every active user has a cohort
            return pa.table({
                "cohort_day": pa.array(co, pa.int64()),
                "day_offset": pa.array(day - co, pa.int64()),
            })

        offs = active.map_batches(attach, batch_format="pyarrow")
    else:
        from ..stages.util import rename_cols

        joined = active.join(rename_cols(cohort, {"u": "c_u"}),
                             "inner", num_partitions,
                             on=("u",), right_on=("c_u",))

        def attach_joined(t: pa.Table) -> pa.Table:
            day = t.column("day").to_numpy(zero_copy_only=False)
            co = t.column("cohort").to_numpy(zero_copy_only=False)
            return pa.table({
                "cohort_day": pa.array(co.astype(np.int64), pa.int64()),
                "day_offset": pa.array((day - co).astype(np.int64),
                                       pa.int64()),
            })

        offs = joined.map_batches(attach_joined, batch_format="pyarrow")

    return grouped_agg(offs, ["cohort_day", "day_offset"], None, "count",
                       num_buckets=num_buckets, out_col="n_users")
