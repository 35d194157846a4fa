"""Ordered funnel analysis over an event stream.

The classic product-analytics sequence matcher (no reference analog —
events-family extension alongside ops/windows.py): for each user, walk
an ordered stage list (e.g. view -> click -> purchase) and find the
deepest stage reachable by a GREEDY strictly-increasing subsequence of
their events — stage i+1 must occur strictly after the matched stage-i
event, and each stage matches its EARLIEST admissible event (greedy
first-match, the standard funnel semantics; greedy is optimal here:
taking the earliest admissible event never excludes a deeper match).

Total order: ``order_col`` (``event_id`` — monotone sequence ids, so
ordering is exact integer comparison with no timestamp ties; the SQL
oracle twin mirrors the same min-id recurrence).

Plan (one shuffle):

1. ``map_batches`` projection: stage events -> (user, order, stage_idx)
   rows; NON-stage events per-batch combine to one (user, -1, -1) row
   per distinct user per batch (they only carry user presence for the
   stage-0 denominator) — the bulk of a real stream drops to near-
   nothing before the shuffle;
2. hash-bucket by user; per bucket one vectorized pandas/numpy pass:
   per stage, min admissible order per user via a sorted groupby-min,
   then advance the per-user bound. Output one row per user:
   ``(user_id, stage, last_event_id)`` (stage 0 = present but never
   entered; last_event_id = -1 then).

Skew: a hot user's shuffled rows are bounded by their stage-event
count; the per-bucket pass is linear in bucket rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.agg import _bucket_of


def funnel_stages(events: "ray.data.Dataset", stages: list[str], *,
                  user_col: str = "user_id", order_col: str = "event_id",
                  type_col: str = "event_type",
                  num_buckets: int = 64) -> "ray.data.Dataset":
    """Deepest-funnel-stage per user. Returns a Dataset with one row per
    distinct user: (user_col, stage, last_event_id)."""
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    stage_idx = {s: i for i, s in enumerate(stages)}

    def project(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t.column(type_col).to_pylist()
        si = np.array([stage_idx.get(x, -1) for x in ty], dtype=np.int64)
        keep = si >= 0
        # presence rows: one per distinct non-stage user per batch
        rest = np.unique(u[~keep])
        uu = np.concatenate([u[keep], rest])
        oo = np.concatenate([o[keep], np.full(len(rest), -1, np.int64)])
        ss = np.concatenate([si[keep], np.full(len(rest), -1, np.int64)])
        return pa.table({
            "u": pa.array(uu, pa.int64()),
            "o": pa.array(oo, pa.int64()),
            "s": pa.array(ss, pa.int64()),
            "__part": pa.array(_bucket_of(uu, num_buckets=num_buckets)
                               if len(uu) else np.empty(0, np.int64)),
        })

    n_stages = len(stages)

    def match(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        o = g["o"].to_numpy()
        s = g["s"].to_numpy()
        users = np.unique(u)
        uidx = np.searchsorted(users, u)
        bound = np.full(len(users), -1, dtype=np.int64)
        depth = np.zeros(len(users), dtype=np.int64)
        last = np.full(len(users), -1, dtype=np.int64)
        for i in range(n_stages):
            # candidates: stage-i events strictly after the user's bound,
            # only for users that have reached stage i so far
            cand = (s == i) & (depth[uidx] == i) & (o > bound[uidx])
            if not cand.any():
                break
            ci, co = uidx[cand], o[cand]
            # min order per user: sort by (user, order), first of each run
            order_ = np.lexsort((co, ci))
            ci_s, co_s = ci[order_], co[order_]
            first = np.empty(len(ci_s), dtype=bool)
            first[0] = True
            first[1:] = ci_s[1:] != ci_s[:-1]
            hit_u, hit_o = ci_s[first], co_s[first]
            depth[hit_u] = i + 1
            bound[hit_u] = hit_o
            last[hit_u] = hit_o
        return pd.DataFrame({user_col: users, "stage": depth,
                             "last_event_id": last})

    return (events.map_batches(project, batch_format="pyarrow")
            .groupby("__part").map_groups(match, batch_format="pandas"))


def funnel_counts(funnel: "ray.data.Dataset", n_stages: int
                  ) -> pd.DataFrame:
    """Stage histogram (driver-side, O(stages) rows) from a
    :func:`funnel_stages` result: users AT each stage and the cumulative
    users who REACHED it (the conversion curve)."""
    from ..stages.agg import grouped_agg

    at = grouped_agg(funnel.select_columns(["stage"]), ["stage"], None,
                     "count", out_col="n").to_pandas()
    at = at.set_index("stage")["n"]
    rows = []
    for i in range(n_stages + 1):
        at_i = int(at.get(i, 0))
        reached = int(sum(at.get(j, 0) for j in range(i, n_stages + 1)))
        rows.append({"stage": i, "users_at": at_i, "users_reached": reached})
    return pd.DataFrame(rows)
