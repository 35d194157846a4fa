"""Windowed aggregations over a keyed event log.

Ray Data is a batch engine (no event-time watermarks — the reference is
strictly batch too, SURVEY.md §2.10). All four window flavors run as
ONE hash-bucketed pass: keys hash into B buckets, each bucket's
``map_groups`` call sorts its rows by (key, ts) and computes every
key's windows VECTORIZED over run boundaries. That keeps the Python
call count at O(B), not O(keys) — a per-key ``groupby(key).map_groups``
pays one interpreter call per key, which dies at 10^9 users.

- tumbling: fixed-size aligned windows (``floor(ts/size)``) — pure
  grouped count on (key, window), no per-key logic at all;
- session: a new session starts when the gap since the previous event
  of the same key exceeds ``gap`` (classic sessionization);
- sliding: fixed size + hop; an event contributes to every window
  covering it;
- (see also ``__ray_entry__.q_events_gaps`` for the lag()-gap pattern.)

Timestamps are int64 microseconds throughout (exact arithmetic; float
epoch seconds would round).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_B = 64  # key-hash buckets: Python call count per pass is O(_B)


def _part_by_key(key: str):
    from ..stages.agg import _bucket_of

    def part(t: pa.Table) -> pa.Table:
        kk = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__part", pa.array(
            _bucket_of(kk, num_buckets=_B)))

    return part


def tumbling_windows(events: "ray.data.Dataset", *, key: str = "user_id",
                     ts: str = "ts", size_s: int = 3600) -> "ray.data.Dataset":
    """(key, window_start, n_events): one bucketed grouped count over
    the derived (key, window) pair — no per-key processing anywhere."""
    from ..stages.agg import grouped_agg
    from ..stages.util import rename_cols

    def add_window(t: pa.Table) -> pa.Table:
        us = t.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (us // 10**6) // size_s
        return pa.table({key: t.column(key).cast(pa.int64()),
                         "window_start": pa.array(w, pa.int64())})

    return grouped_agg(events.map_batches(add_window, batch_format="pyarrow"),
                       [key, "window_start"], None, "count",
                       out_col="n_events")


def session_windows(events: "ray.data.Dataset", *, key: str = "user_id",
                    ts: str = "ts", gap_s: int = 3600) -> "ray.data.Dataset":
    """(key, session_id, session_start_us, n_events, duration_us) rows;
    session_id is the per-key 1-based session ordinal. Vectorized over
    ALL keys of a bucket at once: session breaks are new-key-or-gap
    boundaries, ids are within-run cumsums, stats are reduceat spans."""
    gap_us = gap_s * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        kk = g[key].to_numpy().astype(np.int64)
        us = g[ts].astype("int64").to_numpy()
        order = np.lexsort((us, kk))
        kk, us = kk[order], us[order]
        n = len(kk)
        if n == 0:
            return pd.DataFrame({key: np.empty(0, np.int64),
                                 "session_id": np.empty(0, np.int64),
                                 "session_start_us": np.empty(0, np.int64),
                                 "n_events": np.empty(0, np.int64),
                                 "duration_us": np.empty(0, np.int64)})
        new_key = np.concatenate(([True], kk[1:] != kk[:-1]))
        brk = new_key | np.concatenate(([True], np.diff(us) > gap_us))
        sess_start = np.flatnonzero(brk)
        # per-key 1-based ordinal: global session index minus the index
        # of the key's first session
        sess_idx = np.cumsum(brk) - 1
        key_first_sess = sess_idx[np.flatnonzero(new_key)]
        key_run_id = np.cumsum(new_key) - 1
        sid = sess_idx - key_first_sess[key_run_id] + 1
        ends = np.concatenate((sess_start[1:], [n])) - 1
        return pd.DataFrame({
            key: kk[sess_start],
            "session_id": sid[sess_start],
            "session_start_us": us[sess_start],
            "n_events": np.diff(np.concatenate((sess_start, [n]))),
            "duration_us": us[ends] - us[sess_start],
        })

    return (events.map_batches(_part_by_key(key), batch_format="pyarrow")
            .groupby("__part").map_groups(sessions, batch_format="pandas"))


def sliding_windows(events: "ray.data.Dataset", *, key: str = "user_id",
                    ts: str = "ts", size_s: int = 3600,
                    hop_s: int = 900) -> "ray.data.Dataset":
    """(key, window_start, n_events) with overlapping windows: window w
    covers [w*hop, w*hop + size). Each event expands to its k covering
    windows IN THE BATCH (np.repeat — no per-key step), then one
    bucketed grouped count."""
    assert size_s % hop_s == 0
    k = size_s // hop_s

    from ..stages.agg import grouped_agg

    def expand(t: pa.Table) -> pa.Table:
        kk = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        sec = t.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False) // 10**6
        base = sec // hop_s
        w = np.concatenate([base - j for j in range(k)])
        kk_r = np.tile(kk, k)
        keep = w >= 0
        return pa.table({key: pa.array(kk_r[keep], pa.int64()),
                         "window_start": pa.array(w[keep] * hop_s, pa.int64())})

    return grouped_agg(events.map_batches(expand, batch_format="pyarrow"),
                       [key, "window_start"], None, "count",
                       out_col="n_events")


def transition_counts(events: "ray.data.Dataset", *, key: str = "user_id",
                      ts: str = "ts", tie: str = "event_id",
                      label: str = "event_type") -> "ray.data.Dataset":
    """Markov transition matrix over a keyed event log: for every key's
    event sequence ordered by (ts, tie), count each adjacent
    (prev_label, next_label) pair globally. Output rows
    (prev_type, next_type, n) — at most |labels|² of them.

    One bucketed pass (the windows-module plan): keys hash into ``_B``
    buckets, each bucket lexsorts by (key, ts, tie) and reduces its
    adjacent same-key pairs to per-bucket (prev, next, count) partials
    vectorized — so what leaves a bucket is bounded by |labels|², never
    by events. The cross-bucket merge is over ≤ _B·|labels|² rows
    (output-bounded, NOT data-bounded): one more single-bucket
    map_groups pass sums the partials. No per-key Python, no driver
    state beyond the final matrix."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        kk = g[key].to_numpy().astype(np.int64)
        us = g[ts].astype("int64").to_numpy()
        ee = g[tie].to_numpy().astype(np.int64)
        lab = g[label].to_numpy()
        order = np.lexsort((ee, us, kk))
        kk, lab = kk[order], lab[order]
        same = kk[1:] == kk[:-1]
        if not same.any():
            return pd.DataFrame({"prev_type": pd.Series(dtype=object),
                                 "next_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64"),
                                 "__m": pd.Series(dtype="int64")})
        out = (pd.DataFrame({"prev_type": lab[:-1][same],
                             "next_type": lab[1:][same]})
               .groupby(["prev_type", "next_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        out["__m"] = np.int64(0)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["prev_type", "next_type"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    part = events.map_batches(_part_by_key(key), batch_format="pyarrow")
    partials = part.groupby("__part").map_groups(bucket_pairs,
                                                 batch_format="pandas")
    return partials.groupby("__m").map_groups(merge, batch_format="pandas")


def running_totals(events: "ray.data.Dataset", *, key: str = "user_id",
                   ts: str = "ts", tie: str = "event_id",
                   val: str = "cents") -> "ray.data.Dataset":
    """Per-key running sum — ``sum(val) OVER (PARTITION BY key ORDER BY
    ts, tie)`` — as ONE bucketed pass: each key-hash bucket lexsorts by
    (key, ts, tie) and computes every key's cumulative sum vectorized
    over run boundaries (global cumsum minus each run's base). Output
    one row per input row (tie, key, val, running) — an O(input)
    transform that streams out of the buckets, no driver state."""

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        kk = g[key].to_numpy().astype(np.int64)
        us = g[ts].astype("int64").to_numpy()
        ee = g[tie].to_numpy().astype(np.int64)
        vv = g[val].to_numpy().astype(np.int64)
        order = np.lexsort((ee, us, kk))
        kk, ee, vv = kk[order], ee[order], vv[order]
        n = len(kk)
        if n == 0:
            return pd.DataFrame({tie: pd.Series(dtype="int64"),
                                 key: pd.Series(dtype="int64"),
                                 val: pd.Series(dtype="int64"),
                                 "running": pd.Series(dtype="int64")})
        cum = np.cumsum(vv)
        new = np.concatenate(([True], kk[1:] != kk[:-1]))
        run_start = np.flatnonzero(new)
        base = (cum[run_start] - vv[run_start])[np.cumsum(new) - 1]
        return pd.DataFrame({tie: ee, key: kk, val: vv,
                             "running": cum - base})

    part = events.map_batches(_part_by_key(key), batch_format="pyarrow")
    return part.groupby("__part").map_groups(cumsum, batch_format="pandas")


def rolling_active_users(events: "ray.data.Dataset", *,
                         key: str = "user_id", ts: str = "ts",
                         window_days: int = 7) -> "ray.data.Dataset":
    """Daily + trailing-window distinct active users — the DAU/WAU
    pair. Exact distinct counts without any count-distinct window
    (which neither Ray Data nor SQL engines support directly):

    1. dedup (user, day) once (``distinct_pairs`` — raw events never
       shuffle, a user's Nth event of a day dies in the batch combine);
    2. DAU: grouped count per day;
    3. WAU: ONE user-hash bucket pass — a user's deduped days live in
       exactly one bucket, so each bucket expands its (user, day) rows
       to their ``window_days`` window ends, dedups (user, window_end)
       LOCALLY (a user active twice inside one window counts once) and
       emits per-(window_end) partial counts; what crosses the second
       shuffle is ≤ buckets × days rows (calendar-bounded), never the
       window_days × pairs expansion;
    4. report only days that actually occur (observed-day list is
       bounded by the time span, broadcast as a filter).

    Output: (day, dau, wau) with day = floor(epoch_us / 86400e6).
    """
    from ..stages.agg import _bucket_of, distinct_pairs, grouped_agg

    US_DAY = 86_400_000_000

    def to_day(t: pa.Table) -> pa.Table:
        us = t.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user": t.column(key).cast(pa.int64()),
            "day": pa.array(us // US_DAY, pa.int64()),
        })

    ud = distinct_pairs(events.map_batches(to_day, batch_format="pyarrow"),
                        "user", "day").materialize()
    dau = grouped_agg(ud, ["day"], None, "count", out_col="dau")

    def part(t: pa.Table) -> pa.Table:
        u = t.column("user").to_numpy(zero_copy_only=False)
        return t.append_column("__p", pa.array(_bucket_of(u,
                                                          num_buckets=_B)))

    def wau_partial(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user"].to_numpy().astype(np.int64)
        d = g["day"].to_numpy().astype(np.int64)
        k = window_days
        ue = np.repeat(u, k)
        we = np.repeat(d, k) + np.tile(np.arange(k, dtype=np.int64),
                                       len(d))
        order = np.lexsort((we, ue))
        ue, we = ue[order], we[order]
        first = np.concatenate(([True], (ue[1:] != ue[:-1])
                                | (we[1:] != we[:-1]))) \
            if len(ue) else np.empty(0, bool)
        we = we[first]
        ws = np.sort(we)
        idx = np.flatnonzero(np.concatenate(([True], ws[1:] != ws[:-1]))) \
            if len(ws) else np.empty(0, np.int64)
        cnt = np.diff(np.concatenate((idx, [len(ws)]))) if len(ws) \
            else np.empty(0, np.int64)
        return pd.DataFrame({"wend": ws[idx] if len(ws)
                             else np.empty(0, np.int64),
                             "wau": cnt.astype(np.int64)})

    partials = (ud.map_batches(part, batch_format="pyarrow")
                .groupby("__p").map_groups(wau_partial,
                                           batch_format="pandas"))
    wau = grouped_agg(partials, ["wend"], "wau", "sum", out_col="wau")

    # observed days (bounded by the calendar span, not the data volume)
    days = np.sort(np.asarray(ud.unique("day"), dtype=np.int64))
    days_ref = set(int(x) for x in days)

    dau_df = dau.to_pandas()
    wau_df = wau.to_pandas()
    wau_df = wau_df[wau_df["wend"].isin(days_ref)]
    out = dau_df.merge(wau_df, left_on="day", right_on="wend",
                       how="left")[["day", "dau", "wau"]]
    out["wau"] = out["wau"].fillna(0).astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


def rollup_counts(events: "ray.data.Dataset", *, label: str = "event_type",
                  ts: str = "ts", val: str = "cents",
                  all_label: str = "(all)") -> "ray.data.Dataset":
    """GROUP BY ROLLUP(label, day): counts + exact integer sums at
    (label, day), (label, *) and (*, *) grain. ONE distributed pass
    computes the finest grain (per-batch pandas combine -> one bucketed
    merge keyed on the label hash); the coarser levels are derived FROM
    that base aggregate — sums are additive, so subtotals cost
    O(base rows), which is |labels| x |days| (output-bounded, never
    data-bounded). Sentinels: day = -1 / label = ``all_label`` mark
    rolled-up levels (SQL twin: coalesce over ROLLUP nulls)."""
    from ..stages.agg import _bucket_of

    US_DAY = 86_400_000_000

    def base(t: pa.Table) -> pa.Table:
        us = t.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            label: t.column(label).to_pylist(),
            "day": us // US_DAY,
            val: t.column(val).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        g = (df.groupby([label, "day"], sort=False)
             .agg(n_events=(val, "size"), sum_cents=(val, "sum"))
             .reset_index())
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_cents"] = g["sum_cents"].astype(np.int64)
        import hashlib

        # md5, not hash(): PYTHONHASHSEED varies per worker process, and
        # co-bucketing requires the same label -> same bucket everywhere
        lab_h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(s).encode()).digest()[:8],
                            "little") >> 1 for s in g[label]),
            np.int64, len(g))
        g["__b"] = _bucket_of(lab_h, num_buckets=16)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([label, "day"], sort=False)
               [["n_events", "sum_cents"]].sum().reset_index())
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_cents"] = out["sum_cents"].astype(np.int64)
        return out

    fine = (events.map_batches(base, batch_format="pyarrow")
            .groupby("__b").map_groups(merge, batch_format="pandas")
            .to_pandas())
    by_label = (fine.groupby(label, as_index=False)
                [["n_events", "sum_cents"]].sum())
    by_label["day"] = np.int64(-1)
    total = pd.DataFrame({label: [all_label], "day": [np.int64(-1)],
                          "n_events": [fine["n_events"].sum()],
                          "sum_cents": [fine["sum_cents"].sum()]})
    out = pd.concat([fine, by_label, total], ignore_index=True) \
        [[label, "day", "n_events", "sum_cents"]]
    out["day"] = out["day"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return out.sort_values([label, "day"]).reset_index(drop=True)
