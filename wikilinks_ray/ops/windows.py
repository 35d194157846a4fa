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
