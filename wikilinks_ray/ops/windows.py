"""Windowed aggregations over a keyed event log.

Ray Data is a batch engine (no event-time watermarks — the reference is
strictly batch too, SURVEY.md §2.10); windows are computed per key over
ts-sorted groups: ``groupby(key).map_groups`` where the group function
sorts by timestamp and applies the window logic in pandas/numpy.
Ordering assumption: correctness needs per-key processing over the
complete, ts-sorted event set for that key — which map_groups
guarantees; no cross-key ordering is assumed.

- tumbling: fixed-size aligned windows (``floor(ts/size)``);
- session: a new session starts when the gap since the previous event
  of the same key exceeds ``gap`` (classic sessionization);
- sliding: fixed size + hop; an event contributes to every window
  covering it.

Timestamps are int64 microseconds throughout (exact arithmetic; float
epoch seconds would round).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def tumbling_windows(events: "ray.data.Dataset", *, key: str = "user_id",
                     ts: str = "ts", size_s: int = 3600) -> "ray.data.Dataset":
    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts)
        w = (g[ts].astype("int64") // 10**6) // size_s
        out = g.groupby(w).size().rename("n_events").reset_index()
        out.columns = ["window_start", "n_events"]
        out[key] = g[key].iloc[0]
        return out[[key, "window_start", "n_events"]]

    return events.groupby(key).map_groups(windows, batch_format="pandas")


def session_windows(events: "ray.data.Dataset", *, key: str = "user_id",
                    ts: str = "ts", gap_s: int = 3600) -> "ray.data.Dataset":
    """(key, session_id, session_start_us, n_events, duration_us) rows;
    session_id is the per-key 1-based session ordinal."""
    gap_us = gap_s * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        us = g[ts].astype("int64").to_numpy()
        brk = np.ones(len(us), dtype=np.int64)
        brk[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        df = pd.DataFrame({"sid": sid, "us": us})
        out = df.groupby("sid").agg(session_start_us=("us", "min"),
                                    n_events=("us", "size"),
                                    session_end_us=("us", "max"))
        out["duration_us"] = out.pop("session_end_us") - out["session_start_us"]
        out.index.name = "session_id"
        out = out.reset_index()
        out[key] = g[key].iloc[0]
        return out[[key, "session_id", "session_start_us", "n_events",
                    "duration_us"]]

    return events.groupby(key).map_groups(sessions, batch_format="pandas")


def sliding_windows(events: "ray.data.Dataset", *, key: str = "user_id",
                    ts: str = "ts", size_s: int = 3600,
                    hop_s: int = 900) -> "ray.data.Dataset":
    """(key, window_start, n_events) with overlapping windows: window w
    covers [w*hop, w*hop + size)."""
    assert size_s % hop_s == 0
    k = size_s // hop_s

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts)
        sec = g[ts].astype("int64").to_numpy() // 10**6
        rows = []
        base = sec // hop_s
        for j in range(k):
            rows.append(base - j)
        w = np.concatenate(rows)
        w = w[w >= 0]
        uw, cnt = np.unique(w, return_counts=True)
        return pd.DataFrame({key: g[key].iloc[0], "window_start": uw * hop_s,
                             "n_events": cnt})

    return events.groupby(key).map_groups(windows, batch_format="pandas")
