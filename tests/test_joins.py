"""asof_join vs a brute-force reference: backward point-in-time
semantics, exact-timestamp ties -> max tie id, -1 sentinels, bucket
independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def mk_ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def brute_asof(l: pd.DataFrame, r: pd.DataFrame):
    rows = []
    for _, lr in l.iterrows():
        elig = r[(r.user_id == lr.user_id) & (r.ts <= lr.ts)]
        if len(elig):
            # max ts, then max event_id
            best = elig.sort_values(["ts", "event_id"]).iloc[-1]
            rows.append((lr.event_id, lr.user_id, lr.ts,
                         int(best.event_id),
                         int((lr.ts - best.ts).value // 1000)))
        else:
            rows.append((lr.event_id, lr.user_id, lr.ts, -1, -1))
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                       "matched_event_id", "gap_us"])


def test_asof_join_vs_brute_force(ray_session):
    from wikilinks_ray.ops.joins import asof_join

    rng = np.random.default_rng(9)
    base = pd.Timestamp("2024-01-01")
    nl, nr = 300, 200
    l = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.integers(0, 40, nl),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="us"),
    })
    r = pd.DataFrame({
        "event_id": np.arange(1000, 1000 + nr, dtype=np.int64),
        "user_id": rng.integers(0, 40, nr),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, nr), unit="us"),
    })
    # force exact-timestamp ties: two right rows AND a left row at the
    # same instant for user 7
    t0 = base + pd.to_timedelta(500_000, unit="us")
    r = pd.concat([r, pd.DataFrame({
        "event_id": [2000, 2001], "user_id": [7, 7], "ts": [t0, t0]})],
        ignore_index=True)
    l = pd.concat([l, pd.DataFrame({
        "event_id": [500], "user_id": [7], "ts": [t0]})],
        ignore_index=True)
    # user with left rows and NO right rows at all
    l = pd.concat([l, pd.DataFrame({
        "event_id": [501], "user_id": [99], "ts": [t0]})],
        ignore_index=True)

    want = brute_asof(l, r).sort_values("event_id").reset_index(drop=True)
    for nb in (1, 32):
        got = (asof_join(mk_ds(l), mk_ds(r), num_buckets=nb)
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        got["ts"] = pd.to_datetime(got["ts"])
        pd.testing.assert_frame_equal(
            got.astype({"event_id": "int64", "user_id": "int64",
                        "matched_event_id": "int64", "gap_us": "int64"}),
            want.astype({"event_id": "int64", "user_id": "int64",
                         "matched_event_id": "int64", "gap_us": "int64"}),
            check_dtype=False)
    # the tie: left 500 must match right 2001 (max id at equal ts), gap 0
    row = want[want.event_id == 500].iloc[0]
    assert row.matched_event_id == 2001 and row.gap_us == 0
    assert want[want.event_id == 501].iloc[0].matched_event_id == -1


def brute_interval(l: pd.DataFrame, r: pd.DataFrame, window_us: int):
    rows = []
    for _, lr in l.iterrows():
        lo = lr.ts - pd.Timedelta(window_us, unit="us")
        elig = r[(r.user_id == lr.user_id) & (r.ts <= lr.ts) & (r.ts >= lo)]
        for _, rr in elig.iterrows():
            rows.append((lr.event_id, int(rr.event_id), lr.user_id,
                         int((lr.ts - rr.ts).value // 1000)))
    return pd.DataFrame(rows, columns=["event_id", "matched_event_id",
                                       "user_id", "gap_us"])


def test_interval_join_vs_brute_force(ray_session):
    from wikilinks_ray.ops.joins import interval_join

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    nl, nr, win = 250, 250, 200_000
    l = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.integers(0, 30, nl),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="us"),
    })
    r = pd.DataFrame({
        "event_id": np.arange(1000, 1000 + nr, dtype=np.int64),
        "user_id": rng.integers(0, 30, nr),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, nr), unit="us"),
    })
    # both boundary cases at exactly gap==0 and gap==window for user 3
    t0 = base + pd.to_timedelta(500_000, unit="us")
    r = pd.concat([r, pd.DataFrame({
        "event_id": [2000, 2001], "user_id": [3, 3],
        "ts": [t0, t0 - pd.Timedelta(win, unit="us")]})],
        ignore_index=True)
    l = pd.concat([l, pd.DataFrame({
        "event_id": [500], "user_id": [3], "ts": [t0]})],
        ignore_index=True)

    key = ["event_id", "matched_event_id"]
    want = (brute_interval(l, r, win).sort_values(key)
            .reset_index(drop=True))
    for nb in (1, 32):
        got = (interval_join(mk_ds(l), mk_ds(r), window_us=win,
                             num_buckets=nb)
               .to_pandas().sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"), check_dtype=False)
    # boundaries inclusive on both ends
    b = want[want.event_id == 500]
    assert set(b.matched_event_id) >= {2000, 2001}
    assert set(b[b.matched_event_id.isin([2000, 2001])].gap_us) == {0, win}
