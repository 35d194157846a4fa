"""Temporal joins Ray Data lacks natively — as-of join first.

``asof_join``: for every left row, the right row of the same ``by``
key with the greatest ``on`` value <= the left's (backward direction,
exact matches allowed), ties on equal ``on`` broken by the greatest
``tie`` — the classic point-in-time join (trades⋈quotes,
event⋈latest-signup) that needs a sort-merge within key, not a hash
join.

Shape (SCALE.md): both sides are hash-bucketed by the ``by`` key into
ONE ``map_groups`` (a key lives in exactly one bucket, so the merge is
bucket-local and the only shuffle is the groupby); inside the bucket a
single ``pandas.merge_asof`` — one O(n log n) sort + linear merge —
joins every key at once. Nothing is broadcast; skew rides on the
bucket count knob like every other bucketed op in the repo. Unmatched
left rows emit the ``-1`` sentinel (total columns, no nullable-dtype
hash ambiguity against the SQL twin).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray  # noqa: F401  (Dataset type context)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str = "user_id",
    on: str = "ts",
    tie: str = "event_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Backward as-of join of two event-shaped Datasets (columns
    ``by``, ``on`` (timestamp), ``tie`` (int64, unique)); returns rows
    (tie, by, on, matched_<tie>, gap_us) — one per LEFT row, with the
    matched right ``tie`` and the exact microsecond gap, or -1/-1 when
    no right row precedes it."""
    import pandas as pd

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            b = t.column(by).to_numpy(zero_copy_only=False) % num_buckets
            return pa.table({
                by: t.column(by).cast(pa.int64()),
                on: t.column(on),
                tie: t.column(tie).cast(pa.int64()),
                "__side": pa.array(np.full(t.num_rows, side, np.int64)),
                "__b": pa.array(b.astype(np.int64)),
            })
        return f

    both = (left.map_batches(tag(0), batch_format="pyarrow")
            .union(right.map_batches(tag(1), batch_format="pyarrow")))

    out_cols = [tie, by, on, f"matched_{tie}", "gap_us"]

    def join(g: "pd.DataFrame") -> "pd.DataFrame":
        l = g[g["__side"] == 0].sort_values([on, tie], kind="mergesort")
        r = g[g["__side"] == 1].sort_values([on, tie], kind="mergesort")
        if len(l) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 if c != on else
                                 pd.Series(dtype=l[on].dtype)
                                 for c in out_cols})
        if len(r) == 0:
            m = l.copy()
            m["matched"] = -1
            m["gap_us"] = -1
        else:
            # merge_asof: last eligible row in (on, tie) order == max
            # on, then max tie — the deterministic twin of the SQL
            # ORDER BY rts DESC, rid DESC pick
            rp = r[[by, on, tie]].copy()
            rp["__rts"] = rp[on]  # merge_asof drops the right's on col
            m = pd.merge_asof(l, rp, on=on, by=by,
                              direction="backward",
                              suffixes=("", "__r"))
            rid = m[f"{tie}__r"]
            has = rid.notna().to_numpy()
            lus = m[on].to_numpy().astype("datetime64[us]").astype(np.int64)
            rus = m["__rts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)  # NaT -> garbage, masked below
            m["matched"] = np.where(
                has, rid.fillna(-1).to_numpy(dtype=np.int64), -1)
            m["gap_us"] = np.where(has, lus - rus, -1).astype(np.int64)
        out = pd.DataFrame({
            tie: m[tie].to_numpy(dtype=np.int64),
            by: m[by].to_numpy(dtype=np.int64),
            on: m[on].to_numpy(),
            f"matched_{tie}": m["matched"].to_numpy(dtype=np.int64),
            "gap_us": m["gap_us"].to_numpy(dtype=np.int64),
        })
        return out

    return both.groupby("__b").map_groups(join, batch_format="pandas")


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str = "user_id",
    on: str = "ts",
    tie: str = "event_id",
    window_us: int = 3_600_000_000,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Trailing-window RANGE join: every (left, right) pair of the same
    ``by`` key with ``right.on`` in ``[left.on - window_us, left.on]``
    — the interval join Ray Data lacks natively (trades⋈quotes within
    an hour, event⋈recent-context). Returns rows
    (tie, matched_<tie>, by, gap_us), one per matching pair.

    Fully vectorized, NO per-user cross product: inside each key-hash
    bucket both sides' (key, time) pairs pack into ONE int64 rank key
    (dense key rank x time rank — overflow asserted), and two
    ``np.searchsorted`` calls bound every left row's match run in the
    lexicographically sorted right arrays; pairs materialize by
    repeat+arange expansion, so per-bucket work is
    O((L + R) log R + matches)."""
    import pandas as pd

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            b = t.column(by).to_numpy(zero_copy_only=False) % num_buckets
            return pa.table({
                by: t.column(by).cast(pa.int64()),
                on: t.column(on),
                tie: t.column(tie).cast(pa.int64()),
                "__side": pa.array(np.full(t.num_rows, side, np.int64)),
                "__b": pa.array(b.astype(np.int64)),
            })
        return f

    both = (left.map_batches(tag(0), batch_format="pyarrow")
            .union(right.map_batches(tag(1), batch_format="pyarrow")))

    def join(g: "pd.DataFrame") -> "pd.DataFrame":
        lm = g["__side"].to_numpy() == 0
        lu = g[by].to_numpy()[lm]
        lt = g[on].to_numpy().astype("datetime64[us]").astype(np.int64)[lm]
        lid = g[tie].to_numpy()[lm]
        ru = g[by].to_numpy()[~lm]
        rt = g[on].to_numpy().astype("datetime64[us]").astype(np.int64)[~lm]
        rid = g[tie].to_numpy()[~lm]
        empty = pd.DataFrame({tie: pd.Series(dtype="int64"),
                              f"matched_{tie}": pd.Series(dtype="int64"),
                              by: pd.Series(dtype="int64"),
                              "gap_us": pd.Series(dtype="int64")})
        if len(lu) == 0 or len(ru) == 0:
            return empty
        # dense key ranks over the union keep the packed key small
        uu, uinv = np.unique(np.concatenate([lu, ru]), return_inverse=True)
        lur, rur = uinv[:len(lu)], uinv[len(lu):]
        # global time rank (monotone in ts, so lexicographic
        # (key_rank, ts_rank) order == (key, ts) order)
        allt = np.unique(np.concatenate([rt, lt, lt - window_us]))
        base = len(allt) + 2
        assert len(uu) * base < 2 ** 62, \
            "interval_join rank-key overflow: raise num_buckets"
        rkey = rur * base + np.searchsorted(allt, rt)
        order = np.argsort(rkey, kind="stable")
        rkey_s, rid_s, rt_s = rkey[order], rid[order], rt[order]
        lo = np.searchsorted(rkey_s,
                             lur * base + np.searchsorted(allt,
                                                          lt - window_us),
                             side="left")
        hi = np.searchsorted(rkey_s,
                             lur * base + np.searchsorted(allt, lt),
                             side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(lu)), counts)
        ri = (np.repeat(lo + counts - np.cumsum(counts), counts)
              + np.arange(total))
        return pd.DataFrame({
            tie: lid[li],
            f"matched_{tie}": rid_s[ri],
            by: lu[li],
            "gap_us": lt[li] - rt_s[ri],
        })

    return both.groupby("__b").map_groups(join, batch_format="pandas")
