"""Co-visitation / co-occurrence mining over a keyed event log: the
item-item matrix behind "users who touched A also touched B"
recommenders and query-expansion tables.

Plan (all exchanges combiner-first, quadratic work skew-guarded):

1. parse the item id out of the JSON props payload VECTORIZED
   (``pyarrow.compute.extract_regex`` — no Python per row);
2. distinct (user, item) pairs (``stages.agg.distinct_pairs``: per-batch
   combine, one bucketed shuffle — raw events never move);
3. one user-hash bucket pass: per bucket, lexsort (user, item) and emit
   every within-user ordered item pair via the shared
   ``sorted_run_pairs`` kernel (items sorted ascending, so pairs are
   canonical a < b by construction), combined to per-bucket pair counts
   before leaving;
4. one (item_a, item_b) grouped sum + support filter.

Skew guard: ``max_items_per_user`` — a user with more distinct items
than the cap emits NO pairs (the standard quadratic-blowup guard, same
convention as dedup's ``max_docs_per_shingle``); the SQL oracle
replicates the cap, so it is semantics, not a silent truncation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def parse_item(t: pa.Table, *, props_col: str = "props",
               key: str = "k") -> np.ndarray:
    """int64 item ids from rows like ``{"k": 87}`` (missing -> -1)."""
    import pyarrow.compute as pc

    m = pc.extract_regex(t.column(props_col),
                         f'"{key}":\\s*(?P<v>-?\\d+)')
    v = pc.struct_field(m, "v")
    out = np.full(t.num_rows, -1, np.int64)
    ok = pc.is_valid(v).to_numpy(zero_copy_only=False)
    if ok.any():
        out[ok] = np.asarray(v.drop_null().cast(pa.int64()))
    return out


def covisitation_pairs(events: "ray.data.Dataset", *,
                       user_col: str = "user_id",
                       props_col: str = "props",
                       min_users: int = 3,
                       max_items_per_user: int = 200,
                       num_buckets: int = 64) -> "ray.data.Dataset":
    """(item_a, item_b, n_users) for canonical item pairs co-visited by
    at least ``min_users`` distinct users."""
    from ..stages.agg import _bucket_of, distinct_pairs, grouped_agg, \
        sorted_run_pairs

    def project(t: pa.Table) -> pa.Table:
        items = parse_item(t, props_col=props_col)
        users = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = items >= 0
        return pa.table({"user": pa.array(users[keep], pa.int64()),
                         "item": pa.array(items[keep], pa.int64())})

    ui = distinct_pairs(events.map_batches(project, batch_format="pyarrow"),
                        "user", "item", num_buckets=num_buckets)

    def part(t: pa.Table) -> pa.Table:
        u = t.column("user").to_numpy(zero_copy_only=False)
        return t.append_column("__p", pa.array(
            _bucket_of(u, num_buckets=num_buckets)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        order = np.lexsort((it, u))
        u, it = u[order], it[order]
        a_idx, b_idx, _ = sorted_run_pairs([u], max_run=max_items_per_user)
        if not len(a_idx):
            return pd.DataFrame({"item_a": pd.Series(dtype="int64"),
                                 "item_b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        ia, ib = it[a_idx], it[b_idx]
        o2 = np.lexsort((ib, ia))
        ia, ib = ia[o2], ib[o2]
        new = np.concatenate(([True], (ia[1:] != ia[:-1])
                              | (ib[1:] != ib[:-1])))
        idx = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((idx, [len(ia)])))
        return pd.DataFrame({"item_a": ia[idx], "item_b": ib[idx],
                             "n": cnt.astype(np.int64)})

    partials = (ui.map_batches(part, batch_format="pyarrow")
                .groupby("__p").map_groups(pairs, batch_format="pandas"))
    summed = grouped_agg(partials, ["item_a", "item_b"], "n", "sum",
                         num_buckets=num_buckets, out_col="n_users")

    def support(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t.column("n_users"),
                                         pa.scalar(min_users, pa.int64())))

    return summed.map_batches(support, batch_format="pyarrow")
