"""Fifth-session soak: the three operators added this session at
millions-of-rows scale — timing + identical-output / invariant
assertions. Deterministic (seeded numpy); one JSON line per soak.

1. ``boruvka_msf``: 1M-vertex / 4M-edge random weighted graph, both
   relabel legs (merge-map broadcast vs forced co-bucketed hash join,
   ``label_broadcast_limit=0``) — identical forests asserted.
2. ``interval_join``: 4M events split purchase/signup, 1h trailing
   window — row count cross-checked against a numpy reference computed
   per user-hash stripe.
3. ``transition_counts``: 8M-event stream, 1M users — matrix totals
   must equal (n_events - n_users_with_events) exactly.

Usage: python tools/soak_r5c.py [--stage mst|interval|transitions|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def soak_mst(n: int = 1_000_000, m: int = 4_000_000) -> dict:
    import ray.data as rd

    from wikilinks_ray.pipelines.mst import boruvka_msf

    _init()
    rng = np.random.default_rng(17)
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    uu, vv = np.minimum(u, v)[keep], np.maximum(u, v)[keep]
    w = rng.integers(0, 10**6, keep.sum())
    df = (pd.DataFrame({"u": uu, "v": vv, "w": w})
          .groupby(["u", "v"], as_index=False)["w"].min())
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(64).materialize()

    t0 = time.perf_counter()
    forest = boruvka_msf(ds)
    t_bcast = time.perf_counter() - t0
    t0 = time.perf_counter()
    forest_j = boruvka_msf(ds, label_broadcast_limit=0)
    t_join = time.perf_counter() - t0
    pd.testing.assert_frame_equal(forest, forest_j)
    return {"soak": "mst", "n_vertices": n, "n_edges": int(len(df)),
            "forest_edges": int(len(forest)),
            "total_weight": int(forest["w"].sum()),
            "broadcast_s": round(t_bcast, 1), "forced_join_s": round(t_join, 1)}


def soak_interval(n: int = 4_000_000) -> dict:
    import pyarrow.compute as pc
    import ray.data as rd

    from wikilinks_ray.ops.joins import interval_join

    _init()
    rng = np.random.default_rng(23)
    n_users = 200_000
    win = 3_600_000_000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.integers(0, 30 * 86_400 * 10**6, n),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n)),
        "kind": pa.array(rng.integers(0, 2, n)),
    })
    ds = rd.from_arrow(t).repartition(64).materialize()

    def pick(kind):
        def f(tb: pa.Table) -> pa.Table:
            return tb.filter(pc.equal(tb.column("kind"), kind)) \
                .select(["event_id", "ts", "user_id"])
        return f

    left = ds.map_batches(pick(0), batch_format="pyarrow")
    right = ds.map_batches(pick(1), batch_format="pyarrow")
    t0 = time.perf_counter()
    out = interval_join(left, right, window_us=win)
    n_pairs = out.count()
    dt = time.perf_counter() - t0

    # independent count on one user stripe (every user with id % 97 == 0)
    df = t.to_pandas()
    df["us"] = df["ts"].astype("int64")
    stripe = df[df.user_id % 97 == 0]
    want = 0
    for _uid, g in stripe.groupby("user_id"):
        lt = np.sort(g[g.kind == 0]["us"].to_numpy())
        rt = np.sort(g[g.kind == 1]["us"].to_numpy())
        want += int((np.searchsorted(rt, lt, side="right")
                     - np.searchsorted(rt, lt - win, side="left")).sum())
    got = out.filter(lambda r: r["user_id"] % 97 == 0).count()
    assert got == want, (got, want)
    return {"soak": "interval_join", "n_events": n, "n_pairs": int(n_pairs),
            "stripe_pairs_checked": want, "wall_s": round(dt, 1)}


def soak_transitions(n: int = 8_000_000) -> dict:
    import ray.data as rd

    from wikilinks_ray.ops.windows import transition_counts

    _init()
    rng = np.random.default_rng(29)
    n_users = 1_000_000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.integers(0, 30 * 86_400 * 10**6, n),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n)),
        "event_type": pa.array(
            np.array(["a", "b", "c", "d", "e"])[rng.integers(0, 5, n)]),
    })
    ds = rd.from_arrow(t).repartition(64).materialize()
    t0 = time.perf_counter()
    out = transition_counts(ds).to_pandas()
    dt = time.perf_counter() - t0
    users_seen = len(np.unique(t.column("user_id").to_numpy()))
    assert int(out["n"].sum()) == n - users_seen, \
        (int(out["n"].sum()), n - users_seen)
    assert len(out) == 25
    return {"soak": "transitions", "n_events": n, "n_users": users_seen,
            "matrix_rows": int(len(out)), "wall_s": round(dt, 1)}




def soak_kmeans(n: int = 2_000_000, dim: int = 64) -> dict:
    import ray.data as rd

    from wikilinks_ray.ops.cluster import kmeans_int

    _init()
    rng = np.random.default_rng(31)
    # 8 planted gaussian blobs so the clustering is non-trivial
    centers = rng.normal(0, 1.0, (8, dim)).astype(np.float32)
    shards = []
    per = n // 16
    for s in range(16):
        lab = rng.integers(0, 8, per)
        X = (centers[lab] + rng.normal(0, 0.3, (per, dim))) \
            .astype(np.float32)
        shards.append(pa.table({
            "vec_id": pa.array(np.arange(s * per, (s + 1) * per,
                                         dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
        }))
    ds = rd.from_arrow(shards).materialize()
    t0 = time.perf_counter()
    out = kmeans_int(ds, k=8, iters=4)
    sizes = out.to_pandas()["cluster"].value_counts()
    dt = time.perf_counter() - t0
    return {"soak": "kmeans", "n_vectors": int(per * 16), "dim": dim,
            "k": 8, "iters": 4, "n_clusters_used": int(len(sizes)),
            "largest_cluster": int(sizes.max()), "wall_s": round(dt, 1)}


def soak_covisit(n: int = 10_000_000) -> dict:
    import ray.data as rd

    from wikilinks_ray.ops.covisit import covisitation_pairs

    _init()
    rng = np.random.default_rng(37)
    n_users, n_items = 500_000, 10_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, n_users, n)),
        "props": pa.array([f'{{"k": {i}}}' for i in
                           rng.zipf(1.3, n) % n_items]),
    })
    ds = rd.from_arrow(t).repartition(64).materialize()
    t0 = time.perf_counter()
    out = covisitation_pairs(ds, min_users=5, max_items_per_user=100)
    n_pairs = out.count()
    dt = time.perf_counter() - t0
    return {"soak": "covisitation", "n_events": n, "n_users": n_users,
            "n_items": n_items, "pairs_kept": int(n_pairs),
            "wall_s": round(dt, 1)}


def soak_dau(n: int = 20_000_000) -> dict:
    import ray.data as rd

    from wikilinks_ray.ops.windows import rolling_active_users

    _init()
    rng = np.random.default_rng(43)
    n_users = 2_000_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, n_users, n)),
        "ts": pa.array(rng.integers(0, 365 * 86_400 * 10**6, n),
                       pa.timestamp("us")),
    })
    ds = rd.from_arrow(t).repartition(64).materialize()
    t0 = time.perf_counter()
    out = rolling_active_users(ds, window_days=7)
    dt = time.perf_counter() - t0
    assert len(out) == 365 and (out["wau"] >= out["dau"]).all()
    return {"soak": "rolling_dau", "n_events": n, "n_users": n_users,
            "days": int(len(out)), "mean_dau": int(out["dau"].mean()),
            "mean_wau": int(out["wau"].mean()), "wall_s": round(dt, 1)}


def main():
    stage = "all"
    names = ("mst", "interval", "transitions", "kmeans", "covisit",
             "dau", "all")
    for a in sys.argv[1:]:
        if a.startswith("--stage"):
            stage = a.split("=", 1)[-1] if "=" in a else "all"
        elif a in names:
            stage = a
    if stage in ("mst", "all"):
        print(json.dumps(soak_mst()))
    if stage in ("interval", "all"):
        print(json.dumps(soak_interval()))
    if stage in ("transitions", "all"):
        print(json.dumps(soak_transitions()))
    if stage in ("kmeans", "all"):
        print(json.dumps(soak_kmeans()))
    if stage in ("covisit", "all"):
        print(json.dumps(soak_covisit()))
    if stage in ("dau", "all"):
        print(json.dumps(soak_dau()))
    ray.shutdown()


if __name__ == "__main__":
    main()
