"""Round-5 gate soak: the two size-gated routes added this round, at
4M-doc scale, BOTH legs each — timing + identical-output assertion.

1. ``near_dup_clusters``: broadcast hook+jump leg vs the forced
   components fallback (``broadcast_limit=0``) over the same synthetic
   pair graph (~55% of docs appear in a pair; power-law-ish cluster
   shapes: long chains, stars, and 2-cliques — the shapes hook+jump and
   hash-min components converge on differently, so identical output is
   a real check, not an echo).
2. ``_finalize_topk``: driver lexsort leg vs the forced cluster
   grouped_topk leg (``driver_merge_limit=0``) over the same
   4M x 64 embedding scan, Q queries, k=10.

Deterministic (seeded numpy); prints one JSON line per soak.

Usage: python tools/soak_r5.py [n_docs] [--stage clusters|topk|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
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


def synth_pairs(n_docs: int, seed: int = 5):
    """Synthetic near-dup pair table: ~0.55*n_docs member vertices in
    chains (60%), stars (30%), and 2-cliques (10%)."""
    rng = np.random.default_rng(seed)
    members = rng.choice(n_docs, size=int(n_docs * 0.55), replace=False)
    members = members.astype(np.int64)
    n = len(members)
    a_parts, b_parts = [], []
    # chains of length 32 over the first 60%
    c = members[: int(n * 0.6)]
    c = c[: len(c) - len(c) % 32].reshape(-1, 32)
    a_parts.append(c[:, :-1].ravel())
    b_parts.append(c[:, 1:].ravel())
    # stars of degree 15 over the next 30%
    s = members[int(n * 0.6): int(n * 0.9)]
    s = s[: len(s) - len(s) % 16].reshape(-1, 16)
    a_parts.append(np.repeat(s[:, 0], 15))
    b_parts.append(s[:, 1:].ravel())
    # 2-cliques over the tail
    q = members[int(n * 0.9):]
    q = q[: len(q) - len(q) % 2].reshape(-1, 2)
    a_parts.append(q[:, 0])
    b_parts.append(q[:, 1])
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64())})


def soak_clusters(n_docs: int) -> dict:
    import ray.data as rd

    from wikilinks_ray.ops.dedup import near_dup_clusters

    pairs_t = synth_pairs(n_docs)
    docs = rd.range(n_docs).map_batches(
        lambda t: pa.table({"doc_id": t.column("id")}),
        batch_format="pyarrow").materialize()
    pairs = rd.from_arrow(pairs_t).repartition(32).materialize()
    out = {"soak": "near_dup_clusters", "n_docs": n_docs,
           "n_pairs": pairs_t.num_rows}

    t0 = time.perf_counter()
    broad = near_dup_clusters(docs, pairs=pairs).materialize()
    out["broadcast_leg_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    fall = near_dup_clusters(docs, pairs=pairs, broadcast_limit=0,
                             num_partitions=16).materialize()
    out["components_leg_s"] = round(time.perf_counter() - t0, 1)

    def key(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return df["doc_id"].to_numpy(), df["cluster"].to_numpy()

    (bi, bc), (fi, fc) = key(broad), key(fall)
    assert np.array_equal(bi, fi) and np.array_equal(bc, fc), \
        "cluster assignments differ between legs"
    out["identical"] = True
    out["n_clusters"] = int(len(np.unique(bc)))
    return out


def soak_topk(n_docs: int, dim: int = 64, n_queries: int = 64,
              k: int = 10) -> dict:
    import ray.data as rd

    from wikilinks_ray.ops import similarity as sim

    n_shards = 32
    per = n_docs // n_shards

    def gen(t: pa.Table) -> pa.Table:
        lo = int(t.column("id")[0].as_py()) * per
        rng = np.random.default_rng(100 + lo)
        M = rng.standard_normal((per, dim)).astype(np.float64)
        flat = pa.array(M.ravel(), pa.float64())
        return pa.table({
            "vec_id": pa.array(np.arange(lo, lo + per), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(flat, dim),
        })

    emb = rd.range(n_shards).repartition(n_shards).map_batches(
        gen, batch_format="pyarrow").materialize()
    rng = np.random.default_rng(9)
    queries = rng.standard_normal((n_queries, dim))
    out = {"soak": "ann_topk", "n_vectors": n_docs, "dim": dim,
           "n_queries": n_queries, "k": k}

    t0 = time.perf_counter()
    small = sim.brute_force_top_k(emb, queries, k=k)
    out["driver_leg_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    big = sim.brute_force_top_k(emb, queries, k=k, driver_merge_limit=0)
    out["cluster_leg_s"] = round(time.perf_counter() - t0, 1)
    assert small.equals(big), "top-k results differ between legs"
    out["identical"] = True
    return out


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 4_000_000
    stage = sys.argv[sys.argv.index("--stage") + 1] \
        if "--stage" in sys.argv else "all"
    _init()
    if stage in ("clusters", "all"):
        print(json.dumps(soak_clusters(n_docs)), flush=True)
    if stage in ("topk", "all"):
        print(json.dumps(soak_topk(n_docs)), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
