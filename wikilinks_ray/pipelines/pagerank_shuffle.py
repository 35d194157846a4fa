"""PageRank in pure Ray Data operators — the un-combined
groupby-aggregate shuffle form.

Each superstep literally is the north-star sentence: a join of the rank
table against the edge table emits ``(dst, rank/deg)`` message rows,
``groupby(dst).sum()`` aggregates them, and a vectorized apply adds
damping + dangling mass. This exists as the operator-level specification
of the iteration — the actor-pool implementation (pipelines/pagerank.py)
is the production path: it holds adjacency resident across supersteps
and pre-aggregates messages per destination range inside the shard
(combiner), exchanging O(P·n) dense floats instead of shuffling O(E)
message rows per iteration. Cross-checked to agree to 1e-12 in tests.

State between iterations is one small ``(v, rank)`` table (broadcast via
``ray.put`` each superstep since |ranks| = n_vertices ≪ E; at scales
where the rank table itself cannot broadcast, use the actor path, which
keeps ranks partitioned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.agg import grouped_agg


def pagerank_shuffle(
    edges: "ray.data.Dataset",
    n_vertices: int,
    *,
    damping: float = 0.85,
    iters: int = 20,
) -> np.ndarray:
    """Fixed-iteration PageRank over an edge Dataset; returns the dense
    rank vector."""
    edges = edges.materialize()
    # out-degrees once (groupby(src).count shuffle)
    deg = np.zeros(n_vertices, dtype=np.int64)
    for r in grouped_agg(edges, ["src"], None, "count",
                         out_col="deg").take_all():
        deg[r["src"]] = r["deg"]

    ranks = np.full(n_vertices, 1.0 / n_vertices)
    for _ in range(iters):
        state = ray.put((ranks, deg))

        def messages(t: pa.Table) -> pa.Table:
            rk, dg = ray.get(state)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            return pa.table({
                "dst": pa.array(dst, pa.int64()),
                "m": pa.array(rk[src] / dg[src], pa.float64()),
            })

        summed = grouped_agg(edges.map_batches(messages, batch_format="pyarrow"),
                             ["dst"], "m", "sum", out_col="m").take_all()
        acc = np.zeros(n_vertices)
        for r in summed:
            acc[r["dst"]] = r["m"]
        dangling = ranks[deg == 0].sum()
        ranks = (1 - damping) / n_vertices + damping * (acc + dangling / n_vertices)
    return ranks
