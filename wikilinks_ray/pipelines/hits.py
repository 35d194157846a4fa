"""Distributed HITS (hubs & authorities) in scaled integer arithmetic.

No reference implementation exists (the reference's envelope is ingest +
BFS, SURVEY.md §2.12); like PageRank this reuses the CSR shard-actor
skeleton at partition granularity. Per iteration two half-supersteps::

    a_un[v] = sum over u->v of h[u] // h_denom     (forward scatter)
    a_denom = max(1, sum(a_un) // scale)
    h_un[u] = sum over u->v of a_un[v] // a_denom  (reverse scatter)
    h_denom = max(1, sum(h_un) // scale)

i.e. Kleinberg's alternating A^T h / A a with SUM normalization instead
of L2 — the normalizer is a floor-divided scalar, so every operation is
order-independent int64 arithmetic and a DuckDB re-derivation (unrolled
CTE chain in ``__ray_entry__._hits_oracle_sql``) reproduces the result
bit-for-bit. Sum normalization has the same fixpoint direction as L2
(both are scalar rescalings of the power iteration on A^T A / A A^T);
the scaled-integer form is the frozen spec here, pinned by the driver
oracle and a dense pytest twin.

Transport is the same combiner exchange as PageRank: each half-step
moves P x P per-range partials (dense or sparse via ``pack_partial``),
never O(E) rows, and the normalizing denominators are single scalars on
the driver — O(P) ints per half-step, no rank-sized driver state.
"""

from __future__ import annotations

import numpy as np

import ray

from ..state.csr import accum_sum, vertex_ranges


@ray.remote(num_returns=2)
def _reduce_sum_int(q_size: int, *partials) -> tuple[np.ndarray, int]:
    """Sum P per-shard partials for one dst range; second return is the
    chunk total so the driver can form the normalizing denominator from
    P scalars instead of pulling the chunks."""
    acc = np.zeros(q_size, dtype=np.int64)
    for p in partials:
        accum_sum(acc, p)
    return acc, int(acc.sum())


def _half_step(actors: list, chunk_refs: list, denom: int, sizes: list,
               scale: int) -> tuple[list, int]:
    P = len(actors)
    scatter = []
    for p, a in enumerate(actors):
        s = a.scatter_sum_int.options(
            num_returns=P if P > 1 else 1).remote(chunk_refs[p], denom)
        scatter.append(s if P > 1 else [s])
    red = [_reduce_sum_int.remote(sizes[q],
                                  *[scatter[p][q] for p in range(P)])
           for q in range(P)]
    out_refs = [r[0] for r in red]
    total = sum(ray.get([r[1] for r in red]))
    return out_refs, max(1, total // scale)


def hits_int(fwd_actors: list, rev_actors: list, n_vertices: int, *,
             iters: int = 10, scale: int = 10**9
             ) -> tuple[np.ndarray, np.ndarray]:
    """Run ``iters`` HITS iterations; returns the final
    (authority_scaled, hub_scaled) int64 arrays (values normalized to
    sum ~= ``scale``).

    ``fwd_actors`` / ``rev_actors`` are CSR shard pools over the same
    ``vertex_ranges(n_vertices, P)`` (forward = by-src shards, reverse =
    by-dst shards), so range q's authority chunk is exactly reverse
    actor q's owned range — chunks flow between pools without
    re-partitioning. ``scale`` defaults to 10^9 (not PageRank's 10^12):
    unnormalized sums reach max_degree x scale and must stay within
    int64 with slack.
    """
    P = len(fwd_actors)
    if len(rev_actors) != P:
        raise ValueError("fwd and rev pools must have equal size "
                         f"({P} != {len(rev_actors)})")
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    h_refs = [ray.put(np.full(sizes[p], scale, dtype=np.int64))
              for p in range(P)]
    h_denom = 1
    a_refs, a_denom = [], 1
    for _ in range(iters):
        a_refs, a_denom = _half_step(fwd_actors, h_refs, h_denom, sizes,
                                     scale)
        h_refs, h_denom = _half_step(rev_actors, a_refs, a_denom, sizes,
                                     scale)
    auth = np.concatenate([c // a_denom for c in ray.get(a_refs)]) \
        if a_refs else np.empty(0, np.int64)
    hub = np.concatenate([c // h_denom for c in ray.get(h_refs)]) \
        if h_refs else np.empty(0, np.int64)
    return auth, hub
