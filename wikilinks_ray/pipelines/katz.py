"""Distributed Katz centrality in scaled integer arithmetic.

No reference implementation (the reference's envelope is ingest + BFS,
SURVEY.md §2.12); same CSR shard-actor skeleton as PageRank/HITS. Per
superstep::

    S[v]   = sum over u->v of x[u]          (forward scatter, denom=1)
    x'[v]  = scale + S[v] // a_den          (beta = 1, alpha = 1/a_den)

with ``a_den = max_in_degree + 1`` — the attenuation factor is pinned
BELOW the spectral radius bound (lambda_max <= max in-degree for a
nonnegative matrix), so the fixed-iteration series is contracting by
construction on every input. All arithmetic is order-independent int64
(the scatter partials sum per dst range, floor-divide once in the
reducer), so a DuckDB re-derivation (unrolled CTE chain in
``__ray_entry__._katz_oracle_sql``) reproduces the result bit-for-bit.

Bounds (why this cannot overflow int64): x_0 = scale and
x' <= scale + max_x * (a_den-1)/a_den < scale + max_x, so
x_k < (k+1)*scale; the reducer's incoming sum is
<= max_in_degree * (iters+1) * scale — at scale=10^9, 10 iterations
and a 10^8-in-degree hub that is ~1.1e18, inside int64 with headroom.
An assert in the reducer guards the envelope anyway.

Transport: P x P per-range partials per superstep (the PageRank
combiner exchange — a hub dst receives P pre-summed partials regardless
of in-degree) plus ONE extra unit-scatter superstep up front to compute
the max in-degree (the same exchange with x == 1, reduced to one scalar
per range; O(P) ints to the driver).
"""

from __future__ import annotations

import numpy as np

import ray

from ..state.csr import accum_sum, vertex_ranges


@ray.remote
def _reduce_indeg(q_size: int, *partials) -> int:
    """Max in-degree within one dst range (partials of a unit scatter)."""
    acc = np.zeros(q_size, dtype=np.int64)
    for p in partials:
        accum_sum(acc, p)
    return int(acc.max()) if q_size else 0


@ray.remote
def _reduce_katz_int(q_size: int, scale: int, a_den: int,
                     *partials) -> np.ndarray:
    acc = np.zeros(q_size, dtype=np.int64)
    for p in partials:
        accum_sum(acc, p)
    assert acc.max(initial=0) <= (1 << 62), \
        "Katz sum approaching int64; lower scale or iters"
    return scale + acc // a_den


def _unit_scatter(actors: list, chunk_refs: list, sizes: list) -> list:
    """One forward scatter of the given chunks (denom=1); returns the
    P x P partial grid indexed [src_shard][dst_range]."""
    P = len(actors)
    scatter = []
    for p, a in enumerate(actors):
        s = a.scatter_sum_int.options(
            num_returns=P if P > 1 else 1).remote(chunk_refs[p], 1)
        scatter.append(s if P > 1 else [s])
    return scatter


def max_in_degree(actors: list, n_vertices: int) -> int:
    """Distributed max in-degree via one unit scatter (x == 1)."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    ones = [ray.put(np.ones(sizes[p], dtype=np.int64)) for p in range(P)]
    scatter = _unit_scatter(actors, ones, sizes)
    maxes = ray.get([_reduce_indeg.remote(
        sizes[q], *[scatter[p][q] for p in range(P)]) for q in range(P)])
    return max(maxes) if maxes else 0


def katz_int(actors: list, n_vertices: int, *, iters: int = 10,
             scale: int = 10**9, a_den: int | None = None) -> np.ndarray:
    """Fixed-iteration Katz centrality, scaled int64 — EXACT-match twin
    of the ``graph_katz`` DuckDB oracle. Returns the dense scaled array
    (int64, length ``n_vertices``).

    ``a_den``: attenuation denominator (alpha = 1/a_den); defaults to
    ``max_in_degree + 1`` computed by one extra distributed superstep.
    """
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    if a_den is None:
        a_den = max_in_degree(actors, n_vertices) + 1
    chunk_refs = [ray.put(np.full(sizes[p], scale, dtype=np.int64))
                  for p in range(P)]
    for _ in range(iters):
        scatter = _unit_scatter(actors, chunk_refs, sizes)
        chunk_refs = [
            _reduce_katz_int.remote(
                sizes[q], scale, a_den,
                *[scatter[p][q] for p in range(P)])
            for q in range(P)
        ]
    chunks = ray.get(chunk_refs)
    return np.concatenate(chunks) if chunks else np.empty(0, np.int64)
