"""Distributed PageRank: power iteration with dangling-mass correction.

No reference implementation exists (the reference's envelope is ingest +
BFS, SURVEY.md §2.12); this reuses its CSR skeleton (WikiRoutes.kt:201-226)
at partition granularity. Per superstep:

1. each ``CSRShardActor`` p computes the *combined* (dst, rank/deg)
   messages for its src range as P dense per-dst-range partial arrays
   (``scatter``) — the map-side pre-aggregation of the groupby(dst).sum
   shuffle, so the exchange moves O(P·n) floats, never O(E) rows;
2. each actor reports its local dangling rank mass (out_deg == 0);
3. one reducer task per dst range sums its P partials and applies
       r' = (1-d)/n + d * (partials + dangling_mass/n)
   (uniform-teleport power iteration with dangling correction);
4. the driver sums per-range L1 deltas; converged when < tol.

All rank state lives in the object store as per-range chunks (refs),
never materialized whole on the driver (``collect=False``). Every
superstep checkpoints per-partition chunks + a manifest (lineage +
metrics), and ``resume=True`` continues from the newest complete
iteration (state/checkpoint.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import ray

from ..state.checkpoint import latest_checkpoint, save_checkpoint
from ..state.csr import accum_sum, vertex_ranges


@ray.remote
def _reduce_rank(q_size: int, d: float, n: int, n_shards: int,
                 old_chunk: np.ndarray, *dangling_and_partials
                 ) -> tuple[np.ndarray, float]:
    """``dangling_and_partials`` = P per-shard dangling masses followed
    by P per-shard partial arrays. Summing the dangling scalars HERE
    (they arrive as resolved args) instead of on the driver removes a
    full driver round-trip per superstep: reducers submit immediately
    after the scatters and the driver only synchronizes on the deltas."""
    dangling_mass = float(sum(dangling_and_partials[:n_shards]))
    acc = np.zeros(q_size, dtype=np.float64)
    for p in dangling_and_partials[n_shards:]:
        accum_sum(acc, p)
    new = (1.0 - d) / n + d * (acc + dangling_mass / n)
    return new, float(np.abs(new - old_chunk).sum())


@ray.remote
def _reduce_rank_int(q_size: int, n: int, n_shards: int, scale: int,
                     *dangling_and_partials) -> np.ndarray:
    dangling = int(sum(dangling_and_partials[:n_shards]))
    acc = np.zeros(q_size, dtype=np.int64)
    for p in dangling_and_partials[n_shards:]:
        accum_sum(acc, p)
    base = (15 * scale) // (100 * n)
    return base + (85 * (acc + dangling // n)) // 100


def weighted_pagerank_int(actors: list, n_vertices: int, *,
                          iters: int = 20, scale: int = 10**12
                          ) -> np.ndarray:
    """Fixed-iteration WEIGHTED PageRank in scaled int64 arithmetic over
    weight-carrying CSR shards (``shard_edges(weight_col=...)``): each
    edge contributes ``(r[u] * w_e) // W[u]`` with ``W[u]`` the total
    out-weight, dangling = zero-out-weight mass, teleport uniform. The
    natural rank for a host graph, where contracted edge weights are
    link multiplicities. Same reducer as :func:`pagerank_int` — only the
    scatter differs (``scatter_weighted_int``)."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    chunk_refs = [ray.put(np.full(sizes[p], scale // n_vertices,
                                  dtype=np.int64)) for p in range(P)]
    for _ in range(iters):
        scatter = [a.scatter_weighted_int.options(
            num_returns=P + 1).remote(chunk_refs[p])
            for p, a in enumerate(actors)]
        dangling_refs = [s[P] for s in scatter]
        chunk_refs = [
            _reduce_rank_int.remote(
                sizes[q], n_vertices, P, scale,
                *dangling_refs, *[scatter[p][q] for p in range(P)])
            for q in range(P)
        ]
    chunks = ray.get(chunk_refs)
    return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


@ray.remote
def _reduce_ppr_int(q_size: int, n_seeds: int, n_shards: int, scale: int,
                    seed_idx: np.ndarray, *dangling_and_partials
                    ) -> np.ndarray:
    """Personalized variant of ``_reduce_rank_int``: teleport AND
    dangling mass land only on the seed set (``seed_idx`` = range-local
    offsets of seeds inside this dst range), everything else receives
    pure link mass. Same order-independent int64 arithmetic."""
    dangling = int(sum(dangling_and_partials[:n_shards]))
    acc = np.zeros(q_size, dtype=np.int64)
    for p in dangling_and_partials[n_shards:]:
        accum_sum(acc, p)
    out = (85 * acc) // 100
    if len(seed_idx):
        base = (15 * scale) // (100 * n_seeds)
        out[seed_idx] = base + (85 * (acc[seed_idx]
                                      + dangling // n_seeds)) // 100
    return out


def personalized_pagerank_int(actors: list, n_vertices: int,
                              seeds: np.ndarray, *, iters: int = 20,
                              scale: int = 10**12) -> np.ndarray:
    """Fixed-iteration personalized PageRank (random walk with restart
    to a seed set) in scaled int64 arithmetic. Per superstep::

        c[u]  = r[u] // out_deg[u]
        D     = sum(r[u] for out_deg[u] == 0)
        r'[v] = [v in S] * ( (15*scale) // (100*|S|)
                             + (85 * (S_in[v] + D // |S|)) // 100 )
              + [v not in S] * (85 * S_in[v]) // 100

    i.e. the uniform-teleport terms of :func:`pagerank_int` restricted
    to the seed set — the standard RWR formulation. Reuses the exact
    same ``scatter_int`` combiner exchange (the scatter side is
    personalization-agnostic); only the reducer differs. Every op is
    order-independent integer arithmetic, so the DuckDB oracle
    (``__ray_entry__._ppr_oracle_sql``) reproduces identical integers.

    ``seeds`` must be unique vertex ids in ``[0, n_vertices)``.
    """
    P = len(actors)
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    n_s = len(seeds)
    if n_s == 0:
        raise ValueError("personalized PageRank needs a non-empty seed set")
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    r0 = [np.zeros(sizes[p], dtype=np.int64) for p in range(P)]
    seed_idx_refs = []
    for p in range(P):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        local = seeds[(seeds >= lo) & (seeds < hi)] - lo
        r0[p][local] = scale // n_s
        seed_idx_refs.append(ray.put(local))
    chunk_refs = [ray.put(c) for c in r0]
    for _ in range(iters):
        scatter = [a.scatter_int.options(num_returns=P + 1).remote(chunk_refs[p])
                   for p, a in enumerate(actors)]
        dangling_refs = [s[P] for s in scatter]
        chunk_refs = [
            _reduce_ppr_int.remote(
                sizes[q], n_s, P, scale, seed_idx_refs[q],
                *dangling_refs, *[scatter[p][q] for p in range(P)])
            for q in range(P)
        ]
    chunks = ray.get(chunk_refs)
    return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


def pagerank_int(actors: list, n_vertices: int, *, iters: int = 20,
                 scale: int = 10**12) -> np.ndarray:
    """Fixed-iteration PageRank in scaled int64 arithmetic — the
    EXACT-match oracle twin of :func:`pagerank` (damping fixed at
    85/100, uniform teleport, dangling correction). Per superstep::

        c[u]  = r[u] // out_deg[u]            (contributions, floor)
        D     = sum(r[u] for out_deg[u] == 0) (dangling mass)
        r'[v] = (15*scale) // (100*n) + (85 * (S[v] + D // n)) // 100

    with S[v] the int64 sum of incoming contributions. Every operation
    is order-independent integer arithmetic, so a DuckDB re-derivation
    (unrolled CTE chain in ``__ray_entry__.oracle_sql``) reproduces the
    result bit-for-bit — upgrading the distributed combiner exchange
    from an allclose pytest to a value-hash driver oracle. The float
    path stays the production spec (tol-based convergence).

    Returns the dense scaled-rank array (int64, length ``n_vertices``).
    """
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    chunk_refs = [ray.put(np.full(sizes[p], scale // n_vertices,
                                  dtype=np.int64)) for p in range(P)]
    for _ in range(iters):
        scatter = [a.scatter_int.options(num_returns=P + 1).remote(chunk_refs[p])
                   for p, a in enumerate(actors)]
        dangling_refs = [s[P] for s in scatter]
        chunk_refs = [
            _reduce_rank_int.remote(
                sizes[q], n_vertices, P, scale,
                *dangling_refs, *[scatter[p][q] for p in range(P)])
            for q in range(P)
        ]
    chunks = ray.get(chunk_refs)
    return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


@dataclass
class PageRankResult:
    ranks: list  # per-range chunk refs (or ndarrays if collected)
    bounds: np.ndarray
    iterations: int
    delta: float
    converged: bool
    metrics_history: list[dict] = field(default_factory=list)

    def to_array(self) -> np.ndarray:
        chunks = [c if isinstance(c, np.ndarray) else ray.get(c) for c in self.ranks]
        return np.concatenate(chunks) if chunks else np.empty(0)


def pagerank(
    actors: list,
    n_vertices: int,
    *,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = True,
) -> PageRankResult:
    """Run PageRank over pre-built CSR shard actors (state/csr.py).

    ``tol`` is the L1 convergence threshold; 1e-10 comfortably exceeds
    the north-rule's allclose(1e-6) per-vertex match vs the oracle.

    Pool sizing: supersteps are compute-parallel up to ~half the node's
    cores, then the P x P partial exchange dominates — measured
    GTEPS on a 4M-vertex / 40M-edge graph on a 32-core node: P=8 0.041,
    **P=16 0.117**, P=24 0.023, P=32 0.009 with dense partials. Shard
    analytics pools to ~cores/2 per node, leaving headroom for the
    per-range reducers. Round 3's sparse partial transport
    (state/csr.py pack_partial) flattens the wide-pool cliff — P=32
    measured 3.6x faster than forced-dense in an interleaved A/B
    (BASELINE.md) — so over-wide pools degrade gently instead of
    quadratically.
    """
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]

    start_iter = 0
    history: list[dict] = []
    chunk_refs = None
    if resume and checkpoint_dir:
        ck = latest_checkpoint(checkpoint_dir)
        if ck is not None:
            start_iter, chunks, m = ck
            history = m.get("history", [])
            delta0 = float(m.get("delta", float("inf")))
            chunk_refs = [ray.put(c) for c in chunks]
    if chunk_refs is None:
        delta0 = float("inf")
        init = 1.0 / n_vertices
        chunk_refs = [ray.put(np.full(sizes[p], init, dtype=np.float64)) for p in range(P)]

    delta = delta0  # resumed-from-converged runs report honestly
    it = start_iter
    while it < max_iter and delta >= tol:
        it += 1
        t0 = time.perf_counter()
        scatter = [a.scatter.options(num_returns=P + 1).remote(chunk_refs[p])
                   for p, a in enumerate(actors)]
        dangling_refs = [s[P] for s in scatter]
        out = [
            _reduce_rank.options(num_returns=2).remote(
                sizes[q], damping, n_vertices, P, chunk_refs[q],
                *dangling_refs, *[scatter[p][q] for p in range(P)],
            )
            for q in range(P)
        ]
        new_refs = [o[0] for o in out]
        delta = float(sum(ray.get([o[1] for o in out])))
        dangling = float(sum(ray.get(dangling_refs)))  # resolved, free
        chunk_refs = new_refs
        wall = time.perf_counter() - t0
        history.append({"iteration": it, "delta": delta,
                        "dangling_mass": dangling, "sec": round(wall, 4)})
        if checkpoint_dir and (it % checkpoint_every == 0 or delta < tol):
            save_checkpoint(checkpoint_dir, it, ray.get(chunk_refs),
                            {"history": history, "delta": delta})

    return PageRankResult(
        ranks=chunk_refs,
        bounds=bounds,
        iterations=it,
        delta=delta,
        converged=delta < tol,
        metrics_history=history,
    )
