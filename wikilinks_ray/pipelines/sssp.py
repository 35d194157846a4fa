"""Weighted single-source shortest paths: Bellman-Ford min-plus
supersteps over CSR shard actors.

No reference implementation (the reference's route engine is unweighted
BFS, WikiRoutes.kt:102-124; SURVEY.md §2.12 names weighted paths as an
engine-completeness hole). The superstep IS the connected-components
skeleton with the tropical semiring swapped in: instead of
``min(label[src])`` each dst takes ``min(dist[src] + w_e)``
(``CSRShardActor.min_plus_push``), reduced per dst range with
``new = min(old, candidates)``. Converges when no distance changes —
Bellman-Ford, bounded by the hop depth of the shortest-path tree.

All arithmetic is int64 with the ``SSSP_INF = 2^62`` unreached
sentinel, so every superstep is order-independent and bit-reproducible
by an unrolled SQL relaxation (``__ray_entry__``'s graph_sssp oracle).
Distance state lives as per-range object-store chunks; the driver only
ever sees per-range changed counts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import ray

from ..state.csr import vertex_ranges
from .components import _reduce_min_frontier

SSSP_INF = 1 << 62


@dataclass
class SSSPResult:
    distances: np.ndarray  # int64[n]; SSSP_INF = unreached
    iterations: int
    converged: bool


def sssp_int(
    actors: list,
    n_vertices: int,
    source: int,
    *,
    weighted: bool = True,
    max_iter: int = 10_000,
) -> SSSPResult:
    """Single-source shortest paths over pre-built CSR shard actors.

    ``weighted=True`` needs shards written with
    ``shard_edges(weight_col=...)`` (positive int64 weights);
    ``weighted=False`` computes hop counts (= BFS distances, which the
    dedicated frontier BFS in pipelines/bfs.py does with O(frontier)
    work per level — this dense path exists for the weighted case and
    as its differential oracle).
    """
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    chunk_refs = []
    for p in range(P):
        c = np.full(int(bounds[p + 1] - bounds[p]), SSSP_INF, dtype=np.int64)
        if bounds[p] <= source < bounds[p + 1]:
            c[source - bounds[p]] = 0
        chunk_refs.append(ray.put(c))

    changed = -1
    changed_refs = [None] * P  # full relaxation on the first superstep,
    # then only out-edges of improved vertices (Bellman-Ford queue form)
    it = 0
    while it < max_iter and changed != 0:
        it += 1
        if P > 1:
            push = [a.min_plus_push.options(num_returns=P)
                     .remote(chunk_refs[p], weighted, changed_refs[p])
                    for p, a in enumerate(actors)]
        else:
            push = [[a.min_plus_push.remote(chunk_refs[p], weighted,
                                            changed_refs[p])]
                    for p, a in enumerate(actors)]
        out = [
            _reduce_min_frontier.remote(
                chunk_refs[q], *[push[p][q] for p in range(P)])
            for q in range(P)
        ]
        chunk_refs = [o[0] for o in out]
        changed_refs = [o[2] for o in out]
        changed = int(sum(ray.get([o[1] for o in out])))

    chunks = ray.get(chunk_refs)
    dist = np.concatenate(chunks) if chunks else np.empty(0, np.int64)
    return SSSPResult(distances=dist, iterations=it, converged=changed == 0)
