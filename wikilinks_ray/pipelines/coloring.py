"""Distributed graph coloring: iterated Luby MIS.

No reference implementation (SURVEY.md §2.12). The classic reduction
(Luby 1986; Jones & Plassmann 1993 greedy variants): color class c is a
maximal independent set of the subgraph induced on still-uncolored
vertices, repeated until none remain. Proper by construction (a color
class is independent), and uses at most Δ+1 colors: a vertex left
uncolored after a round has, by maximality, a neighbor in that round's
class, and those neighbors are distinct per round — so v is colored by
round deg(v)+1.

Each class reuses :func:`pipelines.mis.maximal_independent_set` on the
same symmetrized self-loop-free shard actors with an ``init_active``
mask (induced subgraph) and a shifted hash offset (fresh priorities per
class). Per-range uncolored masks stay in the object store; the driver
holds only the final O(n) color vector (per-vertex output is inherently
O(n), same as every label query).

Scale caveat: total supersteps are O(#colors · log n), and #colors
tracks the max degree — on hub-heavy web graphs (Δ in the 10^5+ range)
prefer Jones–Plassmann style priority coloring (each vertex colors
itself once all higher-priority neighbors have, O(log n) expected
rounds total) before running this at full-graph scale; this
implementation is the right shape for bounded-degree graphs and
per-partition scheduling problems.
"""

from __future__ import annotations

import numpy as np

import ray

from ..state.csr import vertex_ranges
from .mis import maximal_independent_set


@ray.remote
def _clear_ids(lo: int, hi: int, mask: np.ndarray, ids: np.ndarray
               ) -> np.ndarray:
    own = ids[(ids >= lo) & (ids < hi)] - lo
    out = mask.copy()
    out[own] = False
    return out


def luby_coloring(actors: list, n_vertices: int, *, max_colors: int = 4096
                  ) -> tuple[np.ndarray, int]:
    """(color int64[n] with -1 never assigned at ``max_colors``, number
    of colors used). ``actors`` must serve the symmetrized
    self-loop-free adjacency (as for MIS)."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    uncolored = [ray.put(np.ones(sizes[p], dtype=bool)) for p in range(P)]
    color = np.full(n_vertices, -1, dtype=np.int64)
    remaining = n_vertices
    c = 0
    while remaining > 0 and c < max_colors:
        ids, _rounds, done = maximal_independent_set(
            actors, n_vertices, init_active=uncolored,
            key_offset=(c + 1) * 1009)
        assert done, "MIS exhausted its round budget without converging"
        color[ids] = c
        ids_ref = ray.put(ids)
        uncolored = [_clear_ids.remote(int(bounds[p]), int(bounds[p + 1]),
                                       uncolored[p], ids_ref)
                     for p in range(P)]
        remaining -= len(ids)
        c += 1
    return color, c
