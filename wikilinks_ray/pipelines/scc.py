"""Strongly connected components: distributed coloring algorithm.

No reference implementation (SURVEY.md §2.12; the reference's
redirect-loop elimination is the 1-cycle special case). Tarjan is
inherently sequential, so this uses the classic parallel COLORING
scheme (Orzan 2004; the FW-BW family): repeat until every vertex is
assigned —

1. **Forward max-coloring fixpoint** over active vertices:
   ``color(v) = max id u (active) with u ->* v`` — max-label
   propagation via ``CSRShardActor.max_push`` (min_push's mirror);
   inactive vertices are masked to int64-min so they never win.
2. **Pivots**: vertices with ``color(v) == v`` (one per color class).
   Each pivot's SCC is exactly ``{v in class c : v ->* c}``.
3. **Backward constrained BFS** from all pivots simultaneously over the
   REVERSE shards (``bfs_expand`` with sid = pivot color), accepting a
   candidate only while active, unassigned and in the same color class.
   Accepted vertices take ``scc = pivot`` and deactivate.

Every discovered SCC label is the MAX member id (the pivot); callers
wanting canonical min-member labels relabel the (vertex, pivot) pairs —
an O(#SCC) group-min (``min_relabel``).

State (color / active / scc arrays) lives as per-range object-store
chunks; the driver sees per-range change counts only. Worst case the
outer loop runs O(#SCC) rounds (chain graphs), typical web graphs
finish in a handful — same envelope as published FW-BW/coloring
implementations.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import ray

from ..state.csr import accum_max, vertex_ranges

_NEG_INF = np.iinfo(np.int64).min


@ray.remote
def _mask_inactive(color: np.ndarray, active: np.ndarray) -> np.ndarray:
    return np.where(active, color, _NEG_INF)


@ray.remote(num_returns=3)
def _reduce_color(old: np.ndarray, active: np.ndarray, *candidates):
    """(new colors, changed count, changed mask). The mask feeds the
    next iteration's frontier push — only vertices whose color grew
    re-push (exact under the idempotent max-merge)."""
    acc = old.copy()
    for c in candidates:
        accum_max(acc, c)
    acc[~active] = old[~active]
    changed = acc != old
    return acc, int(changed.sum()), changed


@ray.remote(num_returns=4)
def _pivot_init(lo: int, scc: np.ndarray, color: np.ndarray,
                active: np.ndarray):
    """Assign pivots (color == own id) and seed the backward frontier."""
    idx = np.flatnonzero(active & (color == np.arange(
        lo, lo + len(color), dtype=np.int64)))
    scc_new = scc.copy()
    scc_new[idx] = idx + lo
    return scc_new, idx + lo, idx + lo, len(idx)


@ray.remote(num_returns=4)
def _scc_accept(lo: int, scc: np.ndarray, color: np.ndarray,
                active: np.ndarray, *candidates):
    """Backward-BFS reducer: accept (dst, sid) candidates that are
    active, unassigned and in color class sid; they join SCC sid and
    form the next frontier chunk."""
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    ss = [c[2] for c in candidates if c is not None and len(c[0])]
    empty = np.empty(0, np.int64)
    if not ds:
        return scc, empty, empty, 0
    d = np.concatenate(ds) - lo
    s = np.concatenate(ss)
    keep = active[d] & (scc[d] < 0) & (color[d] == s)
    d, s = d[keep], s[keep]
    if len(d) == 0:
        return scc, empty, empty, 0
    d, first = np.unique(d, return_index=True)
    s = s[first]
    scc_new = scc.copy()
    scc_new[d] = s
    return scc_new, d + lo, s, len(d)


@ray.remote(num_returns=3)
def _deactivate(active: np.ndarray, scc: np.ndarray):
    new_active = active & (scc < 0)
    return new_active, int(new_active.sum()), int((scc >= 0).sum())


@dataclass
class SCCResult:
    labels: list  # per-range chunk refs; label = pivot (max member) id
    bounds: np.ndarray
    rounds: int
    converged: bool = True  # False => exited at max_rounds with scc=-1
    #                          leftovers; min_relabel would fold them
    #                          into one bogus component, so assert this.

    def to_array(self) -> np.ndarray:
        chunks = [c if isinstance(c, np.ndarray) else ray.get(c)
                  for c in self.labels]
        return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


def min_relabel(labels: np.ndarray) -> np.ndarray:
    """Canonical min-member relabeling of pivot labels (vectorized
    group-min; O(n) — per-vertex output is inherently O(n))."""
    uniq, inv = np.unique(labels, return_inverse=True)
    mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(mins, inv, np.arange(len(labels), dtype=np.int64))
    return mins[inv]


def strongly_connected_components(
    fwd_actors: list,
    rev_actors: list,
    n_vertices: int,
    *,
    max_rounds: int = 1_000,
) -> SCCResult:
    """SCC labels over [0, n). ``fwd_actors`` / ``rev_actors`` must be
    range-aligned pools over the same edges (``DerivedGraph`` with
    ``reverse=True`` builds exactly this)."""
    P = len(fwd_actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    active = [ray.put(np.ones(sizes[p], dtype=bool)) for p in range(P)]
    scc = [ray.put(np.full(sizes[p], -1, dtype=np.int64)) for p in range(P)]
    remaining = n_vertices
    rounds = 0

    while remaining > 0 and rounds < max_rounds:
        rounds += 1
        # 1) forward max-coloring fixpoint
        color = [ray.put(np.arange(bounds[p], bounds[p + 1], dtype=np.int64))
                 for p in range(P)]
        changed = -1
        changed_refs = [None] * P
        while changed != 0:
            masked = [_mask_inactive.remote(color[p], active[p])
                      for p in range(P)]
            if P > 1:
                push = [a.max_push.options(num_returns=P)
                         .remote(masked[p], changed_refs[p])
                        for p, a in enumerate(fwd_actors)]
            else:
                push = [[a.max_push.remote(masked[p], changed_refs[p])]
                        for p, a in enumerate(fwd_actors)]
            out = [_reduce_color.remote(
                color[q], active[q], *[push[p][q] for p in range(P)])
                for q in range(P)]
            color = [o[0] for o in out]
            changed_refs = [o[2] for o in out]
            changed = int(sum(ray.get([o[1] for o in out])))

        # 2) pivots seed the backward frontier
        init = [_pivot_init.remote(int(bounds[q]), scc[q], color[q],
                                   active[q]) for q in range(P)]
        scc = [i[0] for i in init]
        frontier_v = [i[1] for i in init]
        frontier_s = [i[2] for i in init]
        counts = ray.get([i[3] for i in init])

        # 3) backward constrained BFS until the frontier dries up
        while sum(counts) > 0:
            live = [p for p in range(P) if counts[p]]
            if P > 1:
                expand = {p: rev_actors[p].bfs_expand.options(
                    num_returns=P).remote(frontier_v[p], frontier_s[p])
                    for p in live}
            else:
                expand = {p: [rev_actors[p].bfs_expand.remote(
                    frontier_v[p], frontier_s[p])] for p in live}
            out = [_scc_accept.remote(
                int(bounds[q]), scc[q], color[q], active[q],
                *[expand[p][q] for p in live]) for q in range(P)]
            scc = [o[0] for o in out]
            frontier_v = [o[1] for o in out]
            frontier_s = [o[2] for o in out]
            counts = ray.get([o[3] for o in out])

        # 4) deactivate assigned vertices
        upd = [_deactivate.remote(active[q], scc[q]) for q in range(P)]
        active = [u[0] for u in upd]
        remaining = int(sum(ray.get([u[1] for u in upd])))

    return SCCResult(labels=scc, bounds=bounds, rounds=rounds,
                     converged=(remaining == 0))
