"""Bidirectional BFS shortest-path queries (the reference's signature
operator, RouteFinder.kt:9-177).

Two frontiers expand alternately: forward over the out-edge CSR shards,
backward over the transpose (in-edge) shards — the same paired
forward/reverse adjacency the reference materializes
(outEdges/inEdges sections, SegmentWikiGraphStore.kt:100-114). Policy
mirrors the reference:

- expand the cheaper side each step; the reference yields when a parent
  map exceeds ``TOO_BIG = 2^18`` (RouteFinder.kt:26-39,72) — here the
  side with the smaller frontier expands (same intent: bound the
  expanding side);
- candidate meeting vertices are collected whenever a newly-discovered
  vertex already has a distance from the opposite search
  (RouteFinder.kt:91-93);
- BFS optimality guard: expansion continues until
  ``depth_f + depth_b >= best_total`` so the reported meeting vertex
  minimizes total steps (RouteFinder.kt:127-145), then the path splices
  the forward and backward parent chains (:146-175).

State is per-range dist/parent chunks in the object store, exactly like
pipelines/bfs.py (single-source columns here).
"""

from __future__ import annotations

import numpy as np

import ray

from ..state.csr import vertex_ranges


@ray.remote
def _bd_reduce(lo: int, level: int, dist: np.ndarray, parent: np.ndarray,
               other_dist: np.ndarray, *candidates):
    """Like bfs._bfs_reduce (single source) + reports meeting vertices:
    newly discovered vertices already reached by the opposite search.
    Candidates are ``bfs_expand`` outputs (dst, parent, sid); sid is a
    single-source placeholder and ignored."""
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    ps = [c[1] for c in candidates if c is not None and len(c[0])]
    empty = np.empty(0, np.int64)
    if not ds:
        return dist, parent, empty, 0, empty, empty
    d = np.concatenate(ds) - lo
    p = np.concatenate(ps)
    uniq, first_idx = np.unique(d, return_index=True)
    d, p = d[first_idx], p[first_idx]
    unvisited = dist[d] < 0
    d, p = d[unvisited], p[unvisited]
    if len(d) == 0:
        return dist, parent, empty, 0, empty, empty
    dist = dist.copy()
    parent = parent.copy()
    dist[d] = level
    parent[d] = p
    meet = d[other_dist[d] >= 0]
    return (dist, parent, d + lo, int(len(d)),
            meet + lo, other_dist[meet] + level)


class _Side:
    def __init__(self, actors, bounds, sizes, start):
        self.actors = actors
        self.bounds = bounds
        self.dist = []
        self.parent = []
        # frontier chunks live in the object store (refs) after the first
        # expansion; only per-chunk counts transit the driver
        self.frontier = [np.empty(0, np.int64) for _ in sizes]
        self.counts = [0] * len(sizes)
        for p, size in enumerate(sizes):
            dist = np.full(size, -1, dtype=np.int32)
            parent = np.full(size, -1, dtype=np.int64)
            if bounds[p] <= start < bounds[p + 1]:
                dist[start - bounds[p]] = 0
                parent[start - bounds[p]] = start
                self.frontier[p] = np.array([start], dtype=np.int64)
                self.counts[p] = 1
            self.dist.append(ray.put(dist))
            self.parent.append(ray.put(parent))
        self.depth = 0

    def frontier_size(self) -> int:
        return sum(self.counts)

    def expand(self, other: "_Side"):
        """One level; returns (meet_vertices, total_lengths)."""
        P = len(self.actors)
        self.depth += 1
        active = [p for p in range(P) if self.counts[p]]
        if P > 1:
            ex = {p: self.actors[p].bfs_expand_mono.options(num_returns=P).remote(
                self.frontier[p]) for p in active}
        else:
            ex = {p: [self.actors[p].bfs_expand_mono.remote(self.frontier[p])]
                  for p in active}

        out = [
            _bd_reduce.options(num_returns=6).remote(
                int(self.bounds[q]), self.depth, self.dist[q], self.parent[q],
                other.dist[q],
                *[ex[p][q] for p in active])
            for q in range(P)
        ]
        self.dist = [o[0] for o in out]
        self.parent = [o[1] for o in out]
        self.frontier = [o[2] for o in out]
        self.counts = list(ray.get([o[3] for o in out]))
        meets = ray.get([o[4] for o in out])
        totals = ray.get([o[5] for o in out])
        mv = np.concatenate(meets) if meets else np.empty(0, np.int64)
        mt = np.concatenate(totals) if totals else np.empty(0, np.int64)
        return mv, mt

    def dist_of(self, v: int) -> int:
        q = int(np.searchsorted(self.bounds, v, side="right") - 1)
        return int(ray.get(self.dist[q])[v - int(self.bounds[q])])

    def parent_of(self, v: int) -> int:
        q = int(np.searchsorted(self.bounds, v, side="right") - 1)
        return int(ray.get(self.parent[q])[v - int(self.bounds[q])])


def bidirectional_route(fwd_actors, rev_actors, n_vertices: int,
                        src: int, dst: int,
                        max_levels: int = 10_000) -> list[int] | None:
    """Shortest src->dst path using forward + reverse CSR shard pools.

    ``rev_actors`` must be built over the transposed edge table
    (``shard_edges(..., by="dst")`` loads (dst, src) shards whose
    adjacency IS the reverse graph).
    """
    if src == dst:
        return [src]
    P = len(fwd_actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    f = _Side(fwd_actors, bounds, sizes, src)
    b = _Side(rev_actors, bounds, sizes, dst)

    best_total = None
    best_meet = None
    for _ in range(max_levels):
        if f.frontier_size() == 0 and b.frontier_size() == 0:
            break
        # optimality guard: any undiscovered path costs >= depth_f+depth_b+1
        if best_total is not None and f.depth + b.depth + 1 >= best_total:
            break
        side = f if (0 < f.frontier_size() <= b.frontier_size()
                     or b.frontier_size() == 0) else b
        mv, mt = side.expand(b if side is f else f)
        for v, t in zip(mv.tolist(), mt.tolist()):
            if best_total is None or t < best_total or (t == best_total and v < best_meet):
                best_total, best_meet = int(t), int(v)

    if best_meet is None:
        return None
    # splice: forward chain src..meet, backward chain meet..dst
    path = [best_meet]
    v = best_meet
    while v != src:
        v = f.parent_of(v)
        path.append(v)
    path.reverse()
    v = best_meet
    while v != dst:
        v = b.parent_of(v)
        path.append(v)
    return path
