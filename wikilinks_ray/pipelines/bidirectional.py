"""Bidirectional BFS shortest-path queries (the reference's signature
operator, RouteFinder.kt:9-177).

Two frontiers expand — forward over the out-edge CSR shards, backward
over the transpose (in-edge) shards — the same paired forward/reverse
adjacency the reference materializes (outEdges/inEdges sections,
SegmentWikiGraphStore.kt:100-114). While both frontiers are small the
two directions expand CONCURRENTLY on their disjoint actor pools (one
synchronization round covers two levels — route queries are bound by
round latency, not compute); past ``dual_expand_limit`` the policy
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


def _bd_reduce_impl(lo: int, level: int, dist: np.ndarray, parent: np.ndarray,
                    other_dist: np.ndarray, *candidates):
    """Like bfs._bfs_reduce (single source) + reports meeting vertices:
    newly discovered vertices already reached by the opposite search.
    Candidates are ``bfs_expand`` outputs (dst, parent, sid); sid is a
    single-source placeholder and ignored.

    Plain function: route queries are LATENCY-bound, so this runs as a
    CSRShardActor method (warm actor dispatch) rather than a spawned
    task per range per level — see CSRShardActor.bd_step, which fuses
    this reduce with the immediately-following expansion of the new
    frontier (one actor hop per level instead of two).

    Returns 4 values: (dist|None, parent|None, frontier, packed) where
    packed = (count, meet_vertices, meet_totals). The small per-level
    outputs ride in ONE object so the driver's per-level ray.get wave is
    P refs, not 3P (each extra ref costs a store round-trip on the
    latency-critical path); None dist/parent = "unchanged, keep your
    old refs" (re-returning an untouched 600 KB chunk would re-serialize
    it every level for every quiet range)."""
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    ps = [c[1] for c in candidates if c is not None and len(c[0])]
    empty = np.empty(0, np.int64)
    if not ds:
        return None, None, empty, (0, empty, empty)
    d = np.concatenate(ds) - lo
    p = np.concatenate(ps)
    uniq, first_idx = np.unique(d, return_index=True)
    d, p = d[first_idx], p[first_idx]
    unvisited = dist[d] < 0
    d, p = d[unvisited], p[unvisited]
    if len(d) == 0:
        return None, None, empty, (0, empty, empty)
    dist = dist.copy()
    parent = parent.copy()
    dist[d] = level
    parent[d] = p
    meet = d[other_dist[d] >= 0]
    return (dist, parent, d + lo,
            (int(len(d)), meet + lo, other_dist[meet] + level))


# Initial all(-1) dist/parent chunk refs, cached per (n_vertices, P):
# reducers never mutate their inputs (copy-on-update), so every query
# over the same graph shape can share the same untouched templates —
# re-putting ~10 MB of -1s per query measured ~12 ms, a quarter of the
# whole route latency. Only the start vertex's range needs a private put.
_TEMPLATE_CACHE: dict[tuple[int, int], tuple[list, list]] = {}


def _template_refs(n_vertices: int, bounds, sizes):
    key = (int(n_vertices), len(sizes))
    if key not in _TEMPLATE_CACHE:
        _TEMPLATE_CACHE[key] = (
            [ray.put(np.full(s, -1, dtype=np.int32)) for s in sizes],
            [ray.put(np.full(s, -1, dtype=np.int64)) for s in sizes],
        )
    return _TEMPLATE_CACHE[key]


class _Side:
    def __init__(self, actors, bounds, sizes, start, n_vertices):
        self.actors = actors
        self.bounds = bounds
        dist_t, parent_t = _template_refs(n_vertices, bounds, sizes)
        self.dist = list(dist_t)
        self.parent = list(parent_t)
        self.counts = [0] * len(sizes)
        P = len(sizes)
        p0 = int(np.searchsorted(bounds, start, side="right") - 1)
        dist = np.full(sizes[p0], -1, dtype=np.int32)
        parent = np.full(sizes[p0], -1, dtype=np.int64)
        dist[start - bounds[p0]] = 0
        parent[start - bounds[p0]] = start
        self.dist[p0] = ray.put(dist)
        self.parent[p0] = ray.put(parent)
        self.counts[p0] = 1
        self.depth = 0
        # Bootstrap: expand the start vertex once (non-blocking). Every
        # later expansion happens INSIDE bd_step, fused with the reduce
        # — cand[q] always holds the refs of next-level candidates
        # destined to range q, produced by the previous wave's steps.
        f0 = np.array([start], dtype=np.int64)
        if P > 1:
            ex0 = actors[p0].bfs_expand_mono.options(
                num_returns=P).remote(f0)
        else:
            ex0 = [actors[p0].bfs_expand_mono.remote(f0)]
        self.cand = [[ex0[q]] for q in range(P)]

    def frontier_size(self) -> int:
        return sum(self.counts)

    def start(self, other: "_Side") -> list:
        """Launch one full level, non-blocking: ONE fused bd_step call
        per range on this side's OWN pool (reduce this level's pending
        candidates, then expand the new frontier in place — the
        expansion for the next level is already running when the driver
        reads this level's meets). In dual mode the two sides run on
        disjoint pools, so they overlap without any cross-queueing.
        other.dist refs are captured BEFORE the opposite side's
        concurrent step swaps them, so meets are judged against the
        pre-round state of the other search — same-round double
        discoveries are caught by the caller's frontier intersection."""
        P = len(self.actors)
        self.depth += 1
        return [
            self.actors[q].bd_step.options(num_returns=P + 4).remote(
                int(self.bounds[q]), self.depth, self.dist[q], self.parent[q],
                other.dist[q], *self.cand[q])
            for q in range(P)
        ]

    def level_refs(self, out: list, fetch_frontier: bool = False) -> list:
        """The small per-level refs ``finish`` needs: P packed objects
        (+ P frontier arrays in dual mode). Exposed so the dual loop can
        fetch BOTH sides' levels in a single ``ray.get`` wave."""
        P = len(self.actors)
        refs = [o[P + 3] for o in out]  # one packed small object per range
        if fetch_frontier:
            refs += [o[P + 2] for o in out]
        return refs

    def finish(self, out: list, fetch_frontier: bool = False,
               flat: list | None = None):
        """Collect one level: returns (meet_vertices, total_lengths,
        newly_discovered_vertices). ONE driver round-trip (or zero when
        the caller pre-fetched ``flat`` = ray.get(level_refs(...)) —
        the dual loop batches both sides into one get).
        ``fetch_frontier`` additionally pulls the new frontier arrays
        (needed only for the dual-expansion cross-meet check — skipped
        otherwise: a large frontier would cost a driver transfer).

        bd_step returns P+4 refs per range: [0:P] next-level candidates
        by dst range, then dist|None, parent|None, frontier, packed."""
        P = len(self.actors)
        if flat is None:
            flat = ray.get(self.level_refs(out, fetch_frontier))
        packed = flat[:P]
        counts = [pk[0] for pk in packed]
        meets = [pk[1] for pk in packed]
        totals = [pk[2] for pk in packed]
        fronts = flat[P:] if fetch_frontier else None
        # ranges with no discoveries returned None chunks — keep the old
        # dist/parent refs instead of swapping in the placeholder
        for q in range(P):
            if counts[q]:
                self.dist[q] = out[q][P]
                self.parent[q] = out[q][P + 1]
        # next wave reduces THIS wave's expansion outputs
        self.cand = [[out[p][q] for p in range(P)] for q in range(P)]
        self.counts = counts
        mv = np.concatenate(meets) if meets else np.empty(0, np.int64)
        mt = np.concatenate(totals) if totals else np.empty(0, np.int64)
        newly = np.empty(0, np.int64)
        if fronts is not None and any(counts):
            newly = np.concatenate(
                [fr for q, fr in enumerate(fronts) if counts[q]])
        return mv, mt, newly

    def expand(self, other: "_Side"):
        """One level; returns (meet_vertices, total_lengths)."""
        mv, mt, _ = self.finish(self.start(other))
        return mv, mt

    def dist_of(self, v: int) -> int:
        q = int(np.searchsorted(self.bounds, v, side="right") - 1)
        return int(ray.get(self.dist[q])[v - int(self.bounds[q])])

    def parent_of(self, v: int) -> int:
        # the whole chunk transfers once and is cached: the splice walk
        # calls this per path hop
        q = int(np.searchsorted(self.bounds, v, side="right") - 1)
        if not hasattr(self, "_pcache"):
            self._pcache = {}
        if q not in self._pcache:
            self._pcache[q] = ray.get(self.parent[q])
        return int(self._pcache[q][v - int(self.bounds[q])])


def bidirectional_route(fwd_actors, rev_actors, n_vertices: int,
                        src: int, dst: int,
                        max_levels: int = 10_000,
                        dual_expand_limit: int = 65536) -> list[int] | None:
    """Shortest src->dst path using forward + reverse CSR shard pools.

    ``rev_actors`` must be built over the transposed edge table
    (``shard_edges(..., by="dst")`` loads (dst, src) shards whose
    adjacency IS the reverse graph).

    While both frontiers are small (≤ ``dual_expand_limit`` combined),
    BOTH directions expand in the same round on their disjoint actor
    pools — halving the number of latency-bound synchronization rounds.
    Meets against the opposite side's pre-round state come from the
    reduces; vertices discovered by BOTH sides in the same round are
    caught by intersecting the two new frontiers (total = depth_f +
    depth_b). Past the limit the reference's policy applies: expand the
    cheaper side only (TOO_BIG intent, RouteFinder.kt:26-39,72).
    """
    if src == dst:
        return [src]
    P = len(fwd_actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    f = _Side(fwd_actors, bounds, sizes, src, n_vertices)
    b = _Side(rev_actors, bounds, sizes, dst, n_vertices)

    best_total = None
    best_meet = None

    def consider(mv, mt):
        nonlocal best_total, best_meet
        for v, t in zip(mv.tolist(), mt.tolist()):
            if best_total is None or t < best_total or (t == best_total and v < best_meet):
                best_total, best_meet = int(t), int(v)

    for _ in range(max_levels):
        sf, sb = f.frontier_size(), b.frontier_size()
        # one side exhausted without a meet => no path exists: every
        # src->dst path ends at a vertex that can reach dst, so if the
        # backward search drained without touching the forward search
        # (or vice versa) the other side can never meet it either —
        # continuing would BFS the whole component (seconds at 400k)
        if sf == 0 and sb == 0:
            break
        if best_total is None and (sf == 0 or sb == 0):
            break
        # optimality guard: any undiscovered path costs >= depth_f+depth_b+1
        if best_total is not None and f.depth + b.depth + 1 >= best_total:
            break
        if sf and sb and sf + sb <= dual_expand_limit:
            # one fused step wave per side, disjoint pools (see start);
            # both sides' small per-level outputs in ONE ray.get wave
            hf = f.start(b)
            hb = b.start(f)
            rf = f.level_refs(hf, fetch_frontier=True)
            rb = b.level_refs(hb, fetch_frontier=True)
            flat = ray.get(rf + rb)
            mvf, mtf, new_f = f.finish(hf, fetch_frontier=True,
                                       flat=flat[:len(rf)])
            mvb, mtb, new_b = b.finish(hb, fetch_frontier=True,
                                       flat=flat[len(rf):])
            consider(mvf, mtf)
            consider(mvb, mtb)
            cross = np.intersect1d(new_f, new_b)
            if len(cross):
                consider(cross, np.full(len(cross), f.depth + b.depth,
                                        dtype=np.int64))
        else:
            side = f if (0 < sf <= sb or sb == 0) else b
            mv, mt = side.expand(b if side is f else f)
            consider(mv, mt)

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
