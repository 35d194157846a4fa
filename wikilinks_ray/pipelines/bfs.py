"""Multi-source BFS shortest paths over CSR shard actors.

The reference's signature workload: level-synchronous BFS with parent
maps and path reconstruction (RouteFinder.kt:9-177 — its bidirectional
variant is a single-machine latency optimization; level-synchronous
supersteps give the same minimal hop counts, which is what the
reference's own oracle test asserts, RouteFinderTest.kt:69).

State per vertex range (held as object-store refs, never whole on the
driver): ``dist[range_size, K]`` int32 (-1 = unvisited) and
``parent[range_size, K]`` int64 — K sources run in one pass with a
``sid`` (source index) column, exactly the "same superstep with a
source_id column" generalization (SURVEY.md §2.12). Per superstep:

1. each shard actor expands the frontier chunks it owns into
   (dst, parent, sid) candidates, pre-partitioned by dst range
   (``bfs_expand``);
2. one reducer per range keeps candidates hitting unvisited (dst, sid)
   slots — the visited-set dedup (``putIfAbsent`` parent map,
   RouteFinder.kt:59-64) — records dist+parent, and emits the new
   frontier chunk, deduped per (dst, sid).

Terminates when every frontier chunk is empty. Path reconstruction
walks parent chains backwards across range chunks (one small lookup per
hop, RouteFinder.kt:146-175 analog).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import ray

from ..state.checkpoint import latest_checkpoint_multi, save_checkpoint_multi
from ..state.csr import vertex_ranges


@ray.remote
def _bfs_reduce(lo: int, level: int, dist: np.ndarray, parent: np.ndarray,
                stop_pairs, *candidates):
    """Apply candidates to (dist, parent); return new state + frontier +
    small driver-facing scalars: (dist, parent, frontier_v, frontier_s,
    n_new, reached). The frontier arrays stay in the object store — the
    driver only pulls ``n_new`` (termination) and ``reached`` (which
    stop pairs were discovered this level), so frontier bytes never
    transit the driver."""
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    ps = [c[1] for c in candidates if c is not None and len(c[0])]
    ss = [c[2] for c in candidates if c is not None and len(c[0])]
    empty = np.empty(0, np.int64)
    if not ds:
        return dist, parent, empty, empty, 0, []
    d = np.concatenate(ds) - lo
    p = np.concatenate(ps)
    s = np.concatenate(ss)
    # dedup (dst, sid) keeping first candidate (deterministic: inputs are
    # dst-sorted per shard and shards concatenate in fixed order)
    key = d * dist.shape[1] + s
    uniq, first_idx = np.unique(key, return_index=True)
    d, p, s = d[first_idx], p[first_idx], s[first_idx]
    unvisited = dist[d, s] < 0
    d, p, s = d[unvisited], p[unvisited], s[unvisited]
    if len(d) == 0:
        return dist, parent, empty, empty, 0, []
    dist = dist.copy()
    parent = parent.copy()
    dist[d, s] = level
    parent[d, s] = p
    reached = []
    if stop_pairs:
        found = {(int(sid), int(v + lo)) for v, sid in zip(d, s)}
        reached = [t for t in stop_pairs if t in found]
    return dist, parent, d + lo, s, int(len(d)), reached


@dataclass
class BFSResult:
    dist_chunks: list  # refs of (range_size, K) int32
    parent_chunks: list  # refs of (range_size, K) int64
    bounds: np.ndarray
    sources: list[int]
    levels: int

    def distances(self) -> np.ndarray:
        """(n, K) hop counts, -1 = unreachable."""
        return np.vstack([ray.get(c) for c in self.dist_chunks])

    def _lookup(self, v: int, sid: int) -> tuple[int, int]:
        q = int(np.searchsorted(self.bounds, v, side="right") - 1)
        dist = ray.get(self.dist_chunks[q])
        parent = ray.get(self.parent_chunks[q])
        lo = int(self.bounds[q])
        return int(dist[v - lo, sid]), int(parent[v - lo, sid])

    def path_to(self, target: int, sid: int = 0) -> list[int] | None:
        """Reconstruct source->target path by walking parents backwards
        (RouteFinder.kt:146-175 analog: one small chunk lookup per hop)."""
        d, _ = self._lookup(target, sid)
        if d < 0:
            return None
        path = [target]
        v = target
        while v != self.sources[sid]:
            _, par = self._lookup(v, sid)
            v = par
            path.append(v)
        return list(reversed(path))


def multi_source_bfs(
    actors: list,
    n_vertices: int,
    sources: list[int],
    *,
    max_levels: int = 10_000,
    stop_targets: list[tuple[int, int]] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = True,
    source_ids: list[int] | None = None,
) -> BFSResult:
    """Level-synchronous BFS from K sources in one pass.

    ``stop_targets``: optional (sid, vertex) pairs; expansion stops
    early once every pair has been reached (single-pair route queries
    don't explore the whole graph — the reference stops at frontier
    intersection, RouteFinder.kt:91-93). With ``checkpoint_dir`` every
    superstep persists per-partition dist/parent/frontier chunks + a
    manifest, and ``resume=True`` continues from the newest complete
    level.

    ``source_ids``: optional sid per source, collapsing several seed
    vertices into one dist column — a SET-seeded BFS ("super-source"),
    e.g. reachability from a whole SCC (pipelines/bowtie.py). State is
    then O(n · distinct sids), not O(n · seeds). Default: one column
    per source."""
    P = len(actors)
    if source_ids is None:
        source_ids = list(range(len(sources)))
    if len(source_ids) != len(sources):
        raise ValueError("source_ids must parallel sources")
    K = (max(source_ids) + 1) if sources else 0
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]

    start_level = 0
    dist_refs = None
    if resume and checkpoint_dir:
        ck = latest_checkpoint_multi(checkpoint_dir)
        if ck is not None:
            start_level, named, _m = ck
            dist_refs = [ray.put(c) for c in named["dist"]]
            parent_refs = [ray.put(c) for c in named["parent"]]
            frontier_v = list(named["frontier_v"])
            frontier_s = list(named["frontier_s"])
    if dist_refs is None:
        dist_refs, parent_refs = [], []
        frontier_v = [np.empty(0, np.int64) for _ in range(P)]
        frontier_s = [np.empty(0, np.int64) for _ in range(P)]
        for p in range(P):
            dist = np.full((sizes[p], K), -1, dtype=np.int32)
            parent = np.full((sizes[p], K), -1, dtype=np.int64)
            for sid, src in zip(source_ids, sources):
                if bounds[p] <= src < bounds[p + 1]:
                    dist[src - bounds[p], sid] = 0
                    parent[src - bounds[p], sid] = src
                    frontier_v[p] = np.append(frontier_v[p], src)
                    frontier_s[p] = np.append(frontier_s[p], sid)
            dist_refs.append(ray.put(dist))
            parent_refs.append(ray.put(parent))

    frontier_counts = [len(f) for f in frontier_v]  # init arrays are local
    level = start_level
    for level in range(start_level + 1, max_levels + 1):
        active = [p for p in range(P) if frontier_counts[p]]
        if not active:
            level -= 1
            break
        # gather all frontier chunks to each owning shard actor: shard p
        # only expands vertices in its own range, so send it only chunk p
        if P > 1:
            expand = {
                p: actors[p].bfs_expand.options(num_returns=P).remote(
                    frontier_v[p], frontier_s[p])
                for p in active
            }
        else:
            expand = {p: [actors[p].bfs_expand.remote(frontier_v[p], frontier_s[p])]
                      for p in active}
        out = [
            _bfs_reduce.options(num_returns=6).remote(
                int(bounds[q]), level, dist_refs[q], parent_refs[q],
                stop_targets or [],
                *[expand[p][q] for p in active])
            for q in range(P)
        ]
        dist_refs = [o[0] for o in out]
        parent_refs = [o[1] for o in out]
        # frontier arrays stay as refs; only tiny counts/reached transit
        frontier_v = [o[2] for o in out]
        frontier_s = [o[3] for o in out]
        counts = ray.get([o[4] for o in out])
        frontier_counts = list(counts)
        if checkpoint_dir and level % checkpoint_every == 0:
            fv = ray.get(frontier_v)
            fs = ray.get(frontier_s)
            save_checkpoint_multi(
                checkpoint_dir, level,
                {"dist": ray.get(dist_refs), "parent": ray.get(parent_refs),
                 "frontier_v": fv, "frontier_s": fs},
                {"level": level, "frontier_size": int(sum(counts))})
        if stop_targets:
            reached = set()
            for r in ray.get([o[5] for o in out]):
                reached.update(tuple(t) for t in r)
            stop_targets = [t for t in stop_targets if tuple(t) not in reached]
            if not stop_targets:
                break

    return BFSResult(dist_refs, parent_refs, bounds, list(sources), level)


def shortest_route(actors, n_vertices, src: int, dst: int,
                   max_levels: int = 10_000) -> list[int] | None:
    """Single-pair route (the reference's findRoute, WikiRoutes.kt:58-67):
    vertices on a shortest path, or None if unreachable; [src] if equal."""
    if src == dst:
        return [src]
    res = multi_source_bfs(actors, n_vertices, [src], max_levels=max_levels,
                           stop_targets=[(0, dst)])
    return res.path_to(dst, 0)
