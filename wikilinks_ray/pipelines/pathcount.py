"""Path-counting BFS: shortest-path counts (sigma) from a pivot set.

No reference implementation (SURVEY.md §2.12). sigma(s, v) = number of
distinct shortest s→v paths — the forward half of Brandes' betweenness
algorithm (Brandes, "A Faster Algorithm for Betweenness Centrality",
J. Math. Sociol. 2001) and a standard centrality building block on its
own (pivot-sampled betweenness/stress take K pivots exactly like
this). Level-synchronous over the multi-source BFS skeleton
(pipelines/bfs.py), with one twist: candidates carry ``sigma[parent]``
as a VALUE (``CSRShardActor.bfs_expand_val``) so the per-range reducer
can sum path counts without cross-range parent lookups, and
(dst, sid) candidates are NOT deduplicated — every shortest-path
predecessor contributes its count:

    sigma(s, v) = sum over in-neighbors u with dist(s,u)=dist(s,v)-1
                  of sigma(s, u)

All counts are exact int64 (overflow needs ~2^63 shortest paths —
fine at validation scale; Brandes implementations switch to float/log
counts on graphs dense enough to overflow, same caveat here). Dist and
sigma state live as per-range object-store chunks.
"""

from __future__ import annotations

import numpy as np

import ray

from ..state.csr import vertex_ranges


@ray.remote(num_returns=5)
def _sigma_reduce(lo: int, K: int, level: int, dist: np.ndarray,
                  sigma: np.ndarray, *candidates):
    """Apply (dst, sigma_parent, sid) candidates: first arrival fixes
    dist=level; ALL same-level arrivals add into sigma. Returns
    (dist, sigma, frontier_v, frontier_sid, n_new); frontier carries
    the newly-finalized vertices whose sigma is now complete (level-
    synchronous: every level-``level`` contribution arrived in this
    superstep)."""
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    vs = [c[1] for c in candidates if c is not None and len(c[0])]
    ss = [c[2] for c in candidates if c is not None and len(c[0])]
    empty = np.empty(0, np.int64)
    if not ds:
        return dist, sigma, empty, empty, 0
    d = np.concatenate(ds) - lo
    v = np.concatenate(vs)
    s = np.concatenate(ss)
    # sum sigma contributions per (dst, sid)
    key = d * K + s
    order = np.argsort(key, kind="stable")
    key_s, v_s = key[order], v[order]
    first = np.empty(len(key_s), dtype=bool)
    first[0] = True
    first[1:] = key_s[1:] != key_s[:-1]
    idx = np.flatnonzero(first)
    ukey = key_s[idx]
    sums = np.add.reduceat(v_s, idx)
    ud, us = ukey // K, ukey % K
    # unvisited slots open at this level; same-level slots accumulate
    open_new = dist[ud, us] < 0
    dist = dist.copy()
    sigma = sigma.copy()
    dist[ud[open_new], us[open_new]] = level
    at_level = dist[ud, us] == level
    sigma[ud[at_level], us[at_level]] += sums[at_level]
    nd, ns = ud[open_new], us[open_new]
    return (dist, sigma, nd + lo, ns,
            int(open_new.sum()))


from dataclasses import dataclass


@dataclass
class PathCountResult:
    dist_chunks: list  # refs of (range_size, K) int32
    sigma_chunks: list  # refs of (range_size, K) int64
    bounds: np.ndarray
    sources: list[int]
    levels: int

    def distances(self) -> np.ndarray:
        return np.vstack(ray.get(self.dist_chunks))

    def sigmas(self) -> np.ndarray:
        return np.vstack(ray.get(self.sigma_chunks))


def path_count_bfs(
    actors: list,
    n_vertices: int,
    sources: list[int],
    *,
    max_levels: int = 10_000,
) -> PathCountResult:
    """dist/sigma per (vertex, source) as per-range chunk refs; dist -1
    and sigma 0 mark unreachable slots."""
    P = len(actors)
    K = len(sources)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    dist_refs, sigma_refs = [], []
    frontier_v = [np.empty(0, np.int64) for _ in range(P)]
    frontier_s = [np.empty(0, np.int64) for _ in range(P)]
    for p in range(P):
        dist = np.full((sizes[p], K), -1, dtype=np.int32)
        sigma = np.zeros((sizes[p], K), dtype=np.int64)
        for sid, src in enumerate(sources):
            if bounds[p] <= src < bounds[p + 1]:
                dist[src - bounds[p], sid] = 0
                sigma[src - bounds[p], sid] = 1
                frontier_v[p] = np.append(frontier_v[p], src)
                frontier_s[p] = np.append(frontier_s[p], sid)
        dist_refs.append(ray.put(dist))
        sigma_refs.append(ray.put(sigma))

    @ray.remote
    def _frontier_vals(lo: int, sigma: np.ndarray, fv: np.ndarray,
                       fs: np.ndarray) -> np.ndarray:
        return sigma[fv - lo, fs]

    counts = [len(f) for f in frontier_v]
    level = 0
    for level in range(1, max_levels + 1):
        live = [p for p in range(P) if counts[p]]
        if not live:
            level -= 1
            break
        vals = {p: _frontier_vals.remote(int(bounds[p]), sigma_refs[p],
                                         frontier_v[p], frontier_s[p])
                for p in live}
        if P > 1:
            expand = {p: actors[p].bfs_expand_val.options(
                num_returns=P).remote(frontier_v[p], frontier_s[p], vals[p])
                for p in live}
        else:
            expand = {p: [actors[p].bfs_expand_val.remote(
                frontier_v[p], frontier_s[p], vals[p])] for p in live}
        out = [_sigma_reduce.remote(
            int(bounds[q]), K, level, dist_refs[q], sigma_refs[q],
            *[expand[p][q] for p in live]) for q in range(P)]
        dist_refs = [o[0] for o in out]
        sigma_refs = [o[1] for o in out]
        frontier_v = [o[2] for o in out]
        frontier_s = [o[3] for o in out]
        counts = ray.get([o[4] for o in out])

    return PathCountResult(dist_refs, sigma_refs, bounds, list(sources),
                           level)
