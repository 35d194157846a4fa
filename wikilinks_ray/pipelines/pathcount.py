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
counts on graphs dense enough to overflow, same caveat here).

**State residency (round 4):** dist/sigma (and the backward
suffix/delta arrays of pipelines/stress.py) live INSIDE one
``BrandesRangeState`` actor per vertex range and are mutated in place —
the same load-once residency discipline as the CSR shard actors.
Previously each level's reducer TASK copied and re-put the full
(range × K) state (~1.3 GB/superstep at 4M × 16 pivots); now only the
frontier triples and candidate lists cross the object store, and the
big arrays never leave their actor between supersteps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import ray

from ..state.csr import vertex_ranges

_EMPTY = np.empty(0, np.int64)


def _sum_by_slot(d: np.ndarray, s: np.ndarray, v: np.ndarray, K: int):
    """Sum values per (row, sid) slot: sort + reduceat (vectorized,
    ~10× np.add.at; summation order is key-sorted stable, so results
    are deterministic)."""
    key = d * K + s
    order = np.argsort(key, kind="stable")
    key_s, v_s = key[order], v[order]
    first = np.empty(len(key_s), dtype=bool)
    first[0] = True
    first[1:] = key_s[1:] != key_s[:-1]
    idx = np.flatnonzero(first)
    ukey = key_s[idx]
    return ukey // K, ukey % K, np.add.reduceat(v_s, idx)


@ray.remote
class BrandesRangeState:
    """Resident Brandes state for vertex range [lo, hi): forward
    ``dist`` (int32) / ``sigma`` (int64) plus ONE backward accumulator
    (``suffix`` int64 for stress, ``delta`` float64 for betweenness),
    all (range_size, K). Methods mutate in place; supersteps exchange
    only frontier triples and candidate lists."""

    def __init__(self, lo: int, hi: int, sources: list[int]):
        K = len(sources)
        self.lo, self.K = int(lo), K
        size = int(hi - lo)
        self.dist = np.full((size, K), -1, dtype=np.int32)
        self.sigma = np.zeros((size, K), dtype=np.int64)
        self.aux = None
        fv, fs = [], []
        for sid, src in enumerate(sources):
            if lo <= src < hi:
                self.dist[src - lo, sid] = 0
                self.sigma[src - lo, sid] = 1
                fv.append(src)
                fs.append(sid)
        self._fv = np.asarray(fv, dtype=np.int64)
        self._fs = np.asarray(fs, dtype=np.int64)

    # ---- forward pass (path counting) --------------------------------
    def seed(self):
        """Initial frontier (v, sid, sigma values) of owned sources."""
        return (self._fv, self._fs,
                self.sigma[self._fv - self.lo, self._fs])

    def sigma_accept(self, level: int, *candidates):
        """Apply (dst, sigma_parent, sid) candidates IN PLACE: first
        arrival fixes dist=level; ALL same-level arrivals add into
        sigma. Returns (frontier_v, frontier_sid, frontier_vals, n_new)
        — the newly-finalized vertices whose sigma is now complete
        (level-synchronous: every level contribution arrived in this
        superstep)."""
        ds = [c[0] for c in candidates if c is not None and len(c[0])]
        vs = [c[1] for c in candidates if c is not None and len(c[0])]
        ss = [c[2] for c in candidates if c is not None and len(c[0])]
        if not ds:
            return _EMPTY, _EMPTY, _EMPTY, 0
        d = np.concatenate(ds) - self.lo
        v = np.concatenate(vs)
        s = np.concatenate(ss)
        # sum sigma contributions per (dst, sid)
        ud, us, sums = _sum_by_slot(d, s, v, self.K)
        # unvisited slots open at this level; same-level slots accumulate
        open_new = self.dist[ud, us] < 0
        self.dist[ud[open_new], us[open_new]] = level
        at_level = self.dist[ud, us] == level
        self.sigma[ud[at_level], us[at_level]] += sums[at_level]
        nd, ns = ud[open_new], us[open_new]
        return (nd + self.lo, ns, self.sigma[nd, ns],
                int(open_new.sum()))

    # ---- backward pass (stress suffix counts) ------------------------
    def _build_level_index(self) -> None:
        """One argsort of the dist matrix replaces a full
        (range × K) scan per backward level: frontier slots at level L
        become a contiguous slice of the sorted order (searchsorted),
        so a D-level sweep reads O(n·K·log + touched) instead of
        O(D · n · K)."""
        flat = self.dist.ravel()
        self._lvl_order = np.argsort(flat, kind="stable")
        self._lvl_vals = flat[self._lvl_order]

    def _slots_at(self, level: int):
        a = np.searchsorted(self._lvl_vals, level, "left")
        b = np.searchsorted(self._lvl_vals, level, "right")
        idx = self._lvl_order[a:b]
        return idx // self.K, idx % self.K

    def suffix_init(self) -> None:
        self.aux = (self.dist >= 0).astype(np.int64)
        self._build_level_index()

    def suffix_frontier(self, level: int):
        """(v, sid, S values) of owned slots at ``level``."""
        vv, ss = self._slots_at(level)
        return vv + self.lo, ss, self.aux[vv, ss]

    def suffix_accept(self, level: int, *candidates) -> None:
        """Add level-(L+1) suffix sums into owned slots at level L."""
        ds = [c[0] for c in candidates if c is not None and len(c[0])]
        vs = [c[1] for c in candidates if c is not None and len(c[0])]
        ss = [c[2] for c in candidates if c is not None and len(c[0])]
        if not ds:
            return
        d = np.concatenate(ds) - self.lo
        v = np.concatenate(vs)
        s = np.concatenate(ss)
        at = self.dist[d, s] == level  # DAG-edge filter
        d, v, s = d[at], v[at], s[at]
        if len(d):
            ud, us, sums = _sum_by_slot(d, s, v, self.K)
            self.aux[ud, us] += sums

    def fold_stress(self, pivots: np.ndarray):
        """Per-range (vertex, stress) over s != v reached slots."""
        n_local = self.dist.shape[0]
        v_ids = np.arange(self.lo, self.lo + n_local, dtype=np.int64)
        not_self = pivots[None, :] != v_ids[:, None]
        reached = (self.dist >= 0) & not_self
        through = np.where(reached, self.sigma * (self.aux - 1), 0)
        keep = reached.any(axis=1)
        return v_ids[keep], through.sum(axis=1)[keep]

    # ---- backward pass (betweenness dependencies) --------------------
    def delta_init(self) -> None:
        self.aux = np.zeros(self.dist.shape, dtype=np.float64)
        self._build_level_index()

    def delta_frontier(self, level: int):
        """Level-``level`` slots push ``(1 + delta) / sigma`` backward;
        float payloads ride the same bfs_expand_val (it only sums)."""
        vv, ss = self._slots_at(level)
        return (vv + self.lo, ss,
                (1.0 + self.aux[vv, ss]) / self.sigma[vv, ss])

    def delta_accept(self, level: int, *candidates) -> None:
        ds = [c[0] for c in candidates if c is not None and len(c[0])]
        vs = [c[1] for c in candidates if c is not None and len(c[0])]
        ss = [c[2] for c in candidates if c is not None and len(c[0])]
        if not ds:
            return
        d = np.concatenate(ds) - self.lo
        v = np.concatenate(vs)
        s = np.concatenate(ss)
        at = self.dist[d, s] == level
        d, v, s = d[at], v[at], s[at]
        if len(d) == 0:
            return
        ud, us, sums = _sum_by_slot(d, s, v, self.K)
        self.aux[ud, us] += sums * self.sigma[ud, us]

    def fold_betweenness(self, pivots: np.ndarray):
        n_local = self.dist.shape[0]
        v_ids = np.arange(self.lo, self.lo + n_local, dtype=np.int64)
        not_self = pivots[None, :] != v_ids[:, None]
        reached = (self.dist >= 0) & not_self
        keep = reached.any(axis=1)
        return (v_ids[keep],
                np.where(reached, self.aux, 0.0).sum(axis=1)[keep])

    # ---- extraction ---------------------------------------------------
    def get_dist(self) -> np.ndarray:
        return self.dist

    def get_sigma(self) -> np.ndarray:
        return self.sigma


@dataclass
class PathCountResult:
    states: list  # BrandesRangeState handles, one per range
    bounds: np.ndarray
    sources: list[int]
    levels: int
    _dist: list = field(default=None, repr=False)
    _sigma: list = field(default=None, repr=False)

    @property
    def dist_chunks(self) -> list:
        """Refs of (range_size, K) int32 (materialized once on demand)."""
        if self._dist is None:
            self._dist = [s.get_dist.remote() for s in self.states]
        return self._dist

    @property
    def sigma_chunks(self) -> list:
        if self._sigma is None:
            self._sigma = [s.get_sigma.remote() for s in self.states]
        return self._sigma

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
    """dist/sigma per (vertex, source), resident in one
    BrandesRangeState actor per range (dist -1 / sigma 0 mark
    unreachable slots); the result's state actors also serve the
    backward passes of pipelines/stress.py."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    states = [BrandesRangeState.remote(int(bounds[p]), int(bounds[p + 1]),
                                       list(sources))
              for p in range(P)]
    seeds = ray.get([s.seed.remote() for s in states])
    frontier = [(fv, fs, vals) for fv, fs, vals in seeds]
    counts = [len(f[0]) for f in frontier]

    level = 0
    for level in range(1, max_levels + 1):
        live = [p for p in range(P) if counts[p]]
        if not live:
            level -= 1
            break
        if P > 1:
            expand = {p: actors[p].bfs_expand_val.options(
                num_returns=P).remote(*frontier[p]) for p in live}
        else:
            expand = {p: [actors[p].bfs_expand_val.remote(*frontier[p])]
                      for p in live}
        out = [states[q].sigma_accept.options(num_returns=4).remote(
            level, *[expand[p][q] for p in live]) for q in range(P)]
        frontier = [(o[0], o[1], o[2]) for o in out]
        counts = ray.get([o[3] for o in out])

    return PathCountResult(states, bounds, list(sources), level)
