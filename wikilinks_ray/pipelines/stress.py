"""Pivot-sampled stress centrality: Brandes' two-pass scheme with
exact integer accumulation.

No reference implementation (SURVEY.md §2.12). Stress centrality
counts shortest paths THROUGH a vertex (Shimbel 1953); Brandes'
betweenness machinery computes it with a forward path-count pass and a
backward DAG accumulation (Brandes 2001 §6 lists stress among the
variants). Unlike betweenness' fractional dependencies, stress is pure
int64 — which makes the whole two-pass computation value-hash
reproducible in SQL:

    forward:  dist(s, v), sigma(s, v)             (pipelines/pathcount)
    backward: S(s, v) = 1 + sum_{v->w DAG edge} S(s, w)
              (S counts shortest-path SUFFIXES from v on s's DAG,
               including the empty suffix; a v->w edge is a DAG edge
               iff dist(w) = dist(v) + 1)
    stress_K(v) = sum_{s in pivots, s != v} sigma(s, v) * (S(s, v) - 1)

Pivot sampling (K sources) is the standard scale knob — exact
betweenness/stress needs all V sources, published pivot estimators
(Brandes & Pich 2007) use K << V and scale by V/K.

The backward pass walks levels deepest-first over the REVERSE shard
pool: level-(L+1) vertices push their S values to predecessors
(``bfs_expand_val``), and the reducer accepts only slots sitting at
level L (the DAG-edge filter). Same per-range chunked state discipline
as every other superstep family.
"""

from __future__ import annotations

import numpy as np

import ray

from .pathcount import PathCountResult, path_count_bfs


@ray.remote(num_returns=3)
def _level_frontier(lo: int, dist: np.ndarray, suffix: np.ndarray,
                    level: int):
    """(v, sid, S values) of owned slots at ``level``."""
    vv, ss = np.nonzero(dist == level)
    return vv + lo, ss, suffix[vv, ss]


@ray.remote
def _suffix_accept(lo: int, K: int, level: int, dist: np.ndarray,
                   suffix: np.ndarray, *candidates) -> np.ndarray:
    """Add level-(L+1) suffix sums into owned slots at level L."""
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    vs = [c[1] for c in candidates if c is not None and len(c[0])]
    ss = [c[2] for c in candidates if c is not None and len(c[0])]
    if not ds:
        return suffix
    d = np.concatenate(ds) - lo
    v = np.concatenate(vs)
    s = np.concatenate(ss)
    at = dist[d, s] == level  # DAG-edge filter
    d, v, s = d[at], v[at], s[at]
    if len(d) == 0:
        return suffix
    suffix = suffix.copy()
    np.add.at(suffix, (d, s), v)
    return suffix


@ray.remote
def _suffix_init(dist: np.ndarray) -> np.ndarray:
    return (dist >= 0).astype(np.int64)


@ray.remote(num_returns=2)
def _stress_fold(lo: int, pivots: np.ndarray, dist: np.ndarray,
                 sigma: np.ndarray, suffix: np.ndarray):
    """Per-range (vertex, stress) over s != v reached slots."""
    n_local = dist.shape[0]
    v_ids = np.arange(lo, lo + n_local, dtype=np.int64)
    not_self = pivots[None, :] != v_ids[:, None]
    reached = (dist >= 0) & not_self
    through = np.where(reached, sigma * (suffix - 1), 0)
    keep = reached.any(axis=1)
    return v_ids[keep], through.sum(axis=1)[keep]


@ray.remote
def _delta_init(dist: np.ndarray) -> np.ndarray:
    return np.zeros(dist.shape, dtype=np.float64)


@ray.remote(num_returns=3)
def _delta_frontier(lo: int, dist: np.ndarray, sigma: np.ndarray,
                    delta: np.ndarray, level: int):
    """Level-``level`` slots push ``(1 + delta) / sigma`` backward;
    float payloads ride the same bfs_expand_val (it only sums)."""
    vv, ss = np.nonzero(dist == level)
    return vv + lo, ss, (1.0 + delta[vv, ss]) / sigma[vv, ss]


@ray.remote
def _delta_accept(lo: int, level: int, dist: np.ndarray,
                  sigma: np.ndarray, delta: np.ndarray, *candidates
                  ) -> np.ndarray:
    ds = [c[0] for c in candidates if c is not None and len(c[0])]
    vs = [c[1] for c in candidates if c is not None and len(c[0])]
    ss = [c[2] for c in candidates if c is not None and len(c[0])]
    if not ds:
        return delta
    d = np.concatenate(ds) - lo
    v = np.concatenate(vs)
    s = np.concatenate(ss)
    at = dist[d, s] == level
    d, v, s = d[at], v[at], s[at]
    if len(d) == 0:
        return delta
    delta = delta.copy()
    acc = np.zeros(delta.shape, dtype=np.float64)
    np.add.at(acc, (d, s), v)
    delta += acc * sigma
    return delta


@ray.remote(num_returns=2)
def _betweenness_fold(lo: int, pivots: np.ndarray, dist: np.ndarray,
                      delta: np.ndarray):
    n_local = dist.shape[0]
    v_ids = np.arange(lo, lo + n_local, dtype=np.int64)
    not_self = pivots[None, :] != v_ids[:, None]
    reached = (dist >= 0) & not_self
    keep = reached.any(axis=1)
    return v_ids[keep], np.where(reached, delta, 0.0).sum(axis=1)[keep]


def betweenness_centrality(
    fwd_actors: list,
    rev_actors: list,
    n_vertices: int,
    pivots: list[int],
) -> tuple[np.ndarray, np.ndarray]:
    """Pivot-sampled betweenness (Brandes 2001 — the fractional
    dependency accumulation ``delta(v) = sigma(v) * sum_{v->w DAG}
    (1 + delta(w)) / sigma(w)``, exact for the given source set; run
    with all vertices as pivots it IS exact betweenness). Floats, so
    pinned by the networkx pytest oracle rather than the SQL hash gate
    (stress_centrality is the integer sibling under the gate). Returns
    (vertex ids, betweenness) over vertices reached from a non-self
    pivot."""
    pc: PathCountResult = path_count_bfs(fwd_actors, n_vertices, pivots)
    P = len(fwd_actors)
    bounds = pc.bounds
    delta = [_delta_init.remote(d) for d in pc.dist_chunks]

    for level in range(pc.levels, 0, -1):
        fr = [_delta_frontier.remote(int(bounds[p]), pc.dist_chunks[p],
                                     pc.sigma_chunks[p], delta[p], level)
              for p in range(P)]
        if P > 1:
            expand = [rev_actors[p].bfs_expand_val.options(
                num_returns=P).remote(fr[p][0], fr[p][1], fr[p][2])
                for p in range(P)]
        else:
            expand = [[rev_actors[p].bfs_expand_val.remote(
                fr[p][0], fr[p][1], fr[p][2])] for p in range(P)]
        delta = [_delta_accept.remote(
            int(bounds[q]), level - 1, pc.dist_chunks[q],
            pc.sigma_chunks[q], delta[q],
            *[expand[p][q] for p in range(P)]) for q in range(P)]

    piv = np.asarray(pivots, dtype=np.int64)
    folds = [_betweenness_fold.remote(int(bounds[q]), piv,
                                      pc.dist_chunks[q], delta[q])
             for q in range(P)]
    parts = ray.get([f[0] for f in folds]), ray.get([f[1] for f in folds])
    return (np.concatenate(parts[0]) if parts[0] else np.empty(0, np.int64),
            np.concatenate(parts[1]) if parts[1]
            else np.empty(0, np.float64))


def stress_centrality(
    fwd_actors: list,
    rev_actors: list,
    n_vertices: int,
    pivots: list[int],
    max_levels_ok: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(vertex ids, stress values) — vertices reached from at least one
    non-self pivot; stress restricted to the pivot sample.

    ``max_levels_ok`` asserts the BFS depth stays within a caller-side
    bound (e.g. an unrolled SQL oracle's level count) so a deeper graph
    fails loudly here instead of as an opaque hash mismatch."""
    pc: PathCountResult = path_count_bfs(fwd_actors, n_vertices, pivots)
    if max_levels_ok is not None:
        assert pc.levels <= max_levels_ok, (
            f"BFS depth {pc.levels} exceeded the caller's "
            f"{max_levels_ok}-level bound")
    P = len(fwd_actors)
    K = len(pivots)
    bounds = pc.bounds
    suffix = [_suffix_init.remote(d) for d in pc.dist_chunks]

    for level in range(pc.levels - 1, -1, -1):
        fr = [_level_frontier.remote(int(bounds[p]), pc.dist_chunks[p],
                                     suffix[p], level + 1)
              for p in range(P)]
        if P > 1:
            expand = [rev_actors[p].bfs_expand_val.options(
                num_returns=P).remote(fr[p][0], fr[p][1], fr[p][2])
                for p in range(P)]
        else:
            expand = [[rev_actors[p].bfs_expand_val.remote(
                fr[p][0], fr[p][1], fr[p][2])] for p in range(P)]
        suffix = [_suffix_accept.remote(
            int(bounds[q]), K, level, pc.dist_chunks[q], suffix[q],
            *[expand[p][q] for p in range(P)]) for q in range(P)]

    piv = np.asarray(pivots, dtype=np.int64)
    folds = [_stress_fold.remote(int(bounds[q]), piv, pc.dist_chunks[q],
                                 pc.sigma_chunks[q], suffix[q])
             for q in range(P)]
    parts = ray.get([f[0] for f in folds]), ray.get([f[1] for f in folds])
    return (np.concatenate(parts[0]) if parts[0] else np.empty(0, np.int64),
            np.concatenate(parts[1]) if parts[1] else np.empty(0, np.int64))
