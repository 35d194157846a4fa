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
level L (the DAG-edge filter). All dist/sigma/suffix/delta state is
RESIDENT in the forward pass's BrandesRangeState actors
(pipelines/pathcount.py) and mutated in place — per level only the
frontier triples and candidate lists cross the object store, instead of
re-copying and re-putting the full (range × K) arrays (~1.3 GB per
superstep at 4M vertices × 16 pivots before round 4).
"""

from __future__ import annotations

import numpy as np

import ray

from .pathcount import PathCountResult, path_count_bfs


def _backward_sweep(pc: PathCountResult, rev_actors: list,
                    frontier_method: str, accept_method: str) -> None:
    """Deepest-level-first suffix/delta accumulation over the reverse
    pool, state resident in pc.states."""
    P = len(rev_actors)
    for level in range(pc.levels, 0, -1):
        fr = [getattr(s, frontier_method).options(num_returns=3)
              .remote(level) for s in pc.states]
        if P > 1:
            expand = [rev_actors[p].bfs_expand_val.options(
                num_returns=P).remote(fr[p][0], fr[p][1], fr[p][2])
                for p in range(P)]
        else:
            expand = [[rev_actors[p].bfs_expand_val.remote(
                fr[p][0], fr[p][1], fr[p][2])] for p in range(P)]
        # barrier per level: accept must complete before the next
        # (shallower) frontier reads the updated accumulator
        ray.get([getattr(pc.states[q], accept_method).remote(
            level - 1, *[expand[p][q] for p in range(P)])
            for q in range(P)])


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
    ray.get([s.delta_init.remote() for s in pc.states])
    _backward_sweep(pc, rev_actors, "delta_frontier", "delta_accept")

    piv = np.asarray(pivots, dtype=np.int64)
    folds = [s.fold_betweenness.options(num_returns=2).remote(piv)
             for s in pc.states]
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
    ray.get([s.suffix_init.remote() for s in pc.states])
    # note: the stress sweep's frontier level is L+1 while accept
    # filters at L — suffix_frontier(level) with the sweep passing
    # pc.levels..1 and accept at level-1 matches the original
    # (levels-1..0 frontier at level+1) exactly
    _backward_sweep(pc, rev_actors, "suffix_frontier", "suffix_accept")

    piv = np.asarray(pivots, dtype=np.int64)
    folds = [s.fold_stress.options(num_returns=2).remote(piv)
             for s in pc.states]
    parts = ray.get([f[0] for f in folds]), ray.get([f[1] for f in folds])
    return (np.concatenate(parts[0]) if parts[0] else np.empty(0, np.int64),
            np.concatenate(parts[1]) if parts[1] else np.empty(0, np.int64))
