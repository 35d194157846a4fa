"""Maximal independent set: deterministic Luby rounds over CSR shards.

No reference implementation (SURVEY.md §2.12); MIS is the classic
symmetry-breaking primitive behind distributed coloring/scheduling
(Luby, "A Simple Parallel Algorithm for the Maximal Independent Set
Problem", SIAM J. Comput. 1986). Determinism: round t gives every
active vertex the injective priority key

    key(v, t) = (walk_hash(v, t) % 2147483647) << 32 | v

(the frozen hash of pipelines/walks.py; the ``| v`` tail makes ties
impossible, so "strictly smaller than every active neighbor" is
well-defined — and the whole run is replayable by unrolled SQL,
``__ray_entry__._mis_oracle_sql``). Requires dense ids < 2^32 (the
engine's id space is dense by construction, stages/ids.py).

Per round, TWO ``min_push`` exchanges (the connected-components kernel
reused verbatim — inactive vertices push the int64-max sentinel, which
never beats a live key):

1. every active vertex learns the min active-neighbor key; vertices
   beating it join the MIS (isolated/neighborless actives join too);
2. new MIS members push their key; any active vertex hearing a finite
   value has an MIS neighbor and deactivates.

All vertex state (active / MIS masks, keys) lives as per-range
object-store chunks; the driver sees only per-range counts. Rounds are
O(log n) w.h.p. — Luby's analysis carries over since the hash is
uniform enough per round. Run over SYMMETRIZED, self-loop-free shards
(a self-loop would make a vertex its own blocker and never terminate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.csr import accum_min, vertex_ranges
from .walks import walk_hash

_INF = np.iinfo(np.int64).max
_PRI_MOD = 2_147_483_647


def mis_key(v: np.ndarray, t: int) -> np.ndarray:
    """Injective round-t priority (see module docstring)."""
    return ((walk_hash(v, t) % _PRI_MOD) << 32) | v


def drop_self_loops(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tb.filter(pc.not_equal(tb.column("src"), tb.column("dst")))

    return edges.map_batches(f, batch_format="pyarrow")


@ray.remote
def _count_true(mask: np.ndarray) -> int:
    return int(mask.sum())


@ray.remote
def _round_keys(lo: int, hi: int, active: np.ndarray, t: int) -> np.ndarray:
    keys = np.full(hi - lo, _INF, dtype=np.int64)
    idx = np.flatnonzero(active)
    keys[idx] = mis_key(idx + lo, t)
    return keys


@ray.remote
def _reduce_min_fresh(size: int, *candidates) -> np.ndarray:
    acc = np.full(size, _INF, dtype=np.int64)
    for c in candidates:
        accum_min(acc, c)
    return acc


@ray.remote(num_returns=2)
def _select(keys: np.ndarray, nbr_min: np.ndarray):
    """(mis_new mask, keys of new members else INF)."""
    mis_new = (keys < _INF) & (keys < nbr_min)
    keys2 = np.where(mis_new, keys, _INF)
    return mis_new, keys2


@ray.remote(num_returns=3)
def _update(active: np.ndarray, mis: np.ndarray, mis_new: np.ndarray,
            nbr_mis_min: np.ndarray):
    new_mis = mis | mis_new
    new_active = active & ~mis_new & ~(nbr_mis_min < _INF)
    return new_active, new_mis, int(new_active.sum())


def maximal_independent_set(actors: list, n_vertices: int, *,
                            max_rounds: int = 64,
                            init_active: list | None = None,
                            key_offset: int = 0,
                            ) -> tuple[np.ndarray, int, bool]:
    """(sorted MIS vertex ids over the dense [0, n) space, rounds used,
    converged — False means actives remained at ``max_rounds``).
    ``actors`` must serve the symmetrized self-loop-free adjacency.

    ``init_active``: optional per-range bool-mask refs restricting the
    MIS to an induced subgraph (edges to inactive vertices never block
    — inactive vertices push the INF sentinel). ``key_offset`` shifts
    the hash round index so successive calls (graph coloring,
    pipelines/coloring.py) draw fresh priorities."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    sizes = [int(bounds[p + 1] - bounds[p]) for p in range(P)]
    if init_active is None:
        active = [ray.put(np.ones(sizes[p], dtype=bool)) for p in range(P)]
        remaining = n_vertices
    else:
        active = list(init_active)
        remaining = int(sum(ray.get(
            [_count_true.remote(a) for a in active])))
    mis = [ray.put(np.zeros(sizes[p], dtype=bool)) for p in range(P)]
    t = 0
    while remaining > 0 and t < max_rounds:
        keys = [_round_keys.remote(int(bounds[p]), int(bounds[p + 1]),
                                   active[p], key_offset + t)
                for p in range(P)]
        if P > 1:
            push = [a.min_push.options(num_returns=P).remote(keys[p])
                    for p, a in enumerate(actors)]
        else:
            push = [[a.min_push.remote(keys[p])]
                    for p, a in enumerate(actors)]
        nbr_min = [_reduce_min_fresh.remote(
            sizes[q], *[push[p][q] for p in range(P)]) for q in range(P)]
        sel = [_select.remote(keys[q], nbr_min[q]) for q in range(P)]
        if P > 1:
            push2 = [a.min_push.options(num_returns=P).remote(sel[p][1])
                     for p, a in enumerate(actors)]
        else:
            push2 = [[a.min_push.remote(sel[p][1])]
                     for p, a in enumerate(actors)]
        nbr_mis = [_reduce_min_fresh.remote(
            sizes[q], *[push2[p][q] for p in range(P)]) for q in range(P)]
        upd = [_update.remote(active[q], mis[q], sel[q][0], nbr_mis[q])
               for q in range(P)]
        active = [u[0] for u in upd]
        mis = [u[1] for u in upd]
        remaining = int(sum(ray.get([u[2] for u in upd])))
        t += 1

    masks = ray.get(mis)
    out = np.concatenate([np.flatnonzero(m) + bounds[p]
                          for p, m in enumerate(masks)])
    return out.astype(np.int64), t, remaining == 0
