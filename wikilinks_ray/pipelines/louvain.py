"""Louvain-style community detection: synchronous, deterministic,
fixed-round modularity-gain label moves in exact integer arithmetic.

The classic Louvain local-move phase (Blondel et al. 2008), re-derived
for a distributed synchronous engine (the same adaptation lineage as
Grappolo/distributed-Louvain): every round, each ACTIVE vertex i is
conceptually removed from its community and re-inserted into the
candidate community c (its neighbor communities plus its current one)
maximizing the modularity gain. With unit edge weights the argmax over
c of

    dQ(c)  ∝  2m * k_in(i, c)  -  deg(i) * sig_tot(c \\ i)

needs only integers (2m = sum of degrees, k_in = edges from i into c,
sig_tot = community degree sum, minus deg(i) when c is i's own
community) — so the whole trajectory is value-hash oracle-comparable;
DuckDB replays it round by round (``_louvain_oracle_sql``).

Synchronous moves oscillate on bipartite-ish structure, so rounds
alternate by vertex-id parity (round t moves only vertices with
``v % 2 == t % 2`` — the standard coloring-style determinism trick);
ties break to the SMALLEST community id. The run is a FIXED number of
rounds (a deterministic trajectory, not a convergence claim); the final
labels are canonicalized to each community's min member id.

Distribution shape (SCALE.md): per round, one `label_messages` push per
shard actor — raw (dst, src_label) pairs pre-partitioned by dst range,
the labelprop shuffle — then one vectorized reducer per range scores
candidates with the broadcast (sig_tot, 2m) terms. The driver holds the
label chunk refs, the O(n) degree array and the per-round sig_tot array
(8 B/vertex — the per-vertex-query footprint every gated graph query
carries); everything per-edge stays in the actors/reducers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray

from ..state.csr import vertex_ranges


def undirected_simple_edges(edges: "ray.data.Dataset",
                            num_buckets: int = 64) -> "ray.data.Dataset":
    """Symmetric closure of the simple undirected graph under
    ``edges``: drop self-loops, dedup {lo, hi}, emit both directions.
    The exact twin of the oracle's cedges/edges CTEs."""
    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"lo": pa.array(np.minimum(s, d), pa.int64()),
                         "hi": pa.array(np.maximum(s, d), pa.int64())})

    from ..stages.agg import distinct_pairs

    cn = distinct_pairs(edges.map_batches(canon, batch_format="pyarrow"),
                        "lo", "hi", num_buckets=num_buckets)

    def both(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "dst": pa.array(np.concatenate([hi, lo]), pa.int64()),
        })

    return cn.map_batches(both, batch_format="pyarrow")


@ray.remote
def _louvain_reduce(lo: int, active_parity: int, m2: int,
                    old_chunk: np.ndarray, deg_chunk: np.ndarray,
                    sig_ref, *messages):
    """One range's move decisions: per active vertex, argmax over
    neighbor communities + current of the integer gain score. Returns
    (new_chunk, n_changed, (labels, sums) partial sig_tot of the new
    chunk)."""
    sig = sig_ref
    new = old_chunk.copy()
    ds = [m[0] for m in messages if m is not None and len(m[0])]
    ls = [m[1] for m in messages if m is not None and len(m[0])]
    if ds:
        d = np.concatenate(ds) - lo
        c = np.concatenate(ls)
        # kin per (vertex, community): RLE over the sorted pairs
        order = np.lexsort((c, d))
        d, c = d[order], c[order]
        newp = np.empty(len(d), dtype=bool)
        newp[0] = True
        newp[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(newp)
        kin = np.diff(np.append(starts, len(d))).astype(np.int64)
        pv, pc = d[starts], c[starts]
        # current community rides along as a kin=0 candidate (dedup by
        # max keeps the real count when the neighbor community IS the
        # current one)
        av = np.flatnonzero(deg_chunk > 0)
        pv = np.concatenate([pv, av])
        pc = np.concatenate([pc, old_chunk[av]])
        kin = np.concatenate([kin, np.zeros(len(av), np.int64)])
        order = np.lexsort((-kin, pc, pv))
        pv, pc, kin = pv[order], pc[order], kin[order]
        first = np.empty(len(pv), dtype=bool)
        first[0] = True
        first[1:] = (pv[1:] != pv[:-1]) | (pc[1:] != pc[:-1])
        pv, pc, kin = pv[first], pc[first], kin[first]

        degv = deg_chunk[pv]
        cur = old_chunk[pv]
        sig_c = sig[pc] - np.where(pc == cur, degv, 0)
        score = m2 * kin - degv * sig_c
        # per vertex: max score, tie -> smallest community id
        sel = np.lexsort((pc, -score, pv))
        sv, sc_ = pv[sel], pc[sel]
        firstv = np.empty(len(sv), dtype=bool)
        firstv[0] = True
        firstv[1:] = sv[1:] != sv[:-1]
        winners_v, winners_c = sv[firstv], sc_[firstv]
        act = ((winners_v + lo) % 2) == active_parity
        new[winners_v[act]] = winners_c[act]
    changed = int((new != old_chunk).sum())
    present = deg_chunk > 0
    labs, inv = np.unique(new[present], return_inverse=True)
    sums = np.bincount(inv, weights=deg_chunk[present]).astype(np.int64)
    return new, changed, (labs, sums)


@dataclass
class LouvainResult:
    labels: np.ndarray      # canonical min-member community per vertex
    rounds: int
    changed_history: list[int]


def louvain_rounds(actors: list, n_vertices: int, degrees: np.ndarray,
                   *, rounds: int = 8) -> LouvainResult:
    """Run ``rounds`` synchronous parity-alternating Louvain move
    rounds over the symmetric-simple CSR pool. ``degrees`` is the
    undirected degree array (0 for ids outside the graph)."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    m2 = int(degrees.sum())
    assert m2 * max(int(degrees.max()), 1) < 2 ** 62, \
        "louvain int64 headroom: weights need rescaling at this size"

    labels = [np.arange(bounds[p], bounds[p + 1], dtype=np.int64)
              for p in range(P)]
    chunk_refs = [ray.put(c) for c in labels]
    deg_refs = [ray.put(degrees[bounds[p]:bounds[p + 1]]) for p in range(P)]
    sig = degrees.astype(np.int64).copy()  # singleton init: sig_tot = deg
    history: list[int] = []

    for t in range(1, rounds + 1):
        sig_ref = ray.put(sig)
        if P > 1:
            msgs = [a.label_messages.options(num_returns=P).remote(
                chunk_refs[p]) for p, a in enumerate(actors)]
        else:
            msgs = [[a.label_messages.remote(chunk_refs[p])]
                    for p, a in enumerate(actors)]
        out = [_louvain_reduce.options(num_returns=3).remote(
            int(bounds[q]), t % 2, m2, chunk_refs[q], deg_refs[q],
            sig_ref, *[msgs[p][q] for p in range(P)])
            for q in range(P)]
        chunk_refs = [o[0] for o in out]
        history.append(sum(ray.get([o[1] for o in out])))
        sig = np.zeros(n_vertices, dtype=np.int64)
        for labs, sums in ray.get([o[2] for o in out]):
            np.add.at(sig, labs, sums)

    final = np.concatenate(ray.get(chunk_refs)) if P else \
        np.empty(0, np.int64)
    # canonicalize: community id -> min member id (deg>0 members only)
    present = degrees > 0
    vs = np.flatnonzero(present)
    order = np.lexsort((vs, final[vs]))
    sv = final[vs][order]
    first = np.empty(len(sv), dtype=bool)
    if len(sv):
        first[0] = True
        first[1:] = sv[1:] != sv[:-1]
        reps = np.cumsum(first) - 1
        minmem = vs[order][np.flatnonzero(first)]
        canon = final.copy()
        canon[vs[order]] = minmem[reps]
    else:
        canon = final
    return LouvainResult(labels=canon, rounds=rounds,
                         changed_history=history)
