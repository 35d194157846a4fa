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

Distribution shape (SCALE.md): per round, one `label_weight_sums` push
per shard actor — (dst, src_label, weight_sum) triples PRE-COMBINED per
(dst, label) inside the shard (k_in is additive, unlike labelprop's
mode, so the map-side combiner applies: shipped rows are bounded by
distinct (dst, label) pairs, never edges) and pre-partitioned by dst
range — then one vectorized reducer per range scores candidates with
the broadcast (sig_tot, 2m) terms. The driver holds the
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
    neighbor communities + current of the integer gain score. Messages
    are PRE-COMBINED (dst, label, weight_sum) triples
    (``CSRShardActor.label_weight_sums``); ``deg_chunk`` is the
    strength chunk (unweighted degree in phase 1). Returns
    (new_chunk, n_changed, (labels, sums) partial sig_tot of the new
    chunk)."""
    sig = sig_ref
    new = old_chunk.copy()
    ds = [m[0] for m in messages if m is not None and len(m[0])]
    ls = [m[1] for m in messages if m is not None and len(m[0])]
    ws = [m[2] for m in messages if m is not None and len(m[0])]
    if ds:
        d = np.concatenate(ds) - lo
        c = np.concatenate(ls)
        w = np.concatenate(ws)
        # kin per (vertex, community): RLE-sum over the sorted triples
        order = np.lexsort((c, d))
        d, c, w = d[order], c[order], w[order]
        newp = np.empty(len(d), dtype=bool)
        newp[0] = True
        newp[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(newp)
        kin = np.add.reduceat(w.astype(np.int64), starts)
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
            msgs = [a.label_weight_sums.options(num_returns=P).remote(
                chunk_refs[p]) for p, a in enumerate(actors)]
        else:
            msgs = [[a.label_weight_sums.remote(chunk_refs[p])]
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


def contract_by_labels(sym_edges: "ray.data.Dataset", labels: np.ndarray,
                       *, num_buckets: int = 64):
    """Contract the symmetric simple graph under a community labeling:
    returns (inter_edges, internal) where ``inter_edges`` is a Dataset
    (src, dst, weight) of BOTH-direction community-pair edge counts
    (self-loops excluded — the weighted rounds must not see them in
    k_in) and ``internal`` is the per-community A_cc array (= 2x the
    undirected intra-edge count, since ``sym_edges`` carries both
    directions), the self-loop mass that joins the community's strength
    but moves with it. Labels broadcast once via ``ray.put`` (8 B/vertex,
    the per-vertex-query footprint); both reductions are int64-keyed
    ``grouped_agg`` plans."""
    from ..stages.agg import grouped_agg

    lref = ray.put(np.ascontiguousarray(labels, dtype=np.int64))

    def inter(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        s = lab[t.column("src").to_numpy(zero_copy_only=False)]
        d = lab[t.column("dst").to_numpy(zero_copy_only=False)]
        keep = s != d
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    def intra(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        s = lab[t.column("src").to_numpy(zero_copy_only=False)]
        d = lab[t.column("dst").to_numpy(zero_copy_only=False)]
        return pa.table({"c": pa.array(s[s == d], pa.int64())})

    inter_edges = grouped_agg(
        sym_edges.map_batches(inter, batch_format="pyarrow"),
        ["src", "dst"], None, "count", out_col="weight",
        num_buckets=num_buckets)
    internal_tbl = grouped_agg(
        sym_edges.map_batches(intra, batch_format="pyarrow"),
        ["c"], None, "count", out_col="w", num_buckets=num_buckets)
    internal = np.zeros(len(labels), dtype=np.int64)
    for b in ray.get(internal_tbl.to_arrow_refs()):
        if b.num_rows:
            internal[b.column("c").to_numpy(zero_copy_only=False)] = \
                b.column("w").to_numpy(zero_copy_only=False)
    return inter_edges, internal


@dataclass
class LouvainMultilevelResult:
    labels: np.ndarray          # final canonical community per vertex
    phase1_labels: np.ndarray   # canonical labels after the local phase
    n_phase1: int               # communities after phase 1
    n_final: int                # communities after the contracted phase
    changed_history: list[int]
    changed_history2: list[int]


def louvain_multilevel(actors: list, sym_edges: "ray.data.Dataset",
                       n_vertices: int, degrees: np.ndarray, *,
                       rounds1: int = 6, rounds2: int = 6,
                       shard_dir: str | None = None,
                       num_shards: int | None = None) -> LouvainMultilevelResult:
    """Two-level Louvain (Blondel et al. 2008 phases 1+2): the local
    move phase over unit weights, then the community graph — inter
    edges weighted by pair counts, per-community self-loop mass riding
    in the strength array — takes the SAME synchronous parity-gated
    integer move rounds, now weighted (contracted vertices keep their
    phase-1 rep ids, so the id space and every O(n) driver array stay
    unchanged); final labels project back through the phase-1 map.

    The contracted shards rebuild through `shard_edges(weight_col=...)`
    — a graph 1000x smaller than the input in the typical regime; the
    whole phase-2 exchange is community-pair-bounded."""
    import uuid

    from ..state.csr import create_shard_actors, shard_edges

    if shard_dir is None:
        shard_dir = f"/tmp/wikilinks_ray_louvain/{uuid.uuid4().hex[:12]}"

    p1 = louvain_rounds(actors, n_vertices, degrees, rounds=rounds1)
    lab1 = p1.labels
    inter_edges, internal = contract_by_labels(sym_edges, lab1)
    inter_edges = inter_edges.materialize()

    if num_shards is None:
        num_shards = len(actors)
    if inter_edges.count() > 0:
        paths = shard_edges(inter_edges, n_vertices, num_shards, shard_dir,
                            by="src", weight_col="weight")
        actors2, _ = create_shard_actors(paths, n_vertices)
        try:
            ws = ray.get([a.out_weights.remote() for a in actors2])
            strengths = internal + np.concatenate(ws)
            p2 = louvain_rounds(actors2, n_vertices, strengths,
                                rounds=rounds2)
        finally:
            for a in actors2:
                ray.kill(a)
        lab2 = p2.labels
        hist2 = p2.changed_history
    else:
        # every phase-1 community is internally closed: nothing to move
        lab2 = np.arange(n_vertices, dtype=np.int64)
        hist2 = []

    # project: vertex -> phase-1 rep -> phase-2 community of that rep.
    # reps are min members, so min-rep canonicalization of phase 2 is
    # already min-ORIGINAL-member canonical after projection.
    final = lab2[lab1]
    present = degrees > 0
    return LouvainMultilevelResult(
        labels=final,
        phase1_labels=lab1,
        n_phase1=int(np.unique(lab1[present]).size),
        n_final=int(np.unique(final[present]).size),
        changed_history=p1.changed_history,
        changed_history2=hist2,
    )
