"""HyperANF: approximate neighborhood function via HLL register
max-merge supersteps (Boldi, Rosa & Vigna, "HyperANF: Approximating the
Neighbourhood Function of Very Large Graphs on a Budget", WWW 2011).

No reference implementation (SURVEY.md §2.12). Each vertex carries a
64-register HyperLogLog sketch of its K-hop IN-ball
``{u : dist(u -> v) <= K}``; one superstep unions every vertex's sketch
into its out-neighbors' (register-wise max — a perfect idempotent
combiner, the whole point of sketching the neighborhood function
instead of materializing frontiers per source: exact all-pairs would be
O(V) BFS runs). Two exactness-preserving transport cuts on top:

- **row frontier** (round 3): only out-edges of rows whose sketch
  changed last superstep re-push (2.8× measured at 40.5M edges);
- **register delta + sparse blocks** (round 4): the push carries the
  DELTA sketch — changed registers' new values, 0 elsewhere (max with
  0 is a no-op, so per-register exactness follows by the same
  already-absorbed induction as the row frontier) — and mostly-zero
  reduceat outputs ship as (flat_idx, value) pairs, ~5 B per live
  register instead of 64 B per touched row. Late supersteps (balls
  saturating, few registers moving) stop paying the dense E-shaped
  exchange entirely; this strictly dominates the 6-bit register
  packing considered earlier (a fixed 64->48 B/row, 1.33×).

The sketch machinery is the FROZEN integer HLL of stages/agg.py
(md5-derived hashes, 64 registers, scaled-integer estimator), so every
superstep and the final per-vertex ball estimate are bit-reproducible
by the unrolled SQL max-merge in ``__ray_entry__._anf_oracle_sql``.

Summing ``ball_est`` over vertices at iteration t gives the
neighborhood function N(t) (number of pairs within distance t) — the
standard route to effective-diameter estimates.
"""

from __future__ import annotations

import hashlib

import numpy as np

import ray

from ..stages.agg import HLL_K, HLL_M, HLL_P, hll_estimate
from ..state.csr import vertex_ranges


def vertex_registers(ids: np.ndarray) -> np.ndarray:
    """Initial sketch of ``{v}`` per id: uint8 (len, 64) registers with
    one slot set — bucket = top ``HLL_P`` hash bits, value = rho of the
    low 32 bits. Identical hash convention to grouped_approx_distinct
    (md5 little-endian first 8 bytes == DuckDB md5_number_upper)."""
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(str(int(v)).encode()).digest()[:8],
                        "little") for v in ids),
        dtype=np.uint64, count=len(ids))
    bucket = (hs >> np.uint64(64 - HLL_P)).astype(np.int64)
    rem = hs & np.uint64(0xFFFFFFFF)
    rho = np.where(
        rem == 0, 33,
        32 - np.floor(np.log2(np.maximum(rem, 1)
                              .astype(np.float64))).astype(np.int64))
    regs = np.zeros((len(ids), HLL_M), dtype=np.uint8)
    regs[np.arange(len(ids)), bucket] = rho.astype(np.uint8)
    return regs


@ray.remote
def _init_regs(lo: int, hi: int) -> np.ndarray:
    return vertex_registers(np.arange(lo, hi, dtype=np.int64))


@ray.remote(num_returns=3)
def _merge_regs(old: np.ndarray, *partials):
    """(merged registers, changed-row mask, delta sketch).

    The mask feeds the next superstep's frontier push
    (sketch_push(changed=...)) — saturated rows stop being re-gathered.
    The DELTA sketch (new value where a register changed, 0 elsewhere)
    is what the next superstep pushes instead of the full registers:
    exact per register by the same induction as the row frontier —
    every dst already absorbed this row's previous value, and max
    with 0 is a no-op — while late-superstep blocks turn mostly-zero
    and ship in sketch_push's sparse form."""
    acc = old.copy()
    touched = np.zeros(len(acc), dtype=bool)
    for p in partials:
        if p is None:
            continue
        # blocks may be read-only object-store views — never write them
        if isinstance(p, tuple) and len(p) == 5 and p[0] == "s":
            _, offsets, flat_idx, vals, n_rows = p
            sub = acc[offsets]  # (n_rows, HLL_M) copy
            flat = sub.reshape(-1)
            # flat_idx entries are unique (flatnonzero of one block),
            # so plain fancy-index max is safe — no ufunc.at needed
            flat[flat_idx] = np.maximum(flat[flat_idx], vals)
            acc[offsets] = sub
            touched[offsets] = True
        else:
            offsets, block = p
            acc[offsets] = np.maximum(acc[offsets], block)
            touched[offsets] = True
    changed = touched.copy()
    idx = np.flatnonzero(touched)
    if len(idx):
        diff = acc[idx] != old[idx]
        changed[idx] = diff.any(axis=1)
    delta = np.zeros_like(acc)
    cidx = np.flatnonzero(changed)
    if len(cidx):
        rows = acc[cidx]
        delta[cidx] = np.where(rows != old[cidx], rows, 0)
    return acc, changed, delta


@ray.remote
def _estimate_chunk(reg_chunk: np.ndarray) -> np.ndarray:
    r = reg_chunk.astype(np.int64)
    z = (np.int64(1) << (HLL_K - r)).sum(axis=1)
    v_zero = (r == 0).sum(axis=1)
    return np.fromiter(
        (hll_estimate(int(zz), int(vv)) for zz, vv in zip(z, v_zero)),
        dtype=np.int64, count=len(z))


def hyper_anf(actors: list, n_vertices: int, *, iters: int = 4,
              per_iteration: bool = False) -> np.ndarray:
    """K-hop in-ball size estimates. Register state lives in the object
    store as per-range (chunk, 64) uint8 blocks; the driver never
    touches a sketch. Returns int64[n] at iteration ``iters``, or the
    full int64[iters+1, n] trajectory with ``per_iteration=True``
    (column t = ball estimates after t hops; the deltas feed harmonic
    centrality, :func:`harmonic_from_anf`)."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)
    chunk_refs = [_init_regs.remote(int(bounds[p]), int(bounds[p + 1]))
                  for p in range(P)]
    # first superstep: delta == the initial sketches (everything is new)
    delta_refs = chunk_refs
    changed_refs = [None] * P  # None = first superstep, push everything
    est_rounds = []
    if per_iteration:
        est_rounds.append([_estimate_chunk.remote(c) for c in chunk_refs])
    for _ in range(iters):
        if P > 1:
            push = [a.sketch_push.options(num_returns=P)
                     .remote(delta_refs[p], changed_refs[p])
                    for p, a in enumerate(actors)]
        else:
            push = [[a.sketch_push.remote(delta_refs[p], changed_refs[p])]
                    for p, a in enumerate(actors)]
        out = [
            _merge_regs.remote(chunk_refs[q], *[push[p][q] for p in range(P)])
            for q in range(P)
        ]
        chunk_refs = [o[0] for o in out]
        changed_refs = [o[1] for o in out]
        delta_refs = [o[2] for o in out]
        if per_iteration:
            est_rounds.append([_estimate_chunk.remote(c)
                               for c in chunk_refs])
    if per_iteration:
        return np.stack([np.concatenate(ray.get(r)) for r in est_rounds])
    ests = ray.get([_estimate_chunk.remote(c) for c in chunk_refs])
    return np.concatenate(ests) if ests else np.empty(0, np.int64)


def harmonic_from_anf(traj: np.ndarray, *, scale: int = 10**6
                      ) -> np.ndarray:
    """Approximate harmonic (in-)centrality from a ball-size trajectory:
    ``H(v) = sum_t max(ball_t - ball_{t-1}, 0) * scale // t`` — each
    hop-t shell weighted 1/t (Boldi-Vigna's HyperBall centrality
    estimator, "In-Core Computation of Geometric Centralities with
    HyperBall", 2013). Deltas clamp at 0: the HLL estimator's
    LC-to-raw branch switch can dip transiently, and the clamp keeps
    all floor divisions non-negative (= SQL-portable)."""
    out = np.zeros(traj.shape[1], dtype=np.int64)
    for t in range(1, traj.shape[0]):
        d = np.maximum(traj[t] - traj[t - 1], 0)
        out += (d * scale) // t
    return out
