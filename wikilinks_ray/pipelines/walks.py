"""Deterministic random walks over CSR shard actors.

DeepWalk/node2vec-style corpus generation for graph embeddings — a
standard training-data op the reference lacks (its traversal engine
stops at BFS, WikiRoutes.kt:102-124; SURVEY.md §2.12). Walks here are
DETERMINISTIC: at step ``t`` from vertex ``v`` the next hop is the
``H(v, t) % out_deg(v)``-th smallest out-neighbor, with the frozen
integer hash

    H(v, t) = (v % 1000003) * 1103515245 + t * 12345

(`% 1000003` first keeps every intermediate < 2^51, so the arithmetic
is identical in numpy int64 and SQL BIGINT — no wraparound divergence).
Determinism makes the whole walk table re-derivable by unrolled SQL
joins (``__ray_entry__._walks_oracle_sql``) AND makes reruns
reproducible, which matters for resumable corpus generation; for
statistically random walks, salt the hash with a run seed.

Execution shape: one superstep per walk step. The driver holds only the
walk frontier (one current vertex per live walk — O(S) for S seeds,
NOT O(V) or O(E)); each superstep partitions the frontier by owner
range (one ``searchsorted`` + take per shard) and asks each shard actor
for the next hop of its owned walkers (``walk_next``: two int ops + a
CSR gather per walker). Walks that reach a dangling vertex end early.
At 100 TB scale S is the batch knob: walk seeds stream through this in
seed batches sized to driver memory, each batch an independent job —
walks are embarrassingly parallel across batches.
"""

from __future__ import annotations

import numpy as np

import ray

WALK_MOD = 1_000_003
WALK_MUL = 1_103_515_245
WALK_ADD = 12_345


def walk_hash(v: np.ndarray, step: int) -> np.ndarray:
    """The frozen per-step hash (see module docstring)."""
    return (v % WALK_MOD) * WALK_MUL + step * WALK_ADD


def random_walks(
    actors: list,
    bounds: np.ndarray,
    seeds: np.ndarray,
    *,
    length: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Walk ``length`` steps from each seed; returns parallel arrays
    ``(walk_id, step, vertex)`` — one row per visited position,
    including step 0 at the seed. ``walk_id`` is the seed's index in
    ``seeds``. A walk ends early at a vertex with no out-edges."""
    seeds = np.asarray(seeds, dtype=np.int64)
    S = len(seeds)
    P = len(actors)
    walk_ids = [np.arange(S, dtype=np.int64)]
    steps = [np.zeros(S, dtype=np.int64)]
    verts = [seeds.copy()]

    live_ids = np.arange(S, dtype=np.int64)
    cur = seeds.copy()
    for t in range(length):
        if len(cur) == 0:
            break
        owner = np.searchsorted(bounds, cur, side="right") - 1
        order = np.argsort(owner, kind="stable")
        cur_s, ids_s, owner_s = cur[order], live_ids[order], owner[order]
        segs = np.searchsorted(owner_s, np.arange(P + 1))
        futs, spans = [], []
        for p in range(P):
            a, b = segs[p], segs[p + 1]
            if a == b:
                continue
            futs.append(actors[p].walk_next.remote(cur_s[a:b], t))
            spans.append((a, b))
        nxt = np.full(len(cur_s), -1, dtype=np.int64)
        for (a, b), res in zip(spans, ray.get(futs)):
            nxt[a:b] = res
        alive = nxt >= 0
        live_ids = ids_s[alive]
        cur = nxt[alive]
        walk_ids.append(live_ids.copy())
        steps.append(np.full(len(cur), t + 1, dtype=np.int64))
        verts.append(cur.copy())

    return (np.concatenate(walk_ids), np.concatenate(steps),
            np.concatenate(verts))
