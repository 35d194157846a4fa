"""Connected components: hash-min label propagation over CSR shards.

No reference implementation (SURVEY.md §2.12); the iteration skeleton is
the redirect-loop fixpoint generalized to the full graph. Per superstep
each ``CSRShardActor`` pushes, for every dst range, the elementwise MIN
of incoming src labels (the combiner form of the
``groupby(vertex).min()`` shuffle); one reducer per range takes
``new = min(old, candidates)``. Converges when no label changes —
labels end as the minimum vertex id of each (weakly) connected
component, matching the classic hash-min formulation exactly.

Run over SYMMETRIZED shards (``symmetrize_edges`` + ``shard_edges``) so
directed inputs yield weak components.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.checkpoint import latest_checkpoint, save_checkpoint
from ..state.csr import accum_min, vertex_ranges


def symmetrize_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """edges ∪ transpose (distinct not required: min/any aggregates are
    duplicate-insensitive)."""

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    return edges.union(edges.map_batches(swap, batch_format="pyarrow"))


@ray.remote(num_returns=3)
def _reduce_min_frontier(old_chunk: np.ndarray, *candidates):
    """_reduce_min + the changed-slot mask that drives the next
    superstep's frontier push (min_push(changed=...)) — vertices whose
    label didn't improve stop re-pushing. Exact under the idempotent
    monotone min-merge."""
    acc = old_chunk.copy()
    for c in candidates:
        accum_min(acc, c)
    changed = acc != old_chunk
    return acc, int(changed.sum()), changed


@dataclass
class ComponentsResult:
    labels: list  # per-range chunk refs
    bounds: np.ndarray
    iterations: int
    converged: bool
    metrics_history: list[dict] = field(default_factory=list)

    def to_array(self) -> np.ndarray:
        chunks = [c if isinstance(c, np.ndarray) else ray.get(c) for c in self.labels]
        return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


def connected_components(
    actors: list,
    n_vertices: int,
    *,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = True,
) -> ComponentsResult:
    """Hash-min CC over pre-built symmetric CSR shard actors."""
    P = len(actors)
    bounds = vertex_ranges(n_vertices, P)

    start_iter = 0
    history: list[dict] = []
    chunk_refs = None
    if resume and checkpoint_dir:
        ck = latest_checkpoint(checkpoint_dir)
        if ck is not None:
            start_iter, chunks, m = ck
            history = m.get("history", [])
            changed0 = int(m.get("changed", -1))
            chunk_refs = [ray.put(c) for c in chunks]
    if chunk_refs is None:
        changed0 = -1
        chunk_refs = [
            ray.put(np.arange(bounds[p], bounds[p + 1], dtype=np.int64))
            for p in range(P)
        ]

    changed = changed0
    changed_refs = [None] * P  # None = full push (first / post-resume)
    it = start_iter
    while it < max_iter and changed != 0:
        it += 1
        if P > 1:
            push = [a.min_push.options(num_returns=P)
                     .remote(chunk_refs[p], changed_refs[p])
                    for p, a in enumerate(actors)]
        else:
            push = [[a.min_push.remote(chunk_refs[p], changed_refs[p])]
                    for p, a in enumerate(actors)]
        out = [
            _reduce_min_frontier.remote(
                chunk_refs[q], *[push[p][q] for p in range(P)])
            for q in range(P)
        ]
        chunk_refs = [o[0] for o in out]
        changed_refs = [o[2] for o in out]
        changed = int(sum(ray.get([o[1] for o in out])))
        history.append({"iteration": it, "changed": changed})
        if checkpoint_dir and (it % checkpoint_every == 0 or changed == 0):
            save_checkpoint(checkpoint_dir, it, ray.get(chunk_refs),
                            {"history": history, "changed": changed})

    return ComponentsResult(
        labels=chunk_refs,
        bounds=bounds,
        iterations=it,
        converged=changed == 0,
        metrics_history=history,
    )
