"""Community detection: synchronous label propagation with deterministic
tie-breaking.

No reference implementation (SURVEY.md §2.12). Each superstep is the
``groupby(vertex) -> mode(neighbor labels)`` shuffle: a mode is NOT
combiner-decomposable (unlike sum/min), so the shards emit raw
(dst, label) message pairs pre-partitioned by dst range
(``CSRShardActor.label_messages`` = the map-side shuffle write), and one
reducer per range computes the per-vertex mode fully vectorized
(lexsort + run-length encoding). Determinism: ties broken by the
SMALLEST label; vertices with no in-messages keep their label; update is
synchronous (all vertices flip together), run for ``max_iter`` or until
no label changes. Run over symmetrized shards for undirected semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import ray

from ..state.checkpoint import latest_checkpoint, save_checkpoint
from ..state.csr import vertex_ranges


def _mode_per_dst(dsts: np.ndarray, labels: np.ndarray, lo: int, size: int,
                  old_chunk: np.ndarray) -> np.ndarray:
    """Vectorized per-dst mode with smallest-label tie-break."""
    if len(dsts) == 0:
        return old_chunk.copy()
    order = np.lexsort((labels, dsts))
    d, l = dsts[order], labels[order]
    # run-length encode (dst, label) pairs
    new_pair = np.empty(len(d), dtype=bool)
    new_pair[0] = True
    new_pair[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(new_pair)
    counts = np.diff(np.append(starts, len(d)))
    pd_, pl = d[starts], l[starts]
    # pick per dst: max count, tie -> smallest label. pairs are sorted by
    # (dst, label); a stable lexsort on (-count) within dst keeps smallest
    # label first among equal counts.
    sel = np.lexsort((pl, -counts, pd_))
    pd_s, pl_s = pd_[sel], pl[sel]
    first = np.empty(len(pd_s), dtype=bool)
    first[0] = True
    first[1:] = pd_s[1:] != pd_s[:-1]
    out = old_chunk.copy()
    out[pd_s[first] - lo] = pl_s[first]
    return out


@ray.remote
def _reduce_mode(lo: int, size: int, old_chunk: np.ndarray,
                 *messages) -> tuple[np.ndarray, int]:
    ds = [m[0] for m in messages if m is not None and len(m[0])]
    ls = [m[1] for m in messages if m is not None and len(m[0])]
    if not ds:
        return old_chunk.copy(), 0
    dsts = np.concatenate(ds)
    labels = np.concatenate(ls)
    new = _mode_per_dst(dsts, labels, lo, size, old_chunk)
    return new, int((new != old_chunk).sum())


@dataclass
class LabelPropResult:
    labels: list
    bounds: np.ndarray
    iterations: int
    converged: bool
    metrics_history: list[dict] = field(default_factory=list)

    def to_array(self) -> np.ndarray:
        chunks = [c if isinstance(c, np.ndarray) else ray.get(c) for c in self.labels]
        return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


def label_propagation(
    actors: list,
    n_vertices: int,
    *,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = True,
) -> LabelPropResult:
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
    it = start_iter
    while it < max_iter and changed != 0:
        it += 1
        if P > 1:
            msgs = [a.label_messages.options(num_returns=P).remote(chunk_refs[p])
                    for p, a in enumerate(actors)]
        else:
            msgs = [[a.label_messages.remote(chunk_refs[p])] for p, a in enumerate(actors)]
        out = [
            _reduce_mode.options(num_returns=2).remote(
                int(bounds[q]), int(bounds[q + 1] - bounds[q]), chunk_refs[q],
                *[msgs[p][q] for p in range(P)])
            for q in range(P)
        ]
        chunk_refs = [o[0] for o in out]
        changed = int(sum(ray.get([o[1] for o in out])))
        history.append({"iteration": it, "changed": changed})
        if checkpoint_dir and (it % checkpoint_every == 0 or changed == 0):
            save_checkpoint(checkpoint_dir, it, ray.get(chunk_refs),
                            {"history": history, "changed": changed})

    return LabelPropResult(
        labels=chunk_refs,
        bounds=bounds,
        iterations=it,
        converged=changed == 0,
        metrics_history=history,
    )
