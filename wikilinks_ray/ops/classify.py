"""Broadcast-model batched inference: a hashing-trick linear quality
classifier over the documents table.

The 100 TB-pipeline pattern this pins down: a model is ``ray.put`` ONCE,
every inference task/actor reads it from the object store (zero-copy on
a node, one transfer per node on a cluster), and scoring is a vectorized
per-batch kernel — never a per-row Python model call, never a model
re-ship per batch. A real fasttext/transformer quality filter slots into
exactly this shape; the stand-in model here is deliberately integer and
content-derived so the WHOLE inference pass is value-hash reproducible
in SQL (the ``classify_quality`` oracle):

    feat(token) = md5_uint64(token) % D        (DuckDB md5_number_upper)
    logit(doc)  = sum over token OCCURRENCES of w[feat]   (int64, exact)
    label(doc)  = logit >= threshold

Weights are themselves md5-derived from a seed, so the SQL twin inlines
the engine's own weight table (the same cannot-drift trick as the
minhash permutation constants).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import _TokenHasher
from .text import _TOKEN_RE

HASH_DIM = 256


def make_linear_model(seed: int = 11, dim: int = HASH_DIM) -> np.ndarray:
    """Deterministic int64 weight vector in [-8, 8]: w[i] =
    (md5_uint64(f"w{seed}:{i}") % 17) - 8. Integer weights keep the
    logit an exact int64 sum (order-independent — float dots would
    hash-drift under re-partitioning)."""
    return np.fromiter(
        ((int.from_bytes(hashlib.md5(f"w{seed}:{i}".encode()).digest()[:8],
                         "little") % 17) - 8 for i in range(dim)),
        dtype=np.int64, count=dim)


class LinearClassifier:
    """Callable batch scorer. Construct with the weights (or an
    ObjectRef of them — resolved once per actor/worker, NOT per batch)
    and map over (doc_id, text) batches; emits (doc_id, logit, label).
    """

    def __init__(self, weights, threshold: int = 0):
        self.w = np.asarray(ray.get(weights) if isinstance(
            weights, ray.ObjectRef) else weights, dtype=np.int64)
        self.dim = len(self.w)
        self.threshold = int(threshold)
        self._hasher = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        # one flat token array for the whole batch: the md5 cache runs
        # per distinct token, the weight gather + per-doc segment sum
        # are single numpy kernels
        toks: list[str] = []
        lens = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tt = _TOKEN_RE.findall((t or "").lower())
            lens[i] = len(tt)
            toks.extend(tt)
        logits = np.zeros(len(texts), dtype=np.int64)
        if toks:
            h = self._hasher.token_hashes(toks)
            wts = self.w[(h % np.uint64(self.dim)).astype(np.int64)]
            starts = np.zeros(len(texts) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            nonempty = np.flatnonzero(lens)
            sums = np.add.reduceat(wts, starts[nonempty])
            logits[nonempty] = sums
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "logit": pa.array(logits),
            "label": pa.array((logits >= self.threshold).astype(np.int64)),
        })


def classify_documents(docs: "ray.data.Dataset", *,
                       weights: np.ndarray | None = None,
                       threshold: int = 0,
                       concurrency: int = 4) -> "ray.data.Dataset":
    """Score every document with the broadcast linear model.

    ``weights`` default to :func:`make_linear_model`. Two dispatch
    paths, same scorer:

    - **small model** (≤1 MB): a TASK pool whose per-worker-process
      singleton holds the scorer (md5 token cache included) — task
      retries re-execute from lineage with no object-store dependency
      (Ray Data puts actor constructor args in the object store, which
      makes actor RESTARTS depend on those objects surviving —
      ray#53727);
    - **large model**: an actor pool resolving a ``ray.put`` ref once
      per actor in ``__init__`` (one object-store read per actor,
      zero-copy on-node) — for a model too big to ship per task, the
      restart hazard is the documented trade."""
    if weights is None:
        weights = make_linear_model()
    w = np.ascontiguousarray(np.asarray(weights, dtype=np.int64))
    if w.nbytes > (1 << 20):
        return docs.select_columns(["doc_id", "text"]).map_batches(
            LinearClassifier, fn_constructor_args=(ray.put(w), threshold),
            batch_format="pyarrow", concurrency=concurrency)
    wb = w.tobytes()
    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda b: _score_small(b, wb, threshold),
        batch_format="pyarrow", concurrency=concurrency)


_SCORERS: dict = {}


def _score_small(batch: pa.Table, w_bytes: bytes, threshold: int) -> pa.Table:
    """Task-pool scorer: per-worker-process singleton keyed by model
    bytes, so the token-md5 cache persists across batches."""
    key = (hashlib.md5(w_bytes).hexdigest(), threshold)
    sc = _SCORERS.get(key)
    if sc is None:
        if len(_SCORERS) > 4:  # bound worker memory across many models
            _SCORERS.clear()
        sc = _SCORERS[key] = LinearClassifier(
            np.frombuffer(w_bytes, dtype=np.int64), threshold)
    return sc(batch)
