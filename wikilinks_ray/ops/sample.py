"""Deterministic sampling / domain mixing for training-data pipelines.

A 100 TB curation run needs *reproducible* sampling: the decision for a
document must be a pure function of (seed, key), not of partitioning,
worker count, or execution order — so a resumed or re-sharded run keeps
or drops exactly the same documents, and the driver's DuckDB oracle can
re-derive the sample byte-for-byte.

Mechanism: ``u = md5(seed ':' key) mod 1000`` (the first 8 digest bytes
little-endian — DuckDB's ``md5_number_upper``). A document survives if
``u < permille``; per-source permille rates give domain mixing ("keep
5% of crawl, 80% of books"). Embarrassingly parallel: one C-speed md5
per row inside ``map_batches``, no shuffle, no driver state — the same
shape as ops/text.py fingerprints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SAMPLE_MOD = 1000


def sample_units(keys, seed: int) -> np.ndarray:
    """``md5(seed ':' key) mod 1000`` per key (uint64 in [0, 1000))."""
    out = np.empty(len(keys), np.uint64)
    prefix = f"{seed}:".encode()
    for i, k in enumerate(keys):
        d = hashlib.md5(prefix + str(k).encode()).digest()
        out[i] = int.from_bytes(d[:8], "little") % SAMPLE_MOD
    return out


def hash_sample(ds: "object", permille: int, *, key_col: str = "doc_id",
                seed: int = 0) -> "object":
    """Keep rows whose sampling unit < ``permille`` (deterministic
    Bernoulli at rate permille/1000, keyed on ``key_col``)."""

    def keep(t: pa.Table) -> pa.Table:
        u = sample_units(t.column(key_col).to_pylist(), seed)
        return t.filter(pa.array(u < permille))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: "object", permille_by_stratum: dict[str, int], *,
                      strata_col: str = "source", key_col: str = "doc_id",
                      seed: int = 0, default_permille: int = 0) -> "object":
    """Per-stratum deterministic sampling (domain mixing): a row in
    stratum ``s`` survives iff ``md5(seed ':' key) mod 1000 <
    permille_by_stratum[s]``. Strata missing from the dict fall back to
    ``default_permille`` (0 = drop).

    The rate table rides into each task as a plain dict (tiny, by
    value); rows never shuffle."""

    def keep(t: pa.Table) -> pa.Table:
        u = sample_units(t.column(key_col).to_pylist(), seed)
        strata = t.column(strata_col).to_pylist()
        lim = np.fromiter(
            (permille_by_stratum.get(s, default_permille) for s in strata),
            np.uint64, len(strata))
        return t.filter(pa.array(u < lim))

    return ds.map_batches(keep, batch_format="pyarrow")
