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


def sample_priorities(keys, seed: int) -> np.ndarray:
    """Full-width deterministic priority per key:
    ``md5(seed ':' key) first-8-bytes-LE >> 1`` (int64-safe, DuckDB
    ``md5_number_upper(...) >> 1`` twin)."""
    out = np.empty(len(keys), np.int64)
    prefix = f"{seed}:".encode()
    for i, k in enumerate(keys):
        d = hashlib.md5(prefix + str(k).encode()).digest()
        out[i] = int.from_bytes(d[:8], "little") >> 1
    return out


def fixed_size_sample(ds: "object", k: int, *, key_col: str = "doc_id",
                      strata_col: str | None = None, seed: int = 0,
                      num_buckets: int = 64) -> "object":
    """Deterministic fixed-SIZE sample: the ``k`` rows with the
    smallest md5 priorities — globally, or per stratum when
    ``strata_col`` is given (fixed-size domain mixing: "exactly k docs
    per source"). Pure function of (seed, key): partitioning-, order-
    and worker-count-independent, so a resumed run redraws the same
    sample and the DuckDB oracle re-derives it with one
    ``row_number() OVER (ORDER BY pri, key)`` window.

    Combiner-first: each batch keeps its own k smallest per stratum
    (lexsort + run-length head), so at most batches×k rows per stratum
    shuffle; one bucketed stratum-hash pass re-ranks. Output:
    ([strata], key, pri, rank) with rank 1..k."""
    import pandas as pd

    scols = [strata_col] if strata_col else []

    def _head(strata, keys, pris):
        if strata is None:
            strata = np.zeros(len(keys), np.int64)
            order = np.lexsort((keys, pris))
            srt = strata[order]
        else:
            order = np.lexsort((keys, pris, strata))
            srt = strata[order]
        k_s, p_s = keys[order], pris[order]
        n = len(k_s)
        if n == 0:
            return order[:0], np.empty(0, np.int64)
        new = np.concatenate(([True], srt[1:] != srt[:-1]))
        run_start = np.flatnonzero(new)
        pos = np.arange(n) - run_start[np.cumsum(new) - 1]
        keep = pos < k
        return order[keep], pos[keep]

    def local(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pris = sample_priorities(keys, seed)
        if strata_col:
            sarr = np.asarray(t.column(strata_col).to_pylist(), object)
            # string strata sort by value only to group runs; final
            # ranking re-sorts per bucket, so codes suffice here
            _, codes = np.unique(sarr, return_inverse=True)
            idx, _pos = _head(codes, keys, pris)
            cols = {strata_col: pa.array(sarr[idx]),
                    key_col: pa.array(keys[idx], pa.int64()),
                    "pri": pa.array(pris[idx], pa.int64())}
            from ..stages.agg import _bucket_of
            bk = np.fromiter((int.from_bytes(
                hashlib.md5(str(s).encode()).digest()[:8], "little") >> 1
                for s in sarr[idx]), np.int64, len(idx))
            cols["__b"] = pa.array(_bucket_of(bk, num_buckets=num_buckets)
                                   if len(idx) else np.empty(0, np.int64))
        else:
            idx, _pos = _head(None, keys, pris)
            cols = {key_col: pa.array(keys[idx], pa.int64()),
                    "pri": pa.array(pris[idx], pa.int64()),
                    "__b": pa.array(np.zeros(len(idx), np.int64))}
        return pa.table(cols)

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        keys = g[key_col].to_numpy().astype(np.int64)
        pris = g["pri"].to_numpy().astype(np.int64)
        if strata_col:
            sarr = g[strata_col].to_numpy()
            _, codes = np.unique(sarr, return_inverse=True)
            idx, pos = _head(codes, keys, pris)
            out = {strata_col: sarr[idx]}
        else:
            idx, pos = _head(None, keys, pris)
            out = {}
        out[key_col] = keys[idx]
        out["pri"] = pris[idx]
        out["rank"] = pos + 1
        return pd.DataFrame(out)

    return (ds.select_columns(scols + [key_col])
            .map_batches(local, batch_format="pyarrow")
            .groupby("__b").map_groups(final, batch_format="pandas"))
