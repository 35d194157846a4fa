"""Sequence packing: assign documents to fixed-capacity context windows.

Training pipelines concatenate documents into fixed-length contexts
("packing") to avoid padding waste. At 100 TB the assignment must be
(a) distributed — no global sequential scan — and (b) deterministic, so
a resumed run re-derives identical bins. Frozen semantics:

1. **Bucket**: ``bucket = md5(doc_id) mod num_buckets`` (DuckDB
   ``md5_number_upper``-compatible, like ops/sample.py). Buckets are
   independent — each packs on one reducer; num_buckets scales with the
   cluster, not the corpus.
2. **Pack within bucket**: docs ordered by ``doc_id``; greedy
   sequential fill — a doc joins the current bin if the bin stays
   within ``capacity``, else it opens the next bin. A doc longer than
   ``capacity`` occupies a bin alone (never split, matching the common
   "drop-or-isolate oversized" policy).

Emits one row per doc: ``(doc_id, bucket, bin, bin_offset)``. The
per-bucket fill is O(bins · log n) numpy (cumulative sums +
searchsorted over bin boundaries), not a per-row Python loop.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_buckets(keys) -> np.ndarray:
    """``md5(doc_id) mod num_buckets`` companion — returns the raw u64
    hash; callers take ``% num_buckets``."""
    out = np.empty(len(keys), np.uint64)
    for i, k in enumerate(keys):
        d = hashlib.md5(str(k).encode()).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


def _fill_bins(lengths: np.ndarray, capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy sequential fill over pre-ordered lengths -> (bin, offset)."""
    n = len(lengths)
    cs = np.concatenate(([0], np.cumsum(lengths, dtype=np.int64)))
    bins = np.empty(n, np.int64)
    offs = np.empty(n, np.int64)
    pos, b = 0, 0
    while pos < n:
        end = int(np.searchsorted(cs, cs[pos] + capacity, side="right")) - 1
        end = max(end, pos + 1)  # an oversized doc still lands somewhere
        bins[pos:end] = b
        offs[pos:end] = cs[pos:end] - cs[pos]
        pos = end
        b += 1
    return bins, offs


def pack_sequences(ds: "object", capacity: int, *,
                   length_col: str = "n_chars", key_col: str = "doc_id",
                   num_buckets: int = 8) -> "object":
    """documents -> (doc_id, bucket, bin, bin_offset) assignment."""

    def tag(t: pa.Table) -> pa.Table:
        h = pack_buckets(t.column(key_col).to_pylist())
        return pa.table({
            key_col: t.column(key_col),
            length_col: t.column(length_col),
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
        })

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort")
        bins, offs = _fill_bins(g[length_col].to_numpy(np.int64), capacity)
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "bucket": g["bucket"].to_numpy(),
            "bin": bins,
            "bin_offset": offs,
        })

    # group count == num_buckets (small, each group large): the bucketed
    # map_groups pattern — vectorized numpy inside, one reducer per bucket
    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pack_group, batch_format="pandas"))
