"""Edge reciprocity — the fraction of directed non-loop edges whose
reverse edge also exists (mutual links). A standard link-graph metric
(for wikis: pages that cite each other; for hosts: bidirectional
affiliation) the reference does not compute (SURVEY.md §2.12 family).

One bucketed pass, no self-join: canonicalize each ordered edge to its
unordered key (lo, hi), co-locate keys by hash bucket, and count runs
of size 2 — with distinct ordered input, an unordered key appearing
twice is exactly a mutual pair. The shuffle moves one (lo, hi) row per
edge; per-bucket work is a lexsort + run-length scan (numpy, no Python
loop), and only P two-int rows reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def reciprocity_counts(edges: "ray.data.Dataset", *,
                       num_partitions: int = 8) -> tuple[int, int]:
    """(mutual, directed): ordered non-loop distinct edge count, and
    how many of them have their reverse present."""
    from ..stages.agg import _bucket_of, distinct_pairs

    n_buckets = max(num_partitions, 32)
    dedup = distinct_pairs(edges, "src", "dst")

    def tag(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "__part": pa.array(_bucket_of(lo, hi, num_buckets=n_buckets)),
        })

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        lo = g["lo"].to_numpy()
        hi = g["hi"].to_numpy()
        order = np.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        new = np.concatenate(([True], (lo_s[1:] != lo_s[:-1])
                              | (hi_s[1:] != hi_s[:-1])))
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(lo_s)))
        # distinct ordered input => run length is 1 (one-way) or 2 (mutual)
        mutual = int(2 * (lens == 2).sum())
        return pd.DataFrame({"m": [mutual], "d": [len(lo_s)]})

    parts = (dedup.map_batches(tag, batch_format="pyarrow")
             .groupby("__part").map_groups(cnt, batch_format="pandas"))
    tot = parts.to_pandas()
    return int(tot["m"].sum()), int(tot["d"].sum())
