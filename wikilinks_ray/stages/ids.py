"""Content-deterministic dense int64 id assignment (sorted-key rank).

The reference assigns dense int32 ids in parse order
(WikiProcessor.kt:36-41), which forces strictly ordered input
reassembly (WikiReader.kt:442-456). We instead derive ids from content:
``id = rank of the row's key in the global unsigned-lex sort order``.
Block order then never matters (SURVEY.md §2.10/§7 determinism note),
and ids are dense int64 (no int32 overflow by design —
WikiProcessor.kt:37-40 overflows at 2^31 on purpose; we do not).

Implementation = a manual range-partitioned sort-rank, scalable to any
input size:

1. sample the key column (driver-side, small) -> P-1 range boundaries;
2. tag every row with its range partition (vectorized searchsorted) —
   note UTF-8 byte order == code-point order, so numpy/pandas string
   comparisons agree with Arrow's unsigned-lex binary order
   (BufferWikiPage.java:134-154 semantics);
3. per-partition row counts -> driver-side prefix sums (P numbers);
4. ``groupby(part).map_groups``: local sort + ``offset + arange``.

Only steps 3-4 shuffle, keyed by the P-way range partition; boundary
choice affects balance, never the resulting ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _boundaries_from_sample(sample_keys: list, num_partitions: int) -> np.ndarray:
    arr = np.array(sorted(sample_keys), dtype=object)
    if len(arr) == 0 or num_partitions <= 1:
        return np.array([], dtype=object)
    qs = [int(len(arr) * k / num_partitions) for k in range(1, num_partitions)]
    return np.unique(arr[qs])


def assign_dense_ids(
    ds: "ray.data.Dataset",
    key: str,
    *,
    id_column: str = "id",
    num_partitions: int = 16,
    sample_limit: int = 20_000,
) -> "ray.data.Dataset":
    """Append ``id_column`` = dense global rank of ``key`` (unique keys
    assumed; ties get distinct ids in stable order)."""
    sample = [r[key] for r in ds.select_columns([key]).random_sample(
        1.0, seed=0x5EED).limit(sample_limit).take_all()]
    boundaries = _boundaries_from_sample(sample, num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        keys = np.array(batch.column(key).to_pylist(), dtype=object)
        part = np.searchsorted(boundaries, keys, side="left") if len(boundaries) else np.zeros(len(keys), dtype=np.int64)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    counts = tagged.groupby("__part").count().to_pandas()
    counts = counts.sort_values("__part")
    offsets = dict(
        zip(
            counts["__part"].tolist(),
            np.concatenate([[0], np.cumsum(counts["count()"].to_numpy())[:-1]]).tolist(),
        )
    )

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        g = g.sort_values(key, kind="mergesort").reset_index(drop=True)
        g[id_column] = np.int64(offsets[part]) + np.arange(len(g), dtype=np.int64)
        return g.drop(columns="__part")

    return tagged.groupby("__part").map_groups(rank_group, batch_format="pandas")
