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
2. tag every row with its range partition (one Arrow byte-lex compare
   kernel per boundary) — UTF-8 byte order == code-point order, so
   pandas string sorts agree with Arrow's unsigned-lex binary order
   (BufferWikiPage.java:134-154 semantics);
3. per-partition row counts (per-batch bincount partials + driver sum,
   no shuffle) -> driver-side prefix sums (P numbers);
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

    import pyarrow.compute as pc

    num_parts = len(boundaries) + 1

    def tag(batch: pa.Table) -> pa.Table:
        # partition = #(boundaries <= key): one Arrow byte-lex compare
        # kernel per boundary (P-1 of them), fully vectorized — Arrow's
        # utf8 comparison is unsigned byte order, the same order the
        # rank is defined over. (A Python-object searchsorted here was
        # one interpreter compare per row per probe.)
        part = np.zeros(batch.num_rows, dtype=np.int64)
        col = batch.column(key)
        for b in boundaries:
            part += pc.greater_equal(col, pa.scalar(str(b))).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return batch.append_column("__part", pa.array(part))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # per-partition counts via per-batch bincount partials + driver sum
    # (a groupby shuffle for P numbers is pure overhead)
    def part_counts(t: pa.Table) -> pa.Table:
        c = np.bincount(t.column("__part").to_numpy(zero_copy_only=False),
                        minlength=num_parts)
        return pa.table({"p": pa.array(np.arange(num_parts, dtype=np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    totals = np.zeros(num_parts, dtype=np.int64)
    for r in tagged.select_columns(["__part"]).map_batches(
            part_counts, batch_format="pyarrow").take_all():
        totals[r["p"]] += r["c"]
    offs = np.concatenate([[0], np.cumsum(totals)[:-1]])
    offsets = {p: int(offs[p]) for p in range(num_parts)}

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        g = g.sort_values(key, kind="mergesort").reset_index(drop=True)
        g[id_column] = np.int64(offsets[part]) + np.arange(len(g), dtype=np.int64)
        return g.drop(columns="__part")

    return tagged.groupby("__part").map_groups(rank_group, batch_format="pandas")
