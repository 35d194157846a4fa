"""Small Dataset utilities shared across stages/pipelines."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def rename_cols(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    """Block-format-safe column rename.

    ``Dataset.rename_columns`` assumes Arrow blocks and crashes on the
    pandas blocks some groupby-aggregate plans emit
    (``AttributeError: 'DataFrame' object has no attribute
    'rename_columns'``); this goes through a pyarrow ``map_batches`` so
    the block is coerced first.
    """

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(rn, batch_format="pyarrow")
