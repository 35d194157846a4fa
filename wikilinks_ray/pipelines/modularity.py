"""Directed modularity of a vertex partition.

No reference implementation (SURVEY.md §2.12 names community metrics as
engine-completeness additions). For a partition c(v) of a directed
graph with m edges, directed modularity is

    Q = sum_c [ e_c / m  -  (Kout_c * Kin_c) / m^2 ]

with ``e_c`` the intra-community edge count, ``Kout_c`` / ``Kin_c`` the
out-/in-degree mass of community c (Leicht & Newman, "Community
structure in directed networks", PRL 2008 — public formulation).

Execution shape: ONE map_batches pass over the edge list emits
per-batch pre-aggregated (community, intra, kout, kin) partials (the
combiner — a batch collapses to at most |C| rows), then a small
``grouped_agg`` sum merges them; no O(E) shuffle rows ever move. The
per-community integer term ``e_c * m - Kout_c * Kin_c`` makes the
quality EXACT (Q = sum(term) / m^2) and SQL-reproducible without any
float or floor-division divergence.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray.data


def community_stats(
    edges: "ray.data.Dataset",
    labeler: Callable[[np.ndarray], np.ndarray],
    *,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """(community, intra_edges, kout, kin) — one row per community that
    touches any edge. ``labeler`` maps a vertex-id array to community
    ids, applied vectorized per batch on BOTH endpoints."""

    def partial(t: pa.Table) -> pa.Table:
        s = labeler(t.column("src").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        d = labeler(t.column("dst").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        intra = s == d
        # one combined key space: a community's kout, kin and intra
        # partials ride the same groupby
        cs, kout = np.unique(s, return_counts=True)
        cd, kin = np.unique(d, return_counts=True)
        ci, ei = np.unique(s[intra], return_counts=True)
        c = np.concatenate([cs, cd, ci])
        z = np.zeros
        return pa.table({
            "community": pa.array(c, pa.int64()),
            "intra_edges": pa.array(np.concatenate(
                [z(len(cs), np.int64), z(len(cd), np.int64), ei])),
            "kout": pa.array(np.concatenate(
                [kout, z(len(cd), np.int64), z(len(ci), np.int64)])),
            "kin": pa.array(np.concatenate(
                [z(len(cs), np.int64), kin, z(len(ci), np.int64)])),
        })

    from ..stages.agg import _bucket_of

    def part_key(t: pa.Table) -> pa.Table:
        c = t.column("community").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(c, num_buckets=num_buckets)))

    def fold(t: pa.Table) -> pa.Table:
        # one vectorized multi-column sum per bucket (reduceat over the
        # community-sorted run-length layout — no per-key Python)
        c = t.column("community").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c_s = c[order]
        new = np.concatenate(([True], c_s[1:] != c_s[:-1]))
        starts = np.flatnonzero(new)
        cols = {"community": pa.array(c_s[starts], pa.int64())}
        for col in ("intra_edges", "kout", "kin"):
            v = t.column(col).to_numpy(zero_copy_only=False)[order]
            cols[col] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    return (edges.map_batches(partial, batch_format="pyarrow")
            .map_batches(part_key, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(fold, batch_format="pyarrow"))


def directed_modularity(
    edges: "ray.data.Dataset",
    labeler: Callable[[np.ndarray], np.ndarray],
) -> tuple[float, "ray.data.Dataset"]:
    """(Q, per-community stats with the exact integer ``term`` column).
    Only |C| rows reach the driver for the scalar."""
    stats = community_stats(edges, labeler)
    df = stats.to_pandas()
    m = int(df["kout"].sum())
    term = (df["intra_edges"].astype("int64") * m
            - df["kout"].astype("int64") * df["kin"].astype("int64"))
    q = float(term.sum()) / (m * m) if m else 0.0
    df = df.assign(term=term).sort_values("community").reset_index(drop=True)
    return q, ray.data.from_pandas(df)
