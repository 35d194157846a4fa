"""Embedding clustering: distributed Lloyd k-means in EXACT scaled-int
arithmetic — the "semantic domain discovery / semantic dedup prepass"
operator of a training-data pipeline, value-hash replayable in SQL.

Why integers: float k-means (ops/similarity.py train_centroids, the IVF
quantizer) is not bit-stable across reduction orders, so it can only be
pytest-pinned. Here every coordinate is ``floor(x * 2^20 + 0.5) + 2^25``
(the offset makes all coordinates non-negative, so the centroid update
``sum // count`` is the same floor division in numpy and DuckDB;
squared-distance assignment is translation-invariant, so the offset
never changes an argmin). All distances fit int64 with headroom
(dim × (2^26)^2 = 2^58 at dim 64, asserted).

Scale shape: per Lloyd round ONE ``map_batches`` pass; each batch
assigns its vectors to the broadcast centroid matrix by exact integer
Gram expansion (x·x - 2 x·c + c·c via one int64 matmul) and emits
per-cluster (sum-vector, count) partials — a combiner, so what reaches
the driver merge is O(k × dim × n_batches) ints, never vectors. The
centroid matrix (k × dim int64) is the only driver/broadcast state.
The final assignment pass streams (vec_id, cluster) out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

SCALE_BITS = 20
OFFSET = 1 << 25  # coordinates must exceed -32.0 (asserted)


def scale_vectors(t: pa.Table, vec_col: str = "embedding") -> np.ndarray:
    """(n, dim) int64 scaled+offset matrix from a list<float> column —
    zero-copy Arrow values reshape via similarity.unpack_embeddings."""
    from .similarity import unpack_embeddings

    x = unpack_embeddings(t, vec_col)
    xi = np.floor(x * (1 << SCALE_BITS) + 0.5).astype(np.int64) + OFFSET
    assert xi.min() >= 0 and xi.max() < 2 * OFFSET, \
        "kmeans_int: coordinate outside the ±32.0 envelope"
    return xi


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 argmin_{c} |x - c|^2, ties -> smallest cluster id
    (np.argmin first-occurrence == SQL ORDER BY dist, cid)."""
    xx = np.einsum("ij,ij->i", X, X)
    cc = np.einsum("ij,ij->i", C, C)
    cross = X @ C.T
    d = xx[:, None] - 2 * cross + cc[None, :]
    return np.argmin(d, axis=1).astype(np.int64)


def kmeans_int(emb: "ray.data.Dataset", k: int = 8, iters: int = 4, *,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> "ray.data.Dataset":
    """Cluster assignments (vec_id, cluster) after ``iters`` exact Lloyd
    rounds from the deterministic first-k-by-id init. Empty clusters
    keep their previous centroid (mirrored by the SQL twin)."""
    import pyarrow.compute as pc

    init = (emb.map_batches(
        lambda t: t.filter(pc.less(t[id_col], k)), batch_format="pyarrow")
        .to_pandas().sort_values(id_col))
    assert len(init) == k, f"kmeans_int: ids 0..{k - 1} must exist"
    C = scale_vectors(pa.Table.from_pandas(init, preserve_index=False),
                      vec_col)
    dim = C.shape[1]
    assert dim * (2 * OFFSET) ** 2 < 2 ** 62, \
        "kmeans_int: int64 distance headroom"

    for _ in range(iters):
        cref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            X = scale_vectors(t, vec_col)
            a = _assign(X, ray.get(cref))
            order = np.argsort(a, kind="stable")
            a_s = a[order]
            idx = np.flatnonzero(np.concatenate(([True],
                                                 a_s[1:] != a_s[:-1])))
            sums = np.add.reduceat(X[order], idx, axis=0)
            counts = np.diff(np.append(idx, len(a_s)))
            return pa.table({
                "cluster": pa.array(a_s[idx], pa.int64()),
                "vsum": pa.array(list(sums), pa.list_(pa.int64())),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            })

        parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for cl, vsum, cnt in parts.itertuples(index=False):
            sums[cl] += np.asarray(vsum, dtype=np.int64)
            counts[cl] += cnt
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] // counts[nonempty, None]

    cref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        X = scale_vectors(t, vec_col)
        a = _assign(X, ray.get(cref))
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "cluster": pa.array(a, pa.int64())})

    return emb.map_batches(assign, batch_format="pyarrow")


def centroid_classifier_eval(emb: "ray.data.Dataset", *,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             label_col: str = "label"
                             ) -> "ray.data.Dataset":
    """Nearest-centroid classifier evaluation — train per-label mean
    centroids (exact scaled-int floor-division, the kmeans_int update
    rule), predict every vector's nearest centroid, return the
    confusion matrix (label_true, label_pred, n). Two passes:

    1. per-batch per-label (sum-vector, count) combiner partials →
       driver merge → k×dim int64 centroid matrix (the only driver
       state);
    2. broadcast centroids, assign per batch (exact Gram argmin, ties →
       smallest label), combine confusion counts per batch; the final
       merge is over ≤ batches × |labels|² rows (output-bounded).

    Ties in the argmin break to the smallest label id — same rule as
    kmeans_int, so the SQL twin's ORDER BY dist, label agrees."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        X = scale_vectors(t, vec_col)
        lab = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(lab, kind="stable")
        l_s = lab[order]
        idx = np.flatnonzero(np.concatenate(([True], l_s[1:] != l_s[:-1])))
        sums = np.add.reduceat(X[order], idx, axis=0)
        counts = np.diff(np.append(idx, len(l_s)))
        return pa.table({
            "label": pa.array(l_s[idx], pa.int64()),
            "vsum": pa.array(list(sums), pa.list_(pa.int64())),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        })

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    labels = np.sort(parts["label"].unique()).astype(np.int64)
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    dim = len(parts["vsum"].iloc[0])
    sums = np.zeros((len(labels), dim), dtype=np.int64)
    counts = np.zeros(len(labels), dtype=np.int64)
    for lb, vsum, cnt in parts.itertuples(index=False):
        sums[lab_pos[int(lb)]] += np.asarray(vsum, dtype=np.int64)
        counts[lab_pos[int(lb)]] += cnt
    C = sums // counts[:, None]
    assert dim * (2 * OFFSET) ** 2 < 2 ** 62
    cref = ray.put((labels, C))

    def confuse(t: pa.Table) -> pa.Table:
        labs, Cm = ray.get(cref)
        X = scale_vectors(t, vec_col)
        pred = labs[_assign(X, Cm)]
        true = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = (pd.DataFrame({"label_true": true, "label_pred": pred})
              .groupby(["label_true", "label_pred"], sort=False)
              .size().rename("n").reset_index())
        df["n"] = df["n"].astype(np.int64)
        df["__m"] = np.int64(0)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["label_true", "label_pred"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    return (emb.map_batches(confuse, batch_format="pyarrow")
            .groupby("__m").map_groups(merge, batch_format="pandas"))
