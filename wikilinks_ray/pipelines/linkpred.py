"""Link prediction: common-out-neighbor counts + Jaccard vertex
similarity.

No reference implementation (SURVEY.md §2.12); the standard
neighborhood-overlap scores behind "similar pages"/link-suggestion
features (Liben-Nowell & Kleinberg, "The Link Prediction Problem for
Social Networks", CIKM 2003). For ordered pairs u < v:

    common(u, v)  = |N_out(u) ∩ N_out(v)|
    jaccard(u, v) = common / (deg(u) + deg(v) - common)

Execution shape — the n-gram-Jaccard posting-list plan of ops/dedup.py
re-targeted at the adjacency relation (vertex = doc, out-neighbor =
shingle): bucket edges by hash(dst) so each dst's FULL predecessor
posting list lands in one group, expand within-run pairs with the
shared ``sorted_run_pairs`` kernel (src strictly increasing inside a
run ⇒ pairs are born ordered u < v, no self-pairs), pre-reduce counts
per bucket, then one small grouped sum. No all-pairs path: work is
``sum_dst indeg(dst)^2`` bounded by ``max_posting`` (hub dsts above the
cap are EXCLUDED whole-list — deterministic, mirrored by the SQL twin's
in-degree filter). Degrees for the Jaccard denominator ride a broadcast
lookup (vertex-count gated like build.py's title join; the pair table
never joins O(V) rows through a shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.agg import _bucket_of, _rle_reduce, grouped_agg, sorted_run_pairs

# beyond ~50M vertices the (ids, degs) arrays outgrow a comfortable
# broadcast (~800MB); swap the final map for a hash join at that point
BROADCAST_DEG_LIMIT = 50_000_000


def common_neighbor_pairs(
    edges: "ray.data.Dataset",
    *,
    min_common: int = 2,
    max_posting: int = 100_000,
    num_buckets: int = 16,
    scale: int = 10**6,
) -> "ray.data.Dataset":
    """(u, v, common, jaccard_scaled) for ordered pairs u < v with at
    least ``min_common`` shared out-neighbors. ``edges`` must be
    distinct (src, dst) rows."""

    def tag(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__part", pa.array(
            _bucket_of(d, num_buckets=num_buckets)))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, d))
        s_s, d_s = s[order], d[order]
        ai, bi, _ = sorted_run_pairs([d_s], max_run=max_posting)
        u, v = s_s[ai], s_s[bi]
        keep = u != v  # defensive: duplicate (src,dst) rows in the input
        keys, c = _rle_reduce([u[keep], v[keep]],
                              np.ones(int(keep.sum()), np.int64), "sum")
        return pa.table({"u": pa.array(keys[0], pa.int64()),
                         "v": pa.array(keys[1], pa.int64()),
                         "common": pa.array(c, pa.int64())})

    pairs = grouped_agg(
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pyarrow"),
        ["u", "v"], "common", "sum",
        num_buckets=num_buckets, out_col="common")

    def thresh(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("common"), min_common))

    pairs = pairs.map_batches(thresh, batch_format="pyarrow")

    deg = grouped_agg(edges.select_columns(["src"]), ["src"], None,
                      "count", num_buckets=num_buckets, out_col="deg")
    n_deg = deg.count()
    if n_deg > BROADCAST_DEG_LIMIT:
        raise NotImplementedError(
            "degree side exceeds the broadcast budget; join fallback "
            "not yet wired (see ops/dedup.py's size-table join fallback "
            "for the pattern)")
    ddf = deg.to_pandas()
    ids = ddf["src"].to_numpy().astype(np.int64)
    dgs = ddf["deg"].to_numpy().astype(np.int64)
    o = np.argsort(ids)
    deg_ref = ray.put((ids[o], dgs[o]))

    def add_jaccard(t: pa.Table) -> pa.Table:
        ids_s, dgs_s = ray.get(deg_ref)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        c = t.column("common").to_numpy(zero_copy_only=False)
        du = dgs_s[np.searchsorted(ids_s, u)]
        dv = dgs_s[np.searchsorted(ids_s, v)]
        j = (c * scale) // (du + dv - c)
        return t.append_column("jaccard_scaled", pa.array(j, pa.int64()))

    return pairs.map_batches(add_jaccard, batch_format="pyarrow")
