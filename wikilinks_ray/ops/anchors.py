"""Anchor-text aggregation over the pages link graph.

The classic web-link-graph text feature (no reference analog — SURVEY
§2 extension): for every link *target*, aggregate the anchor strings
the rest of the corpus uses when linking to it. At Common-Crawl scale
per-target anchor profiles are a primary ranking / labeling signal and
a standard training-data augmentation (anchor → title pairs).

Plan (combiner-first, one shuffle):

1. ``map_batches`` per-page extraction → per-OCCURRENCE
   ``(dst_title, anchor)`` rows (``functions.wikitext
   .link_anchor_pairs`` — same markup/nesting semantics as the link
   walk, redirect pages excluded);
2. resolve ``dst_title`` → vertex id against the built graph's
   vertices: broadcast ``pc.index_in`` while the title array fits one
   worker (gate: ``title_broadcast_limit``, same knob as
   pipelines/build.py), hash join past it;
3. per-BATCH combine ``(dst, anchor) → cnt`` (a hub target's raw
   occurrences collapse before anything moves — the skew guard: what
   shuffles is bounded by DISTINCT (dst, anchor) pairs per batch, not
   occurrences);
4. one hash-bucketed ``groupby(bucket-of-dst).map_groups`` computes,
   per dst, fully vectorized: total occurrences, distinct-anchor
   count, and the top anchor (max count, lexicographic-min tie-break
   — deterministic, oracle-comparable).

String keys rule out ``stages/agg.grouped_agg`` (int64 keys); the
bucket plan here is the same shape with a pandas groupby kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.wikitext import link_anchor_pairs


def extract_anchor_occurrences(pages: "ray.data.Dataset", *,
                               concurrency: int | None = None
                               ) -> "ray.data.Dataset":
    """pages(url, text, ...) → one row per article link occurrence:
    ``(dst_title, anchor)``. Stateless task-pool stage (same fault
    posture as stages/extract.py — regexes are module-level)."""

    def ex(t: pa.Table) -> pa.Table:
        dsts: list[str] = []
        anchors: list[str] = []
        for text in t.column("text").to_pylist():
            for target, anchor in link_anchor_pairs(text or ""):
                dsts.append(target)
                anchors.append(anchor)
        return pa.table({
            "dst_title": pa.array(dsts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        })

    return pages.select_columns(["text"]).map_batches(
        ex, batch_format="pyarrow", concurrency=concurrency)


def _resolve_dst_ids(occ: "ray.data.Dataset", vertices: "ray.data.Dataset",
                     *, title_broadcast_limit: int,
                     num_partitions: int) -> "ray.data.Dataset":
    """(dst_title, anchor) → (dst:int64, anchor); unresolved titles drop
    (same dangling-link semantics as the edge build)."""
    n = vertices.count()
    if n <= title_broadcast_limit:
        vdf = vertices.select_columns(["id", "title"]).to_pandas()
        titles = pa.array(vdf["title"].tolist(), pa.string())
        ids_np = vdf["id"].to_numpy().astype(np.int64)
        ref = ray.put((titles, ids_np))

        def resolve(t: pa.Table) -> pa.Table:
            tarr, iarr = ray.get(ref)
            pos = pc.index_in(t["dst_title"], value_set=tarr)
            keep = pc.is_valid(pos)
            pos_np = pos.filter(keep).to_numpy(zero_copy_only=False)
            return pa.table({
                "dst": pa.array(iarr[pos_np.astype(np.int64)], pa.int64()),
                "anchor": t["anchor"].filter(keep),
            })

        return occ.map_batches(resolve, batch_format="pyarrow")
    vkey = vertices.select_columns(["title", "id"]).rename_columns(
        {"title": "v_title", "id": "dst"})
    joined = occ.join(vkey, "inner", num_partitions,
                      on=("dst_title",), right_on=("v_title",))
    return joined.select_columns(["dst", "anchor"])


def anchor_stats(pages: "ray.data.Dataset", vertices: "ray.data.Dataset", *,
                 num_buckets: int = 64,
                 concurrency: int | None = None,
                 title_broadcast_limit: int = 20_000_000,
                 num_partitions: int = 16) -> "ray.data.Dataset":
    """Per-target anchor statistics over the whole corpus.

    Output rows (one per vertex that receives >= 1 resolved link
    occurrence): ``dst`` (vertex id), ``occurrences`` (link
    occurrences, NOT per-page-deduped — anchors measure usage),
    ``n_distinct_anchors``, ``top_anchor`` (most frequent;
    lexicographic-min tie-break), ``top_count``.
    """
    occ = extract_anchor_occurrences(pages, concurrency=concurrency)
    resolved = _resolve_dst_ids(occ, vertices,
                                title_broadcast_limit=title_broadcast_limit,
                                num_partitions=num_partitions)

    from ..stages.agg import _bucket_of

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.groupby(["dst", "anchor"], sort=False).size()
             .reset_index(name="cnt"))
        dst = g["dst"].to_numpy().astype(np.int64)
        return pa.table({
            "dst": pa.array(dst, pa.int64()),
            "anchor": pa.array(g["anchor"], pa.string()),
            "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
            "__part": pa.array(_bucket_of(dst, num_buckets=num_buckets)
                               if len(dst) else np.empty(0, np.int64)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["dst", "anchor"], sort=False)["cnt"].sum()
             .reset_index())
        # top anchor: max cnt, lexicographic-min anchor tie-break —
        # one vectorized sort, first row per dst
        c = c.sort_values(["dst", "cnt", "anchor"],
                          ascending=[True, False, True], kind="stable")
        per = c.groupby("dst", sort=True)
        head = c.drop_duplicates("dst", keep="first")
        return pd.DataFrame({
            "dst": head["dst"].to_numpy(),
            "occurrences": per["cnt"].sum().to_numpy(),
            "n_distinct_anchors": per["cnt"].size().to_numpy(),
            "top_anchor": head["anchor"].to_numpy(),
            "top_count": head["cnt"].to_numpy(),
        })

    return (resolved.map_batches(combine, batch_format="pyarrow")
            .groupby("__part").map_groups(final, batch_format="pandas"))
