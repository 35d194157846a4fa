"""pages corpus -> (vertices, edges) graph build.

Ray-Data-first re-expression of the reference's convert pipeline
(Main.kt:60-102 → WikiProcessor.readPagesWithStats,
WikiProcessor.kt:99-112):

    reference (single JVM, mutable HashMap)        this engine (Datasets)
    -----------------------------------------      -----------------------------
    SAX parse → HashMap<String, PagePointer>       map_batches extract (stages/extract.py)
    deferred PagePointer title resolution (§1.4)   hash join links ⋈ vertices on title
    dropRedirectLoops (WikiProcessor.kt:133-172)   pointer-doubling fixpoint on the
                                                   redirect-only subgraph (join per round)
    packPages dense int32 parse-order ids          assign_dense_ids: sorted-title rank,
      (WikiProcessor.kt:36-41)                     dense int64, content-deterministic
    null links dropped + counted (:246-248)        inner join + anti-join counts
    gatherStatistics (:174-206)                    Dataset counts (GraphStats)

Output layout (resumable): ``work_dir/vertices/`` and ``work_dir/edges/``
parquet directories; a rerun that finds both (plus ``_STATS.json``)
skips the build.

Semantics notes (pinned by tests against the reference's behavior):
- A redirect that survives cleanup keeps exactly ONE edge — to its
  *immediate* target (not the chain's end), and only if that target is a
  surviving page (packPages, WikiProcessor.kt:226-241).
- A redirect whose chain of redirects never reaches a non-redirect and
  cycles is dropped entirely (endSomewhere, WikiProcessor.kt:146-171).
- A redirect whose chain exits at a title that is neither a page nor any
  *article's* link target is dropped too: only article links create
  ``PagePointer`` entries (WikiProcessor.kt:56-66), so ``map[target]``
  is null for such titles and endSomewhere returns false
  (WikiProcessor.kt:162-164). A redirect to a missing-but-linked title
  survives with zero edges (pointer exists with ``page == null`` →
  the non-redirect else-branch returns true).
- Known intentional divergence: the reference's ``dropRedirectLoops``
  mutates ``p.page = null`` while iterating in HashMap order, so a chain
  feeding a cycle (or an unknown exit) survives or drops depending on
  whether the cycle member was processed first. This engine freezes the
  order-independent strict semantics: every chain that ends in a cycle
  or at an unknown title is dropped (equivalent to processing each full
  chain before any of its members was nulled).
- Articles' links resolve by exact (capitalized) title; unresolved are
  dropped and counted (WikiProcessor.kt:246-248).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, asdict

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.ids import assign_dense_ids


@dataclass
class GraphStats:
    """Analog of the reference's GraphStatistics (WikiProcessor.kt:174-206)."""

    n_articles: int
    n_redirects_before: int
    n_redirects_dropped: int
    article_link_occurrences: int
    resolved_article_links: int
    null_article_link_occurrences: int
    n_vertices: int
    n_edges: int


@dataclass
class GraphBuildResult:
    vertices_path: str
    edges_path: str
    stats: GraphStats

    def vertices(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.vertices_path)

    def edges(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.edges_path)


def _filter_expr(ds, col, value=True):
    return ds.map_batches(
        lambda t, c=col, v=value: t.filter(pc.equal(t[c], v)),
        batch_format="pyarrow",
    )


def _loop_members_local(pairs: list[tuple[str, str]],
                        unknown_exits: frozenset[str] = frozenset()) -> set[str]:
    """Driver-side exact cycle detection on (src, target) redirect pairs.

    Same semantics as the distributed path; used when the redirect table
    is small enough to collect (the common case — cycle detection only
    needs the redirect subset, ≈10% of vertices in wiki-like corpora).
    Iterative chain-walk with memoization: O(N) total.

    ``unknown_exits``: chain-exit titles with no PagePointer in the
    reference (neither a page title nor any article's link target) —
    chains ending there fail endSomewhere (WikiProcessor.kt:162-164).
    """
    nxt = dict(pairs)
    survives: dict[str, bool] = {}
    for start in nxt:
        if start in survives:
            continue
        path: list[str] = []
        on_path: set[str] = set()
        cur = start
        while True:
            if cur in survives:
                verdict = survives[cur]
                break
            if cur in on_path:  # closed a cycle among redirects
                verdict = False
                break
            if cur not in nxt:  # left the redirect set
                verdict = cur not in unknown_exits
                break
            path.append(cur)
            on_path.add(cur)
            cur = nxt[cur]
        # cycle members, chains feeding a cycle, and chains exiting at an
        # unknown title all fail endSomewhere (WikiProcessor.kt:146-171)
        for t in path:
            survives[t] = verdict
    return {t for t, ok in survives.items() if not ok}


def find_unknown_exit_titles(redirects: "ray.data.Dataset",
                             meta: "ray.data.Dataset",
                             links: "ray.data.Dataset",
                             num_partitions: int = 4) -> frozenset[str]:
    """Redirect targets with no PagePointer in the reference's map:
    neither a page title nor any *article's* link target
    (WikiProcessor.kt:56-66 — only article links create pointers).

    Two anti-joins narrow the candidate set: targets − page titles is
    already tiny (dangling redirect targets only), and the second join
    removes those some article links to. The result is collected as a
    frozenset — it is bounded by the number of dangling redirects, a
    vanishing fraction at wiki scale.
    """
    tgt = redirects.select_columns(["redirect_target"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["redirect_target"])),
        batch_format="pyarrow",
    ).materialize()
    n = tgt.count()
    if n == 0:
        return frozenset()
    p = max(1, min(num_partitions, n // 50))
    # targets that are not page titles (usually a handful)
    miss = tgt.join(meta.select_columns(["title"]), "left_anti", p,
                    on=("redirect_target",), right_on=("title",)).materialize()
    n_miss = miss.count()
    if n_miss == 0:
        return frozenset()
    # ... of those, the ones no article links to. miss is typically a
    # handful of rows — shrink the partition count with it, or Ray's
    # hash join emits schema-less empty blocks that crash pyarrow
    p2 = max(1, min(p, n_miss // 50))
    art_dst = _filter_expr(links.select_columns(["dst_title", "src_is_redirect"]),
                           "src_is_redirect", False).select_columns(["dst_title"])
    unknown = miss.join(art_dst, "left_anti", p2,
                        on=("redirect_target",), right_on=("dst_title",))
    return frozenset(r["redirect_target"] for r in unknown.take_all())


def _known_subset(cands: set[str], meta: "ray.data.Dataset",
                  links: "ray.data.Dataset") -> set[str]:
    """Which of ``cands`` hold a PagePointer: page titles or article link
    targets. One broadcast-filter pass over meta ∪ article-links (no
    shuffle; the candidate set is small by construction)."""
    if not cands:
        return set()
    arr = pa.array(sorted(cands), pa.string())
    art = _filter_expr(
        links.select_columns(["dst_title", "src_is_redirect"]),
        "src_is_redirect", False,
    ).map_batches(lambda t: pa.table({"title": t["dst_title"]}),
                  batch_format="pyarrow")
    uni = meta.select_columns(["title"]).union(art)
    found = uni.map_batches(
        lambda t, a=arr: t.filter(pc.is_in(t["title"], value_set=a)),
        batch_format="pyarrow").take_all()
    return {r["title"] for r in found}


def find_redirect_loop_members(redirects: "ray.data.Dataset",
                               num_partitions: int = 8,
                               driver_side_limit: int = 200_000,
                               unknown_exits: frozenset[str] | None = None,
                               meta: "ray.data.Dataset | None" = None,
                               links: "ray.data.Dataset | None" = None,
                               ) -> "ray.data.Dataset":
    """Titles of redirects to drop: chains that cycle, plus chains whose
    exit title has no PagePointer (see find_unknown_exit_titles).

    ``unknown_exits``: pass explicitly to override; with ``meta`` +
    ``links`` given it is derived — on the driver-side fast path from
    the collected pairs (one broadcast-filter scan, no joins), on the
    distributed path via find_unknown_exit_titles' anti-joins.

    Pointer-doubling over J(src, cur): after round k, ``cur`` is the
    title reached after up to 2^k redirect hops (frozen early once it
    leaves the redirect set). After ceil(log2(N))+1 rounds any row whose
    ``cur`` is still a redirect title sits on/feeds a cycle — exactly
    the set ``dropRedirectLoops`` nulls out (WikiProcessor.kt:133-172).
    Each round is one hash join of the redirect-only table with itself
    (≈10% of vertices), so the fixpoint costs O(log N) small shuffles.

    ``num_partitions`` is capped at ~1/50th of the redirect count: Ray's
    hash-shuffle join emits schema-less empty blocks for key partitions
    that receive no rows, and pyarrow's underlying join then fails with
    ``FieldRef`` resolution errors — keep every partition non-empty.
    """
    r = redirects.select_columns(["title", "redirect_target"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["redirect_target"])),
        batch_format="pyarrow",
    ).rename_columns({"title": "src", "redirect_target": "cur"}).materialize()
    n = r.count()
    if n == 0:
        return r.select_columns(["src"]).limit(0)
    if n <= driver_side_limit:
        # fast path: collect the redirect pairs, resolve exactly on the
        # driver (one pass), return as a tiny dataset.
        pairs = [(row["src"], row["cur"]) for row in r.take_all()]
        if unknown_exits is None:
            if meta is not None and links is not None:
                nxt = dict(pairs)
                exits = {cur for cur in nxt.values() if cur not in nxt}
                unknown_exits = frozenset(
                    exits - _known_subset(exits, meta, links))
            else:
                unknown_exits = frozenset()
        dropped = sorted(_loop_members_local(pairs, unknown_exits))
        if not dropped:
            return r.select_columns(["src"]).limit(0)
        return ray.data.from_arrow(pa.table({"src": pa.array(dropped, pa.string())}))
    if unknown_exits is None:
        unknown_exits = (find_unknown_exit_titles(redirects, meta, links,
                                                  num_partitions)
                         if meta is not None and links is not None
                         else frozenset())
    num_partitions = max(1, min(num_partitions, n // 50))
    rounds = max(1, math.ceil(math.log2(max(2, n))) + 1)

    j = r
    targets = r.rename_columns({"src": "t_src", "cur": "t_cur"})
    for _ in range(rounds):
        step = j.join(targets, "left_outer", num_partitions,
                      on=("cur",), right_on=("t_src",))

        def advance(t: pa.Table) -> pa.Table:
            cur = pc.if_else(pc.is_valid(t["t_cur"]), t["t_cur"], t["cur"])
            return pa.table({"src": t["src"], "cur": cur})

        j = step.map_batches(advance, batch_format="pyarrow").materialize()
        targets = j.rename_columns({"src": "t_src", "cur": "t_cur"})

    # still pointing at a redirect => cyclic; exited at an unknown title
    # => no PagePointer in the reference => dropped too
    red_titles = r.select_columns(["src"]).rename_columns({"src": "t_src"})
    cyc = j.join(red_titles, "left_semi", num_partitions, on=("cur",), right_on=("t_src",))
    dropped = cyc.select_columns(["src"])
    if unknown_exits:
        unk = pa.array(sorted(unknown_exits), pa.string())

        def exit_unknown(t: pa.Table, u=unk) -> pa.Table:
            return t.filter(pc.is_in(t["cur"], value_set=u))

        dropped = dropped.union(
            j.map_batches(exit_unknown, batch_format="pyarrow")
            .select_columns(["src"]))
    return dropped


def build_graph(
    pages: "ray.data.Dataset",
    work_dir: str,
    *,
    num_partitions: int = 16,
    extract_concurrency: int = 4,
    extract_batch_size: int = 512,
    overwrite: bool = False,
    title_broadcast_limit: int = 20_000_000,
    expand_templates: bool = False,
) -> GraphBuildResult:
    """Full build: pages -> vertices(id,url,title,is_redirect) + edges(src,dst).

    ``expand_templates=True`` collects the ``Template:`` namespace into a
    broadcast map first (pipelines/templates.py) so links written inside
    transcluded bodies are extracted too (bliki parity,
    WikiProcessor.kt:45-46); template pages become macro definitions, not
    vertices."""
    # work_dir may be a plain path or a URI (local://, s3://, ...):
    # vertices/edges go through Ray's own URI-aware write_parquet, the
    # sentinel through fsio. _STATS.json is written LAST — it is the
    # build's commit point (see state/fsio.py crash-safety protocol).
    from ..state import fsio

    v_path = fsio.join(work_dir, "vertices")
    e_path = fsio.join(work_dir, "edges")
    s_path = fsio.join(work_dir, "_STATS.json")
    if not overwrite and fsio.exists(s_path):
        try:
            stats = GraphStats(**json.loads(fsio.read_text(s_path)))
            return GraphBuildResult(v_path, e_path, stats)
        except (ValueError, TypeError, OSError):
            pass  # torn/stale sentinel -> rebuild
    fsio.makedirs(work_dir)
    # write_parquet APPENDS into an existing directory — a rebuild over
    # a stale dir would silently multiply vertices/edges
    for d in (v_path, e_path):
        fsio.rmtree(d)
    fsio.delete_file(s_path)

    # single pass over the heavy pages input (html+text read once)
    from ..stages.extract import extract_combined, split_combined

    extract_kwargs = {}
    if expand_templates:
        from .templates import collect_template_map

        extract_kwargs["tpl_ref"] = collect_template_map(pages)
    combined = pages.map_batches(
        extract_combined, batch_format="pyarrow",
        batch_size=extract_batch_size,
        concurrency=extract_concurrency,
        fn_kwargs=extract_kwargs).materialize()
    # meta/links materialize once each: they are consumed by 3-4
    # downstream passes (fixpoint, ids, joins, stats) and re-running the
    # kind-filter over the big combined table per consumer measured
    # slower (43.5s vs 38.9s at 400k pages) than materializing
    meta, links = split_combined(combined)
    meta = meta.materialize()
    links = links.materialize()

    redirects = _filter_expr(meta, "is_redirect", True)
    dropped = find_redirect_loop_members(
        redirects, num_partitions, meta=meta, links=links).materialize()
    n_dropped = dropped.count()

    # vertices = all pages minus dropped redirects; id = sorted-title rank.
    # The dropped set is tiny (cycle members + dead-end chains only), so
    # this anti-join is a broadcast-set filter (ray.put once, one Arrow
    # is_in kernel per batch), not a shuffle.
    if n_dropped:
        import ray as _ray

        dropped_ref = _ray.put(pa.array(
            sorted(r["src"] for r in dropped.take_all()), pa.string()))

        def drop_cyclic(t: pa.Table) -> pa.Table:
            drop = _ray.get(dropped_ref)
            return t.filter(pc.invert(pc.is_in(t["title"], value_set=drop)))

        surviving = meta.map_batches(drop_cyclic, batch_format="pyarrow")
    else:
        surviving = meta
    # materialize the small projected vertex-side once: assign_dense_ids
    # executes its input three times (sample, counts, rank)
    vertices = assign_dense_ids(
        surviving.select_columns(["url", "title", "is_redirect"]).materialize(),
        "title", num_partitions=num_partitions,
    )
    vertices.write_parquet(v_path)
    vertices = ray.data.read_parquet(v_path)

    # resolve edges. ids are sorted-title ranks, so the id-ordered title
    # array doubles as the join: ``pc.index_in(title, sorted_titles)``
    # IS the title->id lookup. Broadcast it once (ray.put; ~20 B/vertex)
    # and both "joins" become one Arrow kernel per batch with NO shuffle
    # — measured 23 s -> ~2 s at 400k pages / 6.7M links. Past the
    # broadcast limit (vertex table no longer belongs in one worker's
    # heap) the two hash joins run instead.
    n_vertices = vertices.count()
    if n_vertices <= title_broadcast_limit:
        vdf = vertices.select_columns(["id", "title"]).to_pandas()
        vdf = vdf.sort_values("id")
        titles_by_id = pa.array(vdf["title"].tolist(), pa.string())
        titles_ref = ray.put(titles_by_id)

        def resolve(t: pa.Table) -> pa.Table:
            arr = ray.get(titles_ref)
            src = pc.index_in(t["src_title"], value_set=arr)
            dst = pc.index_in(t["dst_title"], value_set=arr)
            out = pa.table({
                "src": src.cast(pa.int64()),
                "dst": dst.cast(pa.int64()),
                "src_is_redirect": t["src_is_redirect"],
            })
            return out.filter(pc.and_(pc.is_valid(out["src"]),
                                      pc.is_valid(out["dst"])))

        e2 = links.map_batches(resolve, batch_format="pyarrow").materialize()
    else:
        vkey_src = vertices.select_columns(["title", "id"]).rename_columns(
            {"title": "v_src_title", "id": "src"})
        vkey_dst = vertices.select_columns(["title", "id"]).rename_columns(
            {"title": "v_dst_title", "id": "dst"})
        e1 = links.join(vkey_src, "inner", num_partitions,
                        on=("src_title",), right_on=("v_src_title",))
        e2 = e1.join(vkey_dst, "inner", num_partitions,
                     on=("dst_title",), right_on=("v_dst_title",)
                     ).select_columns(["src", "dst", "src_is_redirect"]
                                      ).materialize()
    e2.select_columns(["src", "dst"]).write_parquet(e_path)
    edges = ray.data.read_parquet(e_path)

    # ---- statistics (reference gatherStatistics, WikiProcessor.kt:174-206)
    # the grouped columns are BOOLEAN: per-batch partial counts + a
    # driver sum replace a full groupby shuffle per table (measured
    # 20 s -> <1 s at 400k pages)
    def counts_by(ds, col) -> dict:
        def part(t: pa.Table) -> pa.Table:
            trues = pc.sum(t.column(col).cast(pa.int64())).as_py() or 0
            return pa.table({"t": pa.array([trues], pa.int64()),
                             "n": pa.array([t.num_rows], pa.int64())})

        rows = ds.map_batches(part, batch_format="pyarrow").take_all()
        trues = sum(r["t"] for r in rows)
        total = sum(r["n"] for r in rows)
        return {True: trues, False: total - trues}

    meta_counts = counts_by(meta.select_columns(["is_redirect"]), "is_redirect")
    link_counts = counts_by(links.select_columns(["src_is_redirect"]),
                            "src_is_redirect")
    e2_counts = counts_by(e2.select_columns(["src_is_redirect"]),
                          "src_is_redirect")
    occ = int(link_counts.get(False, 0))
    resolved = int(e2_counts.get(False, 0))
    stats = GraphStats(
        n_articles=int(meta_counts.get(False, 0)),
        n_redirects_before=int(meta_counts.get(True, 0)),
        n_redirects_dropped=n_dropped,
        article_link_occurrences=occ,
        resolved_article_links=resolved,
        null_article_link_occurrences=occ - resolved,
        n_vertices=n_vertices,
        n_edges=e2.count(),
    )
    fsio.write_text(s_path, json.dumps(asdict(stats), indent=1))
    return GraphBuildResult(v_path, e_path, stats)
