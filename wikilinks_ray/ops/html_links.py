"""HTML href link extraction — the Common-Crawl-shaped input path.

The pages table carries BOTH a wikitext ``text`` column and a rendered
``html`` binary column (input-hint schema: url, warc_ts, html, text,
lang). The flagship build parses wikitext; this module derives the same
link graph from the HTML SIDE alone — ``<a href="/wiki/...">`` anchors
— which is what a real Common-Crawl pipeline has to work with.

Frozen semantics (SQL twin: ``wiki_html_edges``; differential pytest
pins html-derived edges == wikitext-derived article edges on the
corpus):

- internal link = ``<a href="/wiki/RAW">`` (non-greedy to the closing
  quote-gt; regex-grade extraction — real-crawl HTML with nested or
  quoted attributes should go through a proper parser behind an
  optional dependency, same posture as the multimodal probes);
- RAW normalizes exactly like a wikitext target
  (``functions.wikitext.normalize_link_target``: strip ``|``/``#``
  parts, underscores→spaces, trim, capitalize first);
- redirect pages (body starting ``#REDIRECT``, case-insensitive)
  contribute nothing — their one anchor is navigation;
- per-page dedup, then resolution against the built vertices and a
  global DISTINCT (src, dst) — matching the article-link half of the
  flagship edge semantics.

Stateless task-pool extraction; resolution reuses the gated broadcast
``pc.index_in`` plan; the final dedup is the bucketed
``stages/agg.distinct_pairs`` combiner plan.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.wikitext import normalize_link_target

HREF_RE = re.compile(r'<a href="/wiki/(.*?)">', re.DOTALL)
TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
REDIRECT_BODY_RE = re.compile(r"<body>\s*#REDIRECT", re.IGNORECASE)


def html_page_links(html_bytes: bytes) -> tuple[str | None, list[str]]:
    """(page title, per-page-deduped normalized link targets) of one
    rendered page; redirect pages yield no links."""
    doc = html_bytes.decode("utf-8", errors="replace")
    m = TITLE_RE.search(doc)
    title = m.group(1) if m else None
    if REDIRECT_BODY_RE.search(doc):
        return title, []
    seen: set[str] = set()
    links: list[str] = []
    for raw in HREF_RE.findall(doc):
        t = normalize_link_target(raw)
        if t is not None and t not in seen:
            seen.add(t)
            links.append(t)
    return title, links


def html_link_edges(pages: "ray.data.Dataset",
                    vertices: "ray.data.Dataset", *,
                    concurrency: int | None = None,
                    title_broadcast_limit: int = 20_000_000,
                    num_partitions: int = 16) -> "ray.data.Dataset":
    """Distinct resolved (src, dst) id edges derived from the ``html``
    column alone."""

    def ex(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        for h in t.column("html").to_pylist():
            title, links = html_page_links(h or b"")
            if title is None:
                continue
            for link in links:
                srcs.append(title)
                dsts.append(link)
        return pa.table({
            "src_title": pa.array(srcs, pa.string()),
            "dst_title": pa.array(dsts, pa.string()),
        })

    occ = pages.select_columns(["html"]).map_batches(
        ex, batch_format="pyarrow", concurrency=concurrency)

    n = vertices.count()
    if n <= title_broadcast_limit:
        vdf = vertices.select_columns(["id", "title"]).to_pandas()
        titles = pa.array(vdf["title"].tolist(), pa.string())
        ids_np = vdf["id"].to_numpy().astype(np.int64)
        ref = ray.put((titles, ids_np))

        def resolve(t: pa.Table) -> pa.Table:
            tarr, iarr = ray.get(ref)
            ps = pc.index_in(t["src_title"], value_set=tarr)
            pd_ = pc.index_in(t["dst_title"], value_set=tarr)
            keep = pc.and_(pc.is_valid(ps), pc.is_valid(pd_))
            ps_np = ps.filter(keep).to_numpy(zero_copy_only=False)
            pd_np = pd_.filter(keep).to_numpy(zero_copy_only=False)
            return pa.table({
                "src": pa.array(iarr[ps_np.astype(np.int64)], pa.int64()),
                "dst": pa.array(iarr[pd_np.astype(np.int64)], pa.int64()),
            })

        resolved = occ.map_batches(resolve, batch_format="pyarrow")
    else:
        from ..stages.util import rename_cols

        vs = rename_cols(vertices.select_columns(["title", "id"]),
                         {"title": "s_t", "id": "src"})
        vd = rename_cols(vertices.select_columns(["title", "id"]),
                         {"title": "d_t", "id": "dst"})
        resolved = (occ.join(vs, "inner", num_partitions,
                             on=("src_title",), right_on=("s_t",))
                    .join(vd, "inner", num_partitions,
                          on=("dst_title",), right_on=("d_t",))
                    .select_columns(["src", "dst"]))

    from ..stages.agg import distinct_pairs

    return distinct_pairs(resolved, "src", "dst")
