"""Link-extraction stages: zero-copy Arrow ``map_batches`` transforms.

Ray-Data-first re-expression of the reference's SAX-callback parse
(WikiProcessor.kt:43-71): instead of a single-threaded push parser
mutating a HashMap, extraction is a stateless batch transform over the
``pages`` Dataset, emitting

- per-page metadata rows (``extract_pages_meta``): the vertex side +
  the canonical ``extracted_text`` bytes (the byte-identical invariant),
- flat link rows (``LinkExtractor``): the raw edge side
  ``(src_title, dst_title, is_redirect)``, one row per deduped link.

Both run with ``batch_format="pyarrow"`` so blocks come out of the
object store zero-copy; the per-document regex work is inherently
row-wise (like any tokenizer) but all column assembly is Arrow.
``LinkExtractor`` is a callable class so the compiled regexes and any
future models are built once per actor (``__init__``), not per batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.wikitext import parse_wikitext, extracted_text_bytes
from ..sources.corpus import title_from_url

META_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("is_redirect", pa.bool_()),
        ("redirect_target", pa.string()),
        ("n_links", pa.int64()),
        ("extracted_text", pa.binary()),
    ]
)

LINKS_SCHEMA = pa.schema(
    [
        ("src_title", pa.string()),
        ("dst_title", pa.string()),
        ("ord", pa.int64()),  # first-occurrence order within the page
        ("src_is_redirect", pa.bool_()),
    ]
)


def extract_pages_meta(batch: pa.Table) -> pa.Table:
    """pages(url, text, ...) -> one meta row per page."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    titles, is_rd, rd_target, n_links, ext = [], [], [], [], []
    for url, text in zip(urls, texts):
        r, target, links = parse_wikitext(text or "")
        titles.append(title_from_url(url))
        is_rd.append(r)
        rd_target.append(target)
        n_links.append(len(links))
        ext.append(extracted_text_bytes(r, target, links))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "is_redirect": pa.array(is_rd, pa.bool_()),
            "redirect_target": pa.array(rd_target, pa.string()),
            "n_links": pa.array(n_links, pa.int64()),
            "extracted_text": pa.array(ext, pa.binary()),
        },
        schema=META_SCHEMA,
    )


COMBINED_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = page meta row, 1 = link row
        ("url", pa.string()),
        ("title", pa.string()),
        ("is_redirect", pa.bool_()),
        ("redirect_target", pa.string()),
        ("n_links", pa.int64()),
        ("extracted_text", pa.binary()),
        ("dst_title", pa.string()),
        ("ord", pa.int64()),
    ]
)


def extract_combined(batch: pa.Table, *, tpl_ref=None) -> pa.Table:
    """Single-pass extractor: one meta row (kind=0) AND one row per link
    (kind=1) per page, in one table.

    ``tpl_ref`` (optional): broadcast template map (see
    pipelines/templates.py) — when set, ``{{Name|args}}`` transclusions
    expand before the link walk (bliki parity) and ``Template:`` pages
    are consumed as macro definitions only (no meta/link rows — the
    main-namespace filter).

    At corpus scale the pages input (html + text columns) is the heavy
    read; running the meta and link extractors separately reads it
    twice. This emits both row kinds in one pass; downstream splits with
    a cheap vectorized filter on ``kind`` over the (much smaller)
    extracted table. Parse work is also done once per page instead of
    twice.

    A plain function on purpose: the stage is stateless (regexes are
    module-level), so a task pool gives the same throughput as an actor
    pool with strictly better fault tolerance — task retries re-execute
    from lineage, whereas actor restarts depend on the object-store copy
    of the constructor args (ray#53727) and an actor pool can starve the
    upstream read when sized to the node (see state/csr.py notes).
    """
    lookup = None
    tpl_url_prefix = None
    if tpl_ref is not None:
        from ..pipelines.templates import _TPL_URL_PREFIX, _resolve_map

        lookup = _resolve_map(tpl_ref).get
        tpl_url_prefix = _TPL_URL_PREFIX
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    kind, url_o, title_o, isrd, rtgt, nlinks, ext, dst, order = \
        [], [], [], [], [], [], [], [], []
    for url, text in zip(urls, texts):
        if tpl_url_prefix is not None and url.startswith(tpl_url_prefix):
            continue
        title = title_from_url(url)
        r, target, links = parse_wikitext(text or "", template_lookup=lookup,
                                          page_title=title)
        kind.append(0)
        url_o.append(url)
        title_o.append(title)
        isrd.append(r)
        rtgt.append(target)
        nlinks.append(len(links))
        ext.append(extracted_text_bytes(r, target, links))
        dst.append(None)
        order.append(-1)
        for j, link in enumerate(links):
            kind.append(1)
            url_o.append(url)
            title_o.append(title)
            isrd.append(r)
            rtgt.append(None)
            nlinks.append(0)
            ext.append(None)
            dst.append(link)
            order.append(j)
    return pa.table(
        {
            "kind": pa.array(kind, pa.int8()),
            "url": pa.array(url_o, pa.string()),
            "title": pa.array(title_o, pa.string()),
            "is_redirect": pa.array(isrd, pa.bool_()),
            "redirect_target": pa.array(rtgt, pa.string()),
            "n_links": pa.array(nlinks, pa.int64()),
            "extracted_text": pa.array(ext, pa.binary()),
            "dst_title": pa.array(dst, pa.string()),
            "ord": pa.array(order, pa.int64()),
        },
        schema=COMBINED_SCHEMA,
    )


def split_combined(combined: "object"):
    """combined Dataset -> (meta_ds, links_ds) via vectorized kind filters."""
    import pyarrow.compute as pc

    def meta_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 0))
        return t.select(["url", "title", "is_redirect", "redirect_target",
                         "n_links", "extracted_text"])

    def links_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 1))
        return pa.table({
            "src_title": t["title"],
            "dst_title": t["dst_title"],
            "ord": t["ord"],
            "src_is_redirect": t["is_redirect"],
        })

    return (combined.map_batches(meta_part, batch_format="pyarrow"),
            combined.map_batches(links_part, batch_format="pyarrow"))


class LinkExtractor:
    """pages -> flat (src_title, dst_title, ord, src_is_redirect) rows.

    Actor-pool stage: state (compiled regexes live in
    ``functions.wikitext`` at module import, plus any per-actor buffers)
    is built once per actor. Use via::

        pages.map_batches(LinkExtractor, batch_format="pyarrow",
                          batch_size=1024, concurrency=N)
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        src, dst, order, srd = [], [], [], []
        for url, text in zip(urls, texts):
            is_redirect, _target, links = parse_wikitext(text or "")
            title = title_from_url(url)
            for j, link in enumerate(links):
                src.append(title)
                dst.append(link)
                order.append(j)
                srd.append(is_redirect)
        return pa.table(
            {
                "src_title": pa.array(src, pa.string()),
                "dst_title": pa.array(dst, pa.string()),
                "ord": pa.array(order, pa.int64()),
                "src_is_redirect": pa.array(srd, pa.bool_()),
            },
            schema=LINKS_SCHEMA,
        )
