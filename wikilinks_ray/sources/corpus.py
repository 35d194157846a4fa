"""Deterministic synthetic Common-Crawl-style pages corpus.

Produces the `input_hint` table
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
embedding a known wikitext-like link graph, mirroring the semantics the
reference ingests (WikiProcessor.kt:43-71):

- ``[[Target]]`` / ``[[Target|anchor]]`` links inside ``text``;
- ``#REDIRECT [[Target]]`` pages (10%): chains of length 1-3 plus planted
  2- and 3-cycles that must be eliminated like ``dropRedirectLoops``
  (WikiProcessor.kt:133-172); also one redirect to a title nothing links
  to (dropped — no PagePointer exists for it, WikiProcessor.kt:162-164)
  and one redirect to a missing-but-article-linked title (survives with
  zero edges — pointer exists with null page);
- ~10% of link occurrences are written lowercase-first and must be
  capitalized to resolve (WikiProcessor.kt:114-121);
- duplicate links per page that must be deduped (WikiProcessor.kt:55);
- ~2% dangling targets with no page, dropped + counted
  (WikiProcessor.kt:246-248);
- unicode titles exercising unsigned-byte title ordering
  (SegmentWikiGraphSerialization.kt:363-371), including the reference
  fixtures' golden-route pages: ``Gdańsk → Polska`` is a direct link and
  ``Polska → Polsko → Bałtycke Morze`` goes through the redirect
  ``Polsko`` (RouteIntegrationTest.kt:37-63);
- one hub page with > 32_767 out-links at ``n_pages >= 2000`` to prove
  we do not inherit the reference's int16 link-count limit
  (BufferWikiPage.java:52).

Everything is a pure function of ``(n_pages, seed)`` — no RNG state
leaks, no wall clock (warc_ts is epoch-based), so two runs (and two
processes) produce byte-identical parquet.
"""

from __future__ import annotations

import urllib.parse
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

URL_PREFIX = "https://wiki.test/wiki/"
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# Bump whenever generate_pages_table's OUTPUT changes for the same
# (n_pages, seed). Cached corpus directories (bench.py keys /tmp paths
# by this) are regenerated on mismatch — a stale /tmp corpus from an
# older generator silently shifted bench edge counts by 1 between
# rounds 2 and 3 (BASELINE.md "one-edge diff" root cause).
CORPUS_VERSION = 2

UNICODE_TITLES = [
    "Gdańsk",
    "Polska",
    "Polsko",  # redirect -> Bałtycke Morze (golden route middle hop)
    "Bałtycke Morze",
    "Gůrny Ślůnsk",
    "ソニック・ザ・ヘッジホッグ",
]

_WORDS = (
    "graph link node edge page wiki data ray arrow batch shard actor "
    "stream block shuffle merge rank label path route title corpus"
).split()


def page_url(title: str) -> str:
    """Canonical url of a page title (spaces become underscores)."""
    return URL_PREFIX + urllib.parse.quote(title.replace(" ", "_"), safe="")


def title_from_url(url: str) -> str:
    """Inverse of :func:`page_url`."""
    return urllib.parse.unquote(url[len(URL_PREFIX):]).replace("_", " ")


def _lower_first(s: str) -> str:
    return s[0].lower() + s[1:] if s else s


@dataclass
class CorpusSpec:
    """Golden expectations computed by the generator alongside the table."""

    titles: list[str]
    # title -> ordered, deduped, capitalized link targets as *written*
    # (resolution/dropping of dangling targets happens downstream)
    expected_links: dict[str, list[str]] = field(default_factory=dict)
    # title -> redirect target (capitalized) for redirect pages
    redirects: dict[str, str] = field(default_factory=dict)
    # titles of redirects that sit on a redirect-only cycle (must be dropped)
    loop_redirects: set[str] = field(default_factory=set)
    # redirects whose chain exits at a title that is neither a page nor any
    # article's link target (must be dropped: WikiProcessor.kt:162-164)
    noexit_redirects: set[str] = field(default_factory=set)
    # redirects to a missing-but-article-linked title (survive, zero edges)
    ghost_redirects: set[str] = field(default_factory=set)

    @property
    def dropped_redirects(self) -> set[str]:
        return self.loop_redirects | self.noexit_redirects


def build_corpus_spec(n_pages: int = 2000, seed: int = 42) -> CorpusSpec:
    """Draw the link graph. Deterministic in (n_pages, seed)."""
    if n_pages < 64:
        raise ValueError("n_pages must be >= 64")
    rng = np.random.default_rng(seed)

    n_plain = n_pages - len(UNICODE_TITLES)
    titles = [f"Page {i:05d}" for i in range(n_plain)] + list(UNICODE_TITLES)
    spec = CorpusSpec(titles=titles)

    # --- redirects: ~10% of plain pages, drawn from the tail ---------------
    n_redirect = max(4, n_plain // 10)
    redirect_ids = list(range(n_plain - n_redirect, n_plain))
    redirect_set = set(redirect_ids)
    article_ids = [i for i in range(n_plain) if i not in redirect_set]

    # chains: r -> r' -> article for the first quarter of redirects
    for j, rid in enumerate(redirect_ids):
        if j < n_redirect // 4 and j + 1 < n_redirect:
            target = titles[redirect_ids[j + 1]]  # chain into next redirect
        else:
            target = titles[int(rng.choice(article_ids))]
        spec.redirects[titles[rid]] = target
    # planted 2-cycle and 3-cycle (overwrite some chain targets)
    a, b, c, d, e = (titles[redirect_ids[-k]] for k in (1, 2, 3, 4, 5))
    spec.redirects[a], spec.redirects[b] = b, a
    spec.redirects[c], spec.redirects[d], spec.redirects[e] = d, e, c
    spec.loop_redirects = {a, b, c, d, e}
    # one redirect to a title that is neither a page nor any article's
    # link target: no PagePointer exists for it, so endSomewhere returns
    # false and the redirect is DROPPED (WikiProcessor.kt:162-164)
    spec.redirects[titles[redirect_ids[0]]] = "Missing Redirect Target"
    spec.noexit_redirects = {titles[redirect_ids[0]]}

    # --- article out-links: power-law degrees ------------------------------
    dangling_pool = [f"Missing Topic {k:04d}" for k in range(max(8, n_plain // 50))]
    for i in article_ids:
        deg = min(int(rng.pareto(1.3) * 4) + 1, max(4, n_plain // 4))
        target_ids = rng.choice(n_pages, size=deg, replace=True)
        links: list[str] = []
        for t in target_ids:
            name = titles[int(t)]
            r = rng.random()
            if r < 0.02:
                name = dangling_pool[int(rng.integers(len(dangling_pool)))]
            elif r < 0.12:
                name = _lower_first(name)  # must capitalize to resolve
            links.append(name)
        if len(links) > 2 and rng.random() < 0.3:
            links.append(links[0])  # planted duplicate, must dedup
        spec.expected_links[titles[i]] = links

    # one redirect to a MISSING title that some article links to: a
    # PagePointer exists (null page), so endSomewhere's non-redirect
    # branch returns true — survives with zero edges (packPages,
    # WikiProcessor.kt:232-238). Guarded away from the chain section
    # (indices 1..n//4) and the cycle tail (last 5).
    ghost_idx = n_redirect // 4 + 1
    if ghost_idx < n_redirect - 5:
        ghost_title = titles[redirect_ids[ghost_idx]]
        spec.redirects[ghost_title] = dangling_pool[0]
        spec.ghost_redirects = {ghost_title}
        # deterministically guarantee an article links to the target
        spec.expected_links[titles[article_ids[2]]].append(dangling_pool[0])

    # hub page proving int16-free link counts (BufferWikiPage.java:52 limit)
    if n_plain >= 2000:
        hub = titles[article_ids[0]]
        spec.expected_links[hub] = [
            titles[k % n_plain] for k in range(33_000)
        ]

    # --- planted golden routes (RouteIntegrationTest.kt:37-63) -------------
    spec.expected_links["Gdańsk"] = ["Polska"] + spec.expected_links.get("Gdańsk", [])
    spec.expected_links["Polska"] = ["Polsko", "Gdańsk"]
    spec.redirects["Polsko"] = "Bałtycke Morze"
    spec.expected_links["Bałtycke Morze"] = ["Polska"]
    spec.expected_links["Gůrny Ślůnsk"] = ["Polska", "Gdańsk"]
    spec.expected_links["ソニック・ザ・ヘッジホッグ"] = [titles[article_ids[1]]]
    for t in UNICODE_TITLES:
        spec.redirects.pop(t, None) if t != "Polsko" else None
        if t != "Polsko" and t not in spec.expected_links:
            spec.expected_links[t] = []
    spec.expected_links.pop("Polsko", None)

    return spec


def _render_text(title: str, links: list[str], redirect_target: str | None,
                 rng: np.random.Generator) -> str:
    """Wikitext-like body embedding the links in order."""
    if redirect_target is not None:
        return f"#REDIRECT [[{redirect_target}]]"
    parts: list[str] = [f"'''{title}''' is a page in the test corpus."]
    for j, link in enumerate(links):
        w1 = _WORDS[int(rng.integers(len(_WORDS)))]
        if j % 7 == 3:
            parts.append(f"{w1} [[{link}|{w1} anchor]]")
        else:
            parts.append(f"{w1} [[{link}]]")
    parts.append("End of page.")
    return " ".join(parts)


def _render_html(title: str, text: str) -> bytes:
    body = text.replace("[[", '<a href="/wiki/').replace("]]", '">link</a>')
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()


def generate_pages_table(n_pages: int = 2000, seed: int = 42) -> tuple[pa.Table, CorpusSpec]:
    """Materialize the pages table + its golden spec."""
    spec = build_corpus_spec(n_pages, seed)
    rng = np.random.default_rng(seed + 1)  # text filler RNG, separate stream

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i, title in enumerate(spec.titles):
        redirect_target = spec.redirects.get(title)
        links = spec.expected_links.get(title, [])
        text = _render_text(title, links, redirect_target, rng)
        urls.append(page_url(title))
        tss.append(EPOCH_US + i * 1_000_000)
        htmls.append(_render_html(title, text))
        texts.append(text)
        langs.append("szl" if title in ("Gůrny Ślůnsk", "Bałtycke Morze", "Polsko")
                     else ("fo" if i % 97 == 13 else "en"))

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return table, spec


# --------------------------------------------------------------------------
# template-transclusion corpus (bliki template-expansion parity)
# --------------------------------------------------------------------------

@dataclass
class TemplateCorpusSpec:
    """Primitives of the template corpus — raw structures an independent
    oracle (SQL transclusion joins, or a naive recursive expander in
    tests) can re-derive expanded links from."""

    article_titles: list[str]
    template_names: list[str]  # WITHOUT the ``Template:`` prefix
    # template name -> body wikitext
    template_bodies: dict[str, str] = field(default_factory=dict)
    # article title -> direct [[links]] as written (pre-normalization)
    direct_links: dict[str, list[str]] = field(default_factory=dict)
    # article title -> template invocations as written (may be
    # lowercase-first or unknown)
    invocations: dict[str, list[str]] = field(default_factory=dict)


def build_template_corpus(n_pages: int = 1200, seed: int = 7,
                          with_params: bool = False
                          ) -> tuple[pa.Table, TemplateCorpusSpec]:
    """Pages table whose link graph flows partly through ``{{Box k}}``
    transclusions (the bliki-parity corpus; WikiProcessor.kt:45-46).

    Deterministic in ``(n_pages, seed, with_params)``. Structure:

    - templates ``Template:Box 000..``: bodies carry 1-3 article links
      (some lowercase-first, some dangling); every third template nests
      the next one (depth 2), ``Box 000 -> Box 001 -> Box 002`` is a
      planted depth-3 chain, the last two templates invoke each other (a
      planted 2-cycle the depth guard must bottom out — both bodies'
      links still count exactly once), and ``Box 004`` invokes an
      unknown template (contributes nothing);
    - articles: 1-4 direct links plus 0-2 invocations, ~10% of
      invocation names written lowercase-first (must capitalize to
      resolve), ~5% invoking unknown templates;
    - ``with_params=True`` (pytest corpus only — the SQL oracle corpus
      stays parameterless): parameterized templates ``P 0``/``P 1``
      whose bodies link through ``{{{1}}}`` / ``{{{link|...}}}``
      placeholders.
    """
    if n_pages < 200:
        raise ValueError("n_pages must be >= 200")
    rng = np.random.default_rng(seed)
    n_tpl = max(8, n_pages // 40)
    n_articles = n_pages - n_tpl
    articles = [f"TPage {i:05d}" for i in range(n_articles)]
    tnames = [f"Box {k:03d}" for k in range(n_tpl)]
    spec = TemplateCorpusSpec(article_titles=articles, template_names=tnames)

    def art(i: int) -> str:
        return articles[int(i) % n_articles]

    for k, name in enumerate(tnames):
        nl = 1 + int(rng.integers(3))
        links = [art(rng.integers(n_articles)) for _ in range(nl)]
        if rng.random() < 0.2:
            links.append(f"Tpl Missing {int(rng.integers(6)):02d}")
        if rng.random() < 0.3:
            links[0] = _lower_first(links[0])
        body = "Transcluded box. " + " ".join(f"[[{l}]]" for l in links)
        if k % 3 == 0 and k + 1 < n_tpl:
            body += f" {{{{Box {k + 1:03d}}}}}"
        if k == 1:
            body += " {{Box 002}}"  # completes the 0 -> 1 -> 2 chain
        if k == 4:
            body += " {{Ghost box}}"  # unknown nested template
        spec.template_bodies[name] = body
    # planted 2-cycle between the last two templates
    spec.template_bodies[tnames[-1]] += f" {{{{{tnames[-2]}}}}}"
    spec.template_bodies[tnames[-2]] += f" {{{{{tnames[-1]}}}}}"

    if with_params:
        spec.template_names += ["P 0", "P 1"]
        spec.template_bodies["P 0"] = "See [[{{{1}}}]] and [[{{{link|Default Page}}}]]."
        spec.template_bodies["P 1"] = "Pipe anchor [[{{{1|TPage 00000}}}|an|chor]]."

    for i, title in enumerate(articles):
        nl = 1 + int(rng.integers(4))
        links = []
        for _ in range(nl):
            name = art(rng.integers(n_articles))
            r = rng.random()
            if r < 0.03:
                name = f"Tpl Missing {int(rng.integers(6)):02d}"
            elif r < 0.13:
                name = _lower_first(name)
            links.append(name)
        spec.direct_links[title] = links
        inv: list[str] = []
        for _ in range(int(rng.integers(3))):
            r = rng.random()
            name = tnames[int(rng.integers(n_tpl))]
            if r < 0.05:
                name = f"No such box {int(rng.integers(4))}"
            elif r < 0.15:
                name = _lower_first(name)
            inv.append(name)
        if with_params and i % 17 == 0:
            inv.append(f"P 0|{art(i + 7)}|link={art(i + 9)}")
            inv.append(f"P 1|{art(i + 11)}")
        spec.invocations[title] = inv

    rng_txt = np.random.default_rng(seed + 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    rows: list[tuple[str, str]] = [
        (f"Template:{n}", spec.template_bodies[n]) for n in spec.template_names
    ]
    for title in articles:
        parts = [f"'''{title}''' in the transclusion corpus."]
        links, inv = spec.direct_links[title], spec.invocations[title]
        for j in range(max(len(links), len(inv))):
            w = _WORDS[int(rng_txt.integers(len(_WORDS)))]
            if j < len(links):
                parts.append(f"{w} [[{links[j]}]]")
            if j < len(inv):
                parts.append(f"{{{{{inv[j]}}}}}")
        parts.append("End.")
        rows.append((title, " ".join(parts)))
    for i, (title, text) in enumerate(rows):
        urls.append(page_url(title))
        tss.append(EPOCH_US + i * 1_000_000)
        htmls.append(_render_html(title, text))
        texts.append(text)
        langs.append("en")
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return table, spec


def write_template_corpus(path: str, n_pages: int = 1200, seed: int = 7,
                          n_shards: int = 8, with_params: bool = False
                          ) -> TemplateCorpusSpec:
    """Write the transclusion corpus as ``path/part-{k}.parquet``."""
    import os

    table, spec = build_template_corpus(n_pages, seed, with_params)
    os.makedirs(path, exist_ok=True)
    per = -(-table.num_rows // n_shards)
    for k in range(n_shards):
        chunk = table.slice(k * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{k:05d}.parquet"))
    return spec


def write_pages_corpus(path: str, n_pages: int = 2000, seed: int = 42,
                       n_shards: int = 8) -> CorpusSpec:
    """Write the corpus as ``path/part-{k}.parquet`` shards (resumable
    layout: one file per shard)."""
    import os

    table, spec = generate_pages_table(n_pages, seed)
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    per = -(-n // n_shards)
    for k in range(n_shards):
        chunk = table.slice(k * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{k:05d}.parquet"))
    return spec
