"""Driver-oracle plumbing for the flagship wikitext build path.

The driver's correctness gate runs ``queries()`` entries against DuckDB
SQL over parquet. The flagship pipeline (wikitext extraction → redirect
fixpoint → title join → dense ids, ``pipelines/build.py``) consumes a
*pages* corpus, which is not one of the driver's TPC-H-ish tables — so
this module materializes the deterministic synthetic corpus
(``sources/corpus.py``, a pure function of (n_pages, seed)) at a fixed
/tmp path that BOTH sides read: the Ray queries run ``build_graph`` over
it, and the oracle SQL re-derives extraction + capitalization + per-page
dedup + redirect-loop elimination + sorted-title ids from the same
parquet with ``read_parquet``.

Reference semantics being oracle-gated here (WikiProcessor.kt):
- link syntax + first-letter capitalization (:53-55, :114-121),
- per-page link dedup (:57 ``.distinct()``),
- redirect chains/cycles via endSomewhere (:133-171),
- pointer-map knownness — only article links create PagePointers
  (:56-66), so a redirect to a never-linked missing title drops,
- packPages single-edge redirect rewrite + dangling-link drop
  (:226-248),
- dense ids as sorted-title rank (this engine's frozen id semantics;
  DuckDB's binary string collation matches Python/Arrow UTF-8 order).
"""

from __future__ import annotations

import hashlib
import os

CORPUS_N = 2000
CORPUS_SEED = 42


def _semantics_tag() -> str:
    """md5 of the source files the oracle artifacts' SEMANTICS depend on
    (generator, extraction, build, id assignment). A /tmp build produced
    by an older code version must never be reused as the engine side of
    the correctness gate — the dir name changes with the semantics."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.md5()
    # plain file reads, no imports: this runs at module load and module
    # imports here would cycle through the package __init__
    for rel in ("sources/corpus.py", "functions/wikitext.py",
                "stages/extract.py", "stages/ids.py", "pipelines/build.py",
                "pipelines/templates.py"):
        with open(os.path.join(pkg, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


_TAG = _semantics_tag()
ORACLE_CORPUS_DIR = f"/tmp/wl_wiki_oracle_corpus_n{CORPUS_N}_s{CORPUS_SEED}_{_TAG}"
ORACLE_BUILD_DIR = f"/tmp/wl_wiki_oracle_build_n{CORPUS_N}_s{CORPUS_SEED}_{_TAG}"


TPL_CORPUS_N = 1200
TPL_CORPUS_SEED = 7
ORACLE_TPL_CORPUS_DIR = (
    f"/tmp/wl_wiki_oracle_tplcorpus_n{TPL_CORPUS_N}_s{TPL_CORPUS_SEED}_{_TAG}"
)


def ensure_template_corpus() -> str:
    """Write the deterministic transclusion corpus (parameterless — the
    SQL side re-derives expansion with joins) to its fixed /tmp path."""
    if not os.path.isdir(ORACLE_TPL_CORPUS_DIR):
        from ..sources.corpus import write_template_corpus

        tmp = ORACLE_TPL_CORPUS_DIR + f".tmp{os.getpid()}"
        write_template_corpus(tmp, TPL_CORPUS_N, TPL_CORPUS_SEED)
        try:
            os.rename(tmp, ORACLE_TPL_CORPUS_DIR)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return ORACLE_TPL_CORPUS_DIR


def template_links_oracle_sql() -> str:
    """DuckDB twin of ``pipelines.templates.template_link_edges`` over
    the parameterless transclusion corpus: expansion == transclusion
    JOINs unrolled to the corpus's maximum new-body depth (3 — the
    planted ``Box 000 -> 001 -> 002`` chain; the planted template
    2-cycle introduces no new body past depth 2, so the unroll is
    exact; the engine's depth guard at 8 sees the same link set).
    All generated CTEs are MATERIALIZED (DuckDB inlines
    multiply-referenced CTEs exponentially)."""
    corpus = ORACLE_TPL_CORPUS_DIR

    def norm_name(expr: str) -> str:
        t = f"trim(replace({expr}, '_', ' '))"
        return (f"CASE WHEN {t} = '' THEN NULL "
                f"ELSE upper(substr({t}, 1, 1)) || substr({t}, 2) END")

    inv = r"regexp_extract_all({src}, '\{{\{{([^{{}}]*)\}}\}}', 1)"
    links = r"regexp_extract_all({src}, '\[\[(.*?)\]\]', 1)"
    return rf"""
WITH pages AS MATERIALIZED (
    SELECT regexp_extract(decode(html), '<title>(.*?)</title>', 1) AS title,
           text
    FROM read_parquet('{corpus}/part-*.parquet')
),
tpl AS MATERIALIZED (
    SELECT substr(title, 10) AS name, text FROM pages
    WHERE title LIKE 'Template:%'
),
art AS MATERIALIZED (
    SELECT title, text FROM pages WHERE title NOT LIKE 'Template:%'
),
b1 AS MATERIALIZED (  -- bodies transcluded directly by each article
    SELECT x.title AS src, t.text AS body
    FROM (SELECT title, unnest({inv.format(src='text')}) AS tname FROM art) x
    JOIN tpl t ON t.name = {norm_name('x.tname')}
),
b2 AS MATERIALIZED (  -- bodies transcluded by those bodies
    SELECT b.src, t.text AS body
    FROM (SELECT src, unnest({inv.format(src='body')}) AS tname FROM b1) b
    JOIN tpl t ON t.name = {norm_name('b.tname')}
),
b3 AS MATERIALIZED (
    SELECT b.src, t.text AS body
    FROM (SELECT src, unnest({inv.format(src='body')}) AS tname FROM b2) b
    JOIN tpl t ON t.name = {norm_name('b.tname')}
),
raws AS (
    SELECT title AS src, unnest({links.format(src='text')}) AS raw FROM art
    UNION ALL
    SELECT src, unnest({links.format(src='body')}) AS raw FROM b1
    UNION ALL
    SELECT src, unnest({links.format(src='body')}) AS raw FROM b2
    UNION ALL
    SELECT src, unnest({links.format(src='body')}) AS raw FROM b3
)
SELECT DISTINCT src AS src_title, {_norm('raw')} AS dst_title FROM raws
WHERE {_norm('raw')} IS NOT NULL
"""


def ensure_oracle_corpus() -> str:
    """Write the deterministic pages corpus to the fixed /tmp path once
    (atomic rename so a concurrent caller never sees a half-written
    directory). Safe to call from both queries() and oracle_sql()."""
    if not os.path.isdir(ORACLE_CORPUS_DIR):
        from ..sources.corpus import write_pages_corpus

        tmp = ORACLE_CORPUS_DIR + f".tmp{os.getpid()}"
        write_pages_corpus(tmp, CORPUS_N, CORPUS_SEED)
        try:
            os.rename(tmp, ORACLE_CORPUS_DIR)
        except OSError:  # concurrent creator won the rename
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return ORACLE_CORPUS_DIR


ORACLE_WARC_DIR = f"/tmp/wl_wiki_oracle_warc_n{CORPUS_N}_s{CORPUS_SEED}_{_TAG}"


def ensure_warc_corpus() -> str:
    """The oracle corpus re-sharded as plain WARC files (the crawl-
    shaped input for the wiki_warc_edges gate). Same atomic-rename
    protocol as the parquet corpus."""
    if not os.path.isdir(ORACLE_WARC_DIR):
        import ray.data

        from ..sources.warc import write_warc_corpus

        ensure_oracle_corpus()
        pages = ray.data.read_parquet(ORACLE_CORPUS_DIR)
        tmp = ORACLE_WARC_DIR + f".tmp{os.getpid()}"
        write_warc_corpus(pages, tmp, n_shards=8)
        try:
            os.rename(tmp, ORACLE_WARC_DIR)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return ORACLE_WARC_DIR


def oracle_build():
    """Build (or reuse — build_graph skips on existing _STATS.json) the
    flagship graph over the oracle corpus."""
    import ray.data

    from .build import build_graph

    ensure_oracle_corpus()
    pages = ray.data.read_parquet(ORACLE_CORPUS_DIR)
    return build_graph(pages, ORACLE_BUILD_DIR, num_partitions=8,
                       extract_concurrency=4)


# --------------------------------------------------------------------------
# oracle SQL — shared CTE prefix reproducing the extraction semantics
# --------------------------------------------------------------------------

def _norm(expr: str) -> str:
    """SQL twin of functions.wikitext.normalize_link_target: strip
    ``|anchor`` and ``#section``, underscores→spaces, trim, NULL if
    empty, capitalize the first character."""
    t = f"trim(replace(split_part(split_part({expr}, '|', 1), '#', 1), '_', ' '))"
    return (f"CASE WHEN {t} = '' THEN NULL "
            f"ELSE upper(substr({t}, 1, 1)) || substr({t}, 2) END")


def wiki_cte_prefix() -> str:
    corpus = ORACLE_CORPUS_DIR
    rd_re = r"^\s*#REDIRECT\s*:?\s*\[\[(.*?)\]\]"
    return rf"""
WITH RECURSIVE pages AS (
    -- title travels in the html <title> tag (url-decoding isn't
    -- available in this DuckDB); text is the wikitext body
    SELECT regexp_extract(decode(html), '<title>(.*?)</title>', 1) AS title,
           text
    FROM read_parquet('{corpus}/part-*.parquet')
),
parsed AS (
    SELECT title, text,
           regexp_matches(text, '{rd_re}', 'is') AS is_redirect,
           regexp_extract(text, '{rd_re}', 1, 'is') AS rd_raw
    FROM pages
),
rd AS (  -- redirect pages with normalized target (NULL = empty target)
    SELECT title, {_norm('rd_raw')} AS target FROM parsed WHERE is_redirect
),
rawlinks AS (
    SELECT title AS src_title,
           unnest(regexp_extract_all(text, '\[\[(.*?)\]\]', 1)) AS raw
    FROM parsed WHERE NOT is_redirect
),
alinks AS (  -- per-page deduped, capitalized article link targets
    SELECT DISTINCT src_title, {_norm('raw')} AS dst_title FROM rawlinks
    WHERE {_norm('raw')} IS NOT NULL
),
nxt AS (  -- redirect pairs with a usable target (the walkable subgraph)
    SELECT title, target FROM rd WHERE target IS NOT NULL
),
known AS (  -- titles holding a PagePointer: pages + article link targets
    SELECT title FROM parsed
    UNION SELECT dst_title FROM alinks
),
reach AS (  -- every title reachable from each redirect via redirect hops
    SELECT title AS start, target AS cur FROM nxt
    UNION
    SELECT r.start, n.target FROM reach r JOIN nxt n ON n.title = r.cur
),
surviving_rd AS (  -- endSomewhere == true (WikiProcessor.kt:146-171)
    SELECT start AS title FROM reach
    WHERE cur NOT IN (SELECT title FROM nxt)
      AND cur IN (SELECT title FROM known)
    UNION SELECT title FROM rd WHERE target IS NULL
),
dropped AS (  -- EXCEPT is not allowed inside WITH RECURSIVE in DuckDB
    SELECT title FROM rd
    WHERE title NOT IN (SELECT title FROM surviving_rd)
),
ids AS (  -- dense sorted-title rank over surviving pages
    SELECT title, is_redirect,
           row_number() OVER (ORDER BY title) - 1 AS id
    FROM parsed WHERE title NOT IN (SELECT title FROM dropped)
),
allpairs AS (  -- article links + the single redirect edge (packPages)
    SELECT src_title, dst_title FROM alinks
    UNION ALL SELECT title, target FROM nxt
),
edges AS (  -- resolve both endpoints against surviving vertices
    SELECT s.id AS src, d.id AS dst
    FROM allpairs a
    JOIN ids s ON s.title = a.src_title
    JOIN ids d ON d.title = a.dst_title
)
"""


def wiki_oracle_sql() -> dict[str, str]:
    p = wiki_cte_prefix()
    d = {
        "wiki_vertices": p + "SELECT id, title, is_redirect FROM ids",
        "wiki_edges": p + "SELECT src, dst FROM edges",
        "wiki_bfs": p + """
            , walk(v, dist) AS (
                -- source: max-out-degree vertex, min-id tie-break
                SELECT (SELECT src FROM edges GROUP BY src
                        ORDER BY count(*) DESC, src LIMIT 1), 0
                UNION
                -- dist cap terminates the recursion on cycles (see
                -- graph_bfs); wiki-graph eccentricity is far below 256
                SELECT e.dst, w.dist + 1 FROM walk w
                JOIN edges e ON e.src = w.v WHERE w.dist < 256
            )
            SELECT v AS vertex, min(dist) AS dist FROM walk GROUP BY v
        """,
        "wiki_prefix": p + """
            SELECT id, title FROM ids
            WHERE title LIKE 'Page 001%' ORDER BY title LIMIT 10
        """,
        "wiki_stats": p + """
            SELECT
              (SELECT count(*) FROM parsed WHERE NOT is_redirect)::BIGINT AS n_articles,
              (SELECT count(*) FROM rd)::BIGINT AS n_redirects_before,
              (SELECT count(*) FROM dropped)::BIGINT AS n_redirects_dropped,
              (SELECT count(*) FROM alinks)::BIGINT AS article_link_occurrences,
              (SELECT count(*) FROM edges e JOIN ids s ON e.src = s.id
                WHERE NOT s.is_redirect)::BIGINT AS resolved_article_links,
              ((SELECT count(*) FROM alinks)
               - (SELECT count(*) FROM edges e JOIN ids s ON e.src = s.id
                   WHERE NOT s.is_redirect))::BIGINT AS null_article_link_occurrences,
              (SELECT count(*) FROM ids)::BIGINT AS n_vertices,
              (SELECT count(*) FROM edges)::BIGINT AS n_edges
        """,
        # SQL twin of ops/html_links.html_link_edges — the SAME link
        # graph derived from the rendered html column alone (href
        # extraction), independently of the wikitext walk above
        "wiki_html_edges": p + rf"""
            , hraw AS (
                SELECT regexp_extract(decode(html), '<title>(.*?)</title>', 1)
                           AS src_title,
                       unnest(regexp_extract_all(decode(html),
                           '<a href="/wiki/(.*?)">', 1)) AS raw
                FROM read_parquet('{ORACLE_CORPUS_DIR}/part-*.parquet')
                WHERE NOT regexp_matches(decode(html),
                                         '<body>\s*#REDIRECT', 'i')
            ),
            hlinks AS (
                SELECT DISTINCT src_title, {_norm('raw')} AS dst_title
                FROM hraw WHERE {_norm('raw')} IS NOT NULL
            )
            SELECT DISTINCT s.id AS src, d.id AS dst FROM hlinks h
            JOIN ids s ON s.title = h.src_title
            JOIN ids d ON d.title = h.dst_title
        """,
        # wiki_warc_edges: the SAME href-derived edge SQL — the engine
        # side goes WARC shards -> read_warc -> html_link_edges, so the
        # whole crawl-shaped ingest (WARC framing, HTTP payload strip,
        # href walk, resolution) sits under one value-hash gate
        "wiki_warc_edges": "__SEE_BELOW__",
        # SQL twin of ops/anchors.anchor_stats — semantics pinned in
        # functions/wikitext.link_anchor_pairs' docstring: per-OCCURRENCE
        # (no per-page dedup), articles only, anchor = text after the
        # first pipe (else the raw inner as written), both sides compare
        # anchors in code-point order (DuckDB binary UTF-8 == Python str)
        "wiki_anchors": p + f"""
            , anch AS (
                SELECT {_norm('raw')} AS dst_title,
                       CASE WHEN strpos(raw, '|') > 0
                            THEN trim(substr(raw, strpos(raw, '|') + 1))
                            ELSE trim(raw) END AS anchor
                FROM rawlinks WHERE {_norm('raw')} IS NOT NULL
            ),
            resolved AS (
                SELECT d.id AS dst, a.anchor FROM anch a
                JOIN ids d ON d.title = a.dst_title
            ),
            pair_counts AS (
                SELECT dst, anchor, count(*)::BIGINT AS cnt
                FROM resolved GROUP BY dst, anchor
            ),
            ranked AS (
                SELECT dst, anchor, cnt,
                       row_number() OVER (PARTITION BY dst
                                          ORDER BY cnt DESC, anchor) AS rn
                FROM pair_counts
            ),
            totals AS (
                SELECT dst, sum(cnt)::BIGINT AS occurrences,
                       count(*)::BIGINT AS n_distinct_anchors
                FROM pair_counts GROUP BY dst
            )
            SELECT t.dst, t.occurrences, t.n_distinct_anchors,
                   r.anchor AS top_anchor, r.cnt AS top_count
            FROM totals t JOIN ranked r ON r.dst = t.dst AND r.rn = 1
        """,
    }
    d["wiki_warc_edges"] = d["wiki_html_edges"]
    return d
