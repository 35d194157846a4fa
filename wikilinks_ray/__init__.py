"""wikilinks_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch (NOT a port) with the query/data-processing
capabilities of the reference engine jmiettinen/wikilinks (Kotlin/Java,
see /root/reference and SURVEY.md), re-expressed Ray-Data-first:

- ingest Common-Crawl-style Parquet pages
  ``(url, warc_ts, html, text, lang)``,
- extract per-url link edges with ``map_batches`` over zero-copy Arrow
  (reference semantics: WikiProcessor.kt:43-71,114-121),
- materialize a partitioned ``edges(src:int64, dst:int64)`` table with
  CSR adjacency shards held in stateful actor pools
  (reference analog: WikiRoutes.kt:201-226, SegmentWikiGraphStore.kt),
- run iterative PageRank / connected components / label propagation /
  triangle counting / multi-source BFS shortest paths as superstep
  shuffles with per-iteration checkpoints.

Layout:
    sources/    corpus generator + parquet readers
    stages/     stateless map_batches transforms (extract, ids, joins)
    state/      stateful actor pools (CSR shards, checkpoints)
    pipelines/  end-to-end graph pipelines + iterative algorithms
    ops/        training-data ops (dedup, similarity, text, multimodal)
    functions/  scalar/vectorized kernels shared across stages

No function in this package calls ``ray.init()``/``ray.shutdown()``;
sessions are owned by the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"

PAGES_SCHEMA_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
