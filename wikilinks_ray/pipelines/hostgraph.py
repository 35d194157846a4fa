"""Host-level graph contraction — the Common-Crawl-style rollup of a
page-level link graph to its host (domain) graph.

The reference works at page granularity only (WikiPage title space);
the host graph is the standard web-scale companion product: contract
every vertex through a host mapping and keep edge multiplicities as
weights. Both pieces are shuffle-minimal:

- :func:`parse_url_batch` is a per-batch vectorized URL decomposition
  (scheme/host/path/path_depth) with a FROZEN RE2-compatible regex, so
  a DuckDB ``regexp_extract`` re-derivation is byte-identical.
- :func:`contract_edges` maps both endpoints through a vectorized
  key function inside ``map_batches`` (no join — the mapping is
  computed, not looked up) and pre-aggregates weights per batch before
  one small groupby on (src_h, dst_h). At 100 TB the contracted
  keyspace is hosts² (~1e8 for 1e4 hosts), orders below the edge
  count, so the shuffle moves combiner partials, not edges. A mapping
  that must be LOOKED UP (vertex -> host table) swaps the map stage
  for a broadcast array (``ray.put`` once, index per batch) under the
  same size gate the title join uses (pipelines/build.py), or a hash
  join above it.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# frozen, RE2-compatible (no lookaround): scheme://authority path
# DuckDB twin: regexp_extract(url, '^([a-z][a-z0-9+.-]*)://([^/?#]+)([^?#]*)', n)
URL_RE = re.compile(r"^([a-z][a-z0-9+.\-]*)://([^/?#]+)([^?#]*)")


def parse_url_batch(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Append (scheme, host, path, path_depth) columns parsed from
    ``url_col``. Non-matching urls parse to empty strings / depth 0.
    ``path_depth`` = number of '/' characters in the path part."""
    urls = pd.Series(t.column(url_col).to_pylist(), dtype="object")
    parts = urls.str.extract(URL_RE, expand=True).fillna("")
    depth = parts[2].str.count("/").astype("int64")
    return (t.append_column("scheme", pa.array(parts[0], pa.string()))
             .append_column("host", pa.array(parts[1], pa.string()))
             .append_column("path", pa.array(parts[2], pa.string()))
             .append_column("path_depth", pa.array(depth, pa.int64())))


def contract_edges(edges: "ray.data.Dataset", group_of, *,
                   drop_self_loops: bool = False,
                   src_col: str = "src", dst_col: str = "dst",
                   out_src: str = "src_h", out_dst: str = "dst_h"
                   ) -> "ray.data.Dataset":
    """Contract ``edges`` through ``group_of`` (vectorized
    ``int64 array -> int64 array`` mapping, e.g. vertex -> host id) and
    return the weighted group-level edge table
    ``(out_src, out_dst, weight)``.

    Self-loops after contraction are intra-group (intra-host) links;
    kept by default since host-graph consumers usually want them
    separable rather than silently dropped.
    """
    from ..stages.agg import grouped_agg

    def m(t: pa.Table) -> pa.Table:
        s = group_of(t.column(src_col).to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        d = group_of(t.column(dst_col).to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        if drop_self_loops:
            keep = s != d
            s, d = s[keep], d[keep]
        return pa.table({out_src: pa.array(s, pa.int64()),
                         out_dst: pa.array(d, pa.int64())})

    return grouped_agg(edges.map_batches(m, batch_format="pyarrow"),
                       [out_src, out_dst], None, "count", out_col="weight")
