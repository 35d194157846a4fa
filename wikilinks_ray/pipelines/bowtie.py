"""Bow-tie decomposition of a directed web graph (Broder et al.,
"Graph structure in the Web", WWW 2000): classify every vertex by its
relation to the largest strongly connected component.

    CORE          the largest SCC (ties: min canonical label)
    IN            reaches CORE, not in it
    OUT           reachable from CORE, not in it
    TENDRIL       weakly connected to CORE but in none of the above
                  (Broder's tendrils AND tubes, collapsed — both are
                  "attached but not through the core")
    DISCONNECTED  everything else

Composition of oracle-green primitives, each a frontier-superstep
pipeline over the CSR shard pools: SCC (forward max-label fixpoint +
color-constrained backward BFS), then three multi-source BFS runs
seeded with the whole core — forward pool for OUT, reverse pool for
IN, symmetric pool for weak connectivity. IN and OUT are disjoint by
construction: a vertex that both reaches and is reached by the core
would be in the core's SCC.

Exchange per superstep is the BFS family's frontier triples (SCALE.md);
the only driver-resident artifacts are the SCC label array the SCC
pipeline already returns and the three dist arrays (8 B/vertex each, the
same footprint every per-vertex gated query carries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

REGIONS = ("CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED")


def largest_scc_label(labels: np.ndarray, vertices: np.ndarray) -> int:
    """Canonical label of the largest SCC over ``vertices`` (ties: min
    label)."""
    ls = labels[vertices]
    uniq, counts = np.unique(ls, return_counts=True)
    best = counts.max()
    return int(uniq[counts == best].min())


def bowtie_regions(fwd_actors, rev_actors, sym_actors, n: int,
                   labels: np.ndarray, vertices: np.ndarray,
                   ) -> pd.DataFrame:
    """Per-vertex bow-tie region, ``(vertex, region)`` sorted by
    vertex. ``labels`` are canonical (min-member) SCC labels;
    ``vertices`` the graph's real vertex ids (dense id space may have
    holes)."""
    from .bfs import multi_source_bfs

    core_label = largest_scc_label(labels, vertices)
    in_core = np.zeros(n, dtype=bool)
    in_core[vertices] = labels[vertices] == core_label
    core = [int(v) for v in np.flatnonzero(in_core)]

    sids = [0] * len(core)  # one shared dist column: set-seeded BFS
    fwd = multi_source_bfs(fwd_actors, n, core,
                           source_ids=sids).distances()[:, 0] >= 0
    rev = multi_source_bfs(rev_actors, n, core,
                           source_ids=sids).distances()[:, 0] >= 0
    weak = multi_source_bfs(sym_actors, n, core,
                            source_ids=sids).distances()[:, 0] >= 0

    region = np.full(n, 4, dtype=np.int8)  # DISCONNECTED
    region[weak] = 3                       # TENDRIL
    region[rev] = 1                        # IN  (reaches core)
    region[fwd] = 2                        # OUT (reached from core)
    region[in_core] = 0                    # CORE wins
    names = np.asarray(REGIONS, dtype=object)
    vs = np.sort(vertices.astype(np.int64))
    return pd.DataFrame({"vertex": vs, "region": names[region[vs]]})
