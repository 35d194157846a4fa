"""Vertex title index: point, prefix, and random lookups.

Reference analogs: the segment store's sorted ``nameIndex`` binary
search (J2: SegmentWikiGraphStore.kt:26-44), prefix lookup with bounded
scan (J4/O3: SegmentWikiGraphStore.kt:54-79, max-K at WikiRoutes.kt:74-87),
random page (O4: WikiRoutes.kt:47-56), and the id→rank index (J3 —
trivial here because our ids ARE the sorted-title ranks, stages/ids.py).

Because ``id = global rank of title``, range-partitioning by id is
simultaneously range-partitioning by title: each ``VertexIndexShard``
actor owns a contiguous title range, the driver routes a lookup with one
binary search over the P shard-boundary titles, and a prefix scan walks
at most the shards overlapping the prefix interval. State (the sorted
title slice) loads once per actor.
"""

from __future__ import annotations

import bisect

import numpy as np

import ray
import ray.data


@ray.remote
class VertexIndexShard:
    """Holds one contiguous slice of the title-sorted vertex table,
    loaded by the actor itself from parquet with an id-range row filter
    (nothing streams through the driver)."""

    def __init__(self, vertices_path: str, lo: int, hi: int):
        import pyarrow.dataset as pads

        dset = pads.dataset(vertices_path, format="parquet")
        t = dset.to_table(columns=["id", "title", "url", "is_redirect"],
                          filter=(pads.field("id") >= lo) & (pads.field("id") < hi))
        order = np.argsort(t.column("id").to_numpy(zero_copy_only=False))
        ids = t.column("id").to_numpy(zero_copy_only=False)
        titles = t.column("title").to_pylist()
        urls = t.column("url").to_pylist()
        isrd = t.column("is_redirect").to_pylist()
        self.ids = ids[order].tolist()
        self.titles = [titles[i] for i in order]
        self.urls = [urls[i] for i in order]
        self.is_redirect = [isrd[i] for i in order]

    def first_title(self) -> str | None:
        return self.titles[0] if self.titles else None

    def lookup(self, title: str) -> int | None:
        i = bisect.bisect_left(self.titles, title)
        if i < len(self.titles) and self.titles[i] == title:
            return self.ids[i]
        return None

    def prefix(self, prefix: str, k: int) -> list[tuple[int, str]]:
        i = bisect.bisect_left(self.titles, prefix)
        out = []
        while i < len(self.titles) and len(out) < k and self.titles[i].startswith(prefix):
            out.append((self.ids[i], self.titles[i]))
            i += 1
        return out

    def title_of(self, vid: int) -> str | None:
        i = bisect.bisect_left(self.ids, vid)
        if i < len(self.ids) and self.ids[i] == vid:
            return self.titles[i]
        return None


class VertexIndex:
    """Driver-side router over P VertexIndexShard actors."""

    def __init__(self, vertices_path: str, n_vertices: int, num_shards: int = 4):
        self.n = n_vertices
        per = -(-self.n // num_shards) if self.n else 1
        self.actors = []
        for p in range(num_shards):
            lo, hi = p * per, min((p + 1) * per, self.n)
            if lo >= hi:
                break
            self.actors.append(VertexIndexShard.remote(vertices_path, lo, hi))
        # boundary titles = first title of each shard (ids are title ranks)
        self.boundaries = [t for t in ray.get(
            [a.first_title.remote() for a in self.actors]) if t is not None]

    def _route(self, title: str) -> int:
        return max(0, bisect.bisect_right(self.boundaries, title) - 1)

    def lookup(self, title: str) -> int | None:
        """Exact title -> id (J2)."""
        if not self.actors:
            return None
        return ray.get(self.actors[self._route(title)].lookup.remote(title))

    def prefix_search(self, prefix: str, k: int = 10) -> list[tuple[int, str]]:
        """Titles starting with ``prefix``, at most ``k``, in title order
        (J4 + O3 bounded scan). Walks only shards overlapping the range."""
        out: list[tuple[int, str]] = []
        p = self._route(prefix)
        while p < len(self.actors) and len(out) < k:
            # a shard whose first title already sorts past the prefix
            # interval can't match, nor can any later shard
            if p < len(self.boundaries) and self.boundaries[p][:len(prefix)] > prefix:
                break
            out.extend(ray.get(self.actors[p].prefix.remote(prefix, k - len(out))))
            p += 1
        return out[:k]

    def title_of(self, vid: int) -> str | None:
        """id -> title (J3/J5: ids are dense ranks, so the owning shard
        is direct)."""
        if not self.actors or not (0 <= vid < self.n):
            return None
        per = -(-self.n // len(self.actors))
        return ray.get(self.actors[min(vid // per, len(self.actors) - 1)]
                       .title_of.remote(vid))

    def random_vertex(self, rng: np.random.Generator) -> tuple[int, str]:
        """Uniform random page (O4; seeded RNG like Benchmarking.java:16)."""
        vid = int(rng.integers(self.n))
        return vid, self.title_of(vid)

    def close(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
