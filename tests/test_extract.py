"""Extraction-stage tests: golden byte-identical extracted text per url,
and the parallel-vs-serial differential matrix (the reference's core test
strategy, WikiReaderTest.kt:238-285)."""

from __future__ import annotations

import pyarrow as pa

from wikilinks_ray.functions.wikitext import (
    capitalize_first,
    extracted_text_bytes,
)
from wikilinks_ray.sources.corpus import generate_pages_table, page_url
from wikilinks_ray.stages.extract import extract_pages_meta, LinkExtractor


def expected_extraction(spec, title):
    """Golden (is_redirect, target, links) computed from the corpus spec."""
    if title in spec.redirects:
        tgt = capitalize_first(spec.redirects[title])
        return True, tgt, [tgt]
    seen, links = set(), []
    for raw in spec.expected_links.get(title, []):
        t = capitalize_first(raw)
        if t not in seen:
            seen.add(t)
            links.append(t)
    return False, None, links


def test_extracted_text_bytes_golden_per_url(ray_session, small_corpus):
    table, spec, _res = small_corpus
    import ray.data as rd

    meta = rd.from_arrow(table).map_batches(
        extract_pages_meta, batch_format="pyarrow"
    ).take_all()
    got = {r["url"]: r["extracted_text"] for r in meta}
    assert len(got) == len(spec.titles)
    for title in spec.titles:
        is_r, tgt, links = expected_extraction(spec, title)
        assert got[page_url(title)] == extracted_text_bytes(is_r, tgt, links), title


def canonical_map(ray, table, num_blocks):
    """url -> (is_redirect, sorted dst titles), computed at a given
    parallelism (differential-test canonical form, WikiReaderTest.kt:230-286)."""
    import ray.data as rd

    ds = rd.from_arrow(table)
    if num_blocks > 1:
        ds = ds.repartition(num_blocks)
    links = ds.map_batches(
        LinkExtractor, batch_format="pyarrow", batch_size=64, concurrency=2
    ).take_all()
    out: dict[str, tuple[bool, tuple[str, ...]]] = {}
    agg: dict[str, list] = {}
    for r in links:
        agg.setdefault(r["src_title"], []).append((r["src_is_redirect"], r["dst_title"]))
    for k, v in agg.items():
        out[k] = (v[0][0], tuple(sorted(d for _, d in v)))
    return out


def test_differential_parallel_vs_serial(ray_session, small_corpus):
    table, _spec, _res = small_corpus
    base = canonical_map(ray_session, table, 1)
    for blocks in (8, 32):
        assert canonical_map(ray_session, table, blocks) == base


def test_generator_is_deterministic():
    t1, s1 = generate_pages_table(128, seed=7)
    t2, s2 = generate_pages_table(128, seed=7)
    assert t1.equals(t2)
    assert s1.expected_links == s2.expected_links
    assert s1.redirects == s2.redirects
    t3, _ = generate_pages_table(128, seed=8)
    assert not t1.equals(t3)


def test_generator_golden_hash_pins_corpus_version():
    """Pin the generator's OUTPUT to CORPUS_VERSION.

    bench.py keys its /tmp corpus cache by CORPUS_VERSION because /tmp
    persists across driver rounds: round 2's ghost-redirect retarget
    (commit 9840455) changed the generated corpus while BENCH_r02 kept
    reading a stale round-1 cache, producing the r2/r3 one-edge bench
    diff (247,603 vs 247,602 edges at 400k pages). If this hash changes,
    the generator's output changed: bump CORPUS_VERSION in
    wikilinks_ray/sources/corpus.py and update BOTH pins here.
    """
    import hashlib

    from wikilinks_ray.sources.corpus import CORPUS_VERSION

    assert CORPUS_VERSION == 2
    t, _spec = generate_pages_table(2000, seed=42)
    h = hashlib.md5()
    cols = [t.column(n).to_pylist() for n in t.schema.names]
    for row in zip(*cols):
        for v in row:
            h.update(repr(v).encode())
        h.update(b"\x00")
    assert h.hexdigest() == "ffdb5ba766d4e46df529fe39c83da002", (
        "generate_pages_table output changed — bump CORPUS_VERSION and "
        "re-pin this hash"
    )


def test_meta_schema_stable(ray_session, small_corpus):
    table, _spec, _res = small_corpus
    batch = extract_pages_meta(table.slice(0, 10))
    assert batch.schema.names == [
        "url", "title", "is_redirect", "redirect_target", "n_links", "extracted_text",
    ]
    assert batch.schema.field("extracted_text").type == pa.binary()
