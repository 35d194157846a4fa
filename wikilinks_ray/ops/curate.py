"""End-to-end corpus curation: the composition of the training-data
operators into one pipeline a 100 TB pretraining-data job would run.

    documents ──┬─ quality gate (TextAnalyzer: token count + quality score)
                ├─ exact dedup (content-hash, min-id winner)
                └─ near-dup drop (MinHash-LSH band candidates by default,
                   exact n-gram Jaccard opt-in: the larger id of every
                   candidate pair loses — frozen, per-pair rule,
                   deliberately NOT transitive closure so the result is
                   order-independent and SQL-reproducible)
    kept = quality ∩ exact-winners − near-dup-losers

All three legs are Datasets of (doc_id) combined with int-keyed
semi/anti joins — no driver materialization of anything
document-sized. The final set streams to partitioned parquet when
``out_dir`` is given (one file per hash bucket — a rerun can skip
finished buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def curate_documents(
    docs: "ray.data.Dataset",
    *,
    min_tokens: int = 50,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    num_partitions: int = 8,
    concurrency: int = 4,
    max_docs_per_shingle: int = 10_000,
    near_dup_method: str = "minhash",
    out_dir: str | None = None,
) -> "ray.data.Dataset":
    """Returns the kept (doc_id) Dataset; optionally writes the kept
    documents (full rows) as partitioned parquet.

    ``max_docs_per_shingle`` is the near-dup leg's stop-shingle cap —
    THE scale knob for the exact-Jaccard pass: a shingle shared by D
    documents generates O(D^2) candidate pairs, so templated corpora
    (boilerplate phrases shared by ~10^3 docs) blow up pair generation
    long before any pair survives a high threshold (measured: the
    default 10k cap let a 4M-doc soak corpus pin one reducer at 20 GB
    via ~1k-doc posting lists; see tools/soak.py). Lower the cap toward
    ~2/(1-threshold) when boilerplate is expected, or switch
    ``near_dup_method="minhash"``.

    ``near_dup_method``: ``"minhash"`` (MinHash-LSH banding candidates —
    the DEFAULT and the web-scale path, oracle-checked end-to-end via
    the mod-2^64 SQL twin) or ``"jaccard"`` (exact pairwise Jaccard at
    ``jaccard_threshold`` — opt-in for corpora where the exact-threshold
    contract matters more than scale: exact jaccard must count one
    candidate pair per shared shingle, which is O(sum posting²) even far
    below threshold — measured ~7×10^8 pairs / >60 GB of shuffle spill
    on a 4M-doc corpus whose documents collide on single shared link
    targets, while LSH only pairs documents agreeing on a whole
    signature band and finished the same soak in 111.5 s)."""
    from ..stages.agg import grouped_agg
    from .dedup import exact_dedup_keep_min, ngram_jaccard_pairs
    from .text import TextAnalyzer

    ids_only = docs.select_columns(["doc_id", "text"])

    # leg 1: quality gate
    def quality_ids(t: pa.Table) -> pa.Table:
        out = TextAnalyzer()(t)
        keep = pc.and_(
            pc.greater_equal(out["token_count"], pa.scalar(min_tokens)),
            pc.greater_equal(out["quality_score"], pa.scalar(float(min_quality))))
        return pa.table({"doc_id": out.column("doc_id").filter(keep)})

    good = ids_only.map_batches(quality_ids, batch_format="pyarrow").materialize()
    n_good = good.count()
    if n_good == 0:
        return good  # nothing passed the gate; joining empty sides crashes

    # leg 2: exact-dup winners
    winners = exact_dedup_keep_min(ids_only)

    # leg 3: near-dup losers (larger id of each pair)
    if near_dup_method == "minhash":
        from .dedup import minhash_lsh_candidates

        losers = (minhash_lsh_candidates(ids_only, concurrency=concurrency)
                  .select_columns(["b"]).materialize())
    else:
        losers = (ngram_jaccard_pairs(ids_only, threshold=jaccard_threshold,
                                      num_partitions=num_partitions,
                                      concurrency=concurrency,
                                      max_docs_per_shingle=max_docs_per_shingle)
                  .select_columns(["b"]).materialize())

    # partition counts shrink with the smaller side everywhere — Ray's
    # hash join emits schema-less blocks for empty partitions and
    # pyarrow then fails on them
    p_good = max(1, min(num_partitions, n_good // 50 + 1))
    kept = good.join(winners, "left_semi", p_good, on=("doc_id",))
    n_losers = losers.count()
    if n_losers:
        # losers is tiny by construction (near-dup pairs) — partition
        # count must shrink with it (empty hash partitions crash pyarrow)
        p = max(1, min(num_partitions, n_losers // 50 + 1))
        kept = kept.join(losers.rename_columns({"b": "doc_id"}), "left_anti",
                         p, on=("doc_id",))

    if out_dir is not None:
        kept = kept.materialize()
        if kept.count() == 0:
            # every quality survivor lost to dedup: nothing to persist,
            # and semi-joining against a fully empty right side hits the
            # same empty-partition pyarrow crash guarded above
            return kept
        # full kept rows via an int-keyed semi-join (no driver collect —
        # the kept set can be corpus-sized), bucketed for resumability
        p_kept = max(1, min(num_partitions, kept.count() // 50 + 1))
        full = docs.join(kept, "left_semi", p_kept, on=("doc_id",))

        def mark(t: pa.Table) -> pa.Table:
            h = (t.column("doc_id").to_numpy(zero_copy_only=False)
                 .astype(np.uint64) % np.uint64(16)).astype(np.int64)
            return t.append_column("bucket", pa.array(h))

        full.map_batches(mark, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["bucket"])
    return kept
