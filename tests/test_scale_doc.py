"""SCALE.md <-> code sync: every gate/knob the design table names must
exist as a real parameter (or symbol), so the table can't rot into
documentation fiction. Pure inspection — no Ray session needed."""

import inspect
import pathlib
import re

SCALE = (pathlib.Path(__file__).resolve().parent.parent / "SCALE.md") \
    .read_text()


def _params(fn) -> set[str]:
    return set(inspect.signature(fn).parameters)


def _assert_knob(fn, name: str):
    assert name in _params(fn), \
        f"{fn.__qualname__} lost its documented knob {name!r}"
    assert name in SCALE, f"SCALE.md no longer mentions {name!r}"


def test_build_gates():
    from wikilinks_ray.pipelines.build import build_graph

    _assert_knob(build_graph, "title_broadcast_limit")


def test_mst_gates():
    from wikilinks_ray.pipelines.mst import boruvka_msf

    _assert_knob(boruvka_msf, "label_broadcast_limit")
    _assert_knob(boruvka_msf, "max_rounds")


def test_covisit_gates():
    from wikilinks_ray.ops.covisit import covisitation_pairs

    _assert_knob(covisitation_pairs, "max_items_per_user")
    _assert_knob(covisitation_pairs, "min_users")


def test_superstep_checkpoint_knobs():
    from wikilinks_ray.pipelines.bfs import multi_source_bfs
    from wikilinks_ray.pipelines.components import connected_components
    from wikilinks_ray.pipelines.labelprop import label_propagation
    from wikilinks_ray.pipelines.pagerank import pagerank

    for fn in (pagerank, connected_components, label_propagation,
               multi_source_bfs):
        _assert_knob(fn, "checkpoint_every")


def test_route_knobs():
    from wikilinks_ray.pipelines.bidirectional import bidirectional_route
    from wikilinks_ray.state.csr import CSRShardActor, default_num_shards

    _assert_knob(bidirectional_route, "dual_expand_limit")
    _assert_knob(default_num_shards, "kind")
    # the fused per-level dispatch the route table describes
    assert hasattr(CSRShardActor, "bd_step") \
        or "bd_step" in dir(CSRShardActor)


def test_agg_knobs():
    from wikilinks_ray.stages.agg import grouped_agg, grouped_topk

    _assert_knob(grouped_agg, "salt")
    _assert_knob(grouped_agg, "num_buckets")
    assert "grouped_topk" in SCALE and callable(grouped_topk)


def test_dedup_gates():
    from wikilinks_ray.ops.dedup import (minhash_lsh_candidates,
                                         near_dup_clusters,
                                         ngram_jaccard_pairs,
                                         simhash_near_dup_pairs_ds)

    _assert_knob(ngram_jaccard_pairs, "max_docs_per_shingle")
    _assert_knob(minhash_lsh_candidates, "max_docs_per_bucket")
    _assert_knob(simhash_near_dup_pairs_ds, "max_bucket")
    _assert_knob(near_dup_clusters, "broadcast_limit")


def test_curate_gates():
    from wikilinks_ray.ops.curate import curate_documents

    _assert_knob(curate_documents, "max_docs_per_shingle")


def test_similarity_cluster_reduce():
    # the top-k driver merge must stay a cluster-side grouped reduce:
    # SCALE.md promises <= k*Q rows ever reach the driver
    import wikilinks_ray.ops.similarity as sim

    src = inspect.getsource(sim)
    assert "grouped_topk" in src, \
        "ops/similarity.py no longer reduces top-k in the cluster"
    # the size gate SCALE.md documents must exist and be driver-safe
    assert 0 < sim._DRIVER_MERGE_LIMIT <= 50_000_000
    _assert_knob(sim._finalize_topk, "driver_merge_limit")
    _assert_knob(sim.ivf_top_k, "n_cells")
    assert "unpack_embeddings" in SCALE and callable(sim.unpack_embeddings)


def test_pack_sample_knobs():
    from wikilinks_ray.ops.pack import pack_sequences
    from wikilinks_ray.ops.sample import hash_sample

    _assert_knob(pack_sequences, "capacity")
    _assert_knob(hash_sample, "permille")


def test_checkpoint_manifest_last():
    from wikilinks_ray.state import checkpoint as ck

    # manifest-last commit + uncommit-before-rewrite protocol symbols
    assert callable(ck._write_manifest) and callable(ck._uncommit)
    assert "MANIFEST" in SCALE and "_uncommit" in SCALE


def test_anf_delta_transport():
    import wikilinks_ray.pipelines.anf as anf

    src = inspect.getsource(anf)
    assert "delta" in src and "sketch_push" in src
    assert "register-DELTA" in SCALE or "register delta" in SCALE


def test_every_scale_gate_name_resolves():
    """Every `back-ticked` identifier in SCALE.md's gate columns that
    looks like a python name must import or be a knob we checked above
    — catch renames of things the table cites in prose."""
    cited = set(re.findall(r"`([a-z_][a-z0-9_]+)`", SCALE))
    # names that are parameters or local conventions, checked elsewhere
    known_params = {
        "title_broadcast_limit", "dual_expand_limit", "salt",
        "num_buckets", "max_docs_per_shingle", "max_docs_per_bucket",
        "max_bucket", "broadcast_limit", "driver_merge_limit",
        "checkpoint_every", "capacity", "degree_broadcast_limit",
        "broadcast_edge_limit", "max_rounds", "converged", "user_broadcast_limit",
        "label_broadcast_limit", "max_items_per_user", "min_users",
        "window_days", "top_k",
        "n_cells", "num_partitions", "batch_size", "kind", "analytics",
        "route", "permille", "idf_scale", "source_ids",
    }
    modules = {
        # Dataset/numpy API and column-name conventions, not our symbols
        "map_batches", "map_groups", "groupby", "ray", "n", "k",
        "batch_format", "pyarrow", "local", "to_pylist", "reduceat",
        "src", "dst", "__init__", "repartition", "read_binary_files",
        "searchsorted", "materialize",
    }
    for name in cited - known_params - modules:
        # importable as a wikilinks_ray attribute somewhere?
        import wikilinks_ray  # noqa: F401
        found = False
        for mod in ("pipelines.build", "pipelines.bidirectional",
                    "pipelines.pagerank", "pipelines.components",
                    "pipelines.bfs", "pipelines.sssp", "pipelines.anf",
                    "pipelines.stress", "pipelines.triangles",
                    "stages.agg", "stages.extract", "stages.ids",
                    "ops.dedup", "ops.similarity", "ops.text",
                    "ops.classify", "ops.curate", "ops.sample", "ops.bpe",
                    "ops.pack", "ops.windows", "ops.multimodal",
                    "state.csr", "state.checkpoint", "state.fsio",
                    "state.lookup", "sources.xml_dump", "sources.warc",
                    "ops.anchors", "ops.funnel", "ops.retention", "ops.index", "ops.html_links", "pipelines.truss", "pipelines.louvain",
                    "pipelines.assortativity", "pipelines.katz"):
            import importlib

            m = importlib.import_module(f"wikilinks_ray.{mod}")
            if hasattr(m, name) or name in mod:
                found = True
                break
        assert found, f"SCALE.md cites `{name}` but no module exports it"


def test_anchor_gates():
    from wikilinks_ray.ops.anchors import anchor_stats

    _assert_knob(anchor_stats, "title_broadcast_limit")


def test_assortativity_gates():
    from wikilinks_ray.pipelines.assortativity import assortativity_moments

    _assert_knob(assortativity_moments, "degree_broadcast_limit")


def test_truss_gates():
    from wikilinks_ray.pipelines.truss import edge_support, k_truss

    _assert_knob(k_truss, "broadcast_edge_limit")
    _assert_knob(k_truss, "max_rounds")
    _assert_knob(edge_support, "broadcast_edge_limit")


def test_retention_gates():
    from wikilinks_ray.ops.retention import retention_cohorts

    _assert_knob(retention_cohorts, "user_broadcast_limit")


def test_index_gates():
    from wikilinks_ray.ops.index import build_inverted_index

    _assert_knob(build_inverted_index, "num_buckets")


def test_html_links_gates():
    from wikilinks_ray.ops.html_links import html_link_edges

    _assert_knob(html_link_edges, "title_broadcast_limit")


def test_bm25_gates():
    from wikilinks_ray.ops.index import bm25_topk

    _assert_knob(bm25_topk, "idf_scale")
    _assert_knob(bm25_topk, "k")


def test_set_seeded_bfs_knob():
    from wikilinks_ray.pipelines.bfs import multi_source_bfs

    _assert_knob(multi_source_bfs, "source_ids")
