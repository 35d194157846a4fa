"""Pool-size auto-selection (BASELINE.md P-sweep heuristic, pinned as
code in state/csr.py default_num_shards)."""

from __future__ import annotations

from wikilinks_ray.state.csr import default_num_shards


def test_analytics_half_cores():
    # supersteps: ~cores/2 (measured best at P=16 on 32 cores)
    assert default_num_shards(cores=32) == 16
    assert default_num_shards(cores=8) == 4
    assert default_num_shards(cores=1) == 1


def test_route_small_pool():
    # routes: latency grows with P — small fixed pool, replicate for qps
    assert default_num_shards(kind="route", cores=32) == 4
    assert default_num_shards(kind="route", cores=2) == 2


def test_tiny_graph_cap():
    # >=1000 owned vertices per shard: don't pay actor startup on
    # near-empty ranges
    assert default_num_shards(2000, cores=32) == 2
    assert default_num_shards(500, cores=32) == 1
    assert default_num_shards(4_000_000, cores=32) == 16


def test_reads_cluster_resources(ray_session):
    # with no explicit cores, the live session's CPU count drives it
    import ray

    cores = ray.cluster_resources()["CPU"]
    assert default_num_shards() == max(1, int(cores) // 2)


def test_derived_graph_uses_selector(ray_session):
    from wikilinks_ray.pipelines.derived import DerivedGraph

    with DerivedGraph("/root/testdata/sf0.001") as g:
        assert g.num_shards == default_num_shards(g.n, kind="analytics")
        assert len(g.actors) == g.num_shards
