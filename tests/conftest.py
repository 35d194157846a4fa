"""Shared fixtures: one Ray session per pytest session (as required)."""

from __future__ import annotations

import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(ray_session, tmp_path_factory):
    """300-page corpus + its golden spec + built graph, shared by tests."""
    import ray.data as rd

    from wikilinks_ray.sources.corpus import generate_pages_table
    from wikilinks_ray.pipelines.build import build_graph

    table, spec = generate_pages_table(300, seed=42)
    work = str(tmp_path_factory.mktemp("graph_small"))
    res = build_graph(
        rd.from_arrow(table), work, num_partitions=4, extract_concurrency=2
    )
    return table, spec, res
