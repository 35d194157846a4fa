from .build import build_graph, GraphBuildResult, GraphStats  # noqa: F401
