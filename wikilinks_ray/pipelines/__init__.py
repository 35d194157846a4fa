from .build import build_graph, GraphBuildResult, GraphStats  # noqa: F401
from .pagerank import pagerank, PageRankResult  # noqa: F401
from .components import (  # noqa: F401
    connected_components,
    symmetrize_edges,
    ComponentsResult,
)
from .labelprop import label_propagation, LabelPropResult  # noqa: F401
from .bfs import multi_source_bfs, shortest_route, BFSResult  # noqa: F401
from .bidirectional import bidirectional_route  # noqa: F401
from .triangles import triangle_count  # noqa: F401
from .flagship import oracle_build  # noqa: F401
