from .graph import (
    Graph,
    NodeBatch,
    MultiLevelGraph,
    build_graph,
    build_multilevel_graph,
    stack_graphs,
    flatten_stacked,
    repad_edges,
    round_up,
)
from .build import (
    radius_connectivity,
    forward_filter,
    gaussian_connectivity,
    torus1d_connectivity,
    torus2d_connectivity,
    edge_attributes,
)
from .mesh import (
    make_box_grid,
    SquareMeshGenerator,
    RandomMeshGenerator,
    RandomTwoMeshGenerator,
    RandomMultiMeshGenerator,
)
from .lattice import (
    simple_grid,
    grid_edge,
    grid_edge1d,
    grid_edge_aug,
    grid_edge_aug_full,
    downsample_field,
    multi_grid,
)
from .multipole import multi_pole_grid1d, get_edge_attr, multipole_levels_1d
from .splitters import (
    RandomGridSplitter,
    RandomMultiMeshSplitter,
    DownsampleGridSplitter,
    TorusGridSplitter,
)

__all__ = [
    "Graph", "MultiLevelGraph", "build_graph", "build_multilevel_graph",
    "stack_graphs", "flatten_stacked", "repad_edges", "round_up",
    "radius_connectivity", "forward_filter", "gaussian_connectivity",
    "torus1d_connectivity", "torus2d_connectivity", "edge_attributes",
    "make_box_grid", "SquareMeshGenerator", "RandomMeshGenerator",
    "RandomTwoMeshGenerator", "RandomMultiMeshGenerator",
    "simple_grid", "grid_edge", "grid_edge1d", "grid_edge_aug",
    "grid_edge_aug_full", "downsample_field", "multi_grid",
    "multi_pole_grid1d", "get_edge_attr", "multipole_levels_1d",
    "RandomGridSplitter", "RandomMultiMeshSplitter",
    "DownsampleGridSplitter", "TorusGridSplitter",
]
