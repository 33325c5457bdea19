"""Host-side mesh pipeline: SDF geometry, generators, smoothing.

All mesh generation runs at setup time in NumPy float64 (like the reference's
CPU-side Rust mesh layer); the solver consumes the encoded device arrays from
:mod:`cfd2_tpu.runtime.device_mesh`.
"""

from .geometry import (
    BackwardsStep,
    ChannelWithObstacle,
    CircleObstacle,
    Geometry,
    RectangularChannel,
)
from .structs import (
    BOUNDARY_INLET,
    BOUNDARY_NONE,
    BOUNDARY_OUTLET,
    BOUNDARY_WALL,
    Mesh,
)
from .cut_cell import generate_cut_cell_mesh
from .utils import retag_lid_cavity
from .delaunay import generate_delaunay_mesh, triangulate
from .voronoi import generate_voronoi_mesh

__all__ = [
    "Geometry", "ChannelWithObstacle", "BackwardsStep", "RectangularChannel",
    "CircleObstacle", "Mesh", "generate_cut_cell_mesh",
    "generate_delaunay_mesh", "generate_voronoi_mesh", "triangulate",
    "BOUNDARY_NONE", "BOUNDARY_INLET", "BOUNDARY_OUTLET", "BOUNDARY_WALL",
    "retag_lid_cavity",
]
