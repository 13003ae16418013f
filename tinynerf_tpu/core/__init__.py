from .contraction import ContractionAABB, ContractionMip360
from .marching import RayMarcherAABB, RayMarcherUnbounded
from .occupancy import OccupancyGrid, OccupancyState
from .renderer import NerfRenderer, RenderOutput

__all__ = [
    "ContractionAABB",
    "ContractionMip360",
    "RayMarcherAABB",
    "RayMarcherUnbounded",
    "OccupancyGrid",
    "OccupancyState",
    "NerfRenderer",
    "RenderOutput",
]
