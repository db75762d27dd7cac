from vxtpu.world.grid import VoxelGrid
from vxtpu.world.lights import Lights
from vxtpu.world.pyramid import OccupancyPyramid, build_pyramid

__all__ = ["VoxelGrid", "Lights", "OccupancyPyramid", "build_pyramid"]
