"""Computed tomography of chemiluminescence (CTC) utilities."""

from .grid import VoxelGrid
from .camera import camera
from .resample import resample_to_grid
from .raytrace import trace_rays

__all__ = ["VoxelGrid", "camera", "resample_to_grid", "trace_rays"]
