"""Computed tomography of chemiluminescence (CTC) utilities."""

from .grid import VoxelGrid
from .camera import camera
from .resample import resample_to_grid
from .raytrace import trace_rays
from .unstructured import UnstructuredMesh
from .projection import embed_projection, stack_cameras

__all__ = ["VoxelGrid", "UnstructuredMesh", "camera", "resample_to_grid",
           "trace_rays", "embed_projection", "stack_cameras"]
