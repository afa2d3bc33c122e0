"""Host-side utilities: plotting, IO, point-cloud -> mesh extraction."""

from .io import save_samples, save_target_point_clouds
from .marching import marching_tetrahedra
from .pc_to_mesh import marching_cubes_mesh
from .plotting import plot_point_cloud

__all__ = [
    "plot_point_cloud",
    "save_samples",
    "save_target_point_clouds",
    "marching_tetrahedra",
    "marching_cubes_mesh",
]
