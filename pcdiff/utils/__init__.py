"""Host-side utilities: plotting, point-cloud -> mesh extraction."""

from .plotting import plot_point_cloud

__all__ = ["plot_point_cloud"]
