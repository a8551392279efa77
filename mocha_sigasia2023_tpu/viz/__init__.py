"""Visualization: matplotlib 3D stick-figure animation."""

from .plot import animation_plot
