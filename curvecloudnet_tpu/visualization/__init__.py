"""Visualization layer (SURVEY.md §2.9): matplotlib-first, plotly-gated."""

from .plots import (
    plot_confusion,
    plot_curve_cloud,
    plot_segmentation,
    render_bev,
)

__all__ = [
    "plot_confusion",
    "plot_curve_cloud",
    "plot_segmentation",
    "render_bev",
]
