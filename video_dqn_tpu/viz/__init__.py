from .value_map import VisualizationGrid, build_value_maps, render_value_map, build_map_figures
from .panorama import join_images, panorama_strip
from .render_grid import render_grid

__all__ = [
    "VisualizationGrid",
    "build_value_maps",
    "render_value_map",
    "build_map_figures",
    "join_images",
    "panorama_strip",
    "render_grid",
]
