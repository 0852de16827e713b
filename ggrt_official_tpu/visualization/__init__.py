"""Visualization suite (jnp SDF drawing, layout, colormaps, cameras).

Parity target: /root/reference/ggrt/visualization/ (drawing/, layout.py,
annotation.py, color_map.py, feature_visualizer.py, validation_in_3d.py,
camera_trajectory/ — trajectories live in utils/trajectories.py).
"""
from .annotation import add_label, draw_text
from .cameras import draw_cameras, render_projections, unproject_frustum_corners
from .color_map import apply_color_map, apply_color_map_to_image
from .drawing import draw_lines, draw_points
from .feature_visualizer import visualize_attention, visualize_features
from .layout import add_border, hcat, resize, vcat

__all__ = [
    "add_border", "add_label", "apply_color_map", "apply_color_map_to_image",
    "draw_cameras", "draw_lines", "draw_points", "draw_text", "hcat",
    "render_projections", "resize", "unproject_frustum_corners", "vcat",
    "visualize_attention", "visualize_features",
]
