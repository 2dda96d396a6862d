from .integrate import integrate
from .raycast import raycast, render_to_depth_image
from .trilinear import trilinear_sample
from .shading import scene_image, normals_image, compute_normals

__all__ = [
    "integrate",
    "raycast",
    "render_to_depth_image",
    "trilinear_sample",
    "scene_image",
    "normals_image",
    "compute_normals",
]
