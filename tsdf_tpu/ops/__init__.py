from .integrate import integrate
from .raycast import raycast, render_to_depth_image
from .trilinear import trilinear_sample
from .shading import scene_image, normals_image, compute_normals
from .marching_cubes import extract_surface, soup_to_numpy, TriangleSoup
from .deform import deform_points

__all__ = [
    "integrate",
    "raycast",
    "render_to_depth_image",
    "trilinear_sample",
    "scene_image",
    "normals_image",
    "compute_normals",
    "extract_surface",
    "soup_to_numpy",
    "TriangleSoup",
    "deform_points",
]
