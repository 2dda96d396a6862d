from .png import load_png, save_png
from .depth_image import DepthImage
from .tum import TUMDataLoader
from .tsdf_file import save_tsdf, load_tsdf
from .ply import write_ply

__all__ = [
    "load_png",
    "save_png",
    "DepthImage",
    "TUMDataLoader",
    "save_tsdf",
    "load_tsdf",
    "write_ply",
]
