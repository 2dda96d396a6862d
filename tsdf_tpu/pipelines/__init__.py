"""End-to-end fusion pipelines (the reference's "model layer").

  * kinfu: rigid KinectFusion — fuse TUM frames with ground-truth poses
    (ref: src/Tools/kinfu.cpp) or with projective-ICP tracking against
    the raycast model (the full loop the reference ships pieces of but
    never wires together; BASELINE config 3).
  * scenefusion: non-rigid fusion with a per-voxel deformation field
    driven by scene flow (ref: src/SceneFusion/).
"""

from .kinfu import FusionConfig, fuse_frames, track_and_fuse_frames

__all__ = ["FusionConfig", "fuse_frames", "track_and_fuse_frames"]
