"""Utility layer: camera/ray math, quaternions, Gaussian I/O, image/video export."""
from .quaternion import (
    matrix_to_quaternion,
    quaternion_multiply,
    quaternion_normalize,
    quaternion_slerp,
    quaternion_to_matrix,
)
from .cameras import (
    CAMERA_DIM,
    camera_c2w,
    camera_fov,
    camera_intrinsics,
    check_valid_rotations,
    get_random_cameras,
    look_at,
    make_camera,
    matrix_to_square,
    normalize_poses,
    opencv_to_opengl,
    opengl_to_opencv,
    llff_to_opengl,
    sample_from_dense_cameras,
    sample_from_two_poses,
)
from .rays import (
    embed_rays,
    raymap,
    sample_patch_indices,
    sample_rays,
    sample_rays_at,
)
from .gs_io import export_gaussians, export_ply, export_splat, load_ply

__all__ = [k for k in dir() if not k.startswith("_")]
