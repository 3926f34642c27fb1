from .mano import (ManoModel, ManoParams, load_mano_pkl, mano_forward,
                   synthetic_mano)
from .rotations import (axis_angle_to_rotmat, quat_to_rotmat,
                        rotmat_flat_minus_id, rotmat_to_axis_angle)
from .rotations6d import (project_to_rotation, rot6d_to_rotmat,
                          rotmat_to_rot6d)
from .smpl import SmplParams, make_smpl_fn, smpl_forward, substitute_mean_betas

__all__ = [
    "ManoModel", "ManoParams", "SmplParams", "axis_angle_to_rotmat",
    "load_mano_pkl", "make_smpl_fn", "mano_forward", "project_to_rotation",
    "quat_to_rotmat", "rot6d_to_rotmat", "rotmat_flat_minus_id",
    "rotmat_to_axis_angle", "rotmat_to_rot6d", "smpl_forward",
    "substitute_mean_betas", "synthetic_mano",
]
