from .rotations import (axis_angle_to_rotmat, quat_to_rotmat,
                        rotmat_flat_minus_id)
from .smpl import SmplParams, make_smpl_fn, smpl_forward, substitute_mean_betas

__all__ = [
    "SmplParams", "axis_angle_to_rotmat", "make_smpl_fn", "quat_to_rotmat",
    "rotmat_flat_minus_id", "smpl_forward", "substitute_mean_betas",
]
