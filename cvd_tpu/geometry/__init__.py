from cvd_tpu.geometry.epipolar import (
    cross_product_matrix,
    essential_from_transform,
    fundamental_from_transform,
    relative_transform,
    fundamental_between_views,
    k_matrix_from_fov,
    find_fundamental_matrix,
)
from cvd_tpu.geometry.epipolar_mask import (
    epipolar_lines,
    pseudo_lines,
    homography_lines,
    epipolar_attn_bias,
    epipolar_attn_bias_from_lines,
    lines_and_band,
)
from cvd_tpu.geometry.plucker import ray_condition, plucker_embedding
from cvd_tpu.geometry.cameras import (
    Camera,
    parse_pose_file,
    parse_pose_lines,
    relative_poses,
    intrinsics_for_crop,
)
from cvd_tpu.geometry.trajectories import (
    interpolate_pose,
    interpolate_pose_batch,
    circle_trajectory,
    upper_hemi_trajectory,
    interpolate_trajectories,
)
from cvd_tpu.geometry.folding import fold_indices, fold_fundamental_mats
