from .shims import apply_bounds_shim, apply_patch_shim
from .view_selection import get_nearest_pose_ids
