from . import projection, epipolar, se3, depth, alignment, camera
