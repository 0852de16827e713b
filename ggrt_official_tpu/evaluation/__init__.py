from .metrics import psnr, ssim, evaluate_pose_errors
