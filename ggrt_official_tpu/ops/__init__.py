from . import sh, grid_sample, ssim
from .rasterizer import api as rasterizer_api
