from .volume import render_rays, render_image, sample_along_camera_ray, sample_pdf, raw2outputs
from .projector import project_and_gather
from .rays import get_rays_single_image, parse_camera
