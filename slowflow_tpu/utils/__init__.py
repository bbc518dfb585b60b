from .colorwheel import flow_color_img
from .metrics import compute_epe, compute_aae, compute_rms
from .demosaic import bayer2rgb, bayer2rgb_green_ratio, raw_weighting
