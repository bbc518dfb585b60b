from .conv import (
    DERIV_5PT, DERIV_3PT, conv_horiz, conv_vert, conv_sep, gaussian_kernel,
    gaussian_blur,
)
from .warp import warp_bilinear, warp_image
from .image import (
    rgb_to_lab, luminance, saliency, resize_bilinear, rescale_flow, pyramid_sizes,
)
from .penalty import PENALTIES, make_penalty
from .solver import sor_coupled_rb, sor_coupled_reference
