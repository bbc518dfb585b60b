from .interp import EpicParams, epic
from .distance import distance_transform, dist_trf_nnfield
