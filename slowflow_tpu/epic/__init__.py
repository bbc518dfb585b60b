from .interp import EpicParams, epic, epic_batched
from .distance import (distance_transform, dist_trf_nnfield,
                       dist_trf_nnfield_batched)
