from .accumulate import (
    accumulate_consistent_batches, accumulate_flow, accumulate_batches,
    fuse_occlusions, forward_backward_check,
)
from .hypothesis import HypothesisSet
from .mrf import solve_multilabel
