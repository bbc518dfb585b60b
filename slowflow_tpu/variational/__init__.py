from .twoframe import TwoFrameParams, variational_twoframe
from .multiframe import MultiFrameParams, variational_mt
