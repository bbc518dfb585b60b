from .params import ParameterList, Verbosity
