from .flo import read_flo, write_flo
from .edges import read_edges, write_edges
from .matches import read_matches, write_matches
from .images import read_image, write_image, read_pbm, write_pbm
