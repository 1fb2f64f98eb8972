from .edgefile import load_edge_csv, save_edge_csv, make_regular_ldpc
from .scalar import dist_cut, count_errors_from_lappr

__all__ = [
    "load_edge_csv",
    "save_edge_csv",
    "make_regular_ldpc",
    "dist_cut",
    "count_errors_from_lappr",
]
