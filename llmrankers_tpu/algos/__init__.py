from . import pairwise_sort, permutation, setwise_sort, listwise_window
from .scheduler import WaveRunner, run_sync

__all__ = [
    "WaveRunner",
    "run_sync",
    "pairwise_sort",
    "permutation",
    "setwise_sort",
    "listwise_window",
]
