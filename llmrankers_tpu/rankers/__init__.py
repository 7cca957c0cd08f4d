from .listwise import ListwiseLlmRanker
from .pairwise import DuoT5LlmRanker, PairwiseLlmRanker
from .pointwise import MonoT5LlmRanker, PointwiseLlmRanker
from .setwise import SetwiseLlmRanker

__all__ = [
    "DuoT5LlmRanker",
    "ListwiseLlmRanker",
    "MonoT5LlmRanker",
    "PairwiseLlmRanker",
    "PointwiseLlmRanker",
    "SetwiseLlmRanker",
]
