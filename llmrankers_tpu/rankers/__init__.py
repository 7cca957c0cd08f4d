from .listwise import ListwiseLlmRanker
from .pairwise import DuoT5LlmRanker, PairwiseLlmRanker
from .pointwise import MonoT5LlmRanker, PointwiseLlmRanker
from .rank_r1 import RankR1ListwiseLlmRanker, RankR1SetwiseLlmRanker
from .setwise import SetwiseLlmRanker

__all__ = [
    "DuoT5LlmRanker",
    "ListwiseLlmRanker",
    "MonoT5LlmRanker",
    "PairwiseLlmRanker",
    "PointwiseLlmRanker",
    "RankR1ListwiseLlmRanker",
    "RankR1SetwiseLlmRanker",
    "SetwiseLlmRanker",
]
