"""Listwise sliding-window reranking.

Behavioral parity with /root/reference/llmrankers/listwise.py:178-196: for
each of ``num_repeat`` passes, a window of ``window_size`` docs walks from
the BOTTOM of the ranking upward by ``step_size``; each window is reranked
by one listwise comparison whose permutation string rewrites the window
slice. Sequential within a query (each window sees the previous window's
writes); throughput comes from batching windows across queries.
"""
from __future__ import annotations

import copy
from typing import Any, Awaitable, Callable, List

from .permutation import apply_permutation

# compare(window_docs) -> permutation string like "[2] > [1] > [3]"
ListCompare = Callable[[List[Any]], Awaitable[str]]


async def sliding_window(
    ranking: List[Any],
    window_size: int,
    step_size: int,
    num_repeat: int,
    compare: ListCompare,
) -> List[Any]:
    """Bottom-up sliding-window passes (listwise.py:183-192)."""
    for _ in range(num_repeat):
        ranking = copy.copy(ranking)
        end_pos = len(ranking)
        start_pos = end_pos - window_size
        while start_pos >= 0:
            start_pos = max(start_pos, 0)
            result = await compare(ranking[start_pos:end_pos])
            apply_permutation(ranking, result, start_pos, end_pos)
            end_pos -= step_size
            start_pos -= step_size
    return ranking
