"""Listwise reranking algorithms: sliding window + top-down partitioning.

``sliding_window`` is behavioral parity with
/root/reference/llmrankers/listwise.py:178-196: for each of ``num_repeat``
passes, a window of ``window_size`` docs walks from the BOTTOM of the
ranking upward by ``step_size``; each window is reranked by one listwise
comparison whose permutation string rewrites the window slice. Sequential
within a query (each window sees the previous window's writes);
throughput comes from batching windows across queries.

``topdown`` is a beyond-reference extension (arXiv:2405.14589, Top-Down
Partitioning): instead of a sequential bottom-up walk, a pivot from the
ranked head window partitions the rest in PARALLEL windows — all windows
of one level form a single device wave — then the promoted pool recurses.
Sequential depth drops from O(n/step) to O(log) while each level is a
full batch, which is exactly the wave-batching sweet spot.
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


async def _ranked(compare: ListCompare, window: List[Any]) -> List[Any]:
    """One listwise comparison, returned as a reordered copy."""
    out = list(window)
    result = await compare(out)
    apply_permutation(out, result, 0, len(out))
    return out


async def topdown(
    runner,
    ranking: List[Any],
    k: int,
    window_size: int,
    compare: ListCompare,
) -> List[Any]:
    """Top-down partitioning (arXiv:2405.14589).

    1. Rank the head window; the item at rank ``k`` becomes the pivot
       (when k >= window_size the window's last item is used).
    2. Every remaining doc is judged against the pivot in parallel
       windows of (pivot + window_size-1 docs) — ONE wave per level;
       docs a window ranks above the pivot are promoted.
    3. Recurse on (head items above the pivot) + promoted docs until the
       pool fits one window.

    Docs never promoted keep their first-stage relative order below the
    pivot. The pool shrinks strictly every level (pivot and its tail
    never recurse), so termination is guaranteed.
    """
    if window_size < 2:
        raise ValueError("topdown needs window_size >= 2 (a window must "
                         "hold the pivot plus at least one candidate)")
    if k < 1:
        raise ValueError("topdown needs k >= 1 (the pivot is the k-th "
                         "ranked head item)")
    items = list(ranking)
    w = window_size
    if len(items) <= w:
        return await _ranked(compare, items)

    head = await _ranked(compare, items[:w])
    p = min(k, w) - 1  # pivot position in the ranked head
    above, pivot, below = head[:p], head[p], head[p + 1 :]
    rest = items[w:]

    async def judge(chunk: List[Any]) -> List[Any]:
        ranked = await _ranked(compare, [pivot] + chunk)
        # Promote everything the window ranks above the pivot. The pivot
        # is tracked by identity (docids are unique within a query).
        pos = next(i for i, d in enumerate(ranked) if d is pivot)
        return ranked[:pos]

    chunks = [rest[i : i + w - 1] for i in range(0, len(rest), w - 1)]
    promoted_lists = await runner.gather([judge(c) for c in chunks])
    promoted = [d for lst in promoted_lists for d in lst]
    pool = above + promoted

    if not pool:
        top: List[Any] = []
    elif len(pool) <= w:
        top = await _ranked(compare, pool)
    else:
        top = await topdown(runner, pool, k, w, compare)

    # The head window DID judge `below` (it ranked them just under the
    # pivot): keep that ranking immediately after the pivot rather than
    # letting a judged doc fall behind never-judged rest docs. Only the
    # genuinely unjudged remainder keeps first-stage retrieval order
    # (the paper's tail behavior).
    taken = (
        set(id(d) for d in top) | {id(pivot)} | set(id(d) for d in below)
    )
    tail = [d for d in items if id(d) not in taken]  # retrieval order
    return top + [pivot] + below + tail
