"""Pairwise ranking algorithms: binary heapsort, bubblesort, allpair.

Behavioral parity with /root/reference/llmrankers/pairwise.py:133-277:
  * ``compare(a, b)`` resolves True iff the model prefers ``a`` under BOTH
    prompt orderings ((A,B) answered "Passage A" and (B,A) answered
    "Passage B", pairwise.py:228-233); disagreement counts as "not greater".
  * heapSort is the textbook binary partial heapsort (pairwise.py:149-162).
  * bubblesort bubbles the best to the front k times with the
    "skip unchanged tail" shortcut (pairwise.py:253-275).
  * allpair scores all C(n,2) pairs, +1 to the consistent winner, 0.5/0.5
    on conflict (pairwise.py:205-216).

Written as async coroutines for the wave-batching runner; heap build
exposes per-depth parallelism, and each logical comparison is a single
request whose two prompt orderings ride the same device batch.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Awaitable, Callable, Dict, List, Sequence, Tuple

from .scheduler import WaveRunner

# compare(a, b) -> bool : True iff a ranks strictly above b (consistent win).
PairCompare = Callable[[Any, Any], Awaitable[bool]]


async def _sift_down(
    arr: List[Any], n: int, i: int, compare: PairCompare
) -> None:
    """Iterative binary max-heapify (reference heapify, pairwise.py:133-147)."""
    while True:
        largest = i
        l = 2 * i + 1
        r = 2 * i + 2
        if l < n and await compare(arr[l], arr[i]):
            largest = l
        if r < n and await compare(arr[r], arr[largest]):
            largest = r
        if largest == i:
            return
        arr[i], arr[largest] = arr[largest], arr[i]
        i = largest


def _levels_binary(n: int) -> List[List[int]]:
    """Build indices range(n//2, -1, -1) grouped by depth, deepest first."""
    if n <= 0:
        return []
    depth_of = [0] * (n // 2 + 1)
    for i in range(1, len(depth_of)):
        depth_of[i] = depth_of[(i - 1) // 2] + 1
    buckets: Dict[int, List[int]] = {}
    for i in range(n // 2, -1, -1):
        buckets.setdefault(depth_of[i], []).append(i)
    return [buckets[d] for d in sorted(buckets, reverse=True)]


async def heapsort(
    runner: WaveRunner, arr: List[Any], k: int, compare: PairCompare
) -> List[Any]:
    """Partial binary heapsort; returns best-first (pairwise.py:221-237).

    Note: sibling subtree sift-downs at one depth are independent, so the
    build runs as one wave per depth; outcomes match the reference's
    sequential descending-index order.
    """
    n = len(arr)
    for level in _levels_binary(n):
        if len(level) == 1:
            await _sift_down(arr, n, level[0], compare)
        else:
            await runner.gather([_sift_down(arr, n, i, compare) for i in level])
    ranked = 0
    for i in range(n - 1, 0, -1):
        arr[i], arr[0] = arr[0], arr[i]
        ranked += 1
        if ranked == k:
            break
        await _sift_down(arr, i, 0, compare)
    return list(reversed(arr))


async def bubblesort(
    runner: WaveRunner, arr: List[Any], k: int, compare: PairCompare
) -> List[Any]:
    """Top-k pairwise bubblesort with unchanged-tail skipping
    (pairwise.py:253-275). Mutates and returns ``arr``."""
    ranking = arr
    k = min(k, len(ranking))
    last_end = len(ranking) - 1
    for i in range(k):
        current_ind = last_end
        is_change = False
        while True:
            if current_ind <= i:
                break
            if await compare(ranking[current_ind], ranking[current_ind - 1]):
                ranking[current_ind - 1], ranking[current_ind] = (
                    ranking[current_ind],
                    ranking[current_ind - 1],
                )
                if not is_change:
                    is_change = True
                    if last_end != len(ranking) - 1:
                        last_end += 1
            if not is_change:
                last_end -= 1
            current_ind -= 1
    return ranking


async def allpair(
    runner: WaveRunner,
    arr: List[Any],
    keyfn: Callable[[Any], str],
    compare_both: Callable[[Any, Any], Awaitable[Tuple[Any, Any]]],
) -> List[Tuple[str, float]]:
    """All-pairs tournament scoring (pairwise.py:169-219).

    ``compare_both(a, b)`` resolves to the model's labels for both prompt
    orderings (a,b) and (b,a), each one of 'A' / 'B' / anything else
    (unparseable). Win counting mirrors the reference exactly
    (pairwise.py:210-216): a wins iff ordering-1 answered A AND ordering-2
    answered B; b wins on the reverse; every other combination (including
    garbage output) is a conflict scored 0.5 / 0.5. Returns (key, score)
    sorted descending.

    All C(n,2) requests are issued concurrently — the runner fans them into
    full device batches, replacing the reference's DataLoader streaming.
    """
    pairs = [(i, j) for i in range(len(arr)) for j in range(i + 1, len(arr))]
    outcomes = await runner.gather(
        [compare_both(arr[i], arr[j]) for i, j in pairs]
    )
    scores: Dict[str, float] = defaultdict(float)
    for (i, j), (label1, label2) in zip(pairs, outcomes):
        ka, kb = keyfn(arr[i]), keyfn(arr[j])
        if label1 == "A" and label2 == "B":
            scores[ka] += 1
        elif label1 == "B" and label2 == "A":
            scores[kb] += 1
        else:
            scores[ka] += 0.5
            scores[kb] += 0.5
    return sorted(scores.items(), key=lambda kv: kv[1], reverse=True)
