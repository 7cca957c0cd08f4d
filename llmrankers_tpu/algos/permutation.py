"""RankGPT permutation-string parsing.

Behavioral parity with /root/reference/llmrankers/listwise.py:113-144:
digits are kept, everything else becomes whitespace; ids are deduped in
first-seen order; out-of-range ids are dropped; missing ids are appended
in their original order; the parsed permutation rewrites the window slice
in place.
"""
from __future__ import annotations

from typing import List, Sequence, TypeVar

T = TypeVar("T")


def clean_response(response: str) -> str:
    """Keep digits, blank out every other character (listwise.py:113-121)."""
    return "".join(c if c.isdigit() else " " for c in response).strip()


def parse_permutation(response: str, window_len: int) -> List[int]:
    """Parse "[2] > [1] ..." into a 0-based permutation of range(window_len).

    Mirrors receive_permutation's normalization (listwise.py:132-144):
    dedupe keeping first occurrence, drop out-of-range, append missing in
    original order.
    """
    ids: List[int] = []
    for tok in clean_response(response).split():
        v = int(tok) - 1
        if v not in ids:
            ids.append(v)
    ids = [v for v in ids if 0 <= v < window_len]
    ids += [v for v in range(window_len) if v not in ids]
    return ids


def apply_permutation(
    ranking: List[T], response: str, rank_start: int, rank_end: int
) -> List[T]:
    """Rewrite ranking[rank_start:rank_end] per the parsed permutation,
    in place (receive_permutation, listwise.py:132-144)."""
    window = list(ranking[rank_start:rank_end])
    perm = parse_permutation(response, len(window))
    for j, src in enumerate(perm):
        ranking[j + rank_start] = window[src]
    return ranking
