"""DP-optimal length-bucket ladders from observed row lengths.

The engine pads token rows into (batch, length) buckets; each distinct
padded length compiles once and every row pays (bucket_top - true_len)
padded tokens of wasted compute. The default ladder
(engine.DEFAULT_LEN_BUCKETS) is hand-tuned for the reference workloads
(reference prompts cluster ~600 tokens for setwise at num_child=2,
/root/reference/llmrankers/setwise.py prompt shapes); an unusual corpus
can land between rungs and pay 30%+ padding. This module computes the
exact waste-minimizing ladder for an observed length distribution.

Formulation: round each observed length up to ``multiple``. The
default granularity is 16 — the bf16 sublane width, so finer rungs
buy nothing from the hardware layout — NOT a coarser "free" 64/128:
batched T5 scoring is GEMM-bound with M = batch x bucket_len, so
every padded row-token is real MXU work. Measured on the xl int8
setwise bench: 581-token prompts forced to a 640 rung (64-multiple
planning) vs a 592 rung (16-multiple) is a 9.7% end-to-end
throughput difference. Any optimal bucket top can be lowered to the
largest rounded length it covers, so tops come from the candidate set
of distinct rounded lengths. Minimizing total padded tokens
sum_rows(top(len)) over ladders with at most K rungs (the count term
sum_rows(len) is constant) is then a classic partition DP:

    dp[k][j] = min cost covering candidates 1..j with k rungs,
               rung k = c_j
             = min_i dp[k-1][i] + c_j * (N_j - N_i)

with N_j the cumulative row count. O(K * U^2) for U distinct rounded
lengths — microseconds at real U (a few hundred).

Each rung also costs one XLA compile per batch bucket it meets, so
``compile_cost`` (default 0) adds a per-rung token penalty to let
callers trade rungs for padding when the run is short.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple


def optimal_buckets(
    lengths: Sequence[int],
    max_buckets: int = 8,
    multiple: int = 16,
    compile_cost: int = 0,
) -> Tuple[int, ...]:
    """The ladder of at most ``max_buckets`` rung tops (multiples of
    ``multiple``, covering every observed length) minimizing total
    padded tokens + ``compile_cost`` per rung. Deterministic; ties
    prefer fewer rungs."""
    if max_buckets < 1:
        raise ValueError("max_buckets must be >= 1")
    if multiple < 1:
        raise ValueError("multiple must be >= 1")
    lens = [int(x) for x in lengths if x > 0]
    if not lens:
        raise ValueError("no positive lengths to plan from")
    counts: dict = {}
    for x in lens:
        c = -(-x // multiple) * multiple
        counts[c] = counts.get(c, 0) + 1
    cands: List[int] = sorted(counts)
    U = len(cands)
    K = min(max_buckets, U)
    # cumulative row counts: N[j] = rows with rounded len <= cands[j-1]
    N = [0] * (U + 1)
    for j, c in enumerate(cands):
        N[j + 1] = N[j] + counts[c]

    INF = float("inf")
    # dp[j]: min cost covering candidates 1..j with the current rung
    # count, rung top = cands[j-1]; prev[k][j] backtracks the split.
    dp = [INF] * (U + 1)
    for j in range(1, U + 1):  # one rung: top covers everything below
        dp[j] = cands[j - 1] * N[j] + compile_cost
    best_cost = dp[U]
    best_k = 1
    back = {1: {j: 0 for j in range(1, U + 1)}}
    for k in range(2, K + 1):
        ndp = [INF] * (U + 1)
        nback = {}
        for j in range(k, U + 1):
            top = cands[j - 1]
            b, bi = INF, -1
            for i in range(k - 1, j):
                v = dp[i] + top * (N[j] - N[i])
                if v < b:
                    b, bi = v, i
            ndp[j] = b + compile_cost
            nback[j] = bi
        dp = ndp
        back[k] = nback
        if dp[U] < best_cost:  # strict: ties keep fewer rungs
            best_cost = dp[U]
            best_k = k
    # backtrack
    ladder: List[int] = []
    j = U
    for k in range(best_k, 0, -1):
        ladder.append(cands[j - 1])
        j = back[k][j]
    return tuple(reversed(ladder))


def ladder_waste(lengths: Sequence[int], ladder: Sequence[int]) -> int:
    """Total padded tokens sum(top(len) - len) under ``ladder``; lengths
    above the top rung round up to the next 512-multiple (the engine's
    beyond-ladder rule, engine._bucket)."""
    lad = sorted(ladder)
    total = 0
    for x in lengths:
        for b in lad:
            if x <= b:
                total += b - x
                break
        else:
            total += -(-x // 512) * 512 - x
    return total
