"""Reward functions for GRPO.

Parity with the reference reward (Rank-R1/train_grpo.py:7-22,
train_grpo_v0.2.py:8-23): 1 iff the completion matches the
<think>…</think><answer>…</answer> pattern AND the extracted answer
equals the ground-truth label, else 0.
"""
from __future__ import annotations

import re
from typing import List, Sequence

SETWISE_PATTERN = r"<think>.*?</think>\s*<answer>(.*?)</answer>"


def reward_setwise(
    completions: Sequence[str],
    ground_truth: Sequence[str],
    pattern: str = SETWISE_PATTERN,
) -> List[float]:
    scores: List[float] = []
    for text, label in zip(completions, ground_truth):
        m = re.search(pattern, text, re.DOTALL)
        scores.append(1.0 if (m and m.group(1).strip() == label) else 0.0)
    return scores
