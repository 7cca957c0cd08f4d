"""Orbax checkpointing for training state.

Replaces the reference's TRL/HF Trainer checkpoint delegation
(train_grpo.py:67 resume_from_checkpoint, save_steps=20
train_grpo_v0.2.py:67) with explicit save/restore of the adapter +
optimizer state + step counter.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def save(path: str, step: int, lora, opt_state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.join(path, f"step_{step:06d}"),
        {"step": step, "lora": lora, "opt_state": opt_state},
        force=True,
    )


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore(path: str, abstract_state) -> Tuple[int, Any, Any]:
    """Restore the newest checkpoint; abstract_state provides the pytree
    structure/shapes (e.g. {'step': 0, 'lora': lora0, 'opt_state': opt0})."""
    import orbax.checkpoint as ocp

    step = latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(path), f"step_{step:06d}"),
        item=abstract_state,
    )
    return restored["step"], restored["lora"], restored["opt_state"]
