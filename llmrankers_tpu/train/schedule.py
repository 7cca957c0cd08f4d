"""Learning-rate schedule shared by the GRPO and SFT trainers."""
from __future__ import annotations

import optax


def lr_schedule(cfg):
    """DeepSpeed WarmupDecayLR semantics (ds_zero0_config.json: linear
    warmup to learning_rate over warmup_steps, then linear decay to 0 at
    total_steps). warmup_steps == 0 keeps the reference scripts' constant
    LR (TRL default when no scheduler config is given)."""
    if cfg.warmup_steps <= 0:
        return cfg.learning_rate
    if cfg.total_steps <= cfg.warmup_steps:
        # A defaulted/misconfigured total would decay LR to ~0 right
        # after warmup and silently stall training.
        raise ValueError(
            f"warmup_steps={cfg.warmup_steps} needs total_steps > it "
            f"(got {cfg.total_steps}) so the decay segment has room"
        )
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
            optax.linear_schedule(
                cfg.learning_rate, 0.0, cfg.total_steps - cfg.warmup_steps
            ),
        ],
        [cfg.warmup_steps],
    )
