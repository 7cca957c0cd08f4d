"""SFT training for setwise rerankers.

TPU-native rebuild of Rank-R1's SFT pipeline (train_sft.py: TRL SFTTrainer
+ DataCollatorForCompletionOnlyLM + DeepSpeed ZeRO-0 + PEFT LoRA):
  * completion-only loss masking — only tokens after the assistant
    response template contribute (train_sft.py:12-16);
  * LoRA-only optimization over a frozen bf16 base (train_sft.py:25-33);
  * data parallelism expressed as batch sharding over the mesh's 'data'
    axis with tensor-parallel params over 'model' — XLA inserts the
    gradient all-reduces ZeRO-0/NCCL did for the reference
    (ds_zero0_config.json).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import decoder as dec_mod
from ..models.config import DecoderConfig
from ..parallel import mesh as mesh_mod
from . import lora as lora_mod
from .schedule import lr_schedule


@dataclass(frozen=True)
class SFTConfig:
    learning_rate: float = 1e-5  # train_sft.py:38
    max_length: int = 4096
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    batch_size: int = 2
    grad_accum: int = 8
    warmup_steps: int = 0        # ds_zero0_config.json WarmupDecayLR
    total_steps: int = 0         # >0 with warmup: linear decay to 0
    lora: lora_mod.LoraConfig = lora_mod.LoraConfig()



def completion_only_mask(
    input_ids: np.ndarray, response_ids: List[int], pad_id: int
) -> np.ndarray:
    """Loss mask: 1 from just AFTER the last occurrence of the response
    template onward (DataCollatorForCompletionOnlyLM semantics)."""
    B, T = input_ids.shape
    mask = np.zeros((B, T), np.float32)
    rl = len(response_ids)
    for b in range(B):
        row = input_ids[b].tolist()
        start = -1
        for i in range(T - rl, -1, -1):
            if row[i : i + rl] == response_ids:
                start = i + rl
                break
        if start >= 0:
            mask[b, start:] = 1.0
        mask[b, np.asarray(row) == pad_id] = 0.0
    return mask


def sft_loss(
    merged_params, cfg: DecoderConfig, batch: Dict[str, jax.Array]
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Next-token CE over loss-masked positions."""
    ids, attn, lmask = batch["input_ids"], batch["attn_mask"], batch["loss_mask"]
    logits = dec_mod.forward(merged_params, cfg, ids, attn)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = lmask[:, 1:]
    denom = jnp.maximum(w.sum(), 1.0)
    loss = -(tok_lp * w).sum() / denom
    return loss, {"loss": loss, "tokens": w.sum()}


def make_sft_step(
    model_cfg: DecoderConfig,
    train_cfg: SFTConfig,
    mesh: Mesh,
    base_params,
) -> Tuple[Callable, Any, Any]:
    """Build (jitted step, initial lora, initial opt_state).

    step(lora, opt_state, batch) -> (lora, opt_state, metrics). The base
    params close over the step fn already sharded; only the small adapter
    pytree is optimizer state.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.adamw(lr_schedule(train_cfg),
                    weight_decay=train_cfg.weight_decay),
    )
    lora0 = lora_mod.init_lora(base_params, train_cfg.lora, jax.random.PRNGKey(0))
    repl = NamedSharding(mesh, P())
    lora0 = jax.device_put(lora0, repl)
    opt0 = tx.init(lora0)
    data_sh = mesh_mod.data_sharding(mesh)

    def step(lora, opt_state, batch):
        batch = {
            k: jax.lax.with_sharding_constraint(v, data_sh) for k, v in batch.items()
        }

        def loss_fn(lora_):
            merged = lora_mod.merge(base_params, lora_, train_cfg.lora)
            return sft_loss(merged, model_cfg, batch)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1)), lora0, opt0


def make_full_train_step(
    model_cfg: DecoderConfig,
    train_cfg: SFTConfig,
    mesh: Mesh,
):
    """Full-parameter train step (no LoRA) — the dp+tp-sharded program the
    multichip dry-run compiles. Returns step(params, opt_state, batch)."""
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.adamw(lr_schedule(train_cfg),
                    weight_decay=train_cfg.weight_decay),
    )
    data_sh = mesh_mod.data_sharding(mesh)

    def step(params, opt_state, batch):
        batch = {
            k: jax.lax.with_sharding_constraint(v, data_sh) for k, v in batch.items()
        }
        (loss, metrics), grads = jax.value_and_grad(sft_loss, has_aux=True)(
            params, model_cfg, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1)), tx
