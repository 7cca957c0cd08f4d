"""GRPO RL training for reasoning rerankers.

TPU-native rebuild of the reference's TRL-based pipeline
(Rank-R1/train_grpo.py, train_grpo_v0.2.py): group-relative policy
optimization over sampled setwise completions with a binary regex reward,
LoRA adapters on a frozen bf16 base, DP over the mesh's 'data' axis.

Per step (GRPOTrainer semantics with num_iterations=1, "on-policy",
train_grpo_v0.2.py:35):
  1. sample ``num_generations`` completions per prompt at ``temperature``
     through the KV-cache decode scan;
  2. reward each completion (rewards.reward_setwise);
  3. group-normalized advantage A = (r - mean_g) / (std_g + eps);
  4. policy loss -E[A * logp(tokens)] (+ beta * KL(policy || base) via the
     k3 estimator TRL uses), averaged over completion tokens;
  5. AdamW on the adapter only.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import generate as gen_mod
from ..engine.tokenizer import Tokenizer
from ..models import decoder as dec_mod
from ..models.config import DecoderConfig
from ..parallel import mesh as mesh_mod
from . import lora as lora_mod
from .rewards import reward_setwise
from .schedule import lr_schedule


@dataclass(frozen=True)
class GRPOConfig:
    learning_rate: float = 1e-5        # train_grpo.py:48
    num_generations: int = 8           # train_grpo.py:28
    temperature: float = 1.0           # v0.2 uses 1.2 (train_grpo_v0.2.py:40)
    beta: float = 0.04                 # KL coeff; v0.2 sets 0.001
    max_completion_length: int = 256   # reference: 2048/4096 (scaled in tests)
    max_prompt_length: int = 1024
    grad_clip: float = 1.0
    grad_accum: int = 1                # v0.2 uses 4 (train_grpo_v0.2.py:36)
    warmup_steps: int = 0              # ds_zero0_config.json WarmupDecayLR
    total_steps: int = 0               # >0 with warmup: linear decay to 0
    lora: lora_mod.LoraConfig = lora_mod.LoraConfig()



class GRPOTrainer:
    def __init__(
        self,
        model_cfg: DecoderConfig,
        base_params,
        tokenizer: Tokenizer,
        cfg: GRPOConfig,
        mesh: Mesh,
        reward_fn: Callable[[Sequence[str], Sequence[str]], List[float]] = reward_setwise,
    ):
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.reward_fn = reward_fn
        self.base_params = base_params
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(lr_schedule(cfg)),
        )
        # DDP layout (ds_zero0_config.json stage-0 semantics): adapter +
        # optimizer state replicated on every device, batches sharded over
        # 'data'; XLA inserts the gradient all-reduce NCCL did.
        self._repl = NamedSharding(mesh, P())
        self._data_sh = mesh_mod.data_sharding(mesh)
        self.lora = jax.device_put(
            lora_mod.init_lora(base_params, cfg.lora, jax.random.PRNGKey(0)),
            self._repl,
        )
        self.opt_state = self.tx.init(self.lora)
        self.step_idx = 0
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    def _pad_left(self, rows: List[List[int]], L: int):
        ids = np.full((len(rows), L), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((len(rows), L), np.int32)
        for i, r in enumerate(rows):
            r = r[-L:]
            ids[i, L - len(r):] = r
            mask[i, L - len(r):] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    def _sample_fn(self, L: int, T: int, G: int = 1):
        key = ("sample", L, T, G)
        if key not in self._jit_cache:
            mcfg, cfg = self.model_cfg, self.cfg

            data_sh = self._data_sh

            def fn(lora, ids, mask, rng):
                ids = jax.lax.with_sharding_constraint(ids, data_sh)
                mask = jax.lax.with_sharding_constraint(mask, data_sh)
                merged = lora_mod.merge(self.base_params, lora, cfg.lora)
                # Prefill each UNIQUE prompt once; the G rollouts of a
                # group share the whole prompt, so their caches are exact
                # copies (the vLLM-backed TRL setup gets this from prefix
                # caching). Expand [N, ...] -> [N*G, ...] after prefill:
                # (G-1)/G of rollout prefill FLOPs saved.
                logits, cache = gen_mod.decoder_prefill(merged, mcfg, ids, mask, T)
                if G > 1:
                    logits = jnp.repeat(logits, G, axis=0)
                    kc, vc, kmask, pos = cache
                    cache = (
                        jnp.repeat(kc, G, axis=1),
                        jnp.repeat(vc, G, axis=1),
                        jnp.repeat(kmask, G, axis=0),
                        jnp.repeat(pos, G, axis=0),
                    )
                k0, k1 = jax.random.split(rng)
                first = jax.random.categorical(
                    k0, logits.astype(jnp.float32) / cfg.temperature, axis=-1
                ).astype(jnp.int32)
                return gen_mod.decoder_greedy_decode(
                    merged, mcfg, first, cache, L, T, mcfg.eos_token_id,
                    temperature=cfg.temperature, rng=k1,
                )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _loss_fn(self, L: int, T: int):
        key = ("loss", L, T)
        if key not in self._jit_cache:
            mcfg, cfg = self.model_cfg, self.cfg

            def completion_logp(params, ids, mask, comp_mask):
                logits = dec_mod.forward(params, mcfg, ids, mask)
                logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
                tok_lp = jnp.take_along_axis(
                    logp, ids[:, 1:][..., None], axis=-1
                )[..., 0]
                return tok_lp, comp_mask[:, 1:]

            def loss(lora, ids, mask, comp_mask, adv):
                merged = lora_mod.merge(self.base_params, lora, cfg.lora)
                tok_lp, w = completion_logp(merged, ids, mask, comp_mask)
                denom = jnp.maximum(w.sum(axis=-1), 1.0)
                # on-policy PG: grad = A * grad logp, token-averaged.
                pg = -(adv[:, None] * tok_lp * w).sum(axis=-1) / denom
                metrics = {"pg_loss": pg.mean()}
                total = pg.mean()
                if cfg.beta > 0.0:
                    ref_lp, _ = completion_logp(
                        jax.lax.stop_gradient(self.base_params), ids, mask, comp_mask
                    )
                    ref_lp = jax.lax.stop_gradient(ref_lp)
                    # k3 estimator: exp(ref-pol) - (ref-pol) - 1 >= 0.
                    d = ref_lp - tok_lp
                    kl = (jnp.exp(d) - d - 1.0) * w
                    kl = (kl.sum(axis=-1) / denom).mean()
                    metrics["kl"] = kl
                    total = total + cfg.beta * kl
                metrics["loss"] = total
                return total, metrics

            data_sh, repl = self._data_sh, self._repl

            def grad_fn(lora, ids, mask, comp_mask, adv):
                ids = jax.lax.with_sharding_constraint(ids, data_sh)
                mask = jax.lax.with_sharding_constraint(mask, data_sh)
                comp_mask = jax.lax.with_sharding_constraint(comp_mask, data_sh)
                adv = jax.lax.with_sharding_constraint(adv, data_sh)
                (l, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
                    lora, ids, mask, comp_mask, adv
                )
                # Grads of a replicated pytree w.r.t. a data-sharded loss
                # come out replicated already; pin it so XLA keeps them so.
                grads = jax.lax.with_sharding_constraint(grads, repl)
                return grads, metrics

            def apply_fn(lora, opt_state, grads):
                updates, opt_state = self.tx.update(grads, opt_state, lora)
                return optax.apply_updates(lora, updates), opt_state

            self._jit_cache[key] = (
                jax.jit(grad_fn),
                jax.jit(apply_fn, donate_argnums=(0, 1, 2)),
            )
        return self._jit_cache[key]

    def _eval_fn(self, L: int, T: int):
        key = ("eval", L, T)
        if key not in self._jit_cache:
            mcfg, cfg = self.model_cfg, self.cfg
            data_sh = self._data_sh

            def fn(lora, ids, mask):
                ids = jax.lax.with_sharding_constraint(ids, data_sh)
                mask = jax.lax.with_sharding_constraint(mask, data_sh)
                merged = lora_mod.merge(self.base_params, lora, cfg.lora)
                logits, cache = gen_mod.decoder_prefill(merged, mcfg, ids, mask, T)
                first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return gen_mod.decoder_greedy_decode(
                    merged, mcfg, first, cache, L, T, mcfg.eos_token_id
                )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def evaluate(
        self,
        prompts: List[List[dict]],
        ground_truths: Sequence[str],
        batch_size: int = 8,
    ) -> Dict[str, float]:
        """Held-out reward accuracy: ONE greedy completion per prompt,
        scored by the reward function (binary, so mean == accuracy).
        Mirrors the v0.2 builder's 1000-example test split
        (create_dataset_v0.2.py:55-59). Runs in micro-batches of
        ``batch_size`` — each generate program allocates per-row KV
        caches of (prompt + completion) length, so a 1000-example split
        must never run as one batch."""
        cfg = self.cfg
        texts = [
            self.tokenizer.apply_chat_template(p, add_generation_prompt=True)
            for p in prompts
        ]
        rows = [
            self.tokenizer.encode(t, add_special_tokens=False)[-cfg.max_prompt_length:]
            for t in texts
        ]
        L = max(8, 1 << (max(len(r) for r in rows) - 1).bit_length())
        completions: List[str] = []
        for off in range(0, len(rows), batch_size):
            chunk = rows[off : off + batch_size]
            ids, mask = self._pad_left(chunk, L)
            with self.mesh:
                comp = np.asarray(
                    self._eval_fn(L, cfg.max_completion_length)(
                        self.lora, ids, mask
                    )
                )
            completions.extend(
                self.tokenizer.decode(row.tolist(), skip_special_tokens=True)
                for row in comp
            )
        rewards = np.asarray(self.reward_fn(completions, list(ground_truths)))
        return {
            "eval_reward_mean": float(rewards.mean()),
            "eval_n": float(len(prompts)),
        }

    # ------------------------------------------------------------------
    def train_step(
        self, prompts: List[List[dict]], ground_truths: List[str]
    ) -> Dict[str, float]:
        """One GRPO step over a batch of chat prompts."""
        cfg = self.cfg
        G = cfg.num_generations
        texts = [
            self.tokenizer.apply_chat_template(p, add_generation_prompt=True)
            for p in prompts
        ]
        rows = [
            self.tokenizer.encode(t, add_special_tokens=False)[-cfg.max_prompt_length:]
            for t in texts
        ]
        L = max(8, 1 << (max(len(r) for r in rows) - 1).bit_length())
        T = cfg.max_completion_length

        # Prefill unique prompts once; the sample program expands the
        # cache G-fold on device before decoding the rollouts.
        uids, umask = self._pad_left(rows, L)
        rng = jax.random.PRNGKey(929 + self.step_idx)
        with self.mesh:
            comp_ids = self._sample_fn(L, T, G)(self.lora, uids, umask, rng)
        comp_np = np.asarray(comp_ids)
        # Loss inputs need the G-replicated prompt rows.
        ids = jnp.repeat(uids, G, axis=0)
        mask = jnp.repeat(umask, G, axis=0)

        completions = []
        for row in comp_np:
            row_l = row.tolist()
            completions.append(self.tokenizer.decode(row_l, skip_special_tokens=True))

        gts = [g for g in ground_truths for _ in range(G)]
        rewards = np.asarray(self.reward_fn(completions, gts), np.float32)
        groups = rewards.reshape(len(prompts), G)
        adv = (groups - groups.mean(axis=1, keepdims=True)) / (
            groups.std(axis=1, keepdims=True) + 1e-4
        )
        adv = adv.reshape(-1)

        # Assemble full sequences (prompt + completion) with completion mask.
        full_ids = np.concatenate([np.asarray(ids), comp_np], axis=1)
        comp_valid = np.zeros_like(full_ids, np.float32)
        attn = np.concatenate(
            [np.asarray(mask), np.zeros_like(comp_np)], axis=1
        ).astype(np.int32)
        pad, eos = self.tokenizer.pad_id, self.model_cfg.eos_token_id
        for i, row in enumerate(comp_np):
            n = len(row)
            for t, tok in enumerate(row.tolist()):
                attn[i, L + t] = 1
                comp_valid[i, L + t] = 1.0
                if tok == eos:
                    break

        grad_fn, apply_fn = self._loss_fn(L, T)
        # Gradient accumulation over even micro-batches of the rollout
        # rows (train_grpo_v0.2.py:36 gradient_accumulation_steps=4).
        n_rows = full_ids.shape[0]
        n_data = mesh_mod.batch_divisor(self.mesh)
        accum = max(1, min(cfg.grad_accum, n_rows))
        # Even micro-batches; keep them divisible by the data axis whenever
        # the full rollout is, so every micro-batch shards evenly.
        while n_rows % accum or (
            n_rows % n_data == 0 and (n_rows // accum) % n_data
        ):
            accum -= 1
        micro = n_rows // accum
        grads_sum = None
        metric_sums: Dict[str, float] = {}
        for a in range(accum):
            sl = slice(a * micro, (a + 1) * micro)
            with self.mesh:
                g, m = grad_fn(
                    self.lora,
                    jnp.asarray(full_ids[sl]), jnp.asarray(attn[sl]),
                    jnp.asarray(comp_valid[sl]), jnp.asarray(adv[sl]),
                )
            for key_, v in m.items():
                metric_sums[key_] = metric_sums.get(key_, 0.0) + float(v)
            grads_sum = g if grads_sum is None else jax.tree.map(
                jnp.add, grads_sum, g
            )
        metrics = {key_: v / accum for key_, v in metric_sums.items()}
        if accum > 1:
            grads_sum = jax.tree.map(lambda x: x / accum, grads_sum)
        with self.mesh:
            self.lora, self.opt_state = apply_fn(self.lora, self.opt_state, grads_sum)
        self.step_idx += 1
        out = {k: float(v) for k, v in metrics.items()}
        out["reward_mean"] = float(rewards.mean())
        out["reward_std"] = float(rewards.std())
        return out
