"""LoRA adapters as a separate pytree.

Replaces PEFT's LoraConfig/get_peft_model (Rank-R1/train_grpo.py:36-44:
r=16, alpha=32, target q/k/v/o/gate/up/down) and vLLM's LoRARequest
application (setwise.py:450-454, 494-497). Adapters live beside the frozen
base params; ``merge`` folds them in (inference), and training
differentiates through ``merge`` with respect to the adapter leaves only.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
T5_TARGETS = ("q", "k", "v", "o")


@dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    targets: Sequence[str] = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora(
    params: Dict[str, Any], cfg: LoraConfig, key: jax.Array, dtype=jnp.float32
) -> Dict[str, Any]:
    """A ~ N(0, 0.02), B = 0 (standard LoRA init: adapter starts as a
    no-op). Shapes follow the stacked [L, in, out] layer leaves."""
    lora: Dict[str, Any] = {}
    keys = iter(jax.random.split(key, len(cfg.targets)))
    for name in cfg.targets:
        w = params["layers"][name]
        L, d_in, d_out = w.shape
        lora[name] = {
            "a": (jax.random.normal(next(keys), (L, d_in, cfg.r)) * 0.02).astype(dtype),
            "b": jnp.zeros((L, cfg.r, d_out), dtype),
        }
    return lora


def merge(params: Dict[str, Any], lora: Dict[str, Any], cfg: LoraConfig) -> Dict[str, Any]:
    """W' = W + (alpha/r) * A @ B, per stacked layer leaf. Differentiable
    w.r.t. the adapter, so training treats base params as constants."""
    layers = dict(params["layers"])
    for name, ab in lora.items():
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"], ab["b"], preferred_element_type=jnp.float32
        ) * cfg.scale
        layers[name] = layers[name] + delta.astype(layers[name].dtype)
    out = dict(params)
    out["layers"] = layers
    return out


def load_peft_adapter(path: str, params: Dict[str, Any], dtype=jnp.float32):
    """Load a PEFT-format LoRA checkpoint directory (adapter_config.json +
    adapter_model.safetensors) into our stacked-pytree layout.

    Mirrors the HF-hub adapter resolution of the reference
    (setwise.py:429-439) minus the network download.
    """
    import json
    import os

    from safetensors import safe_open

    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    r, alpha = acfg["r"], acfg["lora_alpha"]
    name_map = {
        "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
        "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
    }
    sd = {}
    f = safe_open(os.path.join(path, "adapter_model.safetensors"), framework="numpy")
    for k in f.keys():
        sd[k] = f.get_tensor(k)

    n_layers = params["layers"]["wq"].shape[0]
    lora: Dict[str, Any] = {}
    targets = []
    for hf_name, ours in name_map.items():
        a_fmt = None
        for k in sd:
            if f".{hf_name}.lora_A" in k:
                a_fmt = k
                break
        if a_fmt is None:
            continue
        targets.append(ours)
        a_stack, b_stack = [], []
        for i in range(n_layers):
            a_key = next(k for k in sd if f"layers.{i}." in k and f"{hf_name}.lora_A" in k)
            b_key = next(k for k in sd if f"layers.{i}." in k and f"{hf_name}.lora_B" in k)
            # PEFT stores lora_A [r, in], lora_B [out, r] (torch layout).
            a_stack.append(sd[a_key].T)
            b_stack.append(sd[b_key].T)
        lora[ours] = {
            "a": jnp.asarray(np.stack(a_stack), dtype=dtype),
            "b": jnp.asarray(np.stack(b_stack), dtype=dtype),
        }
    return lora, LoraConfig(r=r, alpha=alpha, targets=tuple(targets))
