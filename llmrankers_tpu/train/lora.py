"""LoRA adapters as a separate pytree.

Replaces PEFT's LoraConfig/get_peft_model (Rank-R1/train_grpo.py:36-44:
r=16, alpha=32, target q/k/v/o/gate/up/down) and vLLM's LoRARequest
application (setwise.py:450-454, 494-497). Adapters live beside the frozen
base params; ``merge`` folds them in (inference), and training
differentiates through ``merge`` with respect to the adapter leaves only.

Layouts:
  * decoder-only params ({"layers": ...}): flat adapter
    {target: {"a": [L, in, r], "b": [L, r, out]}};
  * T5 params ({"encoder"/"decoder": {"layers": ...}}): nested adapter
    {"encoder": {target: ab}, "decoder": {target: ab}} — decoder targets
    may include cross-attention ("cq", "ck", "cv", "co").
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

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


def _is_t5(params: Dict[str, Any]) -> bool:
    return "encoder" in params and "layers" not in params


def _subtrees(params: Dict[str, Any]) -> List[Tuple[Optional[str], Dict[str, Any]]]:
    """(adapter key, stacked-layer dict) pairs; key None = flat layout."""
    if _is_t5(params):
        return [("encoder", params["encoder"]["layers"]),
                ("decoder", params["decoder"]["layers"])]
    return [(None, params["layers"])]


def _init_one(layers: Dict[str, Any], targets, cfg, keys, dtype):
    out: Dict[str, Any] = {}
    for name in targets:
        w = layers[name]
        L, d_in, _ = w.shape
        out[name] = {
            "a": (jax.random.normal(next(keys), (L, d_in, cfg.r)) * 0.02).astype(dtype),
            "b": jnp.zeros((L, cfg.r, w.shape[2]), dtype),
        }
    return out


def init_lora(
    params: Dict[str, Any], cfg: LoraConfig, key: jax.Array, dtype=jnp.float32
) -> Dict[str, Any]:
    """A ~ N(0, 0.02), B = 0 (standard LoRA init: adapter starts as a
    no-op). Shapes follow the stacked [L, in, out] layer leaves."""
    keys = iter(jax.random.split(key, 4 * max(len(cfg.targets), len(T5_TARGETS))))
    if not _is_t5(params):
        return _init_one(params["layers"], cfg.targets, cfg, keys, dtype)
    # The decoder-only default target names don't exist in the T5 tree;
    # auto-switch to the T5 attention targets then, and refuse to build a
    # silently-empty (no-op) adapter for custom target lists.
    cfg_targets = cfg.targets
    if tuple(cfg_targets) == DEFAULT_TARGETS:
        cfg_targets = T5_TARGETS
    lora: Dict[str, Any] = {}
    matched = 0
    for sub, layers in _subtrees(params):
        targets = [t for t in cfg_targets if t in layers]
        matched += len(targets)
        lora[sub] = _init_one(layers, targets, cfg, keys, dtype)
    if matched == 0:
        raise ValueError(
            f"LoraConfig.targets {tuple(cfg.targets)} matches no T5 layer; "
            f"use names from {T5_TARGETS + tuple('c' + t for t in T5_TARGETS)}"
        )
    return lora


def _merge_one(layers: Dict[str, Any], ab_map: Dict[str, Any], scale: float):
    out = dict(layers)
    for name, ab in ab_map.items():
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"], ab["b"], preferred_element_type=jnp.float32
        ) * scale
        out[name] = out[name] + delta.astype(out[name].dtype)
    return out


def merge(params: Dict[str, Any], lora: Dict[str, Any], cfg: LoraConfig) -> Dict[str, Any]:
    """W' = W + (alpha/r) * A @ B, per stacked layer leaf. Differentiable
    w.r.t. the adapter, so training treats base params as constants."""
    out = dict(params)
    if _is_t5(params):
        for sub in ("encoder", "decoder"):
            if sub in lora and lora[sub]:
                tree = dict(out[sub])
                tree["layers"] = _merge_one(out[sub]["layers"], lora[sub], cfg.scale)
                out[sub] = tree
        return out
    out["layers"] = _merge_one(params["layers"], lora, cfg.scale)
    return out


# ---------------------------------------------------------------------------
# PEFT-format checkpoint loading
# ---------------------------------------------------------------------------
# decoder-only (Llama/Qwen): base_model.model.model.layers.{i}.self_attn.q_proj
_DEC_NAME_MAP = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}
# T5: {encoder|decoder}.block.{i}.layer.{j}.{SelfAttention|EncDecAttention}.{q,k,v,o}
_T5_SELF = {n: n for n in T5_TARGETS}
_T5_CROSS = {n: "c" + n for n in T5_TARGETS}


# Export name maps (ours -> HF/PEFT module path inside a layer). The
# decoder side matches the Llama/Qwen naming the published Rank-R1
# adapters use; the T5 side uses the real HF block layout (self-attn is
# layer.0; decoder cross-attn is layer.1).
_DEC_EXPORT = {
    "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
    "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
    "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
    "w_down": "mlp.down_proj",
}
_T5_EXPORT = {
    **{t: f"layer.0.SelfAttention.{t}" for t in T5_TARGETS},
    **{"c" + t: f"layer.1.EncDecAttention.{t}" for t in T5_TARGETS},
}


def save_peft_adapter(
    lora: Dict[str, Any],
    cfg: LoraConfig,
    path: str,
    base_model_name_or_path: str = "",
) -> None:
    """Export an adapter pytree as a PEFT-format checkpoint directory
    (adapter_config.json + adapter_model.safetensors) — the inverse of
    :func:`load_peft_adapter`.

    This is the deployment bridge the reference gets from TRL/PEFT for
    free (Rank-R1/train_grpo.py:36-44 trains with get_peft_model and
    trainer.save_model writes PEFT files vLLM's LoRARequest then loads,
    run_setwise.py:121-127): adapters trained here with train/grpo.py or
    train/sft.py round-trip to HF PEFT / vLLM without conversion.

    Torch tensor layout: PEFT stores lora_A as [r, in] and lora_B as
    [out, r]; our stacked leaves are a [L, in, r] / b [L, r, out], so
    each per-layer slice transposes on the way out (mirror of _stack).
    """
    import json
    import os

    from safetensors.numpy import save_file

    is_t5 = set(lora) <= {"encoder", "decoder"} and "a" not in lora.get(
        "encoder", lora.get("decoder", {})
    )
    sd: Dict[str, np.ndarray] = {}
    modules = set()

    def emit(prefix: str, name: str, ab: Dict[str, Any]) -> None:
        modules.add(name.rsplit(".", 1)[-1])
        a = np.asarray(jax.device_get(ab["a"]), dtype=np.float32)
        b = np.asarray(jax.device_get(ab["b"]), dtype=np.float32)
        for i in range(a.shape[0]):
            sd[f"{prefix}.{i}.{name}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
            sd[f"{prefix}.{i}.{name}.lora_B.weight"] = np.ascontiguousarray(b[i].T)

    if is_t5:
        for sub in ("encoder", "decoder"):
            for ours, ab in lora.get(sub, {}).items():
                emit(f"base_model.model.{sub}.block", _T5_EXPORT[ours], ab)
    else:
        for ours, ab in lora.items():
            emit("base_model.model.model.layers", _DEC_EXPORT[ours], ab)
    if not sd:
        raise ValueError("empty adapter: nothing to export")

    os.makedirs(path, exist_ok=True)
    save_file(sd, os.path.join(path, "adapter_model.safetensors"))
    acfg = {
        "peft_type": "LORA",
        "r": cfg.r,
        "lora_alpha": cfg.alpha,
        "lora_dropout": 0.0,
        "bias": "none",
        "fan_in_fan_out": False,
        "target_modules": sorted(modules),
        "task_type": "SEQ_2_SEQ_LM" if is_t5 else "CAUSAL_LM",
        "base_model_name_or_path": base_model_name_or_path,
    }
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(acfg, f, indent=1, sort_keys=True)


def _load_sd(path: str) -> Dict[str, np.ndarray]:
    import os

    from safetensors import safe_open

    sd = {}
    f = safe_open(os.path.join(path, "adapter_model.safetensors"), framework="numpy")
    for k in f.keys():
        sd[k] = f.get_tensor(k)
    return sd


def _stack(sd, match, n_layers, dtype):
    a_stack, b_stack = [], []
    for i in range(n_layers):
        a_key = next((k for k in sd if match(k, i, "lora_A")), None)
        b_key = next((k for k in sd if match(k, i, "lora_B")), None)
        if a_key is None or b_key is None:
            return None
        # PEFT stores lora_A [r, in], lora_B [out, r] (torch layout).
        a_stack.append(sd[a_key].T)
        b_stack.append(sd[b_key].T)
    return np.stack(a_stack), np.stack(b_stack)


def load_peft_adapter(path: str, params: Dict[str, Any], dtype=jnp.float32):
    """Load a PEFT-format LoRA checkpoint directory (adapter_config.json +
    adapter_model.safetensors) into our stacked-pytree layout.

    Supports decoder-only (Llama/Qwen `*_proj` modules — the published
    Rank-R1 adapters) and T5 (SelfAttention/EncDecAttention q/k/v/o).
    Mirrors the HF-hub adapter resolution of the reference
    (setwise.py:429-439) minus the network download.
    """
    import json
    import os

    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    r, alpha = acfg["r"], acfg["lora_alpha"]
    sd = _load_sd(path)

    if _is_t5(params):
        lora: Dict[str, Any] = {"encoder": {}, "decoder": {}}
        targets = []
        for sub in ("encoder", "decoder"):
            n_layers = params[sub]["layers"]["q"].shape[0]
            attn_maps = [("SelfAttention", _T5_SELF)]
            if sub == "decoder":
                attn_maps.append(("EncDecAttention", _T5_CROSS))
            for mod, nmap in attn_maps:
                for hf_name, ours in nmap.items():
                    def match(k, i, ab, _m=mod, _h=hf_name, _s=sub):
                        return (k.startswith(f"base_model.model.{_s}.") or f".{_s}." in k) \
                            and f"block.{i}." in k and f"{_m}.{_h}.{ab}" in k
                    st = _stack(sd, match, n_layers, dtype)
                    if st is None:
                        continue
                    targets.append(ours)
                    lora[sub][ours] = {
                        "a": jnp.asarray(st[0], dtype=dtype),
                        "b": jnp.asarray(st[1], dtype=dtype),
                    }
        if not targets:
            raise ValueError(
                f"no LoRA tensors in {path!r} matched this T5 model's "
                "layer names (expected PEFT keys like "
                "'...block.N.layer.M.SelfAttention.q.lora_A...'); "
                "is the adapter for a different architecture?"
            )
        return lora, LoraConfig(r=r, alpha=alpha, targets=tuple(targets))

    n_layers = params["layers"]["wq"].shape[0]
    lora = {}
    targets = []
    for hf_name, ours in _DEC_NAME_MAP.items():
        def match(k, i, ab, _h=hf_name):
            return f"layers.{i}." in k and f"{_h}.{ab}" in k
        st = _stack(sd, match, n_layers, dtype)
        if st is None:
            continue
        targets.append(ours)
        lora[ours] = {
            "a": jnp.asarray(st[0], dtype=dtype),
            "b": jnp.asarray(st[1], dtype=dtype),
        }
    if not targets:
        raise ValueError(
            f"no LoRA tensors in {path!r} matched this model's layer "
            "names (expected PEFT keys like "
            "'...layers.N.self_attn.q_proj.lora_A...'); "
            "is the adapter for a different architecture?"
        )
    return lora, LoraConfig(r=r, alpha=alpha, targets=tuple(targets))
