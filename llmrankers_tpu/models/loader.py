"""Checkpoint loading: HF safetensors / torch state_dicts -> JAX pytrees.

Replaces the reference's ``from_pretrained(..., device_map='auto')`` calls
(setwise.py:46-50, pointwise.py:20-26). Weights are read tensor-by-tensor
from safetensors shards (zero-copy numpy) , per-layer tensors are stacked
onto a leading layer axis for the ``lax.scan`` models, and torch Linear
weights are transposed to right-multiplication layout.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Callable, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .config import DecoderConfig, T5Config, load_hf_config


def _np(t: Any) -> np.ndarray:
    """Accept numpy arrays or torch tensors."""
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor without importing torch at module scope
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t)


class TensorSource:
    """Uniform name->tensor access over a state_dict or safetensors dir."""

    def __init__(self, getter: Callable[[str], np.ndarray], names: set):
        self.get = getter
        self.names = names

    def __contains__(self, name: str) -> bool:
        return name in self.names

    @classmethod
    def from_state_dict(cls, sd: Mapping[str, Any]) -> "TensorSource":
        return cls(lambda n: _np(sd[n]), set(sd.keys()))

    @classmethod
    def from_safetensors_dir(cls, path: str) -> "TensorSource":
        from safetensors import safe_open

        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no .safetensors files under {path}")
        index: Dict[str, Any] = {}
        handles = [safe_open(f, framework="numpy") for f in files]
        for h in handles:
            for name in h.keys():
                index[name] = h

        def get(name: str) -> np.ndarray:
            return index[name].get_tensor(name)

        return cls(get, set(index.keys()))


def _stack(src: TensorSource, fmt: str, n: int, transpose: bool, dtype) -> jnp.ndarray:
    mats = []
    for i in range(n):
        a = src.get(fmt.format(i=i))
        mats.append(a.T if transpose else a)
    return jnp.asarray(np.stack(mats), dtype=dtype)


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------
def load_t5(src: TensorSource, cfg: T5Config, dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF T5 names (encoder.block.{i}.layer.{j}...) to our pytree."""

    def ffn(prefix: str, n: int) -> Dict[str, Any]:
        base = prefix + ".DenseReluDense.{w}.weight"
        names = ("wi_0", "wi_1", "wo") if cfg.is_gated else ("wi", "wo")
        return {
            w: _stack(src, base.replace("{w}", w), n, True, dtype)
            for w in names
        }

    Le, Ld = cfg.num_layers, cfg.num_decoder_layers
    e = "encoder.block.{i}.layer"
    d = "decoder.block.{i}.layer"

    enc_layers = {
        "ln1": _stack(src, e + ".0.layer_norm.weight", Le, False, dtype),
        "ln2": _stack(src, e + ".1.layer_norm.weight", Le, False, dtype),
        **{
            k: _stack(src, e + f".0.SelfAttention.{k}.weight", Le, True, dtype)
            for k in ("q", "k", "v", "o")
        },
        **ffn(e + ".1", Le),
    }
    dec_layers = {
        "ln1": _stack(src, d + ".0.layer_norm.weight", Ld, False, dtype),
        "ln2": _stack(src, d + ".1.layer_norm.weight", Ld, False, dtype),
        "ln3": _stack(src, d + ".2.layer_norm.weight", Ld, False, dtype),
        **{
            k: _stack(src, d + f".0.SelfAttention.{k}.weight", Ld, True, dtype)
            for k in ("q", "k", "v", "o")
        },
        **{
            "c" + k: _stack(src, d + f".1.EncDecAttention.{k}.weight", Ld, True, dtype)
            for k in ("q", "k", "v", "o")
        },
        **ffn(d + ".2", Ld),
    }
    params: Dict[str, Any] = {
        "shared": jnp.asarray(src.get("shared.weight"), dtype=dtype),
        "encoder": {
            "rel_bias": jnp.asarray(
                src.get(
                    "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
                ),
                dtype=dtype,
            ),
            "layers": enc_layers,
            "final_ln": jnp.asarray(src.get("encoder.final_layer_norm.weight"), dtype=dtype),
        },
        "decoder": {
            "rel_bias": jnp.asarray(
                src.get(
                    "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
                ),
                dtype=dtype,
            ),
            "layers": dec_layers,
            "final_ln": jnp.asarray(src.get("decoder.final_layer_norm.weight"), dtype=dtype),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(src.get("lm_head.weight").T, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# Decoder-only (Llama / Qwen2 / Qwen3)
# ---------------------------------------------------------------------------
def load_decoder(
    src: TensorSource, cfg: DecoderConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    L = cfg.num_hidden_layers
    p = "model.layers.{i}."
    layers: Dict[str, Any] = {
        "ln1": _stack(src, p + "input_layernorm.weight", L, False, dtype),
        "ln2": _stack(src, p + "post_attention_layernorm.weight", L, False, dtype),
        "wq": _stack(src, p + "self_attn.q_proj.weight", L, True, dtype),
        "wk": _stack(src, p + "self_attn.k_proj.weight", L, True, dtype),
        "wv": _stack(src, p + "self_attn.v_proj.weight", L, True, dtype),
        "wo": _stack(src, p + "self_attn.o_proj.weight", L, True, dtype),
        "w_gate": _stack(src, p + "mlp.gate_proj.weight", L, True, dtype),
        "w_up": _stack(src, p + "mlp.up_proj.weight", L, True, dtype),
        "w_down": _stack(src, p + "mlp.down_proj.weight", L, True, dtype),
    }
    if cfg.attention_bias:
        layers["bq"] = _stack(src, p + "self_attn.q_proj.bias", L, False, dtype)
        layers["bk"] = _stack(src, p + "self_attn.k_proj.bias", L, False, dtype)
        layers["bv"] = _stack(src, p + "self_attn.v_proj.bias", L, False, dtype)
    if cfg.qk_norm:
        layers["q_norm"] = _stack(src, p + "self_attn.q_norm.weight", L, False, dtype)
        layers["k_norm"] = _stack(src, p + "self_attn.k_norm.weight", L, False, dtype)
    params: Dict[str, Any] = {
        "embed": jnp.asarray(src.get("model.embed_tokens.weight"), dtype=dtype),
        "layers": layers,
        "final_ln": jnp.asarray(src.get("model.norm.weight"), dtype=dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(src.get("lm_head.weight").T, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------
def load_pretrained(path: str, dtype=jnp.bfloat16):
    """Load (kind, config, params) from a local HF checkpoint directory.

    kind is 't5' or 'decoder'. Mirrors the reference's AutoConfig dispatch
    (setwise.py:40-41) without the network round trip.
    """
    hf = load_hf_config(path)
    src = TensorSource.from_safetensors_dir(path)
    mt = hf.get("model_type", "")
    if mt == "t5":
        cfg = T5Config.from_hf_config(hf)
        return "t5", cfg, load_t5(src, cfg, dtype)
    elif mt in ("llama", "qwen2", "qwen3", "mistral"):
        cfg = DecoderConfig.from_hf_config(hf)
        return "decoder", cfg, load_decoder(src, cfg, dtype)
    raise NotImplementedError(f"model_type {mt!r} is not supported")
