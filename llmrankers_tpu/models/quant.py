"""Weight-only int8 quantization for decoder models.

Production-serving feature beyond the reference (its vLLM backend offers
the same class of weight-only quantization). Per-output-channel symmetric
int8 for the stacked per-layer matmul weights; embeddings, norms, biases
and the LM head stay in the original dtype. The quantized weight lives
under the ORIGINAL leaf name with a sibling ``<name>_scale`` leaf
([L, 1, out]), so the layer scan and partition specs keep their shape;
matmul sites dequantize via :func:`wmat`, which XLA fuses into the matmul
producer — weights stream from HBM at half the bytes of bf16. That is the
win: single-chip decode is weight-streaming-bound at serving batch sizes,
so int8 roughly doubles decode throughput (and halves weight HBM, e.g.
Qwen2.5-3B 6.2GB -> 3.1GB + scales).

Not supported on quantized weights: LoRA adapter merging (merge adds a
bf16 delta to the int8 leaf) — quantize after merging an adapter instead.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
SCALE_SUFFIX = "_scale"


def wmat(lp: Dict[str, Any], name: str) -> jax.Array:
    """The (dequantized) weight for a matmul site. For unquantized params
    this is the leaf itself; for int8 it multiplies in the per-channel
    scale — XLA fuses this into the consuming matmul, so the int8 bytes
    are what crosses HBM."""
    w = lp[name]
    s = lp.get(name + SCALE_SUFFIX)
    if s is None:
        return w
    return w.astype(s.dtype) * s


def is_quantized(params: Dict[str, Any]) -> bool:
    layers = params.get("layers", {})
    return any((t + SCALE_SUFFIX) in layers for t in QUANT_TARGETS)


def quantize_decoder_params(params: Dict[str, Any], dtype=jnp.bfloat16):
    """Symmetric per-output-channel int8 quantization of the stacked
    [L, in, out] matmul weights. ``dtype`` is the scale (and dequant)
    dtype. Returns a new param pytree; non-target leaves are shared."""
    layers = dict(params["layers"])
    for name in QUANT_TARGETS:
        if name not in layers:
            continue
        w = layers[name].astype(jnp.float32)  # [L, in, out]
        amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # [L, 1, out]
        amax = jnp.maximum(amax, 1e-8)
        layers[name] = (
            jnp.clip(jnp.round(w / amax * 127.0), -127, 127).astype(jnp.int8)
        )
        layers[name + SCALE_SUFFIX] = (amax / 127.0).astype(dtype)
    out = dict(params)
    out["layers"] = layers
    return out
