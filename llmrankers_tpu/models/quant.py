"""int8 quantization: decoder weight-only (W8A16) + T5 W8A8.

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

T5 (encoder-decoder) quantization differs in WHY it wins: the batched T5
scoring path is COMPUTE-bound (~0.6 bf16 MFU), so halving weight bytes
alone buys little — the win is running the GEMMs on the v5e int8 MXU
path (~2x bf16 peak) via the Pallas W8A8 kernel (ops/int8_matmul.py)
with dynamically quantized per-token activations. The same stacked-leaf
layout is used ([L, in, out] int8 + [L, 1, out] scales under the
original names), so the layer scan and partition specs are unchanged;
models/t5.py::_mm dispatches each matmul site on the scale leaf.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
# T5 per-layer matmul leaves (encoder; decoder adds the c*-prefixed
# cross-attention set). Embeddings, rel-pos tables, norms and lm_head
# stay in the original dtype.
T5_TARGETS = (
    "q", "k", "v", "o", "cq", "ck", "cv", "co",
    "wi", "wi_0", "wi_1", "wo",
)
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


def _quantize_layer_stack(layers: Dict[str, Any], targets, dtype):
    """Symmetric per-output-channel int8 over stacked [L, in, out]
    weights; scales land under ``<name>_scale`` as [L, 1, out]."""
    out = dict(layers)
    for name in targets:
        if name not in out:
            continue
        w = out[name].astype(jnp.float32)  # [L, in, out]
        amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # [L, 1, out]
        amax = jnp.maximum(amax, 1e-8)
        out[name] = (
            jnp.clip(jnp.round(w / amax * 127.0), -127, 127).astype(jnp.int8)
        )
        out[name + SCALE_SUFFIX] = (amax / 127.0).astype(dtype)
    return out


def quantize_decoder_params(params: Dict[str, Any], dtype=jnp.bfloat16):
    """Symmetric per-output-channel int8 quantization of the stacked
    [L, in, out] matmul weights. ``dtype`` is the scale (and dequant)
    dtype. Returns a new param pytree; non-target leaves are shared."""
    out = dict(params)
    out["layers"] = _quantize_layer_stack(params["layers"], QUANT_TARGETS, dtype)
    return out


def is_quantized_t5(params: Dict[str, Any]) -> bool:
    layers = params.get("encoder", {}).get("layers", {})
    return any((t + SCALE_SUFFIX) in layers for t in T5_TARGETS)


def quantize_t5_params(params: Dict[str, Any], dtype=jnp.float32):
    """int8-quantize every encoder/decoder per-layer matmul weight of a
    T5 param pytree (models/t5.py::init_params layout). Scales stay
    f32: the W8A8 kernel's epilogue multiplies them in f32 anyway, and
    the w8a16 fallback casts at the matmul site."""
    out = dict(params)
    for block in ("encoder", "decoder"):
        sub = dict(params[block])
        sub["layers"] = _quantize_layer_stack(sub["layers"], T5_TARGETS, dtype)
        out[block] = sub
    return out
