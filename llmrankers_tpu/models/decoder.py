"""From-scratch JAX decoder-only transformer (Llama / Qwen2 / Qwen3).

TPU-native replacement for the HF ``AutoModelForCausalLM`` paths the
reference uses for setwise/pairwise/listwise Llama scoring
(setwise.py:159-177, pairwise.py:105-129, listwise.py:261-271) and for the
vLLM engine behind Rank-R1 (setwise.py:450-454). RoPE + RMSNorm + GQA +
SwiGLU; optional qkv bias (Qwen2) and q/k head-norm (Qwen3). Layer loop is
``lax.scan`` over stacked per-layer leaves.

Left-padding aware: positions derive from the attention mask, matching the
reference's ``padding_side = 'left'`` batch generation (pairwise.py:71).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import apply_rope, mha, rms_norm, rope_cos_sin
from .config import DecoderConfig
from .quant import embed_rows as quant_embed_rows, qmm, swiglu_ffn

Params = Dict[str, Any]


def _split_heads(x: jax.Array, n_heads: int, head_dim: int) -> jax.Array:
    b, l, _ = x.shape
    return x.reshape(b, l, n_heads, head_dim).transpose(0, 2, 1, 3)


def positions_from_mask(attn_mask: jax.Array) -> jax.Array:
    """[B, L] {0,1} -> position ids, 0-based from the first real token."""
    return jnp.maximum(jnp.cumsum(attn_mask, axis=-1) - 1, 0)


def forward(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jax.Array,  # [B, L]
    attn_mask: jax.Array,  # [B, L] {0,1}
) -> jax.Array:
    """Causal LM forward -> logits [B, L, V]."""
    hidden, _ = forward_hidden(params, cfg, input_ids, attn_mask)
    return lm_logits(params, cfg, hidden)


def forward_hidden(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jax.Array,
    attn_mask: jax.Array,
    tap_idx: Optional[jax.Array] = None,
):
    """Returns (final hidden states [B, L, D], positions [B, L]).

    ``tap_idx`` ([S] int32 indices into the flattened [B*L] token axis)
    is a calibration-only side channel (models/awq.py): the return
    gains a third element — per-layer input-activation samples for
    every quantizable matmul-site group, stacked [Lyr, S, ·] by the
    layer scan. The branch is trace-static: with tap_idx=None (every
    production path) the compiled program is unchanged.
    """
    B, L = input_ids.shape
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    x = quant_embed_rows(params, input_ids)
    pos = positions_from_mask(attn_mask)
    cos, sin = rope_cos_sin(pos, Dh, cfg.rope_theta, dtype=x.dtype)
    # Sliding window (Mistral): index-space masking is exact here because
    # the batch is contiguously left-padded. Static no-op when the block
    # fits inside the window (the common rerank-prompt case).
    win = cfg.sliding_window
    win = win if (win is not None and L > win) else None

    def layer(h, lp):
        hn = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(lp, "wq", hn, cfg.qkernels, cfg.flash_mesh)
        k = qmm(lp, "wk", hn, cfg.qkernels, cfg.flash_mesh)
        v = qmm(lp, "wv", hn, cfg.qkernels, cfg.flash_mesh)
        if cfg.attention_bias:
            q = q + lp["bq"]
            k = k + lp["bk"]
            v = v + lp["bv"]
        q = _split_heads(q, H, Dh)
        k = _split_heads(k, KV, Dh)
        v = _split_heads(v, KV, Dh)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # K/V stay at KV heads: the flash kernel reads them GQA-native
        # and the XLA path repeats internally (ops/attention.py::mha).
        a = mha(q, k, v, kv_mask=attn_mask, causal=True, scale=Dh**-0.5,
                use_flash=cfg.use_flash, mesh=cfg.flash_mesh, window=win)
        a = a.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)
        attn_in = hn  # tap: shared input of wq/wk/wv (post-ln1)
        h = h + qmm(lp, "wo", a, cfg.qkernels, cfg.flash_mesh)
        hn = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        if tap_idx is None:
            f = swiglu_ffn(lp, hn, cfg.qkernels, cfg.flash_mesh)
            return h + f, None
        # Tap branch (calibration only; unquantized params, so this
        # decomposition IS swiglu_ffn's dispatch path): expose the FFN
        # intermediate g — w_down's input — which swiglu_ffn hides.
        g = jax.nn.silu(
            qmm(lp, "w_gate", hn, cfg.qkernels, cfg.flash_mesh)
        ) * qmm(lp, "w_up", hn, cfg.qkernels, cfg.flash_mesh)
        f = qmm(lp, "w_down", g, cfg.qkernels, cfg.flash_mesh)

        def _sample(t):
            return t.reshape(-1, t.shape[-1])[tap_idx]

        return h + f, (_sample(attn_in), _sample(a), _sample(hn),
                       _sample(g))

    x, taps = jax.lax.scan(layer, x, params["layers"])
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if tap_idx is None:
        return x, pos
    return x, pos, dict(
        zip(("attn_in", "o_in", "ffn_in", "down_in"), taps)
    )


def lm_logits(params: Params, cfg: DecoderConfig, hidden: jax.Array) -> jax.Array:
    # int8-head dispatch (models/quant.py::_quantize_head): dot the int8
    # bytes, apply the per-token scale to the logit columns after — XLA
    # fuses, so the head streams at half bytes each decode step.
    if cfg.tie_word_embeddings:
        w = params["embed"]
        s = params.get("embed_scale")
        if s is None:
            return hidden @ w.T
        return (hidden @ w.T.astype(s.dtype)) * s.T
    w = params["lm_head"]
    s = params.get("lm_head_scale")
    if s is None:
        return hidden @ w
    return (hidden @ w.astype(s.dtype)) * s


def label_logits(
    params: Params, cfg: DecoderConfig, hidden: jax.Array, label_ids: jax.Array
) -> jax.Array:
    """Logits for selected label tokens only ([D, K] matmul, not [D, V])."""
    if cfg.tie_word_embeddings:
        w = quant_embed_rows(params, label_ids).T
    else:
        w = params["lm_head"][:, label_ids]
        s = params.get("lm_head_scale")
        if s is not None:
            w = w.astype(s.dtype) * s[:, label_ids]
    return hidden @ w


def init_params(cfg: DecoderConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 32))
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    Lyr = cfg.num_hidden_layers

    def nrm(shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5 if len(shape) > 2 else 0.02)
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    layers: Params = {
        "ln1": jnp.ones((Lyr, D), dtype),
        "ln2": jnp.ones((Lyr, D), dtype),
        "wq": nrm((Lyr, D, H * Dh)),
        "wk": nrm((Lyr, D, KV * Dh)),
        "wv": nrm((Lyr, D, KV * Dh)),
        "wo": nrm((Lyr, H * Dh, D)),
        "w_gate": nrm((Lyr, D, F)),
        "w_up": nrm((Lyr, D, F)),
        "w_down": nrm((Lyr, F, D)),
    }
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((Lyr, H * Dh), dtype)
        layers["bk"] = jnp.zeros((Lyr, KV * Dh), dtype)
        layers["bv"] = jnp.zeros((Lyr, KV * Dh), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((Lyr, Dh), dtype)
        layers["k_norm"] = jnp.ones((Lyr, Dh), dtype)
    params: Params = {
        "embed": nrm((cfg.vocab_size, D), 0.02),
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm((D, cfg.vocab_size), D**-0.5)
    return params
