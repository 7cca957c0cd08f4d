"""Attention ops: reference XLA path + Pallas TPU flash kernel dispatch.

The XLA path is the semantic definition (and the CPU/test path); the
Pallas kernel in :mod:`.flash` is a drop-in for TPU when shapes allow.
Supports the additive-bias form required by T5 relative position bias
(the main divergence from stock causal-flash kernels — SURVEY.md §7).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask value, safe in bf16


def mha(
    q: jax.Array,  # [B, H, Lq, Dh]
    k: jax.Array,  # [B, H, Lk, Dh]
    v: jax.Array,  # [B, H, Lk, Dh]
    mask: Optional[jax.Array] = None,  # [B, 1|H, Lq, Lk] bool (XLA path only)
    kv_mask: Optional[jax.Array] = None,  # [B, Lk] {0,1} key validity
    causal: bool = False,
    bias: Optional[jax.Array] = None,  # [1|B, H, Lq, Lk] additive (T5 rel bias)
    scale: Optional[float] = None,  # None -> 1/sqrt(Dh); T5 passes 1.0
    use_flash: bool = False,
    mesh=None,  # Mesh for TP/DP shard_map dispatch of the flash kernel
    window: Optional[int] = None,  # sliding window (causal only; Mistral)
) -> jax.Array:
    """Multi-head attention. Returns [B, H, Lq, Dh].

    GQA-native: ``k``/``v`` may carry fewer (KV) heads than ``q``. The
    flash kernel consumes them directly (no repeated-K/V materialization
    — see flash.flash_mha); the XLA path repeats here.

    Masking is expressed structurally (``kv_mask`` + ``causal`` +
    ``window``) so the Pallas flash kernel can consume it without
    materializing a dense [B, H, Lq, Lk] mask; a dense ``mask`` is still
    accepted on the XLA path. ``window`` bounds causal attention to the
    previous `window` positions in INDEX space — valid for a single
    contiguously-padded block (left or right), where index deltas equal
    position deltas for real tokens; callers with padding holes
    (shared-prefix prefill) build a dense positional mask instead.
    Softmax accumulates in fp32 regardless of input dtype (see
    SURVEY.md §7 'hard parts' #5).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if window is not None and not causal:
        raise ValueError("window requires causal attention")
    # Flash targets the hot op — long-sequence encoder/prefill attention.
    # Short decoder steps stay on XLA (kernel launch overhead dominates,
    # and each extra shape costs a Mosaic compile).
    if use_flash and mask is None and q.shape[2] >= 128:
        multi = mesh is not None and mesh.devices.size > 1
        # shard_map layout: batch over 'data', heads over 'model'. Uneven
        # shards can't be expressed — fall through to the XLA path then
        # (never run the unsharded kernel inside a sharded program).
        even = not multi or (
            q.shape[0] % mesh.shape.get("data", 1) == 0
            and q.shape[1] % mesh.shape.get("model", 1) == 0
            and k.shape[1] % mesh.shape.get("model", 1) == 0
        )
        if even:
            from .flash import flash_mha  # lazy: pallas import on TPU path

            return flash_mha(
                q, k, v, kv_mask=kv_mask, causal=causal, bias=bias,
                scale=scale, mesh=mesh if multi else None, window=window,
            )

    if k.shape[1] != q.shape[1]:  # GQA repeat for the XLA path only
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    dtype = q.dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * jnp.asarray(scale, dtype=scores.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if kv_mask is not None:
        scores = jnp.where(kv_mask.astype(bool)[:, None, None, :], scores, NEG_INF)
    if causal:
        Lq, Lk = q.shape[2], k.shape[2]
        rel = jnp.arange(Lq)[:, None] + (Lk - Lq) - jnp.arange(Lk)[None, :]
        tri = rel >= 0
        if window is not None:
            tri = tri & (rel < window)
        scores = jnp.where(tri[None, None], scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


def mha_flat(
    q: jax.Array,  # [B, Lq, H*Dh] — as the qkv projections produce them
    k: jax.Array,  # [B, Lk, H*Dh]
    v: jax.Array,
    num_heads: int,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    bias: Optional[jax.Array] = None,  # [1, H, Lq, Lk]
    scale: Optional[float] = None,
    use_flash: bool = False,
    mesh=None,
) -> jax.Array:
    """Attention over the projection-natural [B, L, H*Dh] layout.

    On the flash path this is transpose-free end to end: the blhd kernel
    lane-slices heads out of the flat dim (ops/flash.py::_kernel_blhd),
    so the [B,L,H,D] -> [B,H,L,D] head transposes — measured ~37ms of
    pure layout copies per xl batch — never exist. The XLA fallback
    reshapes/transposes internally (exactly the previous cost)."""
    B, Lq, HD = q.shape
    Dh = HD // num_heads
    if scale is None:
        scale = Dh**-0.5
    hg = 128 // _gcd_int(Dh, 128)
    flash_ok = (
        use_flash
        and Lq >= 128
        and HD % 128 == 0
        and num_heads % hg == 0
        and Dh % 8 == 0
    )
    if flash_ok:
        multi = mesh is not None and mesh.devices.size > 1
        even = not multi or (
            B % mesh.shape.get("data", 1) == 0
            and num_heads % (hg * mesh.shape.get("model", 1)) == 0
            and HD % (128 * mesh.shape.get("model", 1)) == 0
        )
        if even:
            from .flash import flash_mha_blhd

            return flash_mha_blhd(
                q, k, v, num_heads, kv_mask=kv_mask, causal=causal,
                bias=bias, scale=scale, mesh=mesh if multi else None,
            )
    # XLA fallback: classic split-heads path.
    def split(x, L):
        return x.reshape(B, L, num_heads, Dh).transpose(0, 2, 1, 3)

    out = mha(
        split(q, Lq), split(k, k.shape[1]), split(v, v.shape[1]),
        kv_mask=kv_mask, causal=causal, bias=bias, scale=scale,
        use_flash=False,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, HD)


def _gcd_int(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def make_causal_mask(length: int) -> jax.Array:
    """[1, 1, L, L] lower-triangular bool mask."""
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return (j <= i)[None, None, :, :]


def make_padding_mask(attn_mask: jax.Array) -> jax.Array:
    """[B, Lk] {0,1} -> [B, 1, 1, Lk] bool key-side mask."""
    return attn_mask.astype(bool)[:, None, None, :]


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """T5/Llama-style RMSNorm (no mean subtraction, no bias), fp32 stats."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def gelu_new(x: jax.Array) -> jax.Array:
    """HF 'gelu_new' (tanh approximation), used by flan-t5 gated FFN."""
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * jnp.power(x, 3.0))))
    )


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float, dtype=jnp.float32
):
    """cos/sin tables for RoPE at the given positions: [..., head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, H, L, Dh]; cos/sin: [B, L, Dh] (broadcast over heads)."""
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    return x * cos + rotate_half(x) * sin
