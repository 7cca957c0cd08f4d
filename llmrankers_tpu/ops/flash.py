"""Pallas TPU flash attention with additive-bias (T5 rel-pos) support.

The hot op of the framework: encoder self-attention over 512-2048-token
comparison prompts. Standard two-matmul online-softmax flash schedule —
one grid program per (batch, head, q-tile), K/V streamed through VMEM —
extended with:
  * an additive bias tile read from a [H, Lq, Lk] table (T5 relative
    position bias must be fused into the tile loop; SURVEY.md §7 hard
    part #2);
  * structural masking: per-row key-validity vector (padding, left or
    right) and/or a causal predicate, so no dense [B,H,Lq,Lk] mask is
    ever materialized.

fp32 accumulation; bf16 (or input dtype) matmul operands feed the MXU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    q_ref,  # [TQ, Dh]
    k_ref,  # [Lk, Dh]
    v_ref,  # [Lk, Dh]
    kvm_ref,  # [1, Lk] int32 or None
    bias_ref,  # [TQ, Lk] or None
    o_ref,  # [TQ, Dh]
    *,
    scale: float,
    causal: bool,
    tk: int,
    lq: int,
    lk: int,
):
    tq, dh = q_ref.shape
    iq = pl.program_id(2)
    q = q_ref[:].astype(jnp.float32) * scale

    m = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((tq, 1), jnp.float32)
    acc = jnp.zeros((tq, dh), jnp.float32)

    row_ids = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)

    nk = lk // tk
    for kt in range(nk):
        k_tile = k_ref[pl.ds(kt * tk, tk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, TK]
        if bias_ref is not None:
            s = s + bias_ref[:, pl.ds(kt * tk, tk)].astype(jnp.float32)
        col_ids = kt * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        valid = jnp.ones((tq, tk), jnp.bool_)
        if kvm_ref is not None:
            valid = jnp.logical_and(
                valid, (kvm_ref[0, pl.ds(kt * tk, tk)] > 0)[None, :]
            )
        if causal:
            # Query position i attends to key positions <= i + (Lk - Lq).
            valid = jnp.logical_and(valid, col_ids <= row_ids + (lk - lq))
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # Explicit re-mask: in a fully-masked tile s == m_new == NEG_INF
        # and exp(s - m_new) would be 1, not 0.
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[pl.ds(kt * tk, tk), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    # Fully-masked rows (padded queries) have l == 0; emit zeros.
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[:] = out.astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k")
)
def flash_mha(
    q: jax.Array,  # [B, H, Lq, Dh]
    k: jax.Array,  # [B, H, Lk, Dh]
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,  # [B, Lk] {0,1}
    causal: bool = False,
    bias: Optional[jax.Array] = None,  # [1, H, Lq, Lk] (batch-invariant)
    scale: float = 1.0,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    if bias is not None and bias.shape[0] != 1:
        raise ValueError("flash path requires batch-invariant bias")

    tq = min(block_q, max(Lq, 8))
    tk = min(block_k, max(Lk, 128))
    # Pad sequence dims to tile multiples; padded keys are masked off via
    # kv_mask (which we materialize if padding is added).
    q_p = _pad_to(q, 2, tq)
    k_p = _pad_to(k, 2, tk)
    v_p = _pad_to(v, 2, tk)
    Lq_p, Lk_p = q_p.shape[2], k_p.shape[2]
    if Lk_p != Lk and kv_mask is None:
        kv_mask = jnp.ones((B, Lk), jnp.int32)
    if kv_mask is not None:
        kv_mask = _pad_to(kv_mask.astype(jnp.int32), 1, tk)[:, None, :]  # [B,1,Lk_p]

    bias_p = None
    if bias is not None:
        bias_p = _pad_to(_pad_to(bias[0], 1, tq), 2, tk)  # [H, Lq_p, Lk_p]

    grid = (B, H, Lq_p // tq)
    in_specs = [
        pl.BlockSpec((1, 1, tq, Dh), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Lk_p, Dh), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Lk_p, Dh), lambda b, h, i: (b, h, 0, 0)),
    ]
    args = [q_p, k_p, v_p]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, Lk_p), lambda b, h, i: (b, 0, 0)))
        args.append(kv_mask)
    if bias_p is not None:
        in_specs.append(pl.BlockSpec((1, tq, Lk_p), lambda b, h, i: (h, i, 0)))
        args.append(bias_p)

    def kernel(*refs):
        idx = 3
        kvm_ref = refs[idx] if kv_mask is not None else None
        idx += kv_mask is not None
        bias_ref = refs[idx] if bias_p is not None else None
        o_ref = refs[-1]
        _kernel(
            refs[0].at[0, 0], refs[1].at[0, 0], refs[2].at[0, 0],
            kvm_ref.at[0] if kvm_ref is not None else None,
            bias_ref.at[0] if bias_ref is not None else None,
            o_ref.at[0, 0],
            scale=scale, causal=causal, tk=tk, lq=Lq_p, lk=Lk_p,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, Dh), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_p, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq_p * Lk_p * Dh,
            bytes_accessed=(q_p.size + k_p.size + v_p.size) * q_p.dtype.itemsize,
            transcendentals=B * H * Lq_p * Lk_p,
        ),
    )(*args)
    return out[:, :, :Lq, :]
