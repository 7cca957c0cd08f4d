"""Fused decode-step attention over a quantized KV cache (Pallas TPU).

The one-token decode step is cache-bandwidth-bound at serving batches:
every step streams the whole [B, KV, T] K and V cache from HBM. With a
quantized cache the XLA path (engine/generate.py::_cached_qk/_cached_pv)
reads the packed payload once per DOT — for the planar int4 cache that is
TWO reads of the same bytes (one per nibble-plane half-dot), so int4's
decode stream degenerated to int8's (the round-3 honest caveat,
docs/NEXT.md). This kernel fuses qk + online softmax + pv (plus the
current token's unquantized self term) into one pass: each cache tile is
DMA'd once and both nibble planes' dots run from VMEM, so the decode
stream finally matches the cache footprint — int4 = half of int8.

Round 3 rejected this kernel on a measured ~150us/call Pallas overhead;
re-measured this round INSIDE a jitted layer scan the marginal cost is
~5us/call (the 150us was per-dispatch tunnel latency, not per-call), so
36 layers cost ~0.2ms/step against a multi-ms step — VERDICT r3 #7.

Numerics match the XLA path up to online-softmax float association:
per-plane dequant folds after the qk dot (scales are per key position),
the v scale folds into p before the pv dot, and the self term joins the
softmax unquantized — the same placement as _cached_qk/_cached_pv.

Layout notes:
  * scales arrive TRANSPOSED [B, KV, S, T] (S = 1 int8 / 2 int4): S
    sublanes x T lanes tiles cleanly; the natural [.., T, S] layout
    would pad S up to 128 lanes in VMEM (megabytes at long T). The
    transpose costs ~12%% of the int4 payload stream per step — cheaper
    than the 100%% second payload read it replaces.
  * the key-validity mask arrives as an additive fp32 penalty row
    (0 / NEG_INF), flash.py's convention.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
M_FLOOR = -1e28


def _unpack_planes(tile: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """Planar int4 bytes -> (lower, upper) plane values in ``dtype``.
    int32 shifts (sign-extending) — int8 shift support in Mosaic is
    spotty; the widen/narrow fuses into the consuming convert."""
    t = tile.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(t, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(t, 24), 28)
    return lo.astype(dtype), hi.astype(dtype)


def _kernel(
    q_ref,  # [1, 1, G, Dh]
    kp_ref,  # [1, 1, T, Dhp] int8 payload
    ks_ref,  # [1, 1, S, T] fp32 scales (transposed)
    vp_ref,  # [1, 1, T, Dhp]
    vs_ref,  # [1, 1, S, T]
    kn_ref,  # [1, 1, 1, Dh] current token's K (unquantized)
    vn_ref,  # [1, 1, 1, Dh] current token's V
    pen_ref,  # [1, 1, T] fp32 additive penalty (0 valid / NEG_INF masked)
    o_ref,  # [1, 1, G, Dh] fp32
    *,
    scale: float,
    mode: str,  # 'int8' | 'int4'
    tk: int,
    t_total: int,
):
    g, dh = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0]  # [G, Dh]
    dtype = q.dtype
    h = dh // 2
    int4 = mode == "int4"

    m = jnp.full((g, 1), M_FLOOR, jnp.float32)
    l = jnp.zeros((g, 1), jnp.float32)
    if int4:
        acc_lo = jnp.zeros((g, h), jnp.float32)
        acc_hi = jnp.zeros((g, h), jnp.float32)
    else:
        acc = jnp.zeros((g, dh), jnp.float32)

    nt = t_total // tk
    for it in range(nt):
        sl = pl.ds(it * tk, tk)
        kp = kp_ref[0, 0, sl, :]  # [tk, Dhp] int8
        if int4:
            k_lo, k_hi = _unpack_planes(kp, dtype)
            s_lo = jax.lax.dot_general(
                q[:, :h], k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, tk]
            s_hi = jax.lax.dot_general(
                q[:, h:], k_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = (
                s_lo * ks_ref[0, 0, 0, sl][None, :]
                + s_hi * ks_ref[0, 0, 1, sl][None, :]
            )
        else:
            s = jax.lax.dot_general(
                q, kp.astype(dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * ks_ref[0, 0, 0, sl][None, :]
        s = s * scale + pen_ref[0, 0, sl][None, :]

        m_new = jnp.maximum(
            jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True)), M_FLOOR
        )
        p = jnp.exp(s - m_new)  # [G, tk] fp32
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vp = vp_ref[0, 0, sl, :]
        if int4:
            v_lo, v_hi = _unpack_planes(vp, dtype)
            p_lo = (p * vs_ref[0, 0, 0, sl][None, :]).astype(dtype)
            p_hi = (p * vs_ref[0, 0, 1, sl][None, :]).astype(dtype)
            acc_lo = acc_lo * alpha + jax.lax.dot_general(
                p_lo, v_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_hi = acc_hi * alpha + jax.lax.dot_general(
                p_hi, v_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            pv = (p * vs_ref[0, 0, 0, sl][None, :]).astype(dtype)
            acc = acc * alpha + jax.lax.dot_general(
                pv, vp.astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_new

    # Current token's self term, unquantized (its K/V are not in the
    # cache yet) — the scan's rank-1 online-softmax term.
    kn = kn_ref[0, 0]  # [1, Dh]
    vn = vn_ref[0, 0]  # [1, Dh]
    # Elementwise multiply + lane reduce instead of an N=1 dot_general
    # (Mosaic miscompiles the single-column dot's operand broadcast).
    s_self = jnp.sum(
        q.astype(jnp.float32) * kn.astype(jnp.float32),
        axis=1, keepdims=True,
    ) * scale  # [G, 1]
    m_new = jnp.maximum(m, s_self)
    p_self = jnp.exp(s_self - m_new)  # [G, 1]
    alpha = jnp.exp(m - m_new)
    l = l * alpha + p_self
    vn_f = vn.astype(jnp.float32)
    if int4:
        out = jnp.concatenate(
            [
                acc_lo * alpha + p_self * vn_f[:, :h],
                acc_hi * alpha + p_self * vn_f[:, h:],
            ],
            axis=1,
        )
    else:
        out = acc * alpha + p_self * vn_f
    o_ref[0, 0] = (out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "mode", "interpret"))
def kvq_decode_attention(
    qg: jax.Array,  # [B, KV, G, Dh]
    kc: Tuple[jax.Array, jax.Array],  # packed [B,KV,T,Dhp], scales [B,KV,T,S]
    vc: Tuple[jax.Array, jax.Array],
    k_new: jax.Array,  # [B, KV, Dh] current token K (unquantized)
    v_new: jax.Array,  # [B, KV, Dh]
    amask: jax.Array,  # [B, T] bool key validity (incl. window)
    scale: float,
    mode: str,  # 'int8' | 'int4'
    interpret: bool = False,
) -> jax.Array:
    """Fused GQA decode attention against a quantized cache; returns the
    normalized attention output [B, KV, G, Dh] fp32 — drop-in for the
    XLA `_cached_qk`/softmax/`_cached_pv`/self-term block of
    engine/generate.py::_decode_token_forward."""
    B, KV, G, Dh = qg.shape
    kp, ks = kc
    vp, vs = vc
    T = kp.shape[2]

    # Scales to [B, KV, S, T] (see module docstring) and the mask to an
    # additive penalty row.
    ks_t = jnp.swapaxes(ks, 2, 3)
    vs_t = jnp.swapaxes(vs, 2, 3)
    # [B, 1, T]: the singleton middle axis satisfies Mosaic's block rule
    # (flash.py's kv_mask convention).
    pen = ((1.0 - amask.astype(jnp.float32)) * NEG_INF)[:, None, :]

    # Tile the cache length; pad T to the tile multiple (penalty NEG_INF
    # masks the pad keys exactly).
    tk = min(512, T) if T % 512 == 0 or T < 512 else 256
    pad = (-T) % tk
    if pad:
        widths4 = ((0, 0), (0, 0), (0, pad), (0, 0))
        kp = jnp.pad(kp, widths4)
        vp = jnp.pad(vp, widths4)
        ks_t = jnp.pad(ks_t, ((0, 0), (0, 0), (0, 0), (0, pad)))
        vs_t = jnp.pad(vs_t, ((0, 0), (0, 0), (0, 0), (0, pad)))
        pen = jnp.pad(pen, ((0, 0), (0, 0), (0, pad)),
                      constant_values=NEG_INF)
    Tp = T + pad
    Dhp = kp.shape[3]
    S = ks_t.shape[2]

    grid = (KV, B)
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, mode=mode, tk=tk, t_total=Tp
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G, Dh), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dhp), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, S, Tp), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dhp), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, S, Tp), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, 1, Dh), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, 1, Dh), lambda kv, b: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda kv, b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, Dh), lambda kv, b: (b, kv, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, Dh), jnp.float32),
        interpret=interpret,
    )(
        qg, kp, ks_t, vp, vs_t,
        k_new[:, :, None, :], v_new[:, :, None, :], pen,
    )
    return out
