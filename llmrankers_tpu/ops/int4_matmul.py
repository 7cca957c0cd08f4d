"""Pallas TPU W4A8 matmul: int4 weights, in-kernel int8 activations.

Why this exists: single-chip decode (the Rank-R1 serving path,
/root/reference/Rank-R1/run_setwise.py:95-222's vLLM engine equivalent)
is weight-streaming-bound — throughput ~ HBM bytes per weight. int8
weight-only (models/quant.py) halves bf16's bytes; int4 halves them
again. XLA-level int4 was measured and REJECTED (docs/ARCHITECTURE.md:
nibble-packed int8 with unpack arithmetic decays to 4.5 bytes/weight of
traffic; native ``jnp.int4`` arrays were slower still), so the unpack
must happen in VMEM inside a kernel — this module.

The unpack trick (measured exact, /tmp probe → tests/test_int4_matmul.py):
a packed byte ``p = (hi4 << 4) | lo_u`` satisfies, in 8-bit two's
complement,

    (p << 4) == 16 * lo4        (lo4 = SIGNED int4 of the low nibble)
    (p >> 4) == hi4             (arithmetic shift; byte sign = hi sign)

so with the k-block's weight rows split half/half into lo/hi nibbles,

    x @ W_block == dot(x[:, :bk/2], p << 4) / 16 + dot(x[:, bk/2:], p >> 4)

— TWO half-K int8 MXU dots (same total MXU work as one full-K dot), ONE
VPU shift per packed byte per dot, no sign-extension, no concat, and the
1/16 folds into the f32 accumulation for exact integer results. Mosaic
rejects shifts on int8 vectors, so the shifts run at int32 width and
cast back (still cheap next to the halved DMA).

Quantization recipe (finer-grained than the int8 path):
  * weights: symmetric int4 in [-7, 7], per (k-group, output channel)
    scale with group size = the kernel's k-block (128-512) — i.e.
    group-wise quantization a la GPTQ/AWQ, groups of 128-512;
  * activations: symmetric int8 per (row, k-group), quantized on the
    VPU from the VMEM-resident tile exactly like the W8A8 kernel
    (ops/int8_matmul.py::_kernel_fusedq) — no quantized copy in HBM,
    tile cached across the N loop;
  * accumulation: int32 dots scaled into an f32 accumulator; the
    per-group scales make the k-loop rescale exact.

A W4A8 dot ALSO runs the int8 MXU path (~2x bf16 peak), so prefill —
compute-bound at long L — speeds up too, not just decode.

Sharding: per-device kernel; multi-device GSPMD callers take the XLA
unpack fallback (models/quant.py::wmat handles packed leaves) so
sharding propagation holds — mirroring the int8 kernel's policy.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_CANDIDATES = (512, 256, 128)


def choose_group(K: int) -> int:
    """Largest supported quantization group (= kernel k-block) dividing
    K; 0 when K admits none (caller must not int4-quantize that site)."""
    for g in GROUP_CANDIDATES:
        if K % g == 0:
            return g
    return 0


def pack_int4(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Group-wise symmetric int4 quantization + nibble packing.

    ``w``: [..., K, N] float. Returns (packed [..., K/2, N] int8,
    scales [..., nk, N] f32) where nk = K // choose_group(K) and packed
    row layout per group g is: rows [gG, gG+G/2) in the LOW nibbles,
    rows [gG+G/2, (g+1)G) in the HIGH nibbles — the order the kernel's
    two-dot unpack reconstructs.
    """
    K, N = w.shape[-2], w.shape[-1]
    G = choose_group(K)
    if G == 0:
        raise ValueError(f"int4 needs K divisible by one of {GROUP_CANDIDATES}, got {K}")
    lead = w.shape[:-2]
    wf = w.astype(jnp.float32).reshape(*lead, K // G, G, N)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8)
    scale = amax / 7.0  # [-7, 7]: symmetric, -8 unused
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    lo = q[..., : G // 2, :]
    hi = q[..., G // 2:, :]
    packed = ((lo & 0xF) | (hi << 4)).astype(jnp.int8)
    return (
        packed.reshape(*lead, K // 2, N),
        scale.reshape(*lead, K // G, N),
    )


def unpack_int4(packed: jax.Array, scales: jax.Array) -> jax.Array:
    """XLA dequant fallback: [..., K/2, N] int8 + [..., nk, N] f32 ->
    [..., K, N] float weights. Used off the kernel path (CPU tests,
    multi-device GSPMD); XLA's lowering of this is the measured-slow
    route the kernel exists to avoid — correctness only."""
    Kh, N = packed.shape[-2], packed.shape[-1]
    nk = scales.shape[-2]
    G = 2 * Kh // nk
    lead = packed.shape[:-2]
    p32 = packed.astype(jnp.int32).reshape(*lead, nk, G // 2, N)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    w = q * scales[..., None, :]
    return w.reshape(*lead, 2 * Kh, N)


def _kernel_w4a8(
    x_ref, p_ref, sw_ref, *rest, nk: int, half: int, has_res: bool
):
    """Fused-quantize W4A8 tile kernel. Grid (i, j, k), k fastest:
    the activation tile is quantized once per (i, k) into scratch and
    reused across j (same caching as _kernel_fusedq in int8_matmul)."""
    if has_res:
        res_ref, o_ref, acc_ref, q_ref, s_ref = rest
    else:
        res_ref = None
        o_ref, acc_ref, q_ref, s_ref = rest
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        q_ref[k] = jnp.clip(
            jnp.round(x * pl.reciprocal(scale, approx=False)), -127, 127
        ).astype(jnp.int8)
        s_ref[k] = scale

    p32 = p_ref[:].astype(jnp.int32)  # [bk/2, bn]
    lo16 = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p32, 28), 24
    ).astype(jnp.int8)  # == 16 * lo4
    hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.int8)
    q = q_ref[k]
    d_lo = jnp.dot(q[:, :half], lo16, preferred_element_type=jnp.int32)
    d_hi = jnp.dot(q[:, half:], hi, preferred_element_type=jnp.int32)
    d = d_lo.astype(jnp.float32) * 0.0625 + d_hi.astype(jnp.float32)
    # sw_ref holds ALL nk group-scale rows (a (1, bn) block would break
    # Mosaic's sublane-divisibility rule); index the k-th dynamically.
    acc_ref[:] += d * s_ref[k] * sw_ref[k]

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:]
        if res_ref is not None:
            out = out + res_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm_cap", "bn_cap", "interpret")
)
def _w4a8_matmul_2d(
    x: jax.Array,  # [M, K] bf16/f32
    p4: jax.Array,  # [K/2, N] packed int4
    sw: jax.Array,  # [nk, N] f32 group scales (nk fixes bk = K // nk)
    residual: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    bm_cap: int = 256,
    bn_cap: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = p4.shape[1]
    nk = sw.shape[0]
    bk = K // nk  # fixed by the packing's group size
    if bk * nk != K or bk not in GROUP_CANDIDATES:
        raise ValueError(f"scales shape {sw.shape} inconsistent with K={K}")
    if N % 128:
        raise ValueError(f"int4 matmul needs 128-multiple N, got {N}")
    bn = N if N <= bn_cap else max(
        (t for t in range(128, bn_cap + 1, 128) if N % t == 0), default=0
    )
    if bn == 0:
        raise ValueError(f"no 128-multiple block divisor for N={N}")
    # bf16 x tiles need 16-row multiples; small-M decode pads M little.
    bm = min(bm_cap, max(16, -(-M // 16) * 16))
    xbytes = x.dtype.itemsize

    def _vmem(bm_, bn_):
        res_bytes = 2 * bm_ * bn_ * 2 if residual is not None else 0
        return (
            2 * (bm_ * bk * xbytes + (bk // 2) * bn_)  # dbuf x + packed w
            + 4 * bm_ * bn_  # f32 acc
            + 2 * bm_ * bn_  # out tile
            + res_bytes
            + nk * bm_ * (bk + 4)  # q + s caches
            + nk * bn_ * 4  # full group-scale block
            + bm_ * bk * 4  # f32 temp during quantize
            + 2 * bk * bn_  # int32->int8 unpack temporaries (lo16/hi)
        )

    while bm > 16 and _vmem(bm, bn) > 13 * 2**20:
        bm //= 2
    while bn > 128 and _vmem(bm, bn) > 13 * 2**20:
        bn //= 2
    pad = (-M) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad), (0, 0)))
    Mp = M + pad
    has_res = residual is not None
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bk // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((nk, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, p4, sw.astype(jnp.float32)]
    if has_res:
        in_specs.append(
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    out = pl.pallas_call(
        functools.partial(
            _kernel_w4a8, nk=nk, half=bk // 2, has_res=has_res
        ),
        grid=(Mp // bm, N // bn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((nk, bm, bk), jnp.int8),
            pltpu.VMEM((nk, bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * xbytes + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:M] if pad else out


def quantized_matmul_int4(
    x: jax.Array,  # [..., K] activations
    p4: jax.Array,  # [K/2, N] packed int4
    sw: jax.Array,  # [nk, N] group scales
    residual: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """W4A8 matmul over arbitrary leading dims (see module docstring)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    res2 = None if residual is None else residual.reshape(x2.shape[0], -1)
    out = _w4a8_matmul_2d(
        x2, p4, sw, res2,
        out_dtype=x.dtype if x.dtype != jnp.float32 else jnp.float32,
        interpret=interpret,
    )
    return out.reshape(*lead, -1)
