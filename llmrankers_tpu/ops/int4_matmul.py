"""Pallas TPU W4A8 matmul: int4 weights, in-kernel int8 activations.

Why this exists: single-chip decode (the Rank-R1 serving path,
/root/reference/Rank-R1/run_setwise.py:95-222's vLLM engine equivalent)
is weight-streaming-bound — throughput ~ HBM bytes per weight. int8
weight-only (models/quant.py) halves bf16's bytes; int4 halves them
again. XLA-level int4 was measured and REJECTED (docs/ARCHITECTURE.md:
nibble-packed int8 with unpack arithmetic decays to 4.5 bytes/weight of
traffic; native ``jnp.int4`` arrays were slower still), so the unpack
must happen in VMEM inside a kernel — this module.

The unpack trick (on-chip probes: this Mosaic build vectorizes int8
bitwise AND but rejects int8/int16 shifts, multiplies, and subtracts —
everything else must run at 4x-wider int32 lanes, which made a
shift-based unpack VPU-bound and erased the DMA win). The packing is
chosen so BOTH nibble planes extract with a single int8 AND:

    byte p = (hi4 << 4) | (lo4 + 8)     per (k-group, out-channel)

    p & 0xF0 == 16 * hi4                 (signed: high bits ARE the sign)
    p & 0x0F == lo4 + 8                  (unsigned biased low nibble)

With the k-block's weight rows split half/half into lo/hi planes,

    x @ W_block == [ dot(q_hi, p & 0xF0) / 16
                   + dot(q_lo, p & 0x0F) - 8 * rowsum(q_lo) ] * scales

— TWO half-K int8 MXU dots (same total MXU work as one full-K dot), TWO
int8-density ANDs per packed byte, and a per-(row, k-block) activation
row-sum (computed once alongside the activation quantize and cached
across the N loop) that cancels the +8 bias exactly in int32. The 1/16
folds into the f32 accumulation; all integer math is exact.

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
    row layout per group g is: rows [gG, gG+G/2) as BIASED low nibbles
    (lo4 + 8), rows [gG+G/2, (g+1)G) as signed HIGH nibbles — the
    layout the kernel's two-AND unpack reconstructs (module docstring).
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
    lo = q[..., : G // 2, :] + 8  # biased to [1, 15]
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
    lo = (p32 & 0xF) - 8  # biased low nibble (pack_int4 layout)
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    w = q * scales[..., None, :]
    return w.reshape(*lead, 2 * Kh, N)


def _kernel_w4a8(
    x_ref, p_ref, sw_ref, *rest, nk: int, half: int, has_res: bool
):
    """Fused-quantize W4A8 tile kernel. Grid (i, j, k), k fastest: the
    activation tile is quantized once per (i, k) into scratch — along
    with its lo-plane row-sum for the zero-point correction — and
    reused across j (same caching as _kernel_fusedq in int8_matmul)."""
    if has_res:
        res_ref, o_ref, acc_ref, q_ref, s_ref, z_ref = rest
    else:
        res_ref = None
        o_ref, acc_ref, q_ref, s_ref, z_ref = rest
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
        q8 = jnp.clip(
            jnp.round(x * pl.reciprocal(scale, approx=False)), -127, 127
        ).astype(jnp.int8)
        q_ref[k] = q8
        s_ref[k] = scale
        z_ref[k] = 8 * jnp.sum(
            q8[:, :half].astype(jnp.int32), axis=1, keepdims=True
        )

    # Two-AND unpack (module docstring): int8-density bitwise ops only —
    # this Mosaic build has no int8/int16 shifts, muls, or subs, and an
    # int32-width unpack is VPU-bound at decode shapes (measured: erased
    # the halved-DMA win entirely).
    p = p_ref[:]  # [bk/2, bn]
    lo = jax.lax.bitwise_and(p, jnp.int8(0x0F))  # lo4 + 8, in [1, 15]
    hi16 = jax.lax.bitwise_and(p, jnp.int8(-16))  # == 16 * hi4
    q = q_ref[k]
    d_lo = jnp.dot(q[:, :half], lo, preferred_element_type=jnp.int32)
    d_hi = jnp.dot(q[:, half:], hi16, preferred_element_type=jnp.int32)
    d = (d_lo - z_ref[k]).astype(jnp.float32) \
        + d_hi.astype(jnp.float32) * 0.0625
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
    # Balanced ceil-division N tiling: bn need NOT divide N — Pallas
    # masks the partial last tile (garbage stays in dropped columns).
    # Divisor-only tiling forced bn=256 on N=11008 (86 j-tiles x nk
    # k-steps ~ 14k grid steps per decode forward; grid-step overhead
    # erased the DMA win).
    nj = -(-N // bn_cap)
    cols128 = -(-N // 128)
    bn = 128 * (-(-cols128 // nj))
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
            + nk * bm_ * (bk + 8)  # q + s + zsum caches
            + nk * bn_ * 4  # full group-scale block
            + 3 * bm_ * bk * 4  # f32 temps during quantize (x, scaled, q)
            + 2 * bk * bn_  # int8 unpack temporaries (lo/hi16)
            + 3 * 4 * bm_ * bn_  # dot outputs d_lo/d_hi (i32) + d (f32)
        )

    # 10MB budget against the 16MB scoped-vmem limit (Mosaic stacks
    # more temporaries than the terms above; measured 17.7M actual on
    # [12288,11008,2048] when the estimate said 8.3M before the dot-
    # output term was counted — keep headroom).
    while bm > 16 and _vmem(bm, bn) > 10 * 2**20:
        bm //= 2
    while bn > 128 and _vmem(bm, bn) > 10 * 2**20:
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
        grid=(Mp // bm, nj, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((nk, bm, bk), jnp.int8),
            pltpu.VMEM((nk, bm, 1), jnp.float32),
            pltpu.VMEM((nk, bm, 1), jnp.int32),  # 8*rowsum(q_lo)
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
    mesh=None,
) -> jax.Array:
    """W4A8 matmul over arbitrary leading dims (see module docstring).

    Mesh path: COLUMN-parallel only — nibble packing interleaves
    k-groups along the packed input dim, so an input-dim shard would
    split groups; decoder_param_pspecs shards every int4 leaf (and its
    group scales) on the OUTPUT dim for exactly this reason. Under
    shard_map each device unpacks and dots its local N columns
    (collective-free; logically-row-parallel sites pay an activation
    all-gather that GSPMD inserts at the shard_map boundary)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    res2 = None if residual is None else residual.reshape(x2.shape[0], -1)
    out_dtype = x.dtype if x.dtype != jnp.float32 else jnp.float32
    if mesh is not None and mesh.devices.size > 1:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from .int8_matmul import dp_spec

        ds = dp_spec(mesh)
        has_res = res2 is not None

        def run(x_, p_, s_, r_=None):
            return _w4a8_matmul_2d(
                x_, p_, s_, r_, out_dtype=out_dtype, interpret=interpret
            )

        in_specs = [P(ds, None), P(None, "model"), P(None, "model")]
        args = [x2, p4, sw]
        if has_res:
            in_specs.append(P(ds, "model"))
            args.append(res2)
        out = shard_map(
            run, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=P(ds, "model"), check_rep=False,
        )(*args)
    else:
        out = _w4a8_matmul_2d(
            x2, p4, sw, res2, out_dtype=out_dtype, interpret=interpret,
        )
    return out.reshape(*lead, -1)
