"""Pallas TPU int8 x int8 MXU matmul for quantized scoring (W8A8).

Why this exists: the flan-t5-xl setwise bench is COMPUTE-bound — the bf16
batched engine measures ~0.55-0.6 MFU, i.e. near the bf16 MXU roofline —
so the only remaining single-chip throughput lever is precision: the v5e
MXU's int8 path has ~2x the bf16 peak (394 vs 197 TOPS). XLA will not
take it from jnp.dot on int8 operands (measured ~8 TFLOP/s — a VPU
lowering), and XLA-level dequantization keeps the matmul in bf16
(measured ~108 TFLOP/s, the bf16 roofline). Mosaic DOES lower an int8
jnp.dot inside a Pallas kernel to the native int8 MXU op: this kernel
measures ~165 TFLOP/s on the xl encoder GEMM shapes — 1.5x the bf16
path (see docs/ARCHITECTURE.md int8 section for the sweep).

Recipe (standard W8A8 dynamic quantization):
  * weights: symmetric per-OUTPUT-CHANNEL int8, quantized once at load
    (models/quant.py), stored [K, N] int8 + [1, N] f32 scales;
  * activations: symmetric per-ROW (= per-token) int8, quantized
    dynamically right before the matmul (cheap fused VPU work);
  * kernel: int8 x int8 -> int32 accumulation on the MXU, K-blocked
    into a VMEM scratch accumulator, with the row*col rescale to the
    output dtype fused into the final K-step epilogue (so only 2-byte
    outputs ever cross HBM).

The reference reaches the same class of optimization by delegating to
fp16 HF / vLLM quantization (/root/reference/llmrankers/setwise.py:46-50);
here it is a first-party TPU kernel.

Sharding: the kernel is invoked per-device. Multi-device callers pass
``mesh`` + ``partition`` and the wrapper runs the SAME per-device kernel
under ``shard_map`` (mirroring ops/flash.py): column-parallel sites
(q/k/v, FFN in) shard the weight's N axis over 'model' with no
collectives; row-parallel sites (o, FFN out) shard K over 'model',
quantize activations per-shard (finer row scales than single-chip —
strictly more accurate), and ``psum`` the f32 partials over ICI before
the residual add. This replaces the reference's vLLM quantization x
tensor_parallel_size composition (Rank-R1/run_setwise.py:109,125) with
a first-party kernel that rides the mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor(n: int, cap: int, step: int = 128) -> int:
    """Largest multiple of ``step`` that divides ``n`` and is <= cap.
    Returns 0 when none exists (caller falls back to XLA)."""
    best = 0
    t = step
    while t <= min(n, cap):
        if n % t == 0:
            best = t
        t += step
    return best


# ---------------------------------------------------------------------------
# Mesh plumbing shared by every quantized-kernel wrapper (int8/int4/gated)
# ---------------------------------------------------------------------------
def dp_spec(mesh):
    """PartitionSpec entry for the flattened-M (batch*seq) axis: over
    ('replica', 'data') when the hybrid axis exists, else 'data'."""
    axes = tuple(a for a in ("replica", "data") if a in mesh.axis_names)
    return axes if len(axes) > 1 else (axes[0] if axes else None)


def dp_size(mesh) -> int:
    return mesh.shape.get("replica", 1) * mesh.shape.get("data", 1)


def tp_size(mesh) -> int:
    return mesh.shape.get("model", 1)


def kernel_mesh_ok(mesh, m: int, k: int, n: int, partition: str) -> bool:
    """Static guard for the shard_map kernel path: every device's LOCAL
    shard must still satisfy the single-device kernel's shape rules
    (128-multiple K/N with a valid block divisor) and carry enough rows
    that the int8 MXU pays (local M >= 1024 — small-M shards are
    weight-streaming-bound and belong on the fused dequant path).
    Callers fall back to the XLA w8a16 dequant when this says no."""
    if mesh is None or mesh.devices.size <= 1:
        return True
    if "model" not in mesh.axis_names:
        return False
    dp = dp_size(mesh)
    tp = tp_size(mesh)
    if m % dp or (m // dp) < 1024:
        return False
    if partition == "row":
        return k % (tp * 128) == 0 and n % 128 == 0
    return n % (tp * 128) == 0 and k % 128 == 0


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row int8 quantization: [M, K] -> (int8
    values [M, K], f32 scales [M, 1]). Pure VPU work; XLA fuses it into
    the producing op."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn_cap", "bk_cap", "interpret")
)
def int8_matmul(
    x8: jax.Array,  # [M, K] int8
    sx: jax.Array,  # [M, 1] f32 row scales
    w8: jax.Array,  # [K, N] int8
    sw: jax.Array,  # [1, N] f32 column scales
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn_cap: int = 2048,
    bk_cap: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """[M, K] @ [K, N] on the int8 MXU -> [M, N] ``out_dtype``.

    M is padded up to a ``bm`` multiple (pad rows sliced off); K and N
    must admit 128-multiple block divisors (every T5/decoder GEMM here
    does — all dims are 128-multiples) or the caller should use the XLA
    dequant fallback. Block defaults are the measured sweep optimum on
    v5e (BM=256, BN=2048, full-K blocks up to 2048).
    """
    M, K = x8.shape
    N = w8.shape[1]
    bn = _largest_divisor(N, bn_cap)
    bk = _largest_divisor(K, bk_cap)
    if bn == 0 or bk == 0:
        raise ValueError(
            f"int8_matmul needs 128-multiple divisible K/N, got {K}x{N}"
        )
    # VMEM guard: double-buffered input tiles + int32 acc scratch +
    # double-buffered out tile. Shrink bm first: on this chip the
    # (bm=256, bk=2048, bn=1024) combo Mosaic produces for shrunken-bn
    # square shapes is pathologically slow (61ms vs 1.6ms — see
    # docs/ARCHITECTURE.md int8 sweep), while halving bm stays fast.
    def _vmem(bm_, bn_):
        return 2 * (bm_ * bk + bk * bn_) + 4 * bm_ * bn_ + 4 * bm_ * bn_

    while bm > 128 and _vmem(bm, bn) > 14 * 2**20:
        bm //= 2
    while bn > 128 and _vmem(bm, bn) > 14 * 2**20:
        bn //= 2
    pad = (-M) % bm
    if pad:
        x8 = jnp.pad(x8, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)))
    Mp = M + pad
    nk = K // bk
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(Mp // bm, N // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K + K * N + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, w8, sx, sw)
    return out[:M] if pad else out


def _kernel_fusedq(
    x_ref, w_ref, sw_ref, *rest, nk: int, has_res: bool
):
    """bf16-activation variant: per-row scales are computed from the
    VMEM-resident x tile and the int8 quantization happens on the VPU,
    so NO quantized copy of the activation ever exists in HBM. With
    K-blocking (nk > 1) each k-block gets its own row scale (finer
    granularity than whole-row — strictly more accurate) and the
    accumulator is f32 so per-block scales fold into the accumulation.

    The quantized tile is cached in scratch per (i, k) and reused across
    the j loop (grid order makes k fastest, j middle), so the VPU
    quantize runs once per x tile instead of N/bn times — profiling v2
    showed the redundant re-quantize costing ~35% of kernel time at the
    wide-N sites.

    ``has_res``: a residual tile rides the epilogue (out = acc*sw + res),
    fusing the transformer block's residual add into the kernel — the
    separate XLA add plus the VMEM staging of the residual stream
    disappear from the layer."""
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

    d = jnp.dot(q_ref[k], w_ref[:], preferred_element_type=jnp.int32)
    acc_ref[:] += d.astype(jnp.float32) * s_ref[k]

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:] * sw_ref[:]
        if res_ref is not None:
            out = out + res_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn_cap", "bk_cap", "interpret")
)
def _fusedq_matmul_2d(
    x: jax.Array,  # [M, K] bf16/f32
    w8: jax.Array,  # [K, N] int8
    sw: jax.Array,  # [1, N] f32
    residual: Optional[jax.Array] = None,  # [M, N], added in the epilogue
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn_cap: int = 2048,
    bk_cap: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = w8.shape[1]
    bn = _largest_divisor(N, bn_cap)
    bk = _largest_divisor(K, bk_cap)
    if bn == 0 or bk == 0:
        raise ValueError(
            f"int8_matmul needs 128-multiple divisible K/N, got {K}x{N}"
        )
    xbytes = x.dtype.itemsize

    def _vmem(bm_, bk_, bn_):
        # double-buffered inputs (+ residual tile) + f32 acc + cached q/s
        # + out + in-kernel f32 temporary of the x tile during the j==0
        # quantize
        nk_ = K // bk_
        res_bytes = 2 * bm_ * bn_ * 2 if residual is not None else 0
        return (
            2 * (bm_ * bk_ * xbytes + bk_ * bn_)
            + 4 * bm_ * bn_ + 4 * bm_ * bn_ + res_bytes
            + nk_ * bm_ * (bk_ + 4)
            + bm_ * bk_ * 4
        )

    while bk > 1024 and _vmem(bm, bk, bn) > 13 * 2**20:
        bk //= 2
    while bm > 128 and _vmem(bm, bk, bn) > 13 * 2**20:
        bm //= 2
    while bn > 128 and _vmem(bm, bk, bn) > 13 * 2**20:
        bn //= 2
    pad = (-M) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad), (0, 0)))
    Mp = M + pad
    nk = K // bk
    has_res = residual is not None
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, w8, sw]
    if has_res:
        in_specs.append(
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    out = pl.pallas_call(
        functools.partial(_kernel_fusedq, nk=nk, has_res=has_res),
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
            bytes_accessed=Mp * K * xbytes + K * N + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:M] if pad else out


def _sharded_fusedq(x2, w8, sw, res2, mesh, partition, out_dtype, interpret):
    """Run _fusedq_matmul_2d per-device under shard_map.

    col: w/sw shard on N over 'model', x replicated over 'model' (its M
         rows shard over the data axes) — collective-free, each device
         emits its N-slice of the output.
    row: x and w shard on K over 'model'; each device quantizes its
         LOCAL activation rows (per-shard row scales — finer than the
         single-chip whole-row scale), accumulates f32, and the partials
         psum over ICI. The residual is added AFTER the psum (adding it
         per-device would count it tp times)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ds = dp_spec(mesh)
    has_res = res2 is not None
    if partition == "row":
        in_specs = [P(ds, "model"), P("model", None), P(None, None)]
        out_specs = P(ds, None)

        def run(x_, w_, s_, r_=None):
            o = _fusedq_matmul_2d(
                x_, w_, s_, None, out_dtype=jnp.float32,
                interpret=interpret,
            )
            o = jax.lax.psum(o, "model")
            if r_ is not None:
                o = o + r_.astype(jnp.float32)
            return o.astype(out_dtype)

        if has_res:
            in_specs.append(P(ds, None))
    else:
        in_specs = [P(ds, None), P(None, "model"), P(None, "model")]
        out_specs = P(ds, "model")

        def run(x_, w_, s_, r_=None):
            return _fusedq_matmul_2d(
                x_, w_, s_, r_, out_dtype=out_dtype, interpret=interpret
            )

        if has_res:
            in_specs.append(P(ds, "model"))
    args = [x2, w8, sw] + ([res2] if has_res else [])
    return shard_map(
        run, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_rep=False,
    )(*args)


def quantized_matmul(
    x: jax.Array,  # [..., K] bf16/f32 activations
    w8: jax.Array,  # [K, N] int8
    sw: jax.Array,  # [1, N] weight column scales
    residual: Optional[jax.Array] = None,  # [..., N] fused epilogue add
    interpret: bool = False,
    mesh=None,  # jax.sharding.Mesh with a 'model' axis, or None
    partition: str = "col",  # weight sharding: 'col' (N) | 'row' (K)
) -> jax.Array:
    """Dynamic-activation W8A8 matmul over arbitrary leading dims.

    The activation is quantized INSIDE the kernel (see _kernel_fusedq):
    profiling the first integration showed the XLA-side quantize —
    f32 materializations, abs-reduce passes, int8 clamp/convert writes,
    and the layout copies they force — cost MORE than the int8 MXU
    saved (docs/ARCHITECTURE.md int8 section).

    With ``mesh`` spanning >1 device the kernel runs per-device under
    shard_map (see _sharded_fusedq); callers gate on kernel_mesh_ok."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    res2 = None if residual is None else residual.reshape(x2.shape[0], -1)
    out_dtype = x.dtype if x.dtype != jnp.float32 else jnp.float32
    if mesh is not None and mesh.devices.size > 1:
        out = _sharded_fusedq(
            x2, w8, sw.astype(jnp.float32), res2, mesh, partition,
            out_dtype, interpret,
        )
    else:
        out = _fusedq_matmul_2d(
            x2, w8, sw.astype(jnp.float32), res2,
            out_dtype=out_dtype, interpret=interpret,
        )
    return out.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# Gated-FFN fused kernel: act(x @ w0) * (x @ w1) in one pass
# ---------------------------------------------------------------------------
def _act(name: str, h: jax.Array) -> jax.Array:
    if name == "gelu_new":
        # tanh GeLU, matching ops/attention.py::gelu_new (HF gelu_new).
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    if name == "relu":
        return jnp.maximum(h, 0.0)
    if name == "silu":
        return h * jax.nn.sigmoid(h)
    raise ValueError(f"unknown activation {name!r}")


def _kernel_gated(
    x_ref, w0_ref, w1_ref, s0_ref, s1_ref, o_ref,
    acc0_ref, acc1_ref, q_ref, s_ref, *, nk: int, act: str
):
    """Gated-FFN body: both halves of the gate share the SAME quantized
    x tile (cached in scratch exactly like _kernel_fusedq), accumulate
    into two f32 accumulators, and the epilogue writes act(h0)*h1
    directly — the [M, 2N] intermediate that the split path writes to
    and re-reads from HBM (671MB per xl encoder batch) never exists."""
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc0_ref[:] = jnp.zeros_like(acc0_ref)
        acc1_ref[:] = jnp.zeros_like(acc1_ref)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        q_ref[k] = jnp.clip(
            jnp.round(x * pl.reciprocal(scale, approx=False)), -127, 127
        ).astype(jnp.int8)
        s_ref[k] = scale

    d0 = jnp.dot(q_ref[k], w0_ref[:], preferred_element_type=jnp.int32)
    d1 = jnp.dot(q_ref[k], w1_ref[:], preferred_element_type=jnp.int32)
    acc0_ref[:] += d0.astype(jnp.float32) * s_ref[k]
    acc1_ref[:] += d1.astype(jnp.float32) * s_ref[k]

    @pl.when(k == nk - 1)
    def _():
        h0 = acc0_ref[:] * s0_ref[:]
        h1 = acc1_ref[:] * s1_ref[:]
        o_ref[:] = (_act(act, h0) * h1).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "bm", "bn_cap", "bk_cap", "interpret"),
)
def _gated_matmul_2d(
    x: jax.Array,   # [M, K] bf16/f32
    wp: jax.Array,  # [K, 2N] int8 — w0 | w1 packed along the output axis
    sp: jax.Array,  # [1, 2N] f32 column scales, packed the same way
    act: str = "gelu_new",
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn_cap: int = 512,
    bk_cap: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = wp.shape[1] // 2
    bn = _largest_divisor(N, bn_cap)
    bk = _largest_divisor(K, bk_cap)
    if bn == 0 or bk == 0:
        raise ValueError(
            f"gated_matmul needs 128-multiple divisible K/N, got {K}x{N}"
        )
    xbytes = x.dtype.itemsize

    def _vmem(bm_, bk_, bn_):
        nk_ = K // bk_
        return (
            2 * (bm_ * bk_ * xbytes + 2 * bk_ * bn_)   # x + two w tiles
            + 2 * 4 * bm_ * bn_                        # two f32 accs
            + 2 * bm_ * bn_ * jnp.dtype(out_dtype).itemsize * 2
            + nk_ * bm_ * (bk_ + 4)                    # q/s caches
            + bm_ * bk_ * 4                            # f32 temp at quantize
        )

    while bk > 1024 and _vmem(bm, bk, bn) > 13 * 2**20:
        bk //= 2
    while bm > 128 and _vmem(bm, bk, bn) > 13 * 2**20:
        bm //= 2
    while bn > 128 and _vmem(bm, bk, bn) > 13 * 2**20:
        bn //= 2
    pad = (-M) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Mp = M + pad
    nk = K // bk
    NB = N // bn
    out = pl.pallas_call(
        functools.partial(_kernel_gated, nk=nk, act=act),
        grid=(Mp // bm, NB, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, NB + j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, NB + j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((nk, bm, bk), jnp.int8),
            pltpu.VMEM((nk, bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * K * N,
            bytes_accessed=Mp * K * xbytes + 2 * K * N + Mp * N * 2,
            transcendentals=Mp * N,
        ),
        interpret=interpret,
    )(x, wp, wp, sp.astype(jnp.float32), sp.astype(jnp.float32))
    return out[:M] if pad else out


def gated_matmul(
    x: jax.Array,   # [..., K] bf16/f32 activations
    wp: jax.Array,  # [K, 2N] int8 — gate | up packed along the output axis
    sp: jax.Array,  # [1, 2N] column scales
    act: str = "gelu_new",
    interpret: bool = False,
) -> jax.Array:
    """act(x @ w0) * (x @ w1) over a packed [K, 2N] int8 weight, as ONE
    Pallas W8A8 pass (see _kernel_gated). The packed weight is passed
    twice with offset index maps — Pallas streams the w0 tile at block
    column j and the w1 tile at NB+j, so no slice of the weight is ever
    materialized. Measured 6.6ms vs 8.6ms for the split path on the xl
    encoder FFN shape ([32768, 2048] x [2048, 2x5120])."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = _gated_matmul_2d(
        x2, wp, sp, act=act,
        out_dtype=x.dtype if x.dtype != jnp.float32 else jnp.float32,
        interpret=interpret,
    )
    return out.reshape(*lead, -1)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "bm", "bn_cap", "bk_cap", "interpret"),
)
def _gated_pair_2d(
    x: jax.Array,   # [M, K]
    w0: jax.Array,  # [K, N] int8 (gate)
    s0: jax.Array,  # [1, N]
    w1: jax.Array,  # [K, N] int8 (up)
    s1: jax.Array,  # [1, N]
    act: str = "silu",
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn_cap: int = 512,
    bk_cap: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Same fused gate as _gated_matmul_2d but over two SEPARATE weight
    leaves (the decoder's w_gate/w_up are independent stacked arrays, so
    no packed leaf exists). The kernel body is shared; only the index
    maps differ (both read block column j of their own array)."""
    M, K = x.shape
    N = w0.shape[1]
    bn = _largest_divisor(N, bn_cap)
    bk = _largest_divisor(K, bk_cap)
    if bn == 0 or bk == 0:
        raise ValueError(
            f"gated pair needs 128-multiple divisible K/N, got {K}x{N}"
        )
    xbytes = x.dtype.itemsize

    def _vmem(bm_, bk_, bn_):
        nk_ = K // bk_
        return (
            2 * (bm_ * bk_ * xbytes + 2 * bk_ * bn_)
            + 2 * 4 * bm_ * bn_
            + 2 * bm_ * bn_ * jnp.dtype(out_dtype).itemsize * 2
            + nk_ * bm_ * (bk_ + 4)
            + bm_ * bk_ * 4
        )

    while bk > 1024 and _vmem(bm, bk, bn) > 13 * 2**20:
        bk //= 2
    while bm > 128 and _vmem(bm, bk, bn) > 13 * 2**20:
        bm //= 2
    while bn > 128 and _vmem(bm, bk, bn) > 13 * 2**20:
        bn //= 2
    pad = (-M) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Mp = M + pad
    nk = K // bk
    out = pl.pallas_call(
        functools.partial(_kernel_gated, nk=nk, act=act),
        grid=(Mp // bm, N // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((nk, bm, bk), jnp.int8),
            pltpu.VMEM((nk, bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * K * N,
            bytes_accessed=Mp * K * xbytes + 2 * K * N + Mp * N * 2,
            transcendentals=Mp * N,
        ),
        interpret=interpret,
    )(x, w0, w1, s0.astype(jnp.float32), s1.astype(jnp.float32))
    return out[:M] if pad else out


def gated_matmul_pair(
    x: jax.Array,
    w0: jax.Array, s0: jax.Array,
    w1: jax.Array, s1: jax.Array,
    act: str = "silu",
    interpret: bool = False,
    mesh=None,
) -> jax.Array:
    """act(x @ w0) * (x @ w1) over two separate int8 weights (decoder
    SwiGLU prefill): the [.., d_ff] gate/up intermediates never touch
    HBM (see gated_matmul for the packed-leaf T5 variant). Gate/up are
    column-parallel (N over 'model' — the decoder_param_pspecs layout),
    so the mesh path is collective-free shard_map, like flash."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out_dtype = x.dtype if x.dtype != jnp.float32 else jnp.float32
    if mesh is not None and mesh.devices.size > 1:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        ds = dp_spec(mesh)

        def run(x_, w0_, s0_, w1_, s1_):
            return _gated_pair_2d(
                x_, w0_, s0_, w1_, s1_, act=act,
                out_dtype=out_dtype, interpret=interpret,
            )

        out = shard_map(
            run, mesh=mesh,
            in_specs=(P(ds, None), P(None, "model"), P(None, "model"),
                      P(None, "model"), P(None, "model")),
            out_specs=P(ds, "model"),
            check_rep=False,
        )(x2, w0, s0, w1, s1)
    else:
        out = _gated_pair_2d(
            x2, w0, s0, w1, s1, act=act,
            out_dtype=out_dtype, interpret=interpret,
        )
    return out.reshape(*lead, -1)
