"""From-scratch JAX T5 encoder-decoder (flan-t5 / t5-v1.1 / t5-v1.0).

TPU-native replacement for the HF ``T5ForConditionalGeneration`` forwards
the reference calls at setwise.py:93, pointwise.py:73-79,117-124,
pairwise.py:97,311-313 and listwise.py:257,733. Functional: parameters are
a pytree with per-layer leaves stacked on a leading axis and the layer
loop expressed as ``lax.scan`` (one compiled layer body instead of 24
unrolled ones — faster compiles, identical math).

Architectural fidelity notes (required for logit parity with HF weights):
  * RMS layer norm without mean subtraction, fp32 stats, eps 1e-6.
  * NO attention-score scaling (T5 folds 1/sqrt(d) into init).
  * NO embedding scaling.
  * Relative position bias: computed from the block-0 bias table, shared
    by every layer; bidirectional buckets for the encoder, causal for the
    decoder; cross-attention carries no bias.
  * Gated FFN (wi_0 * gelu_new, wi_1) for v1.1/flan; plain relu-wi for v1.0.
  * lm_head untied for v1.1/flan; tied variant scales hidden by d_model^-0.5.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import _gcd_int, gelu_new, mha_flat, rms_norm
from .config import T5Config

Params = Dict[str, Any]

_SCALE_SUFFIX = "_scale"  # models/quant.py convention


def _mm(lp: Params, name: str, x: jax.Array, cfg: T5Config,
        residual: Optional[jax.Array] = None) -> jax.Array:
    """One per-layer matmul site, dispatching on quantization state:
      * no ``<name>_scale`` leaf -> plain bf16 matmul;
      * quantized + ``cfg.int8_kernel`` -> Pallas W8A8 int8-MXU kernel
        (dynamic per-token activation quantization; ~1.5x the bf16
        roofline on v5e, ops/int8_matmul.py);
      * quantized otherwise -> XLA w8a16 dequant, fused into the matmul
        producer (multi-device/GSPMD-safe fallback; weight HBM halves
        but the MXU stays bf16).

    ``residual`` is added to the matmul output — in the kernel's
    epilogue on the kernel path, so the transformer block's residual
    add never exists as a separate XLA op.
    """
    w = lp[name]
    s = lp.get(name + _SCALE_SUFFIX)
    if s is None:
        out = x @ w
        return out if residual is None else out + residual
    part = _partition(name)
    if _kernel_worthwhile(x, w, cfg, part):
        from ..ops.int8_matmul import quantized_matmul

        return quantized_matmul(
            x, w, s, residual=residual,
            interpret=jax.default_backend() != "tpu",
            mesh=_live_mesh(cfg), partition=part,
        )
    out = x @ (w.astype(x.dtype) * s.astype(x.dtype))
    return out if residual is None else out + residual


def _partition(name: str) -> str:
    """TP layout of a matmul site (parallel/mesh.py pspecs): the
    attention/FFN OUTPUT projections (o, co, wo) are row-parallel
    (input dim over 'model', psum after); everything else is
    column-parallel."""
    return "row" if name.endswith("o") else "col"


def _live_mesh(cfg: T5Config):
    m = cfg.flash_mesh
    return m if (m is not None and m.devices.size > 1) else None


def _kernel_worthwhile(x: jax.Array, w: jax.Array, cfg: T5Config,
                       partition: str = "col") -> bool:
    """Kernel-vs-dequant dispatch. Small-M GEMMs (the 2-token decoder
    pass: M = B*T ~ 64) are weight-streaming-bound — the w8a16 dequant
    path already streams int8 bytes and fuses, while a kernel call adds
    fixed pipeline cost per site (measured ~50ms across the xl decoder
    at M=64 vs ~30ms on the dequant path). On a mesh the per-device
    shard must additionally satisfy the kernel's shape rules
    (ops/int8_matmul.kernel_mesh_ok) or the site falls back to the
    GSPMD-partitioned w8a16 dequant."""
    if not cfg.int8_kernel:
        return False
    if w.shape[0] % 128 != 0 or w.shape[1] % 128 != 0:
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if m < 1024:
        return False
    from ..ops.int8_matmul import kernel_mesh_ok

    return kernel_mesh_ok(_live_mesh(cfg), m, w.shape[0], w.shape[1],
                          partition)


def _mm_fused(lp: Params, names, x: jax.Array, cfg: T5Config):
    """Several matmul sites sharing one input, as ONE wide GEMM on the
    kernel path: q/k/v (and the gated wi pair) concatenate along the
    output axis, so the activation is quantized once and the kernel
    runs at its wide-N sweet spot (the int8 MXU measures 155-210
    TFLOP/s at [.., 2048] x [2048, 6144+] vs ~85 on the square per-head
    shapes — docs/ARCHITECTURE.md). The per-layer concat of int8
    weights is a ~12MB VMEM-speed copy (~15us), dwarfed by the GEMM.
    Falls back to independent ``_mm`` calls off the kernel path."""
    kernel_ok = (
        all(lp.get(n + _SCALE_SUFFIX) is not None for n in names)
        and all(_kernel_worthwhile(x, lp[n], cfg) for n in names)
        # Mesh: fused sites are all column-parallel, but the runtime
        # concat must also shard cleanly (the concatenated N splits over
        # 'model' at arbitrary site boundaries — column-parallel math is
        # exact for ANY column partition, scales travel with columns).
        and (_live_mesh(cfg) is None
             or sum(lp[n].shape[1] for n in names)
             % (128 * _live_mesh(cfg).shape.get("model", 1)) == 0)
    )
    if not kernel_ok:
        return tuple(_mm(lp, n, x, cfg) for n in names)
    from ..ops.int8_matmul import quantized_matmul

    w = jnp.concatenate([lp[n] for n in names], axis=1)
    s = jnp.concatenate([lp[n + _SCALE_SUFFIX] for n in names], axis=1)
    out = quantized_matmul(x, w, s, interpret=jax.default_backend() != "tpu",
                           mesh=_live_mesh(cfg))
    sizes = [lp[n].shape[1] for n in names]
    offs = [0]
    for sz in sizes:
        offs.append(offs[-1] + sz)
    return tuple(
        out[..., offs[i]: offs[i + 1]] for i in range(len(names))
    )


# ---------------------------------------------------------------------------
# Relative position bias
# ---------------------------------------------------------------------------
def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """T5 bucketing of key_pos - query_pos (log-scale beyond max_exact)."""
    ret = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (relative_position > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(relative_position)
    else:
        rel = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_if_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_if_large = jnp.minimum(rel_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, rel, rel_if_large)


def compute_bias(
    rel_bias_table: jax.Array,  # [num_buckets, H]
    q_len: int,
    k_len: int,
    bidirectional: bool,
    cfg: T5Config,
    q_offset: int | jax.Array = 0,
) -> jax.Array:
    """[1, H, q_len, k_len] additive attention bias."""
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx,
        bidirectional,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = rel_bias_table[buckets]  # [q, k, H]
    return jnp.transpose(bias, (2, 0, 1))[None]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------
def _mm_packed(lp: Params, name: str, x: jax.Array, cfg: T5Config) -> jax.Array:
    """GEMM against a packed multi-site leaf (quant.T5_PACKS): Pallas
    W8A8 when worthwhile, XLA dequant otherwise. Returns the packed
    [..., sum(N)] output; callers slice (or hand it whole to the packed
    flash kernel)."""
    w, s = lp[name], lp[name + _SCALE_SUFFIX]
    if _kernel_worthwhile(x, w, cfg):
        from ..ops.int8_matmul import quantized_matmul

        return quantized_matmul(
            x, w, s, interpret=jax.default_backend() != "tpu"
        )
    return (x @ (w.astype(x.dtype) * s.astype(x.dtype)))


def _attn(
    lp: Params,
    prefix: str,
    cfg: T5Config,
    x: jax.Array,
    kv_src: jax.Array,
    kv_mask: Optional[jax.Array],
    bias: Optional[jax.Array],
    causal: bool = False,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    if kv_src is x and "qkv" in lp:  # packed self-attention (quant pack=True)
        qkv = _mm_packed(lp, "qkv", x, cfg)
        HD = qkv.shape[-1] // 3
        Dh = HD // cfg.num_heads
        hg = 128 // _gcd_int(Dh, 128)
        if (
            cfg.use_flash
            and cfg.flash_mesh is None
            and x.shape[1] >= 128
            and HD % 128 == 0
            and cfg.num_heads % hg == 0
            and Dh % 8 == 0
        ):
            # Slice-free: the packed GEMM output goes straight into the
            # flash kernel via offset index maps (flash_mha_packed).
            from ..ops.flash import flash_mha_packed

            out = flash_mha_packed(
                qkv, cfg.num_heads, kv_mask=kv_mask, causal=causal,
                bias=bias, scale=1.0,
            )
        else:
            qp, kp, vp = (
                qkv[..., :HD], qkv[..., HD:2 * HD], qkv[..., 2 * HD:]
            )
            out = mha_flat(qp, kp, vp, cfg.num_heads, kv_mask=kv_mask,
                           causal=causal, bias=bias, scale=1.0,
                           use_flash=cfg.use_flash, mesh=cfg.flash_mesh)
        return _mm(lp, prefix + "o", out, cfg, residual=residual)
    if kv_src is x:  # self-attention: one fused qkv GEMM
        qp, kp, vp = _mm_fused(
            lp, (prefix + "q", prefix + "k", prefix + "v"), x, cfg
        )
    else:
        qp = _mm(lp, prefix + "q", x, cfg)
        kp, vp = _mm_fused(lp, (prefix + "k", prefix + "v"), kv_src, cfg)
    # Projection-natural [B, L, H*Dh] layout end to end: the blhd flash
    # kernel lane-slices heads, so no head transpose is materialized.
    out = mha_flat(qp, kp, vp, cfg.num_heads, kv_mask=kv_mask,
                   causal=causal, bias=bias, scale=1.0,
                   use_flash=cfg.use_flash, mesh=cfg.flash_mesh)
    return _mm(lp, prefix + "o", out, cfg, residual=residual)


def _ffn(lp: Params, cfg: T5Config, x: jax.Array,
         residual: Optional[jax.Array] = None) -> jax.Array:
    if cfg.is_gated and "wi_g" in lp:  # packed gate|up (quant pack=True)
        w, s = lp["wi_g"], lp["wi_g" + _SCALE_SUFFIX]
        if _kernel_worthwhile(x, w, cfg):
            # One fused Pallas pass writes act(h0)*h1 directly — the
            # [.., 2*d_ff] intermediate never touches HBM.
            from ..ops.int8_matmul import gated_matmul

            h = gated_matmul(
                x, w, s, act=cfg.act_fn,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            act = gelu_new if cfg.act_fn == "gelu_new" else jax.nn.relu
            hh = x @ (w.astype(x.dtype) * s.astype(x.dtype))
            F = hh.shape[-1] // 2
            h = act(hh[..., :F]) * hh[..., F:]
    elif cfg.is_gated:
        act = gelu_new if cfg.act_fn == "gelu_new" else jax.nn.relu
        h0, h1 = _mm_fused(lp, ("wi_0", "wi_1"), x, cfg)
        h = act(h0) * h1
    else:
        h = jax.nn.relu(_mm(lp, "wi", x, cfg))
    return _mm(lp, "wo", h, cfg, residual=residual)


def encode(
    params: Params, cfg: T5Config, input_ids: jax.Array, attn_mask: jax.Array
) -> jax.Array:
    """Encoder forward: [B, L] ids + [B, L] {0,1} mask -> [B, L, D]."""
    enc = params["encoder"]
    x = params["shared"][input_ids]
    L = input_ids.shape[1]
    bias = compute_bias(enc["rel_bias"], L, L, True, cfg)

    def layer(h, lp):
        # NOTE: residual adds stay as XLA ops — fusing them into the
        # kernel epilogue measured neutral-to-slightly-slower (300 vs
        # 295ms/xl batch; the residual tile competes for VMEM/DMA).
        hn = rms_norm(h, lp["ln1"], cfg.layer_norm_epsilon)
        h = h + _attn(lp, "", cfg, hn, hn, attn_mask, bias)
        h = h + _ffn(lp, cfg, rms_norm(h, lp["ln2"], cfg.layer_norm_epsilon))
        return h, None

    x, _ = jax.lax.scan(layer, x, enc["layers"])
    return rms_norm(x, enc["final_ln"], cfg.layer_norm_epsilon)


def decode(
    params: Params,
    cfg: T5Config,
    decoder_input_ids: jax.Array,  # [B, T]
    enc_out: jax.Array,  # [B, L, D]
    enc_mask: jax.Array,  # [B, L] {0,1}
) -> jax.Array:
    """Teacher-forced decoder forward -> logits [B, T, V]."""
    x = decode_hidden(params, cfg, decoder_input_ids, enc_out, enc_mask)
    return lm_logits(params, cfg, x)


def decode_hidden(
    params: Params,
    cfg: T5Config,
    decoder_input_ids: jax.Array,
    enc_out: jax.Array,
    enc_mask: jax.Array,
) -> jax.Array:
    """Decoder forward up to the final layer norm -> hidden [B, T, D]."""
    dec = params["decoder"]
    x = params["shared"][decoder_input_ids]
    T = decoder_input_ids.shape[1]
    self_bias = compute_bias(dec["rel_bias"], T, T, False, cfg)

    def layer(h, lp):
        hn = rms_norm(h, lp["ln1"], cfg.layer_norm_epsilon)
        h = h + _attn(lp, "", cfg, hn, hn, None, self_bias, causal=True)
        hn = rms_norm(h, lp["ln2"], cfg.layer_norm_epsilon)
        h = h + _cross_attn(lp, cfg, hn, enc_out, enc_mask)
        h = h + _ffn(lp, cfg, rms_norm(h, lp["ln3"], cfg.layer_norm_epsilon))
        return h, None

    x, _ = jax.lax.scan(layer, x, dec["layers"])
    return rms_norm(x, dec["final_ln"], cfg.layer_norm_epsilon)


def _cross_attn(lp, cfg, x, enc_out, enc_mask, residual=None):
    if "ckv" in lp:  # packed cross kv (quant pack=True); the k/v slices
        # feed the XLA attention path (decoder Lq=2 < flash minimum), so
        # XLA fuses them into their consumers — no copies materialize.
        ckv = _mm_packed(lp, "ckv", enc_out, cfg)
        HD = ckv.shape[-1] // 2
        kp, vp = ckv[..., :HD], ckv[..., HD:]
    else:
        kp, vp = _mm_fused(lp, ("ck", "cv"), enc_out, cfg)
    qp = _mm(lp, "cq", x, cfg)
    out = mha_flat(qp, kp, vp, cfg.num_heads, kv_mask=enc_mask, bias=None,
                   scale=1.0, use_flash=cfg.use_flash, mesh=cfg.flash_mesh)
    return _mm(lp, "co", out, cfg, residual=residual)


def lm_logits(params: Params, cfg: T5Config, hidden: jax.Array) -> jax.Array:
    if cfg.tie_word_embeddings:
        hidden = hidden * (cfg.d_model**-0.5)
        return hidden @ params["shared"].T
    return hidden @ params["lm_head"]


def label_logits(
    params: Params, cfg: T5Config, hidden: jax.Array, label_ids: jax.Array
) -> jax.Array:
    """Logits for only the given label token ids — a [D, K] matmul
    instead of the full [D, V] vocabulary projection. Order-preserving
    vs the reference's softmax-then-gather (setwise.py:184-186)."""
    if cfg.tie_word_embeddings:
        hidden = hidden * (cfg.d_model**-0.5)
        w = params["shared"][label_ids].T  # [D, K]
    else:
        w = params["lm_head"][:, label_ids]
    return hidden @ w


def forward(
    params: Params,
    cfg: T5Config,
    input_ids: jax.Array,
    attn_mask: jax.Array,
    decoder_input_ids: jax.Array,
) -> jax.Array:
    """Full encoder-decoder forward -> logits [B, T, V]."""
    enc_out = encode(params, cfg, input_ids, attn_mask)
    return decode(params, cfg, decoder_input_ids, enc_out, attn_mask)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------
def init_params(cfg: T5Config, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random init with T5's fan-in scaling (usable for tests/bench)."""
    keys = iter(jax.random.split(key, 64))

    def nrm(shape, scale):
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    D, I, F, H = cfg.d_model, cfg.num_heads * cfg.d_kv, cfg.d_ff, cfg.num_heads

    def attn_block(n_layers, prefix=""):
        return {
            prefix + "q": nrm((n_layers, D, I), (D * cfg.d_kv) ** -0.5),
            prefix + "k": nrm((n_layers, D, I), D**-0.5),
            prefix + "v": nrm((n_layers, D, I), D**-0.5),
            prefix + "o": nrm((n_layers, I, D), I**-0.5),
        }

    def ffn_block(n_layers):
        if cfg.is_gated:
            return {
                "wi_0": nrm((n_layers, D, F), D**-0.5),
                "wi_1": nrm((n_layers, D, F), D**-0.5),
                "wo": nrm((n_layers, F, D), F**-0.5),
            }
        return {
            "wi": nrm((n_layers, D, F), D**-0.5),
            "wo": nrm((n_layers, F, D), F**-0.5),
        }

    Le, Ld = cfg.num_layers, cfg.num_decoder_layers
    enc_layers = {
        "ln1": jnp.ones((Le, D), dtype),
        "ln2": jnp.ones((Le, D), dtype),
        **attn_block(Le),
        **ffn_block(Le),
    }
    dec_layers = {
        "ln1": jnp.ones((Ld, D), dtype),
        "ln2": jnp.ones((Ld, D), dtype),
        "ln3": jnp.ones((Ld, D), dtype),
        **attn_block(Ld),
        **{("c" + k): v for k, v in attn_block(Ld).items()},
        **ffn_block(Ld),
    }
    params: Params = {
        "shared": nrm((cfg.vocab_size, D), 1.0),
        "encoder": {
            "rel_bias": nrm((cfg.relative_attention_num_buckets, H), D**-0.5),
            "layers": enc_layers,
            "final_ln": jnp.ones((D,), dtype),
        },
        "decoder": {
            "rel_bias": nrm((cfg.relative_attention_num_buckets, H), D**-0.5),
            "layers": dec_layers,
            "final_ln": jnp.ones((D,), dtype),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm((D, cfg.vocab_size), D**-0.5)
    return params
