"""Greedy decoding with KV caches, as fixed-shape `lax.scan` programs.

TPU-native replacement for the reference's ``llm.generate`` calls
(setwise.py:93-95 max_new_tokens=2, pairwise.py:97-99, listwise.py:257,268,
Rank-R1 vLLM 2048-token completions, setwise.py:445-446). Everything is
static-shape: the decode loop is a ``lax.scan`` over a fixed step count
with a done-mask (no data-dependent Python control flow), so one compile
serves every batch in a (batch, length) bucket.

Design notes:
  * T5: encoder runs once; cross-attention K/V are precomputed per layer;
    the decoder prefix (e.g. "<pad> Passage") is teacher-forced inside the
    same scan that generates, so prefill and decode share one compiled
    program.
  * Decoder-only: a full-forward prefill returns stacked per-layer K/V
    (post-RoPE) which the decode scan extends. Left-padded prompts are
    supported via mask-derived positions (pairwise.py:71 pads left).
  * Early stop: rows freeze after emitting EOS; multi-token stop strings
    ("</answer>") are handled by the engine's chunked host-side check.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import decoder as dec_mod
from ..models import t5 as t5_mod
from ..models.config import DecoderConfig, T5Config
from ..models import quant
from ..models.quant import qmm, swiglu_ffn
from ..ops.attention import apply_rope, mha, rms_norm, rope_cos_sin

NEG_INF = -1e9


def _kv_quant(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(position, kv-head) symmetric int8 for KV-cache entries:
    x [..., Dh] -> (int8 values, fp32 scales [..., 1]).

    The cache is what crosses HBM every decode step; at serving batches
    (B>=32) or long contexts the KV stream rivals the weight stream, so
    int8 halves it — and halves the per-row cache footprint that bounds
    rows-per-chip (engine._gen_row_limit). Scales are per position and
    per kv-head (finest granularity that adds only Dh^-1 overhead)."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    q = jnp.clip(jnp.round(xf / amax * 127.0), -127, 127).astype(jnp.int8)
    return q, amax / 127.0


def _kv_quant4(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Planar-packed symmetric int4 for KV-cache entries:
    x [..., Dh] -> (int8 bytes [..., Dh//2], fp32 scales [..., 2]).

    Planar layout: dims d and d+Dh/2 share one byte (low nibble = lower
    half, high nibble = upper half). Unpacking is then two elementwise
    shifts with NO reshape/interleave, so XLA fuses the unpack straight
    into the attention dot operands and only nibbles ever cross HBM —
    the same lesson as the int4 weight kernel (docs/NEXT.md: an
    interleaved unpack materializes the dequantized cache and loses the
    bandwidth win). Each half carries its own per-(position, kv-head)
    scale (amax/7, range -7..7), which the planar split gives for free:
    the half-dots dequantize independently (see _cached_qk/_cached_pv).
    """
    h = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    lo, hi = xf[..., :h], xf[..., h:]

    def q4(part):
        amax = jnp.maximum(jnp.max(jnp.abs(part), axis=-1, keepdims=True), 1e-8)
        q = jnp.clip(jnp.round(part / amax * 7.0), -7, 7).astype(jnp.int8)
        return q, amax / 7.0

    qlo, slo = q4(lo)
    qhi, shi = q4(hi)
    packed = jnp.left_shift(qhi, 4) | (qlo & jnp.int8(0x0F))
    return packed, jnp.concatenate([slo, shi], axis=-1)


def _kv_pack(x: jax.Array, mode) -> Tuple[jax.Array, jax.Array]:
    """Quantize a K or V block for the cache under ``mode``
    ('int8' | 'int4'; callers gate on cfg.kv_quant truthiness first)."""
    return _kv_quant4(x) if mode == "int4" else _kv_quant(x)


def _unpack4(packed: jax.Array, dtype):
    """Planar int4 bytes -> (lower-half, upper-half) int values in
    ``dtype``. Pure elementwise (arithmetic shifts sign-extend), so XLA
    fuses both into the consuming dot."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return lo.astype(dtype), hi.astype(dtype)


def _texp(scale_t: jax.Array, out_ndim: int) -> jax.Array:
    """Expand a per-(B, KV, T) scale for broadcast against a scores/probs
    tensor of rank ``out_ndim`` whose last axis is T ([B,KV,G,T] decode,
    [B,KV,G,S,T] spec verify)."""
    for _ in range(out_ndim - 3):
        scale_t = scale_t[:, :, None]
    return scale_t


def _pick(logits, temperature: float, rng, dtype):
    """Next-token choice: greedy argmax, or (temperature > 0 with a key)
    a categorical sample of logits/temperature — one key samples every
    batch row independently. fp32 for a stable softmax."""
    if temperature > 0.0 and rng is not None:
        return jax.random.categorical(
            rng, logits.astype(jnp.float32) / temperature, axis=-1
        ).astype(dtype)
    return jnp.argmax(logits, axis=-1).astype(dtype)


def _cached_qk(qg, kc, dtype, mode, sub: str):
    """q·K^T against a cached K in any kv_quant mode; ``sub`` contracts
    the last axis of both operands (d) with K's T axis second-to-last.
    Dequantization folds AFTER the dot (scales are per output column t);
    int4 splits into two half-Dh dots, one per nibble plane, each with
    its own scale — no unpacked K ever materializes."""
    if mode == "int4":
        kp, ks = kc
        h = qg.shape[-1] // 2
        k_lo, k_hi = _unpack4(kp, dtype)
        s_lo = jnp.einsum(sub, qg[..., :h], k_lo,
                          preferred_element_type=jnp.float32)
        s_hi = jnp.einsum(sub, qg[..., h:], k_hi,
                          preferred_element_type=jnp.float32)
        nd = s_lo.ndim
        return s_lo * _texp(ks[..., 0], nd) + s_hi * _texp(ks[..., 1], nd)
    if mode:  # int8
        k8, ksl = kc
        s = jnp.einsum(sub, qg, k8.astype(dtype),
                       preferred_element_type=jnp.float32)
        return s * _texp(ksl[..., 0], s.ndim)
    return jnp.einsum(sub, qg, kc, preferred_element_type=jnp.float32)


def _cached_pv(p, vc, dtype, mode, sub: str):
    """softmax-probs·V against a cached V in any kv_quant mode; ``sub``
    contracts p's last axis (t) with V's T axis. The per-t scale folds
    into p BEFORE the dot; int4 runs one half-dot per nibble plane and
    concatenates along Dh (a single small [.., Dh] concat)."""
    if mode == "int4":
        vp, vs = vc
        v_lo, v_hi = _unpack4(vp, dtype)
        a_lo = jnp.einsum(sub, (p * _texp(vs[..., 0], p.ndim)).astype(dtype),
                          v_lo, preferred_element_type=jnp.float32)
        a_hi = jnp.einsum(sub, (p * _texp(vs[..., 1], p.ndim)).astype(dtype),
                          v_hi, preferred_element_type=jnp.float32)
        return jnp.concatenate([a_lo, a_hi], axis=-1)
    if mode:  # int8
        v8, vsl = vc
        return jnp.einsum(sub, (p * _texp(vsl[..., 0], p.ndim)).astype(dtype),
                          v8.astype(dtype), preferred_element_type=jnp.float32)
    return jnp.einsum(sub, p.astype(dtype), vc,
                      preferred_element_type=jnp.float32)


def _qkv(lp, hn, cfg):
    """q/k/v projections via the quant-state dispatcher (models/quant.qmm):
    bf16, w8a16 int8, or the Pallas W4A8 int4 kernel when cfg.int4_kernel.
    On a mesh the kernel sites run per-device under shard_map
    (column-parallel, decoder_param_pspecs layout)."""
    return (qmm(lp, "wq", hn, cfg.qkernels, cfg.flash_mesh),
            qmm(lp, "wk", hn, cfg.qkernels, cfg.flash_mesh),
            qmm(lp, "wv", hn, cfg.qkernels, cfg.flash_mesh))


def _ffn(lp, hn, cfg):
    """SwiGLU FFN through the quant-state dispatch (quant.swiglu_ffn):
    large-M int8 prefill fuses gate+up into one Pallas pass so the
    [.., d_ff] intermediates never touch HBM; decode's small-M steps and
    bf16/int4 take the per-site qmm path inside."""
    return swiglu_ffn(lp, hn, cfg.qkernels, cfg.flash_mesh)



# ---------------------------------------------------------------------------
# T5 encoder-decoder greedy generation
# ---------------------------------------------------------------------------
def t5_greedy_generate(
    params,
    cfg: T5Config,
    enc_ids: jax.Array,  # [B, L]
    enc_mask: jax.Array,  # [B, L]
    prefix_ids: jax.Array,  # [B, P] teacher-forced decoder prefix (incl. start)
    max_new_tokens: int,
) -> jax.Array:
    """Returns generated token ids [B, max_new_tokens] (pad after EOS)."""
    B, L = enc_ids.shape
    P = prefix_ids.shape[1]
    H, Dh, Ld = cfg.num_heads, cfg.d_kv, cfg.num_decoder_layers
    T = P + max_new_tokens
    dtype = params["shared"].dtype

    enc_out = t5_mod.encode(params, cfg, enc_ids, enc_mask)
    lyr = params["decoder"]["layers"]

    # Cross-attention K/V per layer, computed once: [Ld, B, H, L, Dh].
    # The target layout comes straight out of the dot (head axis split on
    # the WEIGHT, which is tiny) — the old reshape+transpose of the
    # [Ld, B, L, H*Dh] result materialized a second full-size copy right
    # at the allocation peak, which is what pushed the round-3 bench over
    # HBM at B=110/L=640 (BENCH_r03.json tail).
    def cross_kv(w):
        w4 = w.reshape(Ld, cfg.d_model, H, Dh)
        y = jnp.einsum(
            "bld,xdhe->xbhle", enc_out, w4,
            preferred_element_type=jnp.float32,
        )
        return y.astype(dtype)

    # t5_wmat: sites dequant/unpack transparently for any quant state
    # (the scoring paths dispatch in t5._attn/_ffn; this incremental
    # path consumes leaves directly, so it dispatches here).
    ck = cross_kv(quant.t5_wmat(lyr, "ck", dtype))
    cv = cross_kv(quant.t5_wmat(lyr, "cv", dtype))
    cross_mask = enc_mask.astype(bool)[:, None, :]  # [B, 1, L]

    k_cache = jnp.zeros((Ld, B, H, T, Dh), dtype)
    v_cache = jnp.zeros((Ld, B, H, T, Dh), dtype)
    rel_table = params["decoder"]["rel_bias"]

    # Relative-position bias of distance 0 (the current token against
    # itself) — constant across steps.
    bucket0 = t5_mod.relative_position_bucket(
        jnp.zeros((1,), jnp.int32), False,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias_self = rel_table[bucket0][0]  # [H]

    def step(carry, t):
        prev_tok, kc, vc, done = carry
        y_in = jnp.where(t < P, prefix_ids[:, jnp.minimum(t, P - 1)], prev_tok)
        x = params["shared"][y_in]  # [B, D]

        # Bias of the current query position against all key positions.
        key_pos = jnp.arange(T)
        buckets = t5_mod.relative_position_bucket(
            key_pos - t, False,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias_t = rel_table[buckets].T  # [H, T]
        # Cache positions < t are valid; position t (the current token) is
        # handled as a rank-1 online-softmax term below, so the caches can
        # stay READ-ONLY inside the layer scan — writing them per layer
        # (cache as scan ys) makes XLA copy the full cache every step.
        self_mask = (key_pos < t)[None, None, :]  # [1, 1, T]

        def layer(h, xs):
            lp, kcl, vcl, ckl, cvl = xs
            hn = rms_norm(h, lp["ln1"], cfg.layer_norm_epsilon)
            q = (hn @ quant.t5_wmat(lp, "q", dtype)).reshape(B, H, Dh)
            k_new = (hn @ quant.t5_wmat(lp, "k", dtype)).reshape(B, H, Dh)
            v_new = (hn @ quant.t5_wmat(lp, "v", dtype)).reshape(B, H, Dh)
            s = jnp.einsum("bhd,bhtd->bht", q, kcl, preferred_element_type=jnp.float32)
            s = s + bias_t[None].astype(s.dtype)
            s = jnp.where(self_mask, s, NEG_INF)
            s_self = jnp.einsum(
                "bhd,bhd->bh", q, k_new, preferred_element_type=jnp.float32
            ) + bias_self[None].astype(jnp.float32)
            m = jnp.maximum(jnp.max(s, axis=-1), s_self)  # [B, H]
            p = jnp.exp(s - m[..., None])
            p_self = jnp.exp(s_self - m)
            z = p.sum(axis=-1) + p_self
            a = (
                jnp.einsum("bht,bhtd->bhd", p.astype(dtype), vcl,
                           preferred_element_type=jnp.float32)
                + p_self[..., None] * v_new.astype(jnp.float32)
            ) / z[..., None]
            h = h + a.astype(dtype).reshape(B, H * Dh) @ quant.t5_wmat(
                lp, "o", dtype
            )

            hn2 = rms_norm(h, lp["ln2"], cfg.layer_norm_epsilon)
            cq = (hn2 @ quant.t5_wmat(lp, "cq", dtype)).reshape(B, H, Dh)
            s = jnp.einsum("bhd,bhld->bhl", cq, ckl, preferred_element_type=jnp.float32)
            s = jnp.where(cross_mask, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1).astype(dtype)
            a = jnp.einsum("bhl,bhld->bhd", p, cvl, preferred_element_type=jnp.float32)
            h = h + a.astype(dtype).reshape(B, H * Dh) @ quant.t5_wmat(
                lp, "co", dtype
            )

            hn3 = rms_norm(h, lp["ln3"], cfg.layer_norm_epsilon)
            f = t5_mod._ffn(lp, cfg, hn3[:, None, :])[:, 0, :]
            return h + f, (k_new, v_new)

        h, (k_new, v_new) = jax.lax.scan(layer, x, (lyr, kc, vc, ck, cv))
        kc = jax.lax.dynamic_update_slice(
            kc, k_new[:, :, :, None, :], (0, 0, 0, t, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, v_new[:, :, :, None, :], (0, 0, 0, t, 0)
        )
        h = rms_norm(h, params["decoder"]["final_ln"], cfg.layer_norm_epsilon)
        logits = t5_mod.lm_logits(params, cfg, h)  # [B, V]
        nxt = jnp.argmax(logits, axis=-1).astype(prefix_ids.dtype)
        # During prefill the "emitted" token is ignored; after EOS freeze.
        emitted = jnp.where(done, cfg.pad_token_id, nxt)
        new_done = jnp.logical_or(done, emitted == cfg.eos_token_id)
        is_gen = t >= P - 1  # token emitted at step t feeds position t+1
        done = jnp.where(is_gen, new_done, done)
        out = jnp.where(is_gen, emitted, cfg.pad_token_id)
        return (emitted, kc, vc, done), out

    init = (
        jnp.zeros((B,), prefix_ids.dtype),
        k_cache,
        v_cache,
        jnp.zeros((B,), bool),
    )
    _, outs = jax.lax.scan(step, init, jnp.arange(T))
    # outs[t] is the token generated after consuming position t; generation
    # outputs live at steps P-1 .. T-2.
    return outs[P - 1 : T - 1].T  # [B, max_new_tokens]


# ---------------------------------------------------------------------------
# Decoder-only prefill + greedy decode
# ---------------------------------------------------------------------------
def decoder_prefill(
    params,
    cfg: DecoderConfig,
    input_ids: jax.Array,  # [B, L] (left-padded)
    attn_mask: jax.Array,  # [B, L]
    max_new_tokens: int,
):
    """Full forward over the prompt, returning (last_logits, cache state).

    Cache arrays are padded to L + max_new_tokens so the decode scan can
    extend them in place.
    """
    B, L = input_ids.shape
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    T = L + max_new_tokens
    dtype = quant.embed_dtype(params)

    x = quant.embed_rows(params, input_ids)
    pos = dec_mod.positions_from_mask(attn_mask)
    cos, sin = rope_cos_sin(pos, Dh, cfg.rope_theta, dtype=x.dtype)
    # Sliding window (index space — exact for one left-padded block);
    # static no-op when the prompt fits inside the window.
    win = cfg.sliding_window
    win = win if (win is not None and L > win) else None

    def layer(h, lp):
        hn = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, hn, cfg)
        if cfg.attention_bias:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, KV, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, KV, Dh).transpose(0, 2, 1, 3)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        from ..ops.attention import mha

        # Structural masks so prefill rides the flash kernel on TPU;
        # K/V stay at KV heads (GQA-native kernel — no repeated copy).
        a = mha(q, k, v, kv_mask=attn_mask, causal=True, scale=Dh**-0.5,
                use_flash=cfg.use_flash, mesh=cfg.flash_mesh, window=win)
        a = a.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)
        h = h + qmm(lp, "wo", a, cfg.qkernels, cfg.flash_mesh)
        hn = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        f = _ffn(lp, hn, cfg)
        # Cache padded out to T along the length axis.
        if cfg.kv_quant:
            k8, ks = _kv_pack(k, cfg.kv_quant)
            v8, vs = _kv_pack(v, cfg.kv_quant)
            pad = ((0, 0), (0, 0), (0, T - L), (0, 0))
            kc = (jnp.pad(k8, pad), jnp.pad(ks, pad))
            vc = (jnp.pad(v8, pad), jnp.pad(vs, pad))
        else:
            kc = jnp.pad(k, ((0, 0), (0, 0), (0, T - L), (0, 0)))
            vc = jnp.pad(v, ((0, 0), (0, 0), (0, T - L), (0, 0)))
        return h + f, (kc, vc)

    h, (k_cache, v_cache) = jax.lax.scan(layer, x, params["layers"])
    h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    last_logits = dec_mod.lm_logits(params, cfg, h[:, -1, :])  # [B, V]
    next_pos = pos[:, -1] + 1  # per-row next RoPE position
    key_mask = jnp.pad(attn_mask.astype(bool), ((0, 0), (0, T - L)))
    return last_logits, (k_cache, v_cache, key_mask, next_pos)


def _prefill_layers(
    params,
    cfg: DecoderConfig,
    input_ids: jax.Array,  # [B, L]
    attn_mask: jax.Array,  # [B, L]
    pre_k: Optional[jax.Array] = None,  # [Ld, B, KV, Lp, Dh] per-row prefix KV
    pre_v: Optional[jax.Array] = None,
    pre_mask: Optional[jax.Array] = None,  # [B, Lp]
    pos_offset: Optional[jax.Array] = None,  # [B] RoPE offset (prefix lengths)
):
    """Forward over a token block, optionally attending to precomputed
    per-row prefix K/V. Returns (final hidden [B, L, D], k/v stacks
    [Ld, B, KV, L, Dh], positions [B, L])."""
    B, L = input_ids.shape
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    x = quant.embed_rows(params, input_ids)
    pos = dec_mod.positions_from_mask(attn_mask)
    if pos_offset is not None:
        pos = pos + pos_offset[:, None]
    cos, sin = rope_cos_sin(pos, Dh, cfg.rope_theta, dtype=x.dtype)
    have_pre = pre_k is not None
    kv_mask_full = (
        jnp.concatenate([pre_mask, attn_mask], axis=1) if have_pre else attn_mask
    )
    # Sliding window. Without a prefix the block is contiguously padded,
    # so the structural index-space window is exact (and flash-friendly).
    # With a prefix there are padding holes between the right-padded
    # prefix and the suffix, so index deltas lie about position deltas —
    # build a dense positional mask instead (XLA path; rare case: a
    # shared-prefix Mistral prompt longer than its window).
    win = cfg.sliding_window
    Lk_total = kv_mask_full.shape[1]
    win = win if (win is not None and Lk_total > win) else None
    dense_win = None
    if win is not None and have_pre:
        pre_pos = dec_mod.positions_from_mask(pre_mask)
        pos_k = jnp.concatenate([pre_pos, pos], axis=1)  # [B, Lp+L]
        rel = pos[:, :, None] - pos_k[:, None, :]  # [B, Lq, Lk]
        vis = (rel >= 0) & (rel < win) & kv_mask_full.astype(bool)[:, None, :]
        dense_win = vis[:, None]  # [B, 1, Lq, Lk]

    def layer(h, xs):
        if have_pre:
            lp, kpl, vpl = xs
        else:
            lp = xs
        hn = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, hn, cfg)
        if cfg.attention_bias:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, KV, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, KV, Dh).transpose(0, 2, 1, 3)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if have_pre:
            k_all = jnp.concatenate([kpl, k], axis=2)
            v_all = jnp.concatenate([vpl, v], axis=2)
        else:
            k_all, v_all = k, v
        # causal with Lk > Lq: suffix token j sees all prefix keys plus
        # suffix keys <= j (mha's diagonal offset is Lk - Lq = Lp).
        # K/V stay at KV heads (GQA-native flash / XLA-side repeat).
        if dense_win is not None:
            a = mha(q, k_all, v_all, mask=dense_win, scale=Dh**-0.5)
        else:
            a = mha(q, k_all, v_all, kv_mask=kv_mask_full, causal=True,
                    scale=Dh**-0.5, use_flash=cfg.use_flash,
                    mesh=cfg.flash_mesh, window=win)
        a = a.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)
        h = h + qmm(lp, "wo", a, cfg.qkernels, cfg.flash_mesh)
        hn = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        f = _ffn(lp, hn, cfg)
        return h + f, (k, v)

    xs = (params["layers"], pre_k, pre_v) if have_pre else params["layers"]
    h, (ks, vs) = jax.lax.scan(layer, x, xs)
    h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    return h, ks, vs, pos


def decoder_prefix_kv(
    params, cfg: DecoderConfig, input_ids: jax.Array, attn_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-layer post-RoPE K/V of shared prompt prefixes [Ld, G, KV, Lp, Dh].

    Prefixes are RIGHT-padded with absolute positions 0..len-1, so the
    result is row-independent: every row sharing the prefix reuses the
    same K/V. TPU-native analogue of vLLM's PagedAttention prefix caching
    (reference: llmrankers/setwise.py:450-454) — instead of paged blocks,
    the unique prefixes run as one small batch and rows gather their
    group's K/V (SURVEY.md §7 layer-2 plan)."""
    _, ks, vs, _ = _prefill_layers(params, cfg, input_ids, attn_mask)
    return ks, vs


def decoder_shared_prefill(
    params,
    cfg: DecoderConfig,
    pre_k: jax.Array,  # [Ld, B, KV, Lp, Dh] (gathered per row)
    pre_v: jax.Array,
    pre_mask: jax.Array,  # [B, Lp]
    suffix_ids: jax.Array,  # [B, Ls] RIGHT-padded
    suffix_mask: jax.Array,  # [B, Ls]
    max_new_tokens: Optional[int],
):
    """Prefill suffix tokens on top of shared-prefix K/V.

    Returns (last real-token hidden [B, D], cache) where cache matches
    ``decoder_prefill``'s format with prompt_len = Lp + Ls (padding holes
    between prefix and suffix are handled by key_mask; RoPE positions are
    contiguous per row). max_new_tokens=None skips cache assembly (label
    scoring)."""
    B, Ls = suffix_ids.shape
    Lp = pre_k.shape[3]
    pre_len = pre_mask.sum(axis=1).astype(jnp.int32)  # [B]
    h, ks, vs, _ = _prefill_layers(
        params, cfg, suffix_ids, suffix_mask,
        pre_k=pre_k, pre_v=pre_v, pre_mask=pre_mask, pos_offset=pre_len,
    )
    last_idx = jnp.maximum(jnp.sum(suffix_mask, axis=1) - 1, 0).astype(jnp.int32)
    last_h = h[jnp.arange(B), last_idx]  # [B, D]
    if max_new_tokens is None:
        return last_h, None
    T_new = max_new_tokens
    pad = ((0, 0), (0, 0), (0, 0), (0, T_new), (0, 0))
    k_all = jnp.concatenate([pre_k, ks], axis=3)
    v_all = jnp.concatenate([pre_v, vs], axis=3)
    if cfg.kv_quant:
        k8, ksc = _kv_pack(k_all, cfg.kv_quant)
        v8, vsc = _kv_pack(v_all, cfg.kv_quant)
        k_cache = (jnp.pad(k8, pad), jnp.pad(ksc, pad))
        v_cache = (jnp.pad(v8, pad), jnp.pad(vsc, pad))
    else:
        k_cache = jnp.pad(k_all, pad)
        v_cache = jnp.pad(v_all, pad)
    key_mask = jnp.pad(
        jnp.concatenate([pre_mask, suffix_mask], axis=1).astype(bool),
        ((0, 0), (0, T_new)),
    )
    next_pos = pre_len + jnp.sum(suffix_mask, axis=1).astype(jnp.int32)
    return last_h, (k_cache, v_cache, key_mask, next_pos)


def decoder_greedy_decode(
    params,
    cfg: DecoderConfig,
    first_token: jax.Array,  # [B] first sampled/greedy token from prefill
    cache,
    prompt_len: int,
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Continue generation; returns [B, max_new_tokens] including the
    first token (pad after EOS). temperature > 0 samples categorically
    (GRPO rollouts, train_grpo_v0.2.py:70 temperature=1.2); 0 = greedy."""
    out, _state = decoder_decode_chunk(
        params, cfg, first_token, cache, prompt_len, 0, max_new_tokens,
        eos_id, done=None, temperature=temperature, rng=rng,
    )
    return out


def _decode_token_forward(params, cfg: DecoderConfig, tok, kc, vc, amask,
                          cos, sin):
    """One-token forward against READ-ONLY caches, shared by the scalar
    (:func:`decoder_decode_chunk`) and per-row-write-position
    (:func:`decoder_decode_chunk_rr`) decode loops.

    The caches enter the layer scan as read-only xs. Writing them per
    layer (cache as scan carry/ys) forces XLA to copy the whole
    [Ld,B,KV,T,Dh] cache every step — measured 1.6x total decode step
    time on v5e at Qwen2.5-3B shapes. Instead each layer emits only its
    new (k, v) row; the current token joins attention as a rank-1
    online-softmax term; the CALLER appends all layers' rows in place.

    Returns (logits [B, V], k_new, v_new [Ld, B, KV, Dh])."""
    B = tok.shape[0]
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    dtype = quant.embed_dtype(params)
    x = quant.embed_rows(params, tok)  # [B, D]

    def layer(h, xs):
        lp, kcl, vcl = xs
        hn = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, hn, cfg)
        if cfg.attention_bias:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = q.reshape(B, H, Dh)
        k = k.reshape(B, KV, Dh)
        v = v.reshape(B, KV, Dh)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q[:, :, None, :], cos, sin)[:, :, 0, :]
        k = apply_rope(k[:, :, None, :], cos, sin)[:, :, 0, :]
        # Grouped-query attention against the cache without
        # materializing repeated K/V ([B,H,T,Dh] would be re-written
        # to HBM every step).
        G = H // KV
        qg = q.reshape(B, KV, G, Dh)
        if cfg.kvq_kernel and cfg.kv_quant:
            # Fused Pallas pass over the packed cache: each tile is
            # DMA'd once and (for int4) both nibble-plane dots run
            # from VMEM — the decode stream matches the cache
            # footprint instead of doubling (ops/kvq_attention.py).
            from ..ops.kvq_attention import kvq_decode_attention

            a = kvq_decode_attention(
                qg, kcl, vcl, k, v, amask, Dh**-0.5, cfg.kv_quant,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            # Quantized cache: dequant folds into the dots — the k scale
            # (per output column t) applies AFTER the q.k dot, the v
            # scale (per contracted t) folds into p. Only quantized
            # bytes cross HBM (_cached_qk/_cached_pv dispatch on mode).
            s = _cached_qk(qg, kcl, dtype, cfg.kv_quant, "bkgd,bktd->bkgt")
            s = s * (Dh**-0.5)
            s = jnp.where(amask[:, None, None, :], s, NEG_INF)
            # Current token's self-attention as an online-softmax term
            # (its k/v are not in the cache yet).
            s_self = jnp.einsum(
                "bkgd,bkd->bkg", qg, k, preferred_element_type=jnp.float32
            ) * (Dh**-0.5)
            m = jnp.maximum(jnp.max(s, axis=-1), s_self)  # [B, KV, G]
            p = jnp.exp(s - m[..., None])
            p_self = jnp.exp(s_self - m)
            z = p.sum(axis=-1) + p_self
            a = (
                _cached_pv(p, vcl, dtype, cfg.kv_quant, "bkgt,bktd->bkgd")
                + p_self[..., None] * v.astype(jnp.float32)[:, :, None, :]
            ) / z[..., None]
        h = h + qmm(lp, "wo", a.astype(dtype).reshape(B, H * Dh),
                    cfg.qkernels, cfg.flash_mesh)
        hn = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        f = _ffn(lp, hn, cfg)
        return h + f, (k, v)

    h, (k_new, v_new) = jax.lax.scan(layer, x, (params["layers"], kc, vc))
    h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    logits = dec_mod.lm_logits(params, cfg, h)
    return logits, k_new, v_new


def decoder_decode_chunk(
    params,
    cfg: DecoderConfig,
    first_token: jax.Array,  # [B] next token to consume
    cache,
    prompt_len: int,
    offset,  # int or traced scalar: tokens already generated before this chunk
    steps: int,
    eos_id: int,
    done: Optional[jax.Array] = None,  # [B] rows frozen by the host
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Generate ``steps`` tokens starting at cache position
    prompt_len + offset. Returns (tokens [B, steps],
    (next_token, cache, done)) so the host can stitch chunks together and
    stop early on multi-token stop strings (the Rank-R1 "</answer>" case,
    SURVEY.md §7 hard part #3)."""
    k_cache, v_cache, key_mask, next_pos = cache
    B = first_token.shape[0]
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    T = (k_cache[0] if cfg.kv_quant else k_cache).shape[3]
    dtype = quant.embed_dtype(params)
    L = prompt_len
    if done is None:
        done = jnp.zeros((B,), bool)

    # Sliding window: statically skipped unless the cache can outgrow it.
    win = cfg.sliding_window
    win = win if (win is not None and T > win) else None

    def step(carry, i):
        tok, kc, vc, kmask, pos, done = carry
        t = offset + i
        # write position in the cache is L + t (append after the prompt);
        # RoPE position is per-row `pos`.
        cos, sin = rope_cos_sin(pos[:, None], Dh, cfg.rope_theta,
                                dtype=quant.embed_dtype(params))
        if win is not None:
            # Per-slot positions: padding is contiguous per region and
            # appended slots are marked valid in order, so cumsum of the
            # validity mask reproduces every slot's RoPE position. Keys
            # further than the window behind the current token drop out
            # (the rank-1 self term below is rel 0, always visible).
            slot_pos = jnp.cumsum(kmask.astype(jnp.int32), axis=1) - 1
            amask = kmask & (pos[:, None] - slot_pos < win)
        else:
            amask = kmask

        logits, k_new, v_new = _decode_token_forward(
            params, cfg, tok, kc, vc, amask, cos, sin
        )

        def _append(cache_, new):
            if cfg.kv_quant:
                # [Ld,B,KV,Dh] -> payload + scale [Ld,B,KV,1 or 2]
                q8, sc = _kv_pack(new, cfg.kv_quant)
                return (
                    jax.lax.dynamic_update_slice(
                        cache_[0], q8[:, :, :, None, :], (0, 0, 0, L + t, 0)
                    ),
                    jax.lax.dynamic_update_slice(
                        cache_[1], sc[:, :, :, None, :], (0, 0, 0, L + t, 0)
                    ),
                )
            return jax.lax.dynamic_update_slice(
                cache_, new[:, :, :, None, :], (0, 0, 0, L + t, 0)
            )

        kc = _append(kc, k_new)
        vc = _append(vc, v_new)
        kmask = kmask.at[:, L + t].set(True)
        nxt = _pick(
            logits, temperature,
            jax.random.fold_in(rng, t) if rng is not None else None,
            tok.dtype,
        )
        out = jnp.where(done, cfg.pad_token_id, tok)
        done = jnp.logical_or(done, tok == eos_id)
        nxt = jnp.where(done, tok, nxt)
        return (nxt, kc, vc, kmask, pos + 1, done), out

    init = (first_token, k_cache, v_cache, key_mask, next_pos, done)
    (tok, kc, vc, kmask, pos, done), outs = jax.lax.scan(
        step, init, jnp.arange(steps)
    )
    return outs.T, (tok, (kc, vc, kmask, pos), done)  # [B, steps], state


# ---------------------------------------------------------------------------
# Decode-time slot refill (vLLM continuous-batching equivalent)
# ---------------------------------------------------------------------------
def decoder_decode_chunk_rr(
    params,
    cfg: DecoderConfig,
    first_token: jax.Array,  # [B] next token to consume per slot
    cache,
    wp: jax.Array,  # [B] per-row cache append position
    prompt_len: int,  # session prompt area size (wp starts here per slot)
    max_new_tokens: int,  # per-row budget, counted from the row's own wp-P
    steps: int,
    eos_id: int,
    done: jax.Array,  # [B]
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    step0=0,  # int or traced scalar: session-global step of this chunk's
    #           first token (sampling keys fold step0 + i — rows share a
    #           key per step but sample independently, see _pick)
):
    """Per-row-write-position decode chunk for slot-refill sessions.

    :func:`decoder_decode_chunk` shares ONE scalar cache write index
    (L + t) across every row, which forces all rows of a dispatch to
    start decoding together — rows that finish early sit as frozen pad
    filler until the whole dispatch drains (VERDICT r3 missing #2). Here
    each row appends at its OWN ``wp``, so a slot refilled at a later
    chunk boundary (``decoder_refill_slots``) decodes alongside older
    rows, with a full ``max_new_tokens`` budget counted from its own
    prompt end and frozen ON DEVICE once exhausted. This is the decode
    half of vLLM's continuous batching — the backend the reference
    delegates Rank-R1 to (llmrankers/setwise.py:450-454).

    Token-exact per row vs the scalar path: a row's outputs depend only
    on its own cache slice, key mask and RoPE position, all of which
    evolve identically (tests/test_refill.py pins this).

    Returns (tokens [B, steps], (next_token, cache, wp, done)).
    """
    k_cache, v_cache, key_mask, next_pos = cache
    Dh = cfg.head_dim_
    T = (k_cache[0] if cfg.kv_quant else k_cache).shape[3]
    pad_id = cfg.pad_token_id
    win = cfg.sliding_window
    win = win if (win is not None and T > win) else None

    def step(carry, i):
        tok, kc, vc, kmask, pos, wp, done = carry
        live = jnp.logical_and(~done, wp - prompt_len < max_new_tokens)
        cos, sin = rope_cos_sin(pos[:, None], Dh, cfg.rope_theta,
                                dtype=quant.embed_dtype(params))
        if win is not None:
            slot_pos = jnp.cumsum(kmask.astype(jnp.int32), axis=1) - 1
            amask = kmask & (pos[:, None] - slot_pos < win)
        else:
            amask = kmask
        logits, k_new, v_new = _decode_token_forward(
            params, cfg, tok, kc, vc, amask, cos, sin
        )
        nxt = _pick(
            logits, temperature,
            jax.random.fold_in(rng, step0 + i) if rng is not None else None,
            tok.dtype,
        )
        out = jnp.where(live, tok, pad_id)
        # Append this token's K/V at each row's own position. Frozen rows
        # overwrite their one unused slot with garbage that never becomes
        # visible (their kmask write below is False); a budget-exhausted
        # row's wp == T write clamps inside dynamic_update_slice — also
        # onto a slot only that frozen row could ever read.
        if cfg.kv_quant:
            k8, ks = _kv_pack(k_new, cfg.kv_quant)
            v8, vs = _kv_pack(v_new, cfg.kv_quant)
            kc = (_row_append(kc[0], k8[:, :, :, None, :], wp, 2),
                  _row_append(kc[1], ks[:, :, :, None, :], wp, 2))
            vc = (_row_append(vc[0], v8[:, :, :, None, :], wp, 2),
                  _row_append(vc[1], vs[:, :, :, None, :], wp, 2))
        else:
            kc = _row_append(kc, k_new[:, :, :, None, :], wp, 2)
            vc = _row_append(vc, v_new[:, :, :, None, :], wp, 2)
        kmask = _row_append(kmask, live[:, None], wp, 0)
        done2 = jnp.logical_or(done, jnp.logical_and(live, tok == eos_id))
        nxt_tok = jnp.where(jnp.logical_and(live, ~done2), nxt, tok)
        adv = live.astype(wp.dtype)
        return (nxt_tok, kc, vc, kmask, pos + adv, wp + adv, done2), out

    init = (first_token, k_cache, v_cache, key_mask, next_pos, wp, done)
    (tok, kc, vc, kmask, pos, wp, done), outs = jax.lax.scan(
        step, init, jnp.arange(steps)
    )
    return outs.T, (tok, (kc, vc, kmask, pos), wp, done)


def _rr_scatter(cache, tok, wp, done, new_cache, new_tok, slots):
    """Scatter freshly prefilled rows into a decode session's state at
    ``slots`` (an out-of-range slot marks a padding row — dropped).

    ``new_cache`` is an UNPADDED cache tuple whose T axis is the new
    rows' prompt length P (≤ the session prompt area); refilled rows
    restart at write position P with their real-token RoPE position."""
    k_cache, v_cache, key_mask, next_pos = cache
    nkc, nvc, nkmask, npos = new_cache
    T = key_mask.shape[1]
    P = nkmask.shape[1]

    def scat(buf, new):  # cache leaves [Ld, B, KV, T, ...]; rows on axis 1
        return buf.at[:, slots, :, :P].set(new, mode="drop")

    kc = (
        (scat(k_cache[0], nkc[0]), scat(k_cache[1], nkc[1]))
        if isinstance(k_cache, tuple) else scat(k_cache, nkc)
    )
    vc = (
        (scat(v_cache[0], nvc[0]), scat(v_cache[1], nvc[1]))
        if isinstance(v_cache, tuple) else scat(v_cache, nvc)
    )
    kmask = key_mask.at[slots].set(
        jnp.pad(nkmask.astype(bool), ((0, 0), (0, T - P))), mode="drop"
    )
    pos = next_pos.at[slots].set(npos, mode="drop")
    tok = tok.at[slots].set(new_tok, mode="drop")
    wp = wp.at[slots].set(P, mode="drop")
    done = done.at[slots].set(False, mode="drop")
    return tok, (kc, vc, kmask, pos), wp, done


def decoder_refill_slots(
    params,
    cfg: DecoderConfig,
    cache,
    tok: jax.Array,
    wp: jax.Array,
    done: jax.Array,
    ids: jax.Array,  # [Br, P] LEFT-padded to the session prompt length
    mask: jax.Array,  # [Br, P]
    slots: jax.Array,  # [Br] session slot per row; out-of-range = padding
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Prefill pending prompts and scatter them into a decode session.

    The prefill half of continuous batching: the session's cache keeps
    its shape, only the freed rows' contents are replaced, so the decode
    jit (``decoder_decode_chunk_rr``) never recompiles mid-session.
    Unlike :func:`decoder_prefill` this never materializes the
    (P + max_new)-padded per-batch cache — K/V stay at prompt length
    until the scatter, keeping the refill transient ~P/(P+max_new) of a
    resident row.

    Returns (tok, cache, wp, done) with the refilled slots live.
    """
    h, ks, vs, pos = _prefill_layers(params, cfg, ids, mask)
    # Left-padded: the last position is the last real token.
    first = _pick(
        dec_mod.lm_logits(params, cfg, h[:, -1, :]), temperature, rng,
        tok.dtype,
    )
    if cfg.kv_quant:
        nkc = _kv_pack(ks, cfg.kv_quant)
        nvc = _kv_pack(vs, cfg.kv_quant)
    else:
        nkc, nvc = ks, vs
    new_cache = (nkc, nvc, mask.astype(bool), pos[:, -1] + 1)
    return _rr_scatter(cache, tok, wp, done, new_cache, first, slots)


def decoder_refill_slots_pre(
    params,
    cfg: DecoderConfig,
    cache,
    tok: jax.Array,
    wp: jax.Array,
    done: jax.Array,
    ks: jax.Array,  # [Ld, G, KV, Lp, Dh] PRECOMPUTED prefix K (session)
    vs: jax.Array,
    pmask: jax.Array,  # [G, Lp]
    gidx: jax.Array,  # [Br] group per row
    sids: jax.Array,  # [Br, Ls] RIGHT-padded suffixes; Lp + Ls == session P
    smask: jax.Array,
    slots: jax.Array,  # [Br]
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Refill from a SESSION-CACHED prefix K/V: only the suffix tokens run
    a forward pass. A refill session whose pending rows share the initial
    dispatch's prompt prefixes (the Rank-R1 wave shape — one system +
    query head across all comparisons) would otherwise re-run the prefix
    forward on EVERY refill batch: measured on the tunneled TPU chip, the
    800-token-prefix refill A/B spent so much on repeated prefix prefills
    that slot refill only broke even (speedup 0.99, 2026-08-19 run) —
    vLLM avoids exactly this via PagedAttention prefix block reuse
    (reference llmrankers/setwise.py:450-454)."""
    kpre = jnp.take(ks, gidx, axis=1)
    vpre = jnp.take(vs, gidx, axis=1)
    pmask_b = jnp.take(pmask, gidx, axis=0)
    # max_new_tokens=0: the assembled cache stays at prompt length
    # (Lp + Ls), exactly the scatter source _rr_scatter wants.
    last_h, new_cache = decoder_shared_prefill(
        params, cfg, kpre, vpre, pmask_b, sids, smask, 0
    )
    first = _pick(
        dec_mod.lm_logits(params, cfg, last_h), temperature, rng, tok.dtype
    )
    return _rr_scatter(cache, tok, wp, done, new_cache, first, slots)


def decoder_refill_slots_shared(
    params,
    cfg: DecoderConfig,
    cache,
    tok: jax.Array,
    wp: jax.Array,
    done: jax.Array,
    pids: jax.Array,  # [G, Lp] RIGHT-padded unique prefixes
    pmask: jax.Array,
    gidx: jax.Array,  # [Br] group per row
    sids: jax.Array,  # [Br, Ls] RIGHT-padded suffixes; Lp + Ls == session P
    smask: jax.Array,
    slots: jax.Array,  # [Br]
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Shared-prefix variant of :func:`decoder_refill_slots`: unique
    prompt prefixes prefill once and rows gather their group's K/V, so a
    refill batch keeps the prefix-sharing saving of the initial dispatch
    (engine._group). Used when a refill batch's prefixes DIFFER from the
    session's cached set (else :func:`decoder_refill_slots_pre` skips the
    prefix forward entirely). The scattered rows use the right-padded-
    with-hole layout; it coexists with left-padded rows in the same
    session because every row is self-describing via its key mask and
    RoPE positions."""
    ks, vs = decoder_prefix_kv(params, cfg, pids, pmask)
    return decoder_refill_slots_pre(
        params, cfg, cache, tok, wp, done, ks, vs, pmask, gidx, sids,
        smask, slots, temperature=temperature, rng=rng,
    )


# ---------------------------------------------------------------------------
# Prompt-lookup speculative decoding (vLLM ngram-speculation equivalent)
# ---------------------------------------------------------------------------
def _row_append(buf: jax.Array, blk: jax.Array, starts: jax.Array,
                axis: int) -> jax.Array:
    """Per-row dynamic append: write ``blk``'s slice into ``buf`` at each
    row's own start index along ``axis`` (rows live on axis 0 of the
    vmap; for caches that is physical axis 1)."""
    ndim = buf.ndim - 1  # per-row rank

    def one(b, x, s):
        starts_ = tuple(s if d == axis else 0 for d in range(ndim))
        return jax.lax.dynamic_update_slice(b, x, starts_)

    if buf.ndim == 2:  # [B, T] host-style buffers (hist, key_mask)
        return jax.vmap(one, in_axes=(0, 0, 0))(buf, blk, starts)
    # caches [Ld, B, KV, T, Dh]: rows on axis 1
    return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(buf, blk, starts)


def decoder_spec_decode_chunk(
    params,
    cfg: DecoderConfig,
    first_token: jax.Array,  # [B] pending token (greedy, not yet consumed)
    cache,
    hist: jax.Array,  # [B, T] token history laid out like the cache
    wp: jax.Array,  # [B] per-row physical append position in the cache
    prompt_len: int,
    max_new_tokens: int,  # per-row generation budget (freeze past it)
    rounds: int,
    K: int,  # draft length per round
    eos_id: int,
    done: Optional[jax.Array] = None,
):
    """``rounds`` rounds of prompt-lookup speculative decoding.

    Each round drafts K tokens by bigram lookup in the row's own token
    history (prompt + generated — the TPU-native equivalent of vLLM's
    ngram speculative decoding; Rank-R1 reasoning completions quote
    passage text heavily, reference setwise.py:445-446), then verifies
    the pending token plus all K drafts in ONE (K+1)-token forward
    against the read-only KV cache. Greedy acceptance keeps outputs
    IDENTICAL to the step-by-step scan at any accept rate: every emitted
    token is the model's own argmax — drafts only decide how many argmax
    positions one forward yields (1 to K+1).

    Per-row bookkeeping (rows accept different counts): ``wp`` is each
    row's cache append position; blocks are written with per-row
    dynamic_update_slice and only the consumed prefix is marked valid in
    key_mask. Rejected garbage beyond it is overwritten by the next
    round's block (same size), so the cache needs 2*(K+1) slack past
    ``prompt_len + max_new_tokens`` (the engine allocates it).

    Returns (tokens [B, rounds, K+1], counts [B, rounds],
    (next_token, cache, hist, wp, done)).
    """
    k_cache, v_cache, key_mask, next_pos = cache
    B = first_token.shape[0]
    S = K + 1
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    G = H // KV
    T = (k_cache[0] if cfg.kv_quant else k_cache).shape[3]
    dtype = quant.embed_dtype(params)
    pad_id = cfg.pad_token_id
    L = prompt_len
    if done is None:
        done = jnp.zeros((B,), bool)
    pos_idx = jnp.arange(T)
    idxS = jnp.arange(S)[None, :]
    # Strictly-below-diagonal in-block mask; the diagonal (each token's
    # self-attention) is a separate unquantized term so kv_quant numerics
    # match the step-by-step scan exactly (there, predecessors are read
    # back quantized from the cache but the current token never is).
    tri = jnp.arange(S)[:, None] > jnp.arange(S)[None, :]
    # Sliding window: statically skipped unless the cache can outgrow it.
    # In-block deltas are at most S-1, so the block mask only changes in
    # the degenerate win < S case.
    win = cfg.sliding_window
    win = win if (win is not None and T > win) else None
    if win is not None and win < S:
        tri = tri & (
            jnp.arange(S)[:, None] - jnp.arange(S)[None, :] < win
        )

    def round_fn(carry, _):
        tok, kc, vc, kmask, pos, hist, wp, done = carry
        # Freeze rows that are eos-done OR past their token budget (other
        # rows in the batch may still be live).
        frozen = jnp.logical_or(done, wp - L >= max_new_tokens)

        # --- draft: last bigram match in the valid history -------------
        p_prev = jnp.max(jnp.where(kmask, pos_idx[None, :], -1), axis=1)
        prev = jnp.take_along_axis(
            hist, jnp.maximum(p_prev, 0)[:, None], axis=1
        )[:, 0]
        prev = jnp.where(p_prev >= 0, prev, -1)
        hist_m1 = jnp.concatenate(
            [jnp.full((B, 1), -1, hist.dtype), hist[:, :-1]], axis=1
        )
        kmask_m1 = jnp.concatenate(
            [jnp.zeros((B, 1), bool), kmask[:, :-1]], axis=1
        )
        # Exclude the final valid position: a match there is the current
        # context itself, whose continuation hasn't been generated yet
        # (drafts would all be invalid — the repeating-token case).
        match = (
            (hist == tok[:, None]) & (hist_m1 == prev[:, None])
            & kmask & kmask_m1 & (pos_idx[None, :] < p_prev[:, None])
        )
        # Prefer the longer (trigram) context when one matches — more
        # precise drafts, higher accept rates on real text (vLLM's ngram
        # speculation does the same); fall back to the bigram match.
        # Outputs are invariant to draft choice either way.
        p_prev2 = jnp.max(
            jnp.where(kmask & (pos_idx[None, :] < p_prev[:, None]),
                      pos_idx[None, :], -1),
            axis=1,
        )
        prev2 = jnp.take_along_axis(
            hist, jnp.maximum(p_prev2, 0)[:, None], axis=1
        )[:, 0]
        prev2 = jnp.where(p_prev2 >= 0, prev2, -2)
        hist_m2 = jnp.concatenate(
            [jnp.full((B, 2), -1, hist.dtype), hist[:, :-2]], axis=1
        )
        kmask_m2 = jnp.concatenate(
            [jnp.zeros((B, 2), bool), kmask[:, :-2]], axis=1
        )
        match3 = match & (hist_m2 == prev2[:, None]) & kmask_m2
        p2 = jnp.max(jnp.where(match, pos_idx[None, :], -1), axis=1)
        p3 = jnp.max(jnp.where(match3, pos_idx[None, :], -1), axis=1)
        p_best = jnp.where(p3 >= 0, p3, p2)
        didx = jnp.minimum(
            p_best[:, None] + 1 + jnp.arange(K)[None, :], T - 1
        )
        drafts = jnp.take_along_axis(hist, didx, axis=1)
        dvalid = (
            jnp.take_along_axis(kmask, didx, axis=1) & (p_best >= 0)[:, None]
        )
        # Invalid drafts become pad — correctness never depends on draft
        # content (a wrong draft is simply rejected by verification).
        drafts = jnp.where(dvalid, drafts, pad_id).astype(tok.dtype)
        bt = jnp.concatenate([tok[:, None], drafts], axis=1)  # [B, S]

        # --- verify: one S-token forward against the read-only cache ---
        x = quant.embed_rows(params, bt)  # [B, S, D]
        poss = pos[:, None] + jnp.arange(S)[None, :]
        cos, sin = rope_cos_sin(poss, Dh, cfg.rope_theta, dtype=x.dtype)
        if win is not None:
            slot_pos = jnp.cumsum(kmask.astype(jnp.int32), axis=1) - 1
            amask = (
                kmask[:, None, :]
                & (poss[:, :, None] - slot_pos[:, None, :] < win)
            )  # [B, S, T]
            amask = amask[:, None, None]  # [B, 1, 1, S, T]
        else:
            amask = kmask[:, None, None, None, :]

        def layer(h, xs):
            lp, kcl, vcl = xs
            hn = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
            q, k, v = _qkv(lp, hn, cfg)
            if cfg.attention_bias:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
            k = k.reshape(B, S, KV, Dh).transpose(0, 2, 1, 3)
            v = v.reshape(B, S, KV, Dh).transpose(0, 2, 1, 3)
            if cfg.qk_norm:
                q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            qg = q.reshape(B, KV, G, S, Dh)
            s_c = _cached_qk(qg, kcl, dtype, cfg.kv_quant,
                             "bkgsd,bktd->bkgst")
            s_c = s_c * (Dh**-0.5)
            s_c = jnp.where(amask, s_c, NEG_INF)
            # In-block attention on earlier block positions. Under
            # kv_quant they go through the SAME quantize fold as the
            # cache (the scan would have appended them a step earlier).
            if cfg.kv_quant:
                kb = _kv_pack(k, cfg.kv_quant)
                vb = _kv_pack(v, cfg.kv_quant)
            else:
                kb, vb = k, v
            s_b = _cached_qk(qg, kb, dtype, cfg.kv_quant,
                             "bkgsd,bkud->bkgsu")
            s_b = s_b * (Dh**-0.5)
            s_b = jnp.where(tri[None, None, None], s_b, NEG_INF)
            # Each token's own K/V, always unquantized (the scan's rank-1
            # online-softmax self term).
            s_self = jnp.einsum(
                "bkgsd,bksd->bkgs", qg, k, preferred_element_type=jnp.float32
            ) * (Dh**-0.5)
            m = jnp.maximum(
                jnp.maximum(jnp.max(s_c, axis=-1), jnp.max(s_b, axis=-1)),
                s_self,
            )
            p_c = jnp.exp(s_c - m[..., None])
            p_b = jnp.exp(s_b - m[..., None])
            p_self = jnp.exp(s_self - m)
            z = p_c.sum(axis=-1) + p_b.sum(axis=-1) + p_self
            a = (
                _cached_pv(p_c, vcl, dtype, cfg.kv_quant,
                           "bkgst,bktd->bkgsd")
                + _cached_pv(p_b, vb, dtype, cfg.kv_quant,
                             "bkgsu,bkud->bkgsd")
                + p_self[..., None] * v.astype(jnp.float32)[:, :, None, :, :]
            ) / z[..., None]
            a = (
                a.astype(dtype)
                .reshape(B, H, S, Dh)
                .transpose(0, 2, 1, 3)
                .reshape(B, S, H * Dh)
            )
            h = h + qmm(lp, "wo", a, cfg.qkernels, cfg.flash_mesh)
            hn2 = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
            f = _ffn(lp, hn2, cfg)
            return h + f, (k, v)

        h, (k_new, v_new) = jax.lax.scan(layer, x, (params["layers"], kc, vc))
        h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
        logits = dec_mod.lm_logits(params, cfg, h)  # [B, S, V]
        nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)  # [B, S]

        # --- greedy acceptance -----------------------------------------
        flags = jnp.cumprod(
            (bt[:, 1:] == nxt[:, :-1]).astype(jnp.int32), axis=1
        )  # [B, K]
        acc = flags.sum(axis=1)
        cand = idxS <= acc[:, None]  # consumed candidates 0..acc
        is_eos = (bt == eos_id) & cand
        any_eos = is_eos.any(axis=1) & ~frozen
        first_eos = jnp.argmax(is_eos, axis=1)
        c = jnp.where(any_eos, first_eos + 1, acc + 1)
        c = jnp.where(frozen, 0, c)
        out_r = jnp.where(idxS < c[:, None], bt, pad_id)
        bonus = jnp.take_along_axis(
            nxt, jnp.maximum(c - 1, 0)[:, None], axis=1
        )[:, 0]
        tok2 = jnp.where(frozen, tok, jnp.where(any_eos, eos_id, bonus))
        done2 = jnp.logical_or(done, any_eos)

        # --- append block to cache/history at per-row positions --------
        if cfg.kv_quant:
            k8, ks = _kv_pack(k_new, cfg.kv_quant)
            v8, vs = _kv_pack(v_new, cfg.kv_quant)
            kc = (_row_append(kc[0], k8, wp, 2),
                  _row_append(kc[1], ks, wp, 2))
            vc = (_row_append(vc[0], v8, wp, 2),
                  _row_append(vc[1], vs, wp, 2))
        else:
            kc = _row_append(kc, k_new, wp, 2)
            vc = _row_append(vc, v_new, wp, 2)
        hist2 = _row_append(hist, bt, wp, 0)
        kmask2 = _row_append(kmask, idxS < c[:, None], wp, 0)
        return (tok2, kc, vc, kmask2, pos + c, hist2, wp + c, done2), (out_r, c)

    init = (first_token, k_cache, v_cache, key_mask, next_pos, hist, wp, done)
    (tok, kc, vc, kmask, pos, hist, wp, done), (outs, counts) = jax.lax.scan(
        round_fn, init, jnp.arange(rounds)
    )
    return (
        outs.transpose(1, 0, 2),  # [B, rounds, S]
        counts.T,  # [B, rounds]
        (tok, (kc, vc, kmask, pos), hist, wp, done),
    )
