"""AWQ-style activation-aware quantization calibration (decoder family).

Offline, weights-only transform (AWQ, arXiv:2306.00978): quantization
error concentrates in the weight input-channels that multiply
large-magnitude activation channels. Per matmul-site group, scale the
weight's INPUT channels up by ``s`` and the producing op's output
channels down by ``1/s`` — mathematically exact in full precision — so
the per-channel / group-wise quantizers (models/quant.py,
ops/int4_matmul.py) spend their dynamic range where the activations
actually are. ``s = act_amax**alpha`` with ``alpha`` grid-searched per
(layer, group) against the true quantize-dequantize error on cached
calibration activations, exactly the published search; ``alpha = 0``
(s = 1) is always in the grid, so a calibrated site is never worse than
the uncalibrated one on the calibration set.

Reference match: the reference's vLLM backend serves AWQ checkpoints by
model id (setwise.py:450-454 accepts any HF model, including *-AWQ);
this module provides the calibration itself, on-framework, so
``--quantize int4/int8`` decoder serving can be calibrated on in-domain
ranking prompts (NEXT.md round-3 item: "activation-aware scale
calibration (AWQ-style)").

Fold pairs (models/decoder.py::forward_hidden):

  qkv:     ln1 gamma  *= 1/s       wq/wk/wv input rows *= s
  o:       wv output cols (+bv) *= 1/s;  wo input rows  *= s
           (GQA: s is shared across the query heads of a group — the
           attention value mix is linear per (kv head, channel), so the
           fold is exact exactly when s is group-constant)
  gateup:  ln2 gamma  *= 1/s       w_gate/w_up input rows *= s
  down:    w_up output cols *= 1/s;      w_down input rows *= s
           (g = silu(gate) * up is linear in up's output channels)

Every fold leaves the site OUTPUTS invariant, so RoPE, qk-norm, softmax,
residuals and the qkv biases (added after the invariant matmul) are
untouched; the full-precision folded model equals the original
(tests/test_awq.py pins this to float tolerance for bias/GQA/qk-norm
configs). Calibration runs on the UNQUANTIZED params — the engine folds
first, then quantizes (engine/engine.py ``awq_calib``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.int4_matmul import choose_group, pack_int4, unpack_int4
from .config import DecoderConfig
from .quant import INT4_MIN_SITE_PARAMS

Params = Dict[str, Any]

ALPHA_GRID = (0.0, 0.25, 0.5, 0.75, 1.0)


def collect_taps(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jax.Array,  # [B, L]
    attn_mask: jax.Array,  # [B, L] {0,1}
    sample_rows: int = 256,
) -> Dict[str, jax.Array]:
    """One tapped forward over the calibration batch; returns per-layer
    input-activation samples for each quantizable site group, stacked
    [Lyr, S, ·] (decoder.forward_hidden tap branch). Sample rows are an
    even stride over the VALID (mask=1) token positions."""
    from . import decoder

    valid = np.nonzero(np.asarray(attn_mask).reshape(-1))[0]
    if valid.size == 0:
        raise ValueError("awq calibration batch has no valid tokens")
    take = min(sample_rows, valid.size)
    idx = valid[np.linspace(0, valid.size - 1, take).astype(np.int64)]
    _, _, taps = decoder.forward_hidden(
        params, cfg, input_ids, attn_mask, tap_idx=jnp.asarray(idx)
    )
    return {k: v.astype(jnp.float32) for k, v in taps.items()}


def _qdq(w: jax.Array, mode: str) -> jax.Array:
    """Quantize-dequantize a stacked [L, K, N] site with the SAME math
    the serving quantizers apply (models/quant.py), including int4's
    site routing: small sites and group-less K fall back to int8."""
    K, N = w.shape[-2], w.shape[-1]
    if mode == "int4" and choose_group(K) != 0 and K * N >= INT4_MIN_SITE_PARAMS:
        return unpack_int4(*pack_int4(w)).astype(jnp.float32)
    # per-output-channel symmetric int8 (quant._quantize_layer_stack)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True), 1e-8)
    q = jnp.clip(jnp.round(w / amax * 127.0), -127, 127)
    return q * (amax / 127.0)


def _fit_group(
    x: jax.Array,  # [L, S, K] f32 — the group's shared input sample
    ws: Sequence[jax.Array],  # each [L, K, N_i] — sites sharing that input
    mode: str,
    alpha_grid: Sequence[float],
    constrain=None,  # act [L, K] -> [L, K] (GQA group sharing)
) -> Tuple[jax.Array, float, float]:
    """Per-layer alpha search: returns (s [L, K], err at alpha=0, best
    err) where err is the summed squared output error of the
    quantize-dequantized sites on the calibration sample."""
    ws = [w.astype(jnp.float32) for w in ws]
    refs = [jnp.einsum("lsk,lkn->lsn", x, w) for w in ws]
    act = jnp.mean(jnp.abs(x), axis=1)  # [L, K]
    if constrain is not None:
        act = constrain(act)
    act = act / jnp.maximum(jnp.mean(act, axis=-1, keepdims=True), 1e-8)
    act = jnp.clip(act, 1e-4, 1e4)

    cand_s, cand_err = [], []
    for a in alpha_grid:
        s = act**a  # [L, K]; a=0 -> ones
        xs = x / s[:, None, :]
        err = 0.0
        for w, ref in zip(ws, refs):
            wq = _qdq(w * s[:, :, None], mode)
            err = err + jnp.sum(
                (jnp.einsum("lsk,lkn->lsn", xs, wq) - ref) ** 2, axis=(1, 2)
            )
        cand_s.append(s)
        cand_err.append(err)  # [L]
    errs = jnp.stack(cand_err)  # [A, L]
    best = jnp.argmin(errs, axis=0)  # [L]
    s_best = jnp.take_along_axis(
        jnp.stack(cand_s), best[None, :, None], axis=0
    )[0]
    i0 = list(alpha_grid).index(0.0) if 0.0 in alpha_grid else 0
    return s_best, float(jnp.sum(errs[i0])), float(jnp.sum(jnp.min(errs, axis=0)))


def awq_scales(
    taps: Dict[str, jax.Array],
    layers: Dict[str, Any],
    cfg: DecoderConfig,
    mode: str,
    alpha_grid: Sequence[float] = ALPHA_GRID,
) -> Tuple[Dict[str, jax.Array], Dict[str, float]]:
    """Fit the four fold groups; returns ({group: s}, {group: error
    ratio best/uncalibrated} for observability)."""
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    G = H // KV

    def gqa_share(act: jax.Array) -> jax.Array:  # [L, H*Dh]
        L = act.shape[0]
        a = act.reshape(L, KV, G, Dh).max(axis=2, keepdims=True)
        return jnp.broadcast_to(a, (L, KV, G, Dh)).reshape(L, H * Dh)

    groups = {
        "qkv": (taps["attn_in"], [layers["wq"], layers["wk"], layers["wv"]], None),
        "o": (taps["o_in"], [layers["wo"]], gqa_share),
        "gateup": (taps["ffn_in"], [layers["w_gate"], layers["w_up"]], None),
        "down": (taps["down_in"], [layers["w_down"]], None),
    }
    scales, info = {}, {}
    for name, (x, ws, constr) in groups.items():
        s, e0, eb = _fit_group(x, ws, mode, alpha_grid, constrain=constr)
        scales[name] = s
        info[name] = round(eb / max(e0, 1e-30), 4)
    return scales, info


def apply_awq(
    params: Params, scales: Dict[str, jax.Array], cfg: DecoderConfig
) -> Params:
    """Fold the fitted scales into a NEW param pytree (original dtypes
    preserved; unquantized leaves shared). Exact: the folded model's
    full-precision outputs equal the original's."""
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    G = H // KV
    lyr = dict(params["layers"])
    dt = lyr["wq"].dtype

    def rows(w, s):  # input-channel scale: [L, K, N] * s[L, K, 1]
        return (w.astype(jnp.float32) * s[:, :, None]).astype(dt)

    def cols(w, s):  # output-channel scale: [L, K, N] * s[L, 1, N]
        return (w.astype(jnp.float32) * s[:, None, :]).astype(dt)

    s = scales["qkv"]
    lyr["ln1"] = (lyr["ln1"].astype(jnp.float32) / s).astype(dt)
    for n in ("wq", "wk", "wv"):
        lyr[n] = rows(lyr[n], s)

    s = scales["o"]  # [L, H*Dh], group-constant (awq_scales.gqa_share)
    L = s.shape[0]
    s_v = s.reshape(L, KV, G, Dh)[:, :, 0, :].reshape(L, KV * Dh)
    lyr["wv"] = cols(lyr["wv"], 1.0 / s_v)
    if "bv" in lyr:  # v output = hn @ wv + bv: the whole output scales
        lyr["bv"] = (lyr["bv"].astype(jnp.float32) / s_v).astype(dt)
    lyr["wo"] = rows(lyr["wo"], s)

    s = scales["gateup"]
    lyr["ln2"] = (lyr["ln2"].astype(jnp.float32) / s).astype(dt)
    for n in ("w_gate", "w_up"):
        lyr[n] = rows(lyr[n], s)

    s = scales["down"]
    lyr["w_up"] = cols(lyr["w_up"], 1.0 / s)
    lyr["w_down"] = rows(lyr["w_down"], s)

    out = dict(params)
    out["layers"] = lyr
    return out


def calibrate(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jax.Array,
    attn_mask: jax.Array,
    mode: str = "int4",
    sample_rows: int = 256,
    alpha_grid: Sequence[float] = ALPHA_GRID,
) -> Tuple[Params, Dict[str, float]]:
    """Full calibration: tap activations on the calibration batch, fit
    per-(layer, group) scales for the given quantize mode, fold them.
    Returns (folded params, {group: quantization-error ratio vs
    uncalibrated, < 1 means AWQ helped})."""
    taps = collect_taps(params, cfg, input_ids, attn_mask, sample_rows)
    scales, info = awq_scales(taps, params["layers"], cfg, mode, alpha_grid)
    return apply_awq(params, scales, cfg), info


def calib_batch_from_texts(
    tokenizer, texts: Sequence[str], max_len: int = 1024, max_rows: int = 16
) -> Tuple[jax.Array, jax.Array]:
    """Tokenize calibration prompts into a right-padded [B, L] batch +
    mask (positions derive from the mask, so right padding is exact for
    the tapped forward)."""
    rows: List[List[int]] = [
        tokenizer.encode(t, add_special_tokens=True)[:max_len]
        for t in texts[:max_rows]
    ]
    if not rows:
        raise ValueError("awq calibration needs at least one prompt")
    L = max(len(r) for r in rows)
    ids = np.zeros((len(rows), L), np.int32)
    mask = np.zeros((len(rows), L), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1
    return jnp.asarray(ids), jnp.asarray(mask)
