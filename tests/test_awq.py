"""AWQ-style activation-aware calibration (models/awq.py).

Pins the two properties that make the transform safe to ship:
1. EXACTNESS — folding arbitrary positive per-channel scales into the
   producer/consumer pairs leaves the full-precision model output
   unchanged (incl. qkv bias, GQA sharing, qk-norm).
2. PAYOFF — on a model with outlier activation channels (the regime AWQ
   exists for, arXiv:2306.00978 §3), calibrated quantization has
   strictly lower logit error than uncalibrated quantization, at both
   int8 and int4, and through the engine surface.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmrankers_tpu.models import awq, decoder
from llmrankers_tpu.models.config import DecoderConfig


def _batch(cfg, rows=4, L=48, seed=7):
    rng = np.random.RandomState(seed)
    ids = rng.randint(2, cfg.vocab_size, (rows, L)).astype(np.int32)
    mask = np.ones((rows, L), np.int32)
    # ragged validity so the tap index path sees real padding
    mask[0, L - 5:] = 0
    ids[0, L - 5:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def _outlier_params(cfg, seed=0, channels=(3, 11, 17), factor=40.0):
    """Random-init params whose embedding injects large per-channel
    activation outliers — the salient-channel regime AWQ targets."""
    params = decoder.init_params(cfg, jax.random.PRNGKey(seed))
    emb = np.array(params["embed"], np.float32)
    emb[:, list(channels)] *= factor
    out = dict(params)
    out["embed"] = jnp.asarray(emb)
    return out


def _rand_scales(cfg, key):
    """Arbitrary positive scales per fold group (NOT fitted) — exactness
    must hold for any s, group-constant for o."""
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    G = H // KV
    Lyr, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jnp.exp(jax.random.uniform(k, shape, minval=-1.5, maxval=1.5))
    s_o = jnp.broadcast_to(
        u(ks[1], (Lyr, KV, 1, Dh)), (Lyr, KV, G, Dh)
    ).reshape(Lyr, H * Dh)
    return {
        "qkv": u(ks[0], (Lyr, D)),
        "o": s_o,
        "gateup": u(ks[2], (Lyr, D)),
        "down": u(ks[3], (Lyr, F)),
    }


@pytest.mark.quick
@pytest.mark.parametrize(
    "variant",
    ["gqa_bias", "qk_norm"],
)
def test_fold_is_exact(variant):
    """Arbitrary-scale folds leave full-precision logits unchanged."""
    cfg = DecoderConfig.tiny(
        attention_bias=(variant == "gqa_bias"),
        qk_norm=(variant == "qk_norm"),
    )
    params = decoder.init_params(cfg, jax.random.PRNGKey(1))
    ids, mask = _batch(cfg)
    ref = decoder.forward(params, cfg, ids, mask)
    folded = awq.apply_awq(params, _rand_scales(cfg, jax.random.PRNGKey(2)), cfg)
    got = decoder.forward(folded, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


@pytest.mark.quick
def test_tap_branch_matches_production_forward():
    """forward_hidden's tap branch returns the same final hidden as the
    untapped path, and taps have the documented shapes."""
    cfg = DecoderConfig.tiny(attention_bias=True)
    params = decoder.init_params(cfg, jax.random.PRNGKey(3))
    ids, mask = _batch(cfg)
    h_ref, pos_ref = decoder.forward_hidden(params, cfg, ids, mask)
    idx = jnp.arange(0, ids.size, 7, dtype=jnp.int32)
    h_tap, pos_tap, taps = decoder.forward_hidden(
        params, cfg, ids, mask, tap_idx=idx
    )
    np.testing.assert_allclose(np.asarray(h_tap), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pos_tap), np.asarray(pos_ref))
    Lyr, D = cfg.num_hidden_layers, cfg.hidden_size
    H, KV, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim_)
    S = idx.shape[0]
    assert taps["attn_in"].shape == (Lyr, S, D)
    assert taps["o_in"].shape == (Lyr, S, H * Dh)
    assert taps["ffn_in"].shape == (Lyr, S, D)
    assert taps["down_in"].shape == (Lyr, S, cfg.intermediate_size)


def _quant_logit_mse(params, cfg, ids, mask, mode, calib=False):
    from llmrankers_tpu.models.quant import (
        quantize_decoder_params,
        quantize_decoder_params_int4,
    )

    ref = np.asarray(decoder.forward(params, cfg, ids, mask), np.float32)
    p = params
    info = None
    if calib:
        p, info = awq.calibrate(p, cfg, ids, mask, mode=mode)
    if mode == "int4":
        # tiny sites: drop the int8 size fallback so the int4 path is
        # what gets exercised (mirrors _qdq's routing knob)
        q = quantize_decoder_params_int4(p, min_site_params=0,
                                         quantize_head=False)
    else:
        q = quantize_decoder_params(p, quantize_head=False)
    got = np.asarray(decoder.forward(q, cfg, ids, mask), np.float32)
    return float(np.mean((got - ref) ** 2)), info


@pytest.mark.quick
@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_calibration_reduces_quant_error_on_outlier_model(mode):
    """With activation-channel outliers, AWQ-calibrated quantization has
    strictly lower logit MSE than plain quantization."""
    # hidden 128 so every site (incl. 64-wide kv heads) is int4-groupable
    cfg = DecoderConfig.tiny()
    cfg = dataclasses.replace(cfg, hidden_size=128, intermediate_size=256,
                              num_key_value_heads=4)
    params = _outlier_params(cfg)
    ids, mask = _batch(cfg, rows=4, L=64)
    plain, _ = _quant_logit_mse(params, cfg, ids, mask, mode, calib=False)
    awq_mse, info = _quant_logit_mse(params, cfg, ids, mask, mode, calib=True)
    assert awq_mse < plain, (awq_mse, plain, info)
    # the fitted error ratios the engine logs agree something was won
    assert any(v < 1.0 for v in info.values()), info


@pytest.mark.quick
def test_alpha_zero_guard_on_uniform_activations():
    """Without outliers, the alpha grid may pick 0 everywhere — the fold
    must then be (near-)identity and never hurt."""
    cfg = DecoderConfig.tiny()
    params = decoder.init_params(cfg, jax.random.PRNGKey(5))
    ids, mask = _batch(cfg)
    plain, _ = _quant_logit_mse(params, cfg, ids, mask, "int8", calib=False)
    awq_mse, info = _quant_logit_mse(params, cfg, ids, mask, "int8", calib=True)
    assert awq_mse <= plain * 1.05, (awq_mse, plain, info)
    assert all(v <= 1.0 + 1e-6 for v in info.values()), info


@pytest.mark.quick
def test_engine_awq_calib_end_to_end():
    """Engine surface: awq_calib folds before quantize, the fit info is
    recorded, and calibrated scoring stays in the plain-quantized
    engine's error regime (the PAYOFF inequality is pinned at the model
    level above — at the engine surface, head quantization and the tiny
    calib set put the two arms within noise of each other)."""
    from llmrankers_tpu.engine import ByteTokenizer, ScoringEngine

    cfg = DecoderConfig.tiny()
    cfg = dataclasses.replace(cfg, hidden_size=128, intermediate_size=256,
                              num_key_value_heads=4)
    params = _outlier_params(cfg)
    tok = ByteTokenizer(cfg.vocab_size)
    prompts = [f"rank passages for query {i}: the relevant one" for i in range(4)]
    rows = [tok.encode(p) for p in prompts]
    labels = [65, 66, 67]
    engines = {}

    def scores(tag, **kw):
        eng = ScoringEngine("decoder", cfg, params, tok,
                            len_buckets=(64,), batch_buckets=(4,), **kw)
        engines[tag] = eng
        return np.asarray(eng.score_labels(rows, labels), np.float32)

    ref = scores("ref")
    plain = scores("plain", quantize="int8")
    calib = scores("calib", quantize="int8", awq_calib=prompts)
    assert calib.shape == ref.shape
    assert np.isfinite(calib).all()
    # fit info recorded; the alpha=0 guard makes every ratio <= 1 on the
    # calibration set itself
    info = engines["calib"].awq_info
    assert set(info) == {"qkv", "o", "gateup", "down"}
    assert all(v <= 1.0 + 1e-6 for v in info.values()), info
    # both quantized engines sit in the same error regime vs fp32 (the
    # 12-logit sample here is too small for a strict payoff inequality;
    # that lives in the model-level tests above)
    assert np.mean((plain - ref) ** 2) < 1e-2
    assert np.mean((calib - ref) ** 2) < 1e-2
    # non-decoder / unquantized misuse is rejected or ignored cleanly
    with pytest.raises(ValueError):
        from llmrankers_tpu.models.config import T5Config
        from llmrankers_tpu.models import t5 as t5_mod

        t5cfg = T5Config.tiny()
        ScoringEngine(
            "t5", t5cfg,
            t5_mod.init_params(t5cfg, jax.random.PRNGKey(0)),
            ByteTokenizer(t5cfg.vocab_size),
            quantize="int8", awq_calib=prompts,
        )
