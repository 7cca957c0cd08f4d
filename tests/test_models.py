"""Numerical parity: our JAX models vs HF torch reference implementations.

Tiny random-init HF models are built locally from config (no network),
their state_dicts are loaded through our checkpoint mapper, and logits
are compared. This is the model-correctness gate that lets real
flan-t5/Llama/Qwen checkpoints load and reproduce the reference's scores.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llmrankers_tpu.models import config as cfgmod
from llmrankers_tpu.models import decoder as jdec
from llmrankers_tpu.models import t5 as jt5
from llmrankers_tpu.models.loader import TensorSource, load_decoder, load_t5

TOL = dict(rtol=2e-4, atol=2e-4)


def _hf_t5(tie=False, gated=True):
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=512,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    model = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = cfgmod.T5Config.from_hf_config(hf_cfg.to_dict())
    params = load_t5(TensorSource.from_state_dict(model.state_dict()), cfg)
    return model, cfg, params


@pytest.mark.parametrize("tie,gated", [(False, True), (True, False)])
def test_t5_logits_parity(tie, gated):
    model, cfg, params = _hf_t5(tie=tie, gated=gated)
    rng = np.random.RandomState(0)
    B, L, T = 3, 17, 5
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[0, 12:] = 0  # right padding on one row
    ids[0, 12:] = 0
    dec = rng.randint(2, 500, size=(B, T))

    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    got = np.asarray(
        jt5.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(dec))
    )
    np.testing.assert_allclose(got, want, **TOL)


def test_t5_encoder_long_relative_positions():
    """Distances beyond max_exact exercise the log-bucket branch."""
    model, cfg, params = _hf_t5()
    rng = np.random.RandomState(1)
    B, L = 2, 200
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    with torch.no_grad():
        want = model.encoder(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(jt5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, **TOL)


def _hf_llama(kind="llama"):
    if kind == "llama":
        from transformers import LlamaConfig as HFCfg
        from transformers import LlamaForCausalLM as HFModel

        extra = {}
    elif kind == "qwen2":
        from transformers import Qwen2Config as HFCfg
        from transformers import Qwen2ForCausalLM as HFModel

        extra = {}
    else:
        from transformers import Qwen3Config as HFCfg
        from transformers import Qwen3ForCausalLM as HFModel

        extra = {"head_dim": 16}

    hf_cfg = HFCfg(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
        **extra,
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    d = hf_cfg.to_dict()
    d["model_type"] = {"llama": "llama", "qwen2": "qwen2", "qwen3": "qwen3"}[kind]
    cfg = cfgmod.DecoderConfig.from_hf_config(d)
    params = load_decoder(TensorSource.from_state_dict(model.state_dict()), cfg)
    return model, cfg, params


@pytest.mark.parametrize("kind", ["llama", "qwen2", "qwen3"])
def test_decoder_logits_parity(kind):
    model, cfg, params = _hf_llama(kind)
    rng = np.random.RandomState(2)
    B, L = 3, 19
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    # Left padding on one row (the reference pads left for batch generate).
    mask[1, :6] = 0
    ids[1, :6] = 0
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)

    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
        ).logits.numpy()

    got = np.asarray(jdec.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    # Compare only positions that can attend to at least one real token.
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=5e-4, atol=5e-4)


@pytest.mark.quick
def test_qwen2_attention_bias_loaded():
    _, cfg, params = _hf_llama("qwen2")
    assert cfg.attention_bias
    assert "bq" in params["layers"]


def test_random_init_shapes():
    import jax

    cfg = cfgmod.T5Config.tiny()
    p = jt5.init_params(cfg, jax.random.PRNGKey(0))
    logits = jt5.forward(
        p, cfg, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
        jnp.zeros((2, 3), jnp.int32),
    )
    assert logits.shape == (2, 3, cfg.vocab_size)

    dcfg = cfgmod.DecoderConfig.tiny(qk_norm=True, attention_bias=True)
    dp = jdec.init_params(dcfg, jax.random.PRNGKey(1))
    logits = jdec.forward(
        dp, dcfg, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32)
    )
    assert logits.shape == (2, 8, dcfg.vocab_size)
