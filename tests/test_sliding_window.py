"""Mistral sliding-window attention: HF parity + cross-path consistency.

The reference serves Mistral through HF/vLLM, which honor the config's
``sliding_window`` (each token attends to at most the previous W
positions). Our implementation masks in INDEX space for contiguous
blocks (prefill/scoring) and in POSITION space for the cached decode and
shared-prefix paths; these tests pin

  * HF tiny-Mistral logits parity with W < L (the external oracle),
  * flash-kernel window masking vs the XLA path,
  * decode-chunk / spec-decode / shared-prefix consistency with the
    full-forward definition once generation outgrows the window.
"""
import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.models import config as cfgmod
from llmrankers_tpu.models import decoder as jdec
from llmrankers_tpu.models.config import DecoderConfig


@pytest.mark.quick
def test_config_sliding_window_parse():
    base = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    mis = DecoderConfig.from_hf_config(
        dict(base, model_type="mistral", sliding_window=4096)
    )
    assert mis.sliding_window == 4096
    # Mistral v0.2+ ships null -> full attention.
    mis2 = DecoderConfig.from_hf_config(
        dict(base, model_type="mistral", sliding_window=None)
    )
    assert mis2.sliding_window is None
    # Qwen2 carries the field but gates it behind use_sliding_window.
    q2 = DecoderConfig.from_hf_config(
        dict(base, model_type="qwen2", sliding_window=32768)
    )
    assert q2.sliding_window is None
    q2on = DecoderConfig.from_hf_config(
        dict(base, model_type="qwen2", sliding_window=32768,
             use_sliding_window=True)
    )
    assert q2on.sliding_window == 32768


def test_mistral_hf_logits_parity_windowed():
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig as HFCfg
    from transformers import MistralForCausalLM as HFModel

    from llmrankers_tpu.models.loader import TensorSource, load_decoder

    hf_cfg = HFCfg(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        sliding_window=8, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    d = hf_cfg.to_dict()
    d["model_type"] = "mistral"
    cfg = cfgmod.DecoderConfig.from_hf_config(d)
    assert cfg.sliding_window == 8
    params = load_decoder(TensorSource.from_state_dict(model.state_dict()), cfg)

    rng = np.random.RandomState(3)
    B, L = 3, 19  # L > W=8 so the window actually cuts
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[1, :6] = 0  # left padding (reference batch-generate layout)
    ids[1, :6] = 0
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)

    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
        ).logits.numpy()
    got = np.asarray(jdec.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=5e-4, atol=5e-4)

    # Sanity: the window changed the answer vs full attention.
    full = np.asarray(
        jdec.forward(params, dataclasses.replace(cfg, sliding_window=None),
                     jnp.asarray(ids), jnp.asarray(mask))
    )
    assert np.abs(full[valid] - got[valid]).max() > 1e-3


def test_flash_window_matches_xla():
    from llmrankers_tpu.ops import attention, flash

    # Interpreter mode so the kernel runs on CPU.
    orig = flash.pl.pallas_call
    flash_fn = flash.flash_mha.__wrapped__

    def rand(shape, key):
        return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)

    B, H, L, D = 2, 2, 256, 64
    q, k, v = (rand((B, H, L, D), i + 20) for i in range(3))
    kv_mask = np.ones((B, L), np.int32)
    kv_mask[1, :40] = 0  # left padding
    kv_mask = jnp.asarray(kv_mask)
    for W in (32, 100):
        want = attention.mha(q, k, v, kv_mask=kv_mask, causal=True,
                             scale=0.125, window=W)
        try:
            flash.pl.pallas_call = functools.partial(orig, interpret=True)
            got = flash_fn(q, k, v, kv_mask=kv_mask, causal=True,
                           scale=0.125, block_q=64, block_k=128, window=W)
        finally:
            flash.pl.pallas_call = orig
        w, g = np.asarray(want), np.asarray(got)
        # Pad-query rows (left padding + causal -> zero visible keys) are
        # garbage in both paths; compare real query rows only.
        np.testing.assert_allclose(g[0], w[0], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(g[1][:, 40:], w[1][:, 40:],
                                   rtol=2e-5, atol=2e-5)
        assert np.all(np.isfinite(g))


@pytest.fixture(scope="module")
def tiny_win():
    cfg = dataclasses.replace(DecoderConfig.tiny(), sliding_window=12)
    params = jdec.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_decode_chunk_matches_full_forward_windowed(tiny_win):
    """Greedy decode through the position-masked cache must equal
    teacher-forced argmax of the index-masked full forward."""
    from llmrankers_tpu.engine import generate as gen_mod

    cfg, params = tiny_win
    rng = np.random.RandomState(5)
    B, L, T = 2, 20, 12  # L > W and L+T outgrows the window mid-decode
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[0, :5] = 0
    ids[0, :5] = 0
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    logits, cache = gen_mod.decoder_prefill(params, cfg, ids_j, mask_j, T)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out, _ = gen_mod.decoder_decode_chunk(
        params, cfg, first, cache, L, 0, T, eos_id=-1,
    )
    out = np.asarray(out)  # [B, T]

    # Teacher-forced check: append the generated tokens and re-run the
    # full windowed forward; each step's argmax must reproduce the next
    # generated token.
    full_ids = np.concatenate([ids, out], axis=1)
    full_mask = np.concatenate([mask, np.ones((B, T), np.int64)], axis=1)
    logits_full = np.asarray(
        jdec.forward(params, cfg, jnp.asarray(full_ids), jnp.asarray(full_mask))
    )
    for b in range(B):
        for t in range(T - 1):
            # logits at the position of generated token t predict token t+1
            pred = int(np.argmax(logits_full[b, L + t]))
            assert pred == int(out[b, t + 1]), (b, t)


def test_spec_decode_matches_plain_windowed(tiny_win):
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer

    cfg, params = tiny_win
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("decoder", cfg, params, tok)
    spec = ScoringEngine("decoder", cfg, params, tok, spec_lookup=4)
    rows = [list(range(2 + 11 * i, 40 + 13 * i)) for i in range(3)]
    a, an = base.generate(rows, max_new_tokens=24, chunk_tokens=8)
    b, bn = spec.generate(rows, max_new_tokens=24, chunk_tokens=8)
    assert a == b and an == bn


def test_shared_prefix_matches_plain_windowed(tiny_win):
    """Shared-prefix grouping (dense positional window mask) must emit
    the same tokens as the plain prefill path."""
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer

    cfg, params = tiny_win
    tok = ByteTokenizer(cfg.vocab_size)
    shared = ScoringEngine("decoder", cfg, params, tok, prefix_share=True)
    plain = ScoringEngine("decoder", cfg, params, tok, prefix_share=False)
    rng = np.random.RandomState(7)
    pre = rng.randint(2, 500, 96).tolist()  # prefix far beyond W=12
    rows = [pre + rng.randint(2, 500, 6 + 3 * i).tolist() for i in range(4)]
    a, na = shared.generate(rows, max_new_tokens=10, chunk_tokens=5)
    b, nb = plain.generate(rows, max_new_tokens=10, chunk_tokens=5)
    keys = {k[0] for k in shared._jit_cache}
    assert {"dec_prefill_shared", "dec_prefill_pre"} & keys
    assert a == b and na == nb

    labels = [5, 6, 7]
    sa = shared.score_labels(rows, labels)
    sb = plain.score_labels(rows, labels)
    np.testing.assert_allclose(sa, sb, rtol=2e-4, atol=2e-4)
