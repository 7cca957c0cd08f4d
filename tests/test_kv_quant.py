"""int8 KV cache: quantization accuracy + decode-path integration.

The reference's long-decode path (Rank-R1 vLLM completions, setwise.py:445-446)
is HBM-bound on the KV stream at serving batch sizes; these tests pin the
int8-cache variant (engine kv_quantize='int8') to the bf16 baseline.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.generate import _kv_quant
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_kv_quant_roundtrip_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 7, 32) * 3.0, jnp.float32)
    q, s = _kv_quant(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 7, 1)
    xd = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    # Symmetric int8: worst-case half-step rounding of amax/127.
    assert (np.abs(xd - np.asarray(x)) <= amax * (0.5 / 127.0) + 1e-6).all()


def test_kv_quant_generation_matches_bf16(tiny):
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("decoder", cfg, params, tok)
    kvq = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int8")
    assert kvq.cfg.kv_quant and not base.cfg.kv_quant
    rows = [list(range(2, 70 + 9 * i)) for i in range(3)]

    a, _ = base.generate(rows, max_new_tokens=8)
    b, _ = kvq.generate(rows, max_new_tokens=8)
    # Greedy decode from the same weights: int8 cache error (<0.4% of
    # amax per entry) should not flip tiny-model argmaxes.
    assert a == b

    # Chunked long-generation path carries the quantized cache across
    # chunk boundaries (host-side stop-string checks between chunks).
    a2, _ = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    b2, _ = kvq.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert a2 == b2


def test_kv_quant_shared_prefix_generation(tiny):
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    kvq = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int8")
    base = ScoringEngine("decoder", cfg, params, tok)
    # Identical 48-token prefix -> rows group onto the shared-prefix
    # prefill; cache assembly must quantize the gathered prefix K/V too.
    prefix = list(range(2, 50))
    rows = [prefix + list(range(60, 70 + 5 * i)) for i in range(4)]
    a, _ = base.generate(rows, max_new_tokens=6)
    b, _ = kvq.generate(rows, max_new_tokens=6)
    assert a == b


def test_kv_quant_on_mesh(tiny):
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    mesh = mesh_mod.make_mesh(2, 2)
    kvq = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                        kv_quantize="int8")
    rows = [list(range(2, 64)) for _ in range(4)]
    texts, ntoks = kvq.generate(rows, max_new_tokens=6)
    assert len(texts) == 4 and all(n >= 1 for n in ntoks)


def test_kv_quant_row_limit_doubles(tiny):
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("decoder", cfg, params, tok)
    kvq = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int8")
    # The HBM row cap is cache-bound at long contexts; int8 (1B + 4/Dh
    # scale overhead vs bf16's 2B) must admit more rows per dispatch.
    rows = [[0] * 4096]
    nb = base._gen_row_limit(rows, 2048)
    nq = kvq._gen_row_limit(rows, 2048)
    assert nq > nb


def test_kv_quant_validation(tiny):
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    with pytest.raises(ValueError, match="kv_quantize"):
        ScoringEngine("decoder", cfg, params, tok, kv_quantize="int4")

    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    tcfg = T5Config.tiny()
    tparams = t5_mod.init_params(tcfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="decoder"):
        ScoringEngine("t5", tcfg, tparams, ByteTokenizer(tcfg.vocab_size),
                      kv_quantize="int8")
