"""KV-cached decode under a dp x tp mesh (VERDICT r4 #3).

The serving path a pod actually runs — engine prefill + chunked KV-cache
decode — must produce token-exact output when the params are TP-sharded
over 'model' and the batch over 'data', for the plain bf16 cache and the
quantized-KV variants. Reference match: the vLLM engine the reference
delegates generation to (/root/reference/llmrankers/setwise.py:450-454)
runs under tensor_parallel_size.
"""
import pytest

import jax

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig
from llmrankers_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.quick


def _tiny():
    cfg = DecoderConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    return cfg, dec_mod.init_params(cfg, jax.random.PRNGKey(7))


def _rows(tok, n=5):
    return [tok.encode(f"rank passage {i} for the query q{i % 2}",
                       add_special_tokens=False) for i in range(n)]


@pytest.mark.parametrize("kvq", [None, "int8", "int4"])
def test_decode_tp2_token_exact(kvq):
    cfg, params = _tiny()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("decoder", cfg, params, tok, kv_quantize=kvq)
    rows = _rows(tok)
    want_txt, want_n = single.generate(rows, 10, chunk_tokens=4)
    mesh = mesh_mod.make_mesh(1, 2, devices=jax.devices()[:2])
    tp = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                       kv_quantize=kvq)
    got_txt, got_n = tp.generate(rows, 10, chunk_tokens=4)
    assert got_txt == want_txt
    assert got_n == want_n


def test_decode_dp2tp2_token_exact():
    cfg, params = _tiny()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int8")
    rows = _rows(tok, n=6)
    want_txt, want_n = single.generate(rows, 8)
    mesh = mesh_mod.make_mesh(2, 2, devices=jax.devices()[:4])
    dptp = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                         kv_quantize="int8")
    got_txt, got_n = dptp.generate(rows, 8)
    assert got_txt == want_txt
    assert got_n == want_n


def test_decode_tp2_sampled_token_exact():
    """Temperature sampling re-keys only by dispatch partitioning, not by
    mesh: the same (rows, temperature, seed, chunking) call on a TP mesh
    must reproduce the single-device sample stream."""
    cfg, params = _tiny()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("decoder", cfg, params, tok)
    rows = _rows(tok, n=4)
    want_txt, want_n = single.generate(rows, 8, temperature=0.8, seed=3)
    mesh = mesh_mod.make_mesh(1, 2, devices=jax.devices()[:2])
    tp = ScoringEngine("decoder", cfg, params, tok, mesh=mesh)
    got_txt, got_n = tp.generate(rows, 8, temperature=0.8, seed=3)
    assert got_txt == want_txt
    assert got_n == want_n
