"""Quantized KV cache: quantization accuracy + decode-path integration.

The reference's long-decode path (Rank-R1 vLLM completions, setwise.py:445-446)
is HBM-bound on the KV stream at serving batch sizes; these tests pin the
int8 cache (engine kv_quantize='int8') to the bf16 baseline and the int4
cache (planar nibble packing, per-half scales) to its own exactness
invariants (chunking / prefix sharing / spec decode must not change
outputs for a fixed cache format).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.generate import _kv_quant, _kv_quant4, _unpack4
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.mark.quick
def test_kv_quant_roundtrip_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 7, 32) * 3.0, jnp.float32)
    q, s = _kv_quant(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 7, 1)
    xd = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    # Symmetric int8: worst-case half-step rounding of amax/127.
    assert (np.abs(xd - np.asarray(x)) <= amax * (0.5 / 127.0) + 1e-6).all()


def test_kv_quant4_roundtrip_error():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 7, 32) * 3.0, jnp.float32)
    q, s = _kv_quant4(x)
    assert q.dtype == jnp.int8 and q.shape == (2, 3, 7, 16)
    assert s.shape == (2, 3, 7, 2)
    lo, hi = _unpack4(q, jnp.float32)
    xd = np.concatenate(
        [np.asarray(lo) * np.asarray(s[..., :1]),
         np.asarray(hi) * np.asarray(s[..., 1:])],
        axis=-1,
    )
    xn = np.asarray(x)
    amax_lo = np.abs(xn[..., :16]).max(axis=-1, keepdims=True)
    amax_hi = np.abs(xn[..., 16:]).max(axis=-1, keepdims=True)
    amax = np.concatenate([np.repeat(amax_lo, 16, -1),
                           np.repeat(amax_hi, 16, -1)], axis=-1)
    # Symmetric int4: worst-case half-step rounding of amax/7 per half.
    assert (np.abs(xd - xn) <= amax * (0.5 / 7.0) + 1e-6).all()


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


def test_kv_int4_generation_self_consistent(tiny):
    """int4's quantization error may legitimately flip a random-weight
    argmax vs bf16, but the path itself is deterministic: chunked decode
    must equal unchunked decode bit-for-bit (the cache format is the
    same either way), and outputs must be non-degenerate."""
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    kv4 = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int4")
    assert kv4.cfg.kv_quant == "int4"
    rows = [list(range(2, 70 + 9 * i)) for i in range(3)]
    a, na = kv4.generate(rows, max_new_tokens=12)
    b, nb = kv4.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert a == b and na == nb
    assert all(n >= 1 for n in na)


def test_kv_int4_token_agreement_vs_bf16(tiny):
    """Greedy tokens through the int4 cache vs the bf16 cache: at least
    half of a 6-step continuation must agree. (int4 per-half absmax
    keeps worst-case cache-entry error ~7%, so near-tie argmaxes can
    flip on random weights — token agreement is the strongest stable
    assertion here; exact numeric closeness of the quantized cache is
    pinned by the roundtrip-error tests above.)"""
    from llmrankers_tpu.engine import generate as gen

    cfg, params = tiny
    ids = jnp.asarray([list(range(2, 66))], jnp.int32)
    mask = jnp.ones_like(ids)
    outs = {}
    for mode in (None, "int4"):
        c = dataclasses.replace(cfg, kv_quant=mode, use_flash=False)
        logits, cache = gen.decoder_prefill(params, c, ids, mask, 24)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks, (nxt, cache2, done) = gen.decoder_decode_chunk(
            params, c, first, cache, ids.shape[1], 0, 6, eos_id=-1
        )
        outs[mode] = np.asarray(toks, np.int64)
    # Same first token by construction (prefill ignores kv_quant); the
    # decoded continuations should agree on most steps.
    agree = (outs[None] == outs["int4"]).mean()
    assert agree >= 0.5, f"int4 decode diverged everywhere: {outs}"


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


def test_kv_int4_shared_prefix_matches_unshared(tiny):
    """Per-position scales make quantize(concat(prefix, suffix)) equal
    concat(quantize(prefix), quantize(suffix)): the shared-prefix int4
    path must produce bit-identical outputs to the plain int4 path."""
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    shared = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int4")
    plain = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int4",
                          prefix_share=False)
    prefix = list(range(2, 50))
    rows = [prefix + list(range(60, 70 + 5 * i)) for i in range(4)]
    a, _ = shared.generate(rows, max_new_tokens=6)
    b, _ = plain.generate(rows, max_new_tokens=6)
    assert a == b


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_kv_quant_on_mesh(tiny, mode):
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    mesh = mesh_mod.make_mesh(2, 2)
    kvq = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                        kv_quantize=mode)
    rows = [list(range(2, 64)) for _ in range(4)]
    texts, ntoks = kvq.generate(rows, max_new_tokens=6)
    assert len(texts) == 4 and all(n >= 1 for n in ntoks)


def test_kv_quant_row_limit_scales(tiny):
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("decoder", cfg, params, tok)
    kv8 = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int8")
    kv4 = ScoringEngine("decoder", cfg, params, tok, kv_quantize="int4")
    # The HBM row cap is cache-bound at long contexts; int8 (1B + 4/Dh
    # scale overhead vs bf16's 2B) must admit more rows per dispatch,
    # and int4 (0.5B + 8/Dh) more still.
    rows = [[0] * 4096]
    nb = base._gen_row_limit(rows, 2048)
    n8 = kv8._gen_row_limit(rows, 2048)
    n4 = kv4._gen_row_limit(rows, 2048)
    assert n4 > n8 > nb


def test_kv_quant_validation(tiny):
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    with pytest.raises(ValueError, match="kv_quantize"):
        ScoringEngine("decoder", cfg, params, tok, kv_quantize="int2")

    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    tcfg = T5Config.tiny()
    tparams = t5_mod.init_params(tcfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="decoder"):
        ScoringEngine("t5", tcfg, tparams, ByteTokenizer(tcfg.vocab_size),
                      kv_quantize="int8")
