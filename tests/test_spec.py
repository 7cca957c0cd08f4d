"""Prompt-lookup speculative decoding: greedy-equivalence + accept rate.

The invariant under test: speculation NEVER changes outputs — every
emitted token is the model's own argmax; drafts only decide how many
argmax positions one verify forward yields. So every test pins the spec
engine's generations against the plain engine token-for-token.
"""
import numpy as np
import pytest

import jax

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _engines(cfg, params, **spec_kw):
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("decoder", cfg, params, tok)
    spec = ScoringEngine("decoder", cfg, params, tok, spec_lookup=4, **spec_kw)
    return base, spec


@pytest.mark.quick
def test_spec_matches_plain_distinct_rows(tiny):
    cfg, params = tiny
    base, spec = _engines(cfg, params)
    # Distinct rows -> no shared-prefix grouping: plain prefill path.
    rows = [list(range(2 + 11 * i, 60 + 13 * i)) for i in range(3)]
    a, an = base.generate(rows, max_new_tokens=24, chunk_tokens=8)
    b, bn = spec.generate(rows, max_new_tokens=24, chunk_tokens=8)
    assert a == b and an == bn
    assert spec.spec_stats["rounds"] > 0


def test_spec_matches_plain_shared_prefix(tiny):
    cfg, params = tiny
    base, spec = _engines(cfg, params)
    prefix = list(range(2, 50))
    rows = [prefix + list(range(60, 70 + 4 * i)) for i in range(4)]
    a, an = base.generate(rows, max_new_tokens=16, chunk_tokens=8)
    b, bn = spec.generate(rows, max_new_tokens=16, chunk_tokens=8)
    assert a == b and an == bn


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_spec_matches_with_quantized_kv(tiny, mode):
    """Spec verify must fold fresh in-block K/V through the SAME
    quantizer as the cache so outputs equal the step-by-step scan for
    either cache format."""
    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    kvq = ScoringEngine("decoder", cfg, params, tok, kv_quantize=mode)
    both = ScoringEngine("decoder", cfg, params, tok, kv_quantize=mode,
                         spec_lookup=4)
    rows = [list(range(2 + 7 * i, 64 + 5 * i)) for i in range(3)]
    a, _ = kvq.generate(rows, max_new_tokens=16, chunk_tokens=8)
    b, _ = both.generate(rows, max_new_tokens=16, chunk_tokens=8)
    assert a == b


def test_spec_accept_rate_on_repetitive_model(tiny):
    """Zero weights degenerate to a constant argmax token, so the bigram
    lookup drafts correctly and rounds accept > 1 token — a stand-in for
    the repetitive regime Rank-R1 completions (quoting passage text)
    sit in."""
    cfg, params = tiny
    small = jax.tree.map(lambda x: x * 0.0, params)
    _, spec = _engines(cfg, small)
    rows = [list(range(2, 40))]
    spec.generate(rows, max_new_tokens=48, chunk_tokens=16)
    st = spec.spec_stats
    assert st["rounds"] > 0
    assert st["tokens"] / st["rounds"] > 1.5, st


def test_spec_stops_on_eos_and_stop_strings(tiny):
    cfg, params = tiny
    base, spec = _engines(cfg, params)
    rows = [list(range(2, 70))] * 2
    rows[1] = list(range(5, 90))
    # Stop string: whatever the first 6 decoded chars are — forces the
    # host-side freeze path through the spec loop.
    ref, _ = base.generate(rows, max_new_tokens=32, chunk_tokens=8)
    stop = ref[0][:6] if len(ref[0]) >= 6 else None
    if stop:
        a, _ = base.generate(rows, max_new_tokens=32, chunk_tokens=8,
                             stop_strings=(stop,))
        b, _ = spec.generate(rows, max_new_tokens=32, chunk_tokens=8,
                             stop_strings=(stop,))
        assert a == b


def test_spec_on_mesh(tiny):
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg, params = tiny
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("decoder", cfg, params, tok)
    mesh = mesh_mod.make_mesh(2, 2)
    spec = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                         spec_lookup=4)
    rows = [list(range(2 + 3 * i, 64)) for i in range(4)]
    a, _ = base.generate(rows, max_new_tokens=12, chunk_tokens=6)
    b, _ = spec.generate(rows, max_new_tokens=12, chunk_tokens=6)
    assert a == b


def test_spec_rejects_t5():
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="decoder"):
        ScoringEngine("t5", cfg, params, ByteTokenizer(cfg.vocab_size),
                      spec_lookup=4)
