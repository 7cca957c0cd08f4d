"""Temperature sampling through ScoringEngine.generate.

vLLM SamplingParams equivalent for decoder generation (the reference's
Rank-R1 backend samples during GRPO rollouts, Rank-R1/train_grpo_v0.2.py
temperature=1.2; serving APIs expose temperature): each token is drawn
categorically from logits/temperature instead of argmax, threaded through
every decoder generate route — prefill first token, chunked decode
(engine._decode_chunked), and the slot-refill session incl. refill
prefills. Greedy (temperature=0) paths are bit-identical to before: the
sampled wrappers live under distinct jit-cache keys.
"""
import dataclasses

import jax
import numpy as np
import pytest

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models import t5 as t5_mod
from llmrankers_tpu.models.config import DecoderConfig, T5Config

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def eng():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size),
        len_buckets=(64,), batch_buckets=(4,),
    )


def _rows(n, L=30):
    return [
        [int(t) for t in np.random.RandomState(i).randint(2, 258, L)]
        for i in range(n)
    ]


def test_seed_reproducible_and_distinct(eng):
    rows = _rows(3)
    a = eng.generate(rows, max_new_tokens=10, temperature=1.0, seed=7)
    b = eng.generate(rows, max_new_tokens=10, temperature=1.0, seed=7)
    c = eng.generate(rows, max_new_tokens=10, temperature=1.0, seed=8)
    g = eng.generate(rows, max_new_tokens=10)
    assert a == b
    assert a != c  # 10 draws over a 320-vocab: collision ~impossible
    assert a != g


def test_greedy_unchanged_after_sampling(eng):
    """Sampled wrappers must not disturb the greedy jit cache."""
    rows = _rows(3)
    g1 = eng.generate(rows, max_new_tokens=8, chunk_tokens=4)
    eng.generate(rows, max_new_tokens=8, chunk_tokens=4,
                 temperature=0.7, seed=1)
    g2 = eng.generate(rows, max_new_tokens=8, chunk_tokens=4)
    assert g1 == g2


def test_sampled_chunked_matches_unchunked_stream_keying(eng):
    """Chunk boundaries must not re-key the stream: the chunk fn folds
    the rng by the GLOBAL step, so chunk_tokens=4 and =5 over the same
    dispatch give the same walk (same base rng, same fold indices)."""
    rows = _rows(3)
    a = eng.generate(rows, max_new_tokens=10, chunk_tokens=4,
                     temperature=1.0, seed=11)
    b = eng.generate(rows, max_new_tokens=10, chunk_tokens=5,
                     temperature=1.0, seed=11)
    assert a == b


def test_sampled_refill_session(eng):
    """Multi-dispatch wave with sampling engages the refill session and
    is reproducible under a fixed seed."""
    rows = _rows(10)
    orig = eng._gen_row_limit
    eng._gen_row_limit = lambda r, m: 4
    try:
        before = eng.refill_stats["sessions"]
        a = eng.generate(rows, max_new_tokens=12, chunk_tokens=4,
                         temperature=1.0, seed=3)
        b = eng.generate(rows, max_new_tokens=12, chunk_tokens=4,
                         temperature=1.0, seed=3)
    finally:
        eng._gen_row_limit = orig
    assert eng.refill_stats["sessions"] >= before + 2
    assert a == b


def test_t5_and_spec_reject_temperature():
    tcfg = T5Config.tiny()
    te = ScoringEngine(
        "t5", tcfg, t5_mod.init_params(tcfg, jax.random.PRNGKey(0)),
        ByteTokenizer(tcfg.vocab_size),
    )
    with pytest.raises(ValueError, match="decoder"):
        te.generate([[3, 4, 5]], max_new_tokens=2, temperature=1.0)
    cfg = DecoderConfig.tiny()
    se = ScoringEngine(
        "decoder", cfg, dec_mod.init_params(cfg, jax.random.PRNGKey(0)),
        ByteTokenizer(cfg.vocab_size), spec_lookup=4,
    )
    with pytest.raises(ValueError, match="spec_lookup"):
        se.generate(_rows(2), max_new_tokens=4, temperature=1.0)


def test_high_temperature_spreads_tokens(eng):
    """At temperature 5 the draws should cover far more distinct tokens
    than greedy's fixed-point walk — sanity that sampling actually
    samples rather than argmaxing with extra steps."""
    rows = _rows(2, L=24)
    s, _ = eng.generate(rows, max_new_tokens=16, temperature=5.0, seed=0)
    g, _ = eng.generate(rows, max_new_tokens=16)
    # decoded text of byte tokenizer: compare distinct characters
    assert len(set("".join(s))) > len(set("".join(g)))


def test_rank_r1_temperature_knob(eng):
    """Rank-R1 rankers expose vLLM's SamplingParams temperature: sampled
    reranks are seed-reproducible, and the knob is rejected alongside
    features that require deterministic outcomes."""
    from llmrankers_tpu.rankers.rank_r1 import (
        RankR1ListwiseLlmRanker,
        RankR1SetwiseLlmRanker,
    )
    from llmrankers_tpu.types import SearchResult

    prompt_file = "/root/repo/llmrankers_tpu/prompts/prompt_setwise-R1.toml"
    docs = [SearchResult(f"d{i}", 0.0, f"passage about topic {i}")
            for i in range(5)]

    def run():
        r = RankR1SetwiseLlmRanker(
            eng, prompt_file, num_child=2, k=3, max_completion_tokens=12,
            temperature=1.5, seed=11,
        )
        out = r.rerank("which passage talks about topic 2", list(docs))
        return [d.docid for d in out], r.total_completion_tokens

    ids_a, toks_a = run()
    ids_b, toks_b = run()
    assert ids_a == ids_b and toks_a == toks_b

    with pytest.raises(ValueError, match="cache_comparisons"):
        RankR1SetwiseLlmRanker(eng, prompt_file, cache_comparisons=True,
                               temperature=1.0)
    with pytest.raises(ValueError, match="spec_depth"):
        RankR1SetwiseLlmRanker(eng, prompt_file, spec_depth=2,
                               temperature=1.0)
    lw_prompt = (
        "/root/repo/llmrankers_tpu/prompts/prompt_listwise_rankzephyr.toml"
    )
    with pytest.raises(ValueError, match="cache_comparisons"):
        RankR1ListwiseLlmRanker(eng, lw_prompt, cache_comparisons=True,
                                temperature=1.0)
