"""RESOURCE_EXHAUSTED backoff in ScoringEngine.generate (VERDICT r3 #1c).

The round-3 driver bench died because one optimistic row-limit estimate
produced a dispatch that OOMed with no recovery path. generate() now
catches device memory exhaustion at the dispatch, halves the
rows-per-dispatch cap to a ladder rung, retries the chunk, and remembers
the learned cap for the rest of the session. These tests inject the OOM
(no way to exhaust real HBM deterministically from CPU CI) through the
same dispatch seam the real error crosses.
"""
import jax
import numpy as np
import pytest

from llmrankers_tpu.engine.engine import ScoringEngine, _is_oom
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models import t5 as t5_mod
from llmrankers_tpu.models.config import DecoderConfig, T5Config

pytestmark = pytest.mark.quick


def _fake_oom():
    # jaxlib raises XlaRuntimeError("RESOURCE_EXHAUSTED: Out of memory
    # allocating ..."); matching on the message is what _is_oom does.
    return RuntimeError(
        "RESOURCE_EXHAUSTED: Error allocating device buffer: "
        "Attempting to allocate 6.90G. That was not possible."
    )


def test_is_oom_classifier():
    assert _is_oom(_fake_oom())
    assert _is_oom(RuntimeError("Resource exhausted: Out of memory"))
    assert not _is_oom(RuntimeError("INVALID_ARGUMENT: shape mismatch"))


def _decoder_engine():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size),
        len_buckets=(64,), batch_buckets=(8,),
    )


def _inject_oom(eng, oversize, record, fail_times=1):
    """Wrap _generate_dispatch: raise a fake OOM the first ``fail_times``
    times a chunk larger than ``oversize`` rows arrives; record every
    dispatched chunk size."""
    orig = eng._generate_dispatch
    state = {"left": fail_times}

    def wrapper(pp, chunk, *a, **kw):
        record.append(len(chunk))
        if len(chunk) > oversize and state["left"] > 0:
            state["left"] -= 1
            raise _fake_oom()
        return orig(pp, chunk, *a, **kw)

    eng._generate_dispatch = wrapper


def test_oom_backoff_halves_and_recovers():
    eng = _decoder_engine()
    rows = [
        eng.tokenizer.encode(f"prompt number {i}", add_special_tokens=False)
        for i in range(8)
    ]
    sizes = []
    _inject_oom(eng, oversize=4, record=sizes)
    texts, ntoks = eng.generate(rows, max_new_tokens=6)
    # First dispatch was the full 8-row chunk (failed); the retry ran the
    # same rows in <=4-row pieces.
    assert sizes[0] == 8
    assert all(s <= 4 for s in sizes[1:])
    assert len(texts) == 8 and all(isinstance(t, str) for t in texts)
    assert all(n > 0 for n in ntoks)
    # The learned cap is recorded for this (kind, L, max_new) family.
    assert 4 in set(eng._learned_row_caps.values())

    # A second call pre-splits from the start: no dispatch exceeds the
    # learned cap, and (being identically shaped) outputs are identical.
    sizes2 = []
    _inject_oom(eng, oversize=4, record=sizes2)  # would fail if oversize hit
    texts2, ntoks2 = eng.generate(rows, max_new_tokens=6)
    assert all(s <= 4 for s in sizes2)
    assert texts2 == texts and ntoks2 == ntoks


def test_oom_backoff_t5_path():
    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    eng = ScoringEngine(
        "t5", cfg, params, ByteTokenizer(cfg.vocab_size),
        len_buckets=(64,), batch_buckets=(8,),
    )
    rows = [
        eng.tokenizer.encode(f"doc {i}", add_special_tokens=False)
        for i in range(8)
    ]
    sizes = []
    _inject_oom(eng, oversize=4, record=sizes)
    texts, ntoks = eng.generate(rows, max_new_tokens=4)
    assert sizes[0] == 8 and all(s <= 4 for s in sizes[1:])
    assert len(texts) == 8


def test_oom_at_one_row_reraises():
    eng = _decoder_engine()
    rows = [eng.tokenizer.encode("p", add_special_tokens=False)]
    _inject_oom(eng, oversize=0, record=[], fail_times=99)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        eng.generate(rows, max_new_tokens=4)


def test_non_oom_error_propagates():
    eng = _decoder_engine()
    rows = [
        eng.tokenizer.encode(f"p{i}", add_special_tokens=False)
        for i in range(8)
    ]
    orig = eng._generate_dispatch

    def wrapper(pp, chunk, *a, **kw):
        raise ValueError("not a memory error")

    eng._generate_dispatch = wrapper
    with pytest.raises(ValueError, match="not a memory error"):
        eng.generate(rows, max_new_tokens=4)
    eng._generate_dispatch = orig


def test_stats_not_double_counted_after_retry():
    from llmrankers_tpu.engine.engine import BatchStats

    eng = _decoder_engine()
    rows = [
        eng.tokenizer.encode(f"prompt number {i}", add_special_tokens=False)
        for i in range(8)
    ]
    true_prompt = sum(len(r) for r in rows)
    stats = BatchStats()
    _inject_oom(eng, oversize=4, record=[])
    eng.generate(rows, max_new_tokens=4, stats=stats)
    assert stats.prompt_tokens == true_prompt
