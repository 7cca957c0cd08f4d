"""Decode-time slot refill (continuous batching) — VERDICT r3 missing #2.

The reference delegates Rank-R1 long decodes to vLLM, whose core serving
loop refills finished sequences' slots mid-decode
(llmrankers/setwise.py:450-454). Here a multi-dispatch generate wave runs
as one fixed-shape decode session: rows append K/V at their own write
position (generate.decoder_decode_chunk_rr) and freed slots are
re-prefilled from pending rows at chunk boundaries
(generate.decoder_refill_slots). These tests pin:

  * token-exactness of the per-row-write-position chunk against the
    scalar-write-position chunk it generalizes;
  * end-to-end output parity of refill sessions vs the frozen-row
    per-chunk path (plain, shared-prefix, quantized-KV, sliding-window,
    stop-string variants);
  * that the session actually refills (refill_stats).

Shapes are pinned to one length bucket so both paths compile identical
programs — the comparison isolates the refill orchestration itself.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmrankers_tpu.engine import generate as gen
from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _engine(cfg, params, **kw):
    kw.setdefault("len_buckets", (64,))
    kw.setdefault("batch_buckets", (4, 8, 16))
    return ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size), **kw
    )


def _rows(n, seed=0, lo=20, hi=56):
    rng = np.random.RandomState(seed)
    return [
        [int(t) for t in rng.randint(2, 258, size=rng.randint(lo, hi))]
        for _ in range(n)
    ]


def _force_rows_per_dispatch(eng, n):
    eng._gen_row_limit = lambda rows, max_new: n


@pytest.mark.quick
def test_chunk_rr_matches_scalar_chunk(tiny):
    """decoder_decode_chunk_rr with uniform wp == decoder_decode_chunk."""
    cfg, params = tiny
    rows = _rows(3, seed=1, lo=30, hi=40)
    L = max(len(r) for r in rows)
    ids = np.zeros((3, L), np.int32)
    mask = np.zeros((3, L), np.int32)
    for i, r in enumerate(rows):  # left padding
        ids[i, L - len(r):] = r
        mask[i, L - len(r):] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    max_new = 10
    logits, cache = gen.decoder_prefill(params, cfg, ids, mask, max_new)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    toks_a, _ = gen.decoder_decode_chunk(
        params, cfg, first, cache, L, 0, max_new, eos_id=1
    )
    logits2, cache2 = gen.decoder_prefill(params, cfg, ids, mask, max_new)
    wp = jnp.full((3,), L, jnp.int32)
    done = jnp.zeros((3,), bool)
    toks_b, _ = gen.decoder_decode_chunk_rr(
        params, cfg, first, cache2, wp, L, max_new, max_new, 1, done
    )
    assert np.array_equal(np.asarray(toks_a), np.asarray(toks_b))


def _parity(eng_rr, eng_base, rows, **gkw):
    out_b, n_b = eng_base.generate(rows, **gkw)
    out_r, n_r = eng_rr.generate(rows, **gkw)
    assert out_r == out_b
    assert n_r == n_b


@pytest.mark.quick
def test_refill_session_token_exact_plain(tiny, monkeypatch):
    cfg, params = tiny
    eng = _engine(cfg, params, prefix_share=False)
    base = _engine(cfg, params, prefix_share=False)
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    rows = _rows(11, seed=2)
    out_b, n_b = base.generate(rows, max_new_tokens=16, chunk_tokens=4)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=16, chunk_tokens=4)
    assert out_r == out_b and n_r == n_b
    assert eng.refill_stats["sessions"] == 1
    assert eng.refill_stats["refills"] >= 1
    assert base.refill_stats["sessions"] == 0


@pytest.mark.quick
def test_refill_session_stop_strings(tiny, monkeypatch):
    """Host stop-string freezing frees slots mid-stream; the refill path
    must reuse them and still emit identical per-row texts."""
    cfg, params = tiny
    # Any printable ASCII byte stops a row -> rows finish at widely
    # different steps (geometric), exercising mid-stream refill.
    stops = [chr(c) for c in range(48, 123)]
    eng = _engine(cfg, params, prefix_share=False)
    base = _engine(cfg, params, prefix_share=False)
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    rows = _rows(10, seed=3)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(
        rows, max_new_tokens=24, chunk_tokens=4, stop_strings=stops
    )
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(
        rows, max_new_tokens=24, chunk_tokens=4, stop_strings=stops
    )
    assert out_r == out_b and n_r == n_b
    assert eng.refill_stats["refills"] >= 1


def test_refill_session_shared_prefix(tiny, monkeypatch):
    """Rows sharing a long prefix ride the grouped prefill in BOTH the
    initial dispatch and the refill batches (l_total-forced layout)."""
    cfg, params = tiny
    pre = [int(t) for t in np.random.RandomState(7).randint(2, 258, 40)]
    rows = [pre + [int(t) for t in np.random.RandomState(100 + i).randint(2, 258, 8 + i % 7)] for i in range(9)]
    eng = _engine(cfg, params)
    base = _engine(cfg, params)
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert out_r == out_b and n_r == n_b
    assert eng.refill_stats["sessions"] == 1


def _prefixed_rows(pre_len=120, n=9, seed=7):
    """Rows long enough that the initial dispatch's shared-prefix group
    clears group_shared_prefixes' min_saving (pre_len * 3 rows >= 256)."""
    pre = [int(t) for t in np.random.RandomState(seed).randint(2, 258, pre_len)]
    return pre, [
        pre + [
            int(t)
            for t in np.random.RandomState(100 + i).randint(2, 258, 8 + i % 7)
        ]
        for i in range(n)
    ]


@pytest.mark.quick
def test_refill_session_prefix_kv_reuse(tiny, monkeypatch):
    """Refill batches whose rows extend the initial dispatch's prefixes
    reuse the SESSION-CACHED prefix K/V (decoder_refill_slots_pre): only
    suffixes run a forward. Without the cache, every refill re-ran the
    prefix prefill — measured break-even (0.99x) on 800-token Rank-R1
    prefixes on the TPU chip. Token-exact vs the frozen-row path, and
    the stats pin that the pre path actually engaged."""
    cfg, params = tiny
    _, rows = _prefixed_rows()
    eng = _engine(cfg, params, len_buckets=(160,))
    base = _engine(cfg, params, len_buckets=(160,))
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert out_r == out_b and n_r == n_b
    assert eng.refill_stats["sessions"] == 1
    assert eng.refill_stats["refills"] >= 1
    # every refill batch matched the session's cached prefixes
    assert eng.refill_stats["prefix_kv_hits"] == eng.refill_stats["refills"]


def test_refill_session_prefix_kv_fallback(tiny, monkeypatch):
    """Pending rows that DON'T extend the session's prefixes fall back to
    the recompute refill paths — outputs stay exact, no pre hits for the
    unmatched batches."""
    cfg, params = tiny
    _, shared = _prefixed_rows(n=5)
    # tail rows: unrelated prompts (no session prefix match)
    tail = _rows(4, seed=11, lo=20, hi=40)
    rows = shared + tail
    eng = _engine(cfg, params, len_buckets=(160,))
    base = _engine(cfg, params, len_buckets=(160,))
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert out_r == out_b and n_r == n_b
    assert eng.refill_stats["sessions"] == 1
    # some refills matched (rows 4 extends the prefix), some fell back
    assert eng.refill_stats["prefix_kv_hits"] < eng.refill_stats["refills"]


def test_refill_session_prefix_kv_spec(tiny, monkeypatch):
    """Prefix-KV refill composes with prompt-lookup speculation: the
    refilled slot's token history is assembled from the session's host
    prefix tokens + the batch suffixes."""
    cfg, params = tiny
    rng = np.random.RandomState(8)
    seg = [int(t) for t in rng.randint(2, 258, 8)]
    pre = (seg * 20)[:120]  # repetitive -> bigram drafts hit
    rows = [pre + (seg * 3)[: 8 + i % 5] for i in range(9)]
    eng = _engine(cfg, params, len_buckets=(160,), spec_lookup=3)
    base = _engine(cfg, params, len_buckets=(160,), spec_lookup=3)
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=16, chunk_tokens=8)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=16, chunk_tokens=8)
    assert out_r == out_b and n_r == n_b
    assert eng.refill_stats["prefix_kv_hits"] >= 1


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_refill_session_quantized_kv(tiny, monkeypatch, mode):
    cfg, params = tiny
    eng = _engine(cfg, params, prefix_share=False, kv_quantize=mode)
    base = _engine(cfg, params, prefix_share=False, kv_quantize=mode)
    _force_rows_per_dispatch(eng, 4)
    _force_rows_per_dispatch(base, 4)
    rows = _rows(9, seed=4)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert out_r == out_b and n_r == n_b


def test_refill_session_sliding_window(monkeypatch):
    """Mistral-style windowed attention under per-row write positions:
    the cumsum slot-position mask is layout-agnostic."""
    import dataclasses

    cfg = dataclasses.replace(DecoderConfig.tiny(), sliding_window=24)
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    eng = _engine(cfg, params, prefix_share=False)
    base = _engine(cfg, params, prefix_share=False)
    _force_rows_per_dispatch(eng, 3)
    _force_rows_per_dispatch(base, 3)
    rows = _rows(7, seed=5, lo=30, hi=50)
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert out_r == out_b and n_r == n_b


def test_refill_session_spec_decode(tiny, monkeypatch):
    """Slot refill composes with prompt-lookup speculative decoding: the
    spec chunk already decodes at per-row write positions, so a refill
    session only scatters prompt K/V + history into freed slots. Outputs
    stay greedy-exact (same guarantee as plain spec)."""
    cfg, params = tiny
    eng = _engine(cfg, params, prefix_share=False, spec_lookup=3)
    base = _engine(cfg, params, prefix_share=False, spec_lookup=3)
    plain = _engine(cfg, params, prefix_share=False)
    for e in (eng, base, plain):
        _force_rows_per_dispatch(e, 4)
    # Repetitive prompts give the bigram drafts something to hit.
    rng = np.random.RandomState(8)
    rows = []
    for i in range(9):
        seg = [int(t) for t in rng.randint(2, 258, 8)]
        rows.append((seg * 5)[: 30 + i])
    monkeypatch.setenv("LLMRANKERS_NO_REFILL", "1")
    out_b, n_b = base.generate(rows, max_new_tokens=16, chunk_tokens=8)
    out_p, n_p = plain.generate(rows, max_new_tokens=16, chunk_tokens=8)
    monkeypatch.delenv("LLMRANKERS_NO_REFILL")
    out_r, n_r = eng.generate(rows, max_new_tokens=16, chunk_tokens=8)
    assert out_r == out_b and n_r == n_b
    assert out_r == out_p and n_r == n_p  # spec == plain greedy
    assert eng.refill_stats["sessions"] == 1
    assert eng.spec_stats["rounds"] > 0


def test_refill_not_engaged_single_chunk(tiny):
    """A wave that fits one dispatch keeps the (pipelined) scalar path."""
    cfg, params = tiny
    eng = _engine(cfg, params, prefix_share=False)
    rows = _rows(3, seed=6)
    eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert eng.refill_stats["sessions"] == 0
