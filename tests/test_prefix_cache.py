"""Cross-wave prefix-KV cache (engine._pkv_assemble / *_pre jits).

The reference gets prefix reuse ACROSS requests for free from vLLM's
PagedAttention prefix caching (llmrankers/setwise.py:450-454): a sort's
successive waves (heapsort rounds, bubblesort passes, num_permutation
copies) re-score prompts sharing the same query head, and vLLM reuses
the cached prefix blocks every time. Within-wave grouping
(engine._group) only dedups the prefix forward per dispatch; the
cross-wave cache keeps unique prefixes' per-layer K/V on device between
engine calls — LRU over a byte budget, keyed by (adapter, prefix
tokens), entries stored UNPADDED so one entry serves waves whose prefix
area buckets differently. These tests pin:

  * numerical identity of the cache-assembled (*_pre) scoring/generate
    paths vs the fused in-jit prefix forward (prefix_cache_mb=0);
  * hit/miss/eviction accounting, including cross-call hits;
  * adapter keying: per-adapter entries, purge on re-register;
  * refill sessions seeding the cache and later waves hitting it;
  * mesh execution (dp x tp) of the assembled path.
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


def _engine(cfg, params, **kw):
    kw.setdefault("len_buckets", (160,))
    kw.setdefault("batch_buckets", (4, 8, 16))
    return ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size), **kw
    )


def _rows(seed=7, n=6, plen=120):
    pre = [int(t) for t in np.random.RandomState(seed).randint(2, 258, plen)]
    return [
        pre + [
            int(t)
            for t in np.random.RandomState(100 + i).randint(2, 258, 8 + i % 7)
        ]
        for i in range(n)
    ]


LABELS = [65, 66, 67]


@pytest.mark.quick
def test_score_labels_cached_matches_fused(tiny):
    """Wave 2 hits the cache; both waves match the fused shared path
    bit-for-bit on CPU (same forward, different program partition)."""
    cfg, params = tiny
    eng = _engine(cfg, params)  # cache on by default
    base = _engine(cfg, params, prefix_cache_mb=0)
    rows = _rows()
    a1 = eng.score_labels(rows, LABELS)
    assert eng.pkv_stats["misses"] >= 1 and eng.pkv_stats["hits"] == 0
    m1 = eng.pkv_stats["misses"]
    a2 = eng.score_labels(rows, LABELS)
    assert eng.pkv_stats["misses"] == m1  # wave 2: pure hits
    assert eng.pkv_stats["hits"] >= 1
    b = base.score_labels(rows, LABELS)
    assert ("dec_labels_pre",) in {k[:1] for k in eng._jit_cache}
    assert ("dec_labels_shared",) in {k[:1] for k in base._jit_cache}
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(a1, b, rtol=2e-4, atol=2e-4)
    assert (a1.argmax(1) == b.argmax(1)).all()


@pytest.mark.quick
def test_generate_cached_matches_fused(tiny):
    cfg, params = tiny
    eng = _engine(cfg, params)
    base = _engine(cfg, params, prefix_cache_mb=0)
    rows = _rows(seed=9)
    a, na = eng.generate(rows, max_new_tokens=8)
    b, nb = base.generate(rows, max_new_tokens=8)
    assert a == b and na == nb
    # the same prefixes now serve the scoring path from the cache
    h0 = eng.pkv_stats["hits"]
    eng.score_labels(rows, LABELS)
    assert eng.pkv_stats["hits"] > h0


def test_cache_disabled_env(tiny, monkeypatch):
    monkeypatch.setenv("LLMRANKERS_NO_PKV_CACHE", "1")
    cfg, params = tiny
    eng = _engine(cfg, params)
    assert eng._pkv_budget == 0
    rows = _rows()
    eng.score_labels(rows, LABELS)
    assert eng.pkv_stats == {"hits": 0, "misses": 0, "evictions": 0}
    assert ("dec_labels_shared",) in {k[:1] for k in eng._jit_cache}


def test_eviction_under_budget(tiny):
    """Distinct prefixes past the byte budget evict LRU; results stay
    correct (an evicted prefix recomputes on next use)."""
    cfg, params = tiny
    eng = _engine(cfg, params, prefix_cache_mb=1)
    base = _engine(cfg, params, prefix_cache_mb=0)
    for seed in range(7, 15):
        rows = _rows(seed=seed, n=4)
        np.testing.assert_allclose(
            eng.score_labels(rows, LABELS),
            base.score_labels(rows, LABELS),
            rtol=2e-4, atol=2e-4,
        )
    assert eng._pkv_bytes <= 1 << 20
    if eng.pkv_stats["evictions"]:
        # a previously evicted prefix scores correctly again
        rows = _rows(seed=7, n=4)
        np.testing.assert_allclose(
            eng.score_labels(rows, LABELS),
            base.score_labels(rows, LABELS),
            rtol=2e-4, atol=2e-4,
        )


def test_adapter_keying_and_purge(tiny):
    """Each adapter caches its own prefix K/V (merged weights change the
    forward); re-registering a name purges its entries."""
    from llmrankers_tpu.train import lora as lora_mod

    cfg, params = tiny
    eng = _engine(cfg, params, max_cached_adapters=2)
    lcfg = lora_mod.LoraConfig(r=4, alpha=8.0)
    adapter = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(3))
    # init_lora zeroes B (no-op adapter); randomize so the adapter
    # visibly changes the forward.
    adapter = jax.tree.map(
        lambda x, k=jax.random.PRNGKey(4): (
            jax.random.normal(k, x.shape, x.dtype) * 0.02
        ),
        adapter,
    )
    eng.add_adapter("a1", adapter, lcfg)
    rows = _rows(n=4)
    base_scores = eng.score_labels(rows, LABELS)
    ad_scores = eng.score_labels(rows, LABELS, adapter="a1")
    # the adapter changes the forward -> scores differ, and the cache
    # kept SEPARATE entries rather than serving one to the other
    assert not np.allclose(base_scores, ad_scores)
    akeys = {k[0] for k in eng._pkv}
    assert akeys == {None, "a1"}
    # purity: re-scoring each from its cached entry reproduces it
    np.testing.assert_array_equal(
        eng.score_labels(rows, LABELS), base_scores
    )
    np.testing.assert_array_equal(
        eng.score_labels(rows, LABELS, adapter="a1"), ad_scores
    )
    eng.add_adapter("a1", adapter, lcfg)  # re-register purges
    assert {k[0] for k in eng._pkv} == {None}


def test_refill_session_seeds_cache(tiny):
    """A multi-dispatch refill session's initial shared prefill seeds the
    cross-wave cache; the NEXT wave (and the session's own refills) hit."""
    cfg, params = tiny
    eng = _engine(cfg, params)
    eng._gen_row_limit = lambda rows, max_new: 4
    rows = _rows(n=9)
    out1, n1 = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert eng.refill_stats["sessions"] == 1
    assert len(eng._pkv) >= 1  # seeded (or assembled) at session start
    h0 = eng.pkv_stats["hits"]
    out2, n2 = eng.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert eng.pkv_stats["hits"] > h0  # wave 2 session start hit
    assert out1 == out2 and n1 == n2
    base = _engine(cfg, params, prefix_cache_mb=0)
    base._gen_row_limit = lambda rows, max_new: 4
    out_b, n_b = base.generate(rows, max_new_tokens=12, chunk_tokens=4)
    assert out1 == out_b and n1 == n_b


def test_cached_scoring_on_mesh():
    """The assembled-KV path runs under a dp x tp mesh: cache entries are
    sliced/stacked host-side from sharded arrays and re-consumed."""
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(cfg.vocab_size)
    mesh = mesh_mod.make_mesh(2, 2)
    eng = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                        len_buckets=(160,), batch_buckets=(4, 8, 16))
    base = ScoringEngine("decoder", cfg, params, tok, prefix_cache_mb=0,
                         len_buckets=(160,), batch_buckets=(4, 8, 16))
    rows = _rows(n=8)
    a1 = eng.score_labels(rows, LABELS)
    a2 = eng.score_labels(rows, LABELS)  # hit wave
    assert eng.pkv_stats["hits"] >= 1
    b = base.score_labels(rows, LABELS)
    np.testing.assert_allclose(a1, b, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(a2, b, rtol=2e-4, atol=2e-4)
