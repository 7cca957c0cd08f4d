"""Batched multi-adapter serving (S-LoRA style) — VERDICT r3 missing #4/#5.

The reference serves LoRA adapters through vLLM's LoRARequest
(llmrankers/setwise.py:491-498); vLLM mixes many adapters in one batch via
per-row unmerged A·B application. Here the engine stacks registered
adapters ([L, N+1, in, rmax] with slot 0 = base, alpha/r folded into B)
and every qmm site adds x@A[idx]@B[idx] (models/quant.py::_lora_mix), so
one dispatch serves N adapters at CONSTANT memory — no merged full-model
weight copies, no adapter-LRU thrash.

Numerics: the mixed path computes x@W + x@(AB) where the merged path
computes x@(W + AB) — float-associativity equivalent. Tests compare at
fp32 on CPU with tight tolerances plus exact greedy-token agreement.
"""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig
from llmrankers_tpu.train import lora as lora_mod


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    eng = ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size),
        len_buckets=(64,), batch_buckets=(4, 8, 16),
    )
    for i, (name, r) in enumerate([("ad_a", 4), ("ad_b", 8), ("ad_c", 4),
                                   ("ad_d", 8)]):
        lcfg = lora_mod.LoraConfig(r=r, alpha=2 * r)
        ad = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(10 + i))
        # init_lora zeroes B (no-op adapter); randomize it so each
        # adapter visibly changes the model.
        ad = jax.tree.map(
            lambda x, k=jax.random.PRNGKey(20 + i): (
                jax.random.normal(k, x.shape, x.dtype) * 0.02
            ),
            ad,
        )
        eng.add_adapter(name, ad, lcfg)
    return cfg, params, eng


def _rows(n, seed=0, lo=20, hi=56):
    rng = np.random.RandomState(seed)
    return [
        [int(t) for t in rng.randint(2, 258, size=rng.randint(lo, hi))]
        for _ in range(n)
    ]


@pytest.mark.quick
def test_mixed_score_labels_matches_merged(setup):
    cfg, params, eng = setup
    rows = _rows(8, seed=1)
    names = ["ad_a", "ad_b", None, "ad_c"]
    row_adapters = [names[i % 4] for i in range(8)]
    labels = [5, 9, 13]
    mixed = eng.score_labels(rows, labels, row_adapters=row_adapters)
    for name in set(names):
        want = eng.score_labels(rows, labels, adapter=name)
        sel = [i for i, a in enumerate(row_adapters) if a == name]
        np.testing.assert_allclose(
            mixed[sel], want[sel], rtol=2e-3, atol=2e-5
        )
        assert (mixed[sel].argmax(-1) == want[sel].argmax(-1)).all()


@pytest.mark.quick
def test_mixed_generate_matches_merged(setup):
    cfg, params, eng = setup
    rows = _rows(9, seed=2)
    row_adapters = [["ad_a", "ad_b", None][i % 3] for i in range(9)]
    texts, ntoks = eng.generate(
        rows, max_new_tokens=8, row_adapters=row_adapters
    )
    for name in ("ad_a", "ad_b", None):
        want, wn = eng.generate(rows, max_new_tokens=8, adapter=name)
        sel = [i for i, a in enumerate(row_adapters) if a == name]
        assert [texts[i] for i in sel] == [want[i] for i in sel]
        assert [ntoks[i] for i in sel] == [wn[i] for i in sel]


def test_mixed_generate_refill_session(setup):
    """Mixing composes with decode-time slot refill: refilled slots carry
    their own adapter index into the session's per-row index vector."""
    cfg, params, eng = setup
    eng2 = ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size),
        len_buckets=(64,), batch_buckets=(4, 8, 16),
    )
    eng2._adapters = eng._adapters  # share registrations
    eng2._gen_row_limit = lambda r, m: 4
    rows = _rows(10, seed=3)
    row_adapters = [["ad_a", "ad_d", None][i % 3] for i in range(10)]
    texts, ntoks = eng2.generate(
        rows, max_new_tokens=12, chunk_tokens=4, row_adapters=row_adapters
    )
    assert eng2.refill_stats["sessions"] == 1
    for name in ("ad_a", "ad_d", None):
        want, wn = eng.generate(rows, max_new_tokens=12, adapter=name)
        sel = [i for i, a in enumerate(row_adapters) if a == name]
        assert [texts[i] for i in sel] == [want[i] for i in sel]
        assert [ntoks[i] for i in sel] == [wn[i] for i in sel]
    # Constant memory: the mixed path materialized no merged clones...
    assert len(eng2._adapter_params) == 0
    # ...while the merged comparisons above did (cached per adapter).
    assert len(eng._adapter_params) >= 1


@pytest.mark.quick
def test_mixed_heterogeneous_ranks_and_single_fallback(setup):
    cfg, params, eng = setup
    rows = _rows(4, seed=4)
    # ad_a (r=4) and ad_b (r=8) in one wave: rank zero-padding path.
    mixed = eng.score_labels(
        rows, [5, 9], row_adapters=["ad_a", "ad_b", "ad_a", "ad_b"]
    )
    assert mixed.shape == (4, 2)
    # All rows the same adapter -> reduces to the merged single path.
    setup_res = eng._mix_setup(["ad_a"] * 4, 4)
    assert setup_res == ("single", "ad_a")
    assert eng._mix_setup([None] * 4, 4) == ("single", None)


@pytest.mark.quick
def test_mix_rejected_on_quantized_and_t5(setup):
    cfg, params, eng = setup
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    qeng = ScoringEngine(
        "decoder", cfg, params, ByteTokenizer(cfg.vocab_size),
        quantize="int8",
    )
    with pytest.raises(ValueError, match="quantized"):
        qeng._mix_setup(["a", "b"], 2)
    tcfg = T5Config.tiny()
    teng = ScoringEngine(
        "t5", tcfg, t5_mod.init_params(tcfg, jax.random.PRNGKey(0)),
        ByteTokenizer(tcfg.vocab_size),
    )
    with pytest.raises(ValueError, match="decoder"):
        teng._mix_setup(["a", "b"], 2)


def test_rankr1_wave_mixes_four_adapters(setup):
    """End-to-end: one Rank-R1 rerank_many over 4 queries, each with its
    own adapter, runs mixed waves and matches per-adapter reranks."""
    from llmrankers_tpu.rankers.rank_r1 import RankR1SetwiseLlmRanker
    from llmrankers_tpu.types import SearchResult

    cfg, params, eng = setup
    prompt_file = "/root/repo/llmrankers_tpu/prompts/prompt_setwise-R1.toml"
    ranker = RankR1SetwiseLlmRanker(
        eng, prompt_file, num_child=2, k=2, max_completion_tokens=16
    )
    docs = [
        [SearchResult(f"d{i}", 0.0, f"passage about topic {i + q}")
         for i in range(5)]
        for q in range(4)
    ]
    queries = [f"query {q}" for q in range(4)]
    adapters = ["ad_a", "ad_b", "ad_c", "ad_d"]
    eng._adapter_params.clear()
    mixed = ranker.rerank_many(queries, docs, query_adapters=adapters)
    assert len(eng._adapter_params) == 0  # no merged clones
    for q in range(4):
        solo = RankR1SetwiseLlmRanker(
            eng, prompt_file, num_child=2, k=2, max_completion_tokens=16,
            adapter=adapters[q],
        )
        want = solo.rerank(queries[q], list(docs[q]))
        assert [d.docid for d in mixed[q]] == [d.docid for d in want]


def test_unsupported_ranker_rejects_query_adapters(setup):
    from llmrankers_tpu.rankers.setwise import SetwiseLlmRanker

    cfg, params, eng = setup
    r = SetwiseLlmRanker(engine=eng, num_child=2, method="heapsort", k=2)
    from llmrankers_tpu.types import SearchResult

    docs = [SearchResult("0", 0.0, "x"), SearchResult("1", 0.0, "y")]
    with pytest.raises(ValueError, match="per-query"):
        r.rerank_many(["q"], [docs], query_adapters=["ad_a"])


def test_serve_mixed_adapter_window():
    """Four adapters arriving in one window run as ONE mixed wave set
    (mixed_waves counter), through a capability-gated ranker."""
    from llmrankers_tpu.serve import RerankService
    from llmrankers_tpu.types import SearchResult

    calls = []

    class FakeEngine:
        kind = "decoder"
        params = {"layers": {}}

    class MixRanker:
        adapter = None
        per_query_stats = None
        supports_query_adapters = True
        engine = FakeEngine()

        def rerank_many(self, queries, rankings, query_adapters=None):
            calls.append((len(queries), tuple(query_adapters or ())))
            return [list(r) for r in rankings]

    service = RerankService(MixRanker(), max_batch=8, window_ms=100.0,
                            adapters=["a", "b", "c", "d"])
    docs = [SearchResult("0", 0.0, "x")]
    jobs = [service.submit(f"q{i}", list(docs), ad)
            for i, ad in enumerate(["a", "b", "c", "d"])]
    for j in jobs:
        j.done.wait(timeout=10)
        assert j.error is None
    assert service.mixed_waves == 1
    assert len(calls) == 1 and calls[0] == (4, ("a", "b", "c", "d"))
    service.shutdown()


@pytest.mark.quick
def test_mix_cache_lru_bounded(setup):
    """Distinct adapter name-SETS must not accumulate unboundedly: the
    stack cache is LRU-bounded by _max_mix_stacks and evicts oldest
    first (a long-lived serve process mixing varying subsets would
    otherwise leak one device-resident stack per subset)."""
    cfg, params, eng = setup
    eng._mix_cache.clear()
    eng._max_mix_stacks = 2
    try:
        eng._stack_adapters(("ad_a", "ad_b"))
        eng._stack_adapters(("ad_a", "ad_c"))
        assert len(eng._mix_cache) == 2
        # touch the first so it becomes MRU, then overflow
        eng._stack_adapters(("ad_a", "ad_b"))
        eng._stack_adapters(("ad_b", "ad_c"))
        assert len(eng._mix_cache) == 2
        assert ("ad_a", "ad_b") in eng._mix_cache  # MRU survived
        assert ("ad_a", "ad_c") not in eng._mix_cache  # LRU evicted
        # evicted set still works (re-stacked on demand)
        assert eng._stack_adapters(("ad_a", "ad_c")) is not None
    finally:
        eng._max_mix_stacks = max(4, eng._max_cached_adapters)
        eng._mix_cache.clear()
