"""Headline benchmark: setwise-heapsort rerank throughput on one chip.

Workload mirrors the reference's README benchmark setting (README.md:
256-279): BM25 top-100 rerank, setwise heapsort num_child=2 k=10,
flan-t5-large-shaped model, 128-token passages / 16-token queries —
random weights (zero-network environment), synthetic corpus with
token counts matched to the DL19 configuration.

Two executions of the same workload:
  * batched   — this framework's wave-batched rerank_many (all queries'
    comparisons share fixed-shape device batches);
  * reference-style — the reference's execution model (run.py:184-195 +
    setwise.py:200-232): one query at a time, one batch-1 device call per
    comparison.

Prints ONE JSON line; vs_baseline = batched docs/sec over
reference-style docs/sec on the SAME chip (the architectural speedup;
the reference publishes no absolute latency numbers — BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_workload(n_queries: int, n_docs: int, doc_tokens: int, qry_tokens: int):
    from llmrankers_tpu.types import SearchResult

    rng = np.random.RandomState(929)
    words = ["w%03d" % i for i in range(1000)]

    def text(n_tok):
        # ~1 byte-token per char: sized chunks of letters.
        return " ".join(rng.choice(words, max(1, n_tok // 5)))

    queries = [text(qry_tokens) for _ in range(n_queries)]
    rankings = [
        [SearchResult(f"q{q}d{i}", 0.0, text(doc_tokens)) for i in range(n_docs)]
        for q in range(n_queries)
    ]
    return queries, rankings


def main():
    import jax
    import jax.numpy as jnp

    from llmrankers_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from llmrankers_tpu.engine import ByteTokenizer, ScoringEngine
    from llmrankers_tpu.models import t5
    from llmrankers_tpu.models.config import T5Config
    from llmrankers_tpu.rankers import SetwiseLlmRanker

    cfg = T5Config.flan_t5_large()
    params = t5.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tok = ByteTokenizer(cfg.vocab_size)

    N_QUERIES, N_DOCS = 64, 100
    queries, rankings = build_workload(N_QUERIES, N_DOCS, 128, 16)

    # ---- batched path ----------------------------------------------------
    engine = ScoringEngine(
        "t5", cfg, params, tok,
        len_buckets=(512, 640, 1024), batch_buckets=(16, 32, 64, 256),
    )
    from llmrankers_tpu.rankers.base import rerank_many_pipelined

    def make_ranker():
        return SetwiseLlmRanker(
            engine, num_child=2, k=10, scoring="likelihood", method="heapsort"
        )

    ranker = make_ranker()
    # Warm-up compile on one query.
    ranker.rerank_many(queries[:1], [rankings[0][:]])
    ranker.rerank_many(queries[:20], [list(r) for r in rankings[:20]])
    t0 = time.perf_counter()
    # Two cohorts overlap host packing with device compute (+8% on v5e).
    _, cohort_rankers = rerank_many_pipelined(
        make_ranker, queries, [list(r) for r in rankings], cohorts=2
    )
    batched_s = time.perf_counter() - t0
    batched_dps = N_QUERIES * N_DOCS / batched_s
    total_compares = sum(r.total_compare for r in cohort_rankers)

    # (The 'insertion' method is not benchmarked here: its comparison
    # savings require a real model judging a correlated first-stage
    # prior — random weights invert its behavior. See
    # tests/test_algos.py::test_setwise_insertion_topk.)

    # ---- reference-style path (batch-1, sequential) ----------------------
    seq_engine = ScoringEngine(
        "t5", cfg, params, tok, len_buckets=(512, 640, 1024), batch_buckets=(1,),
    )
    seq_ranker = SetwiseLlmRanker(
        seq_engine, num_child=2, k=10, scoring="likelihood", method="heapsort",
        max_wave_size=1,
    )
    SEQ_QUERIES = 2
    seq_ranker.rerank_many(queries[:1], [rankings[0][:]])  # warm-up
    t0 = time.perf_counter()
    for q in range(SEQ_QUERIES):
        seq_ranker.rerank_many([queries[q]], [list(rankings[q])])
    seq_s = (time.perf_counter() - t0) / SEQ_QUERIES * N_QUERIES
    seq_dps = N_QUERIES * N_DOCS / seq_s

    print(
        json.dumps(
            {
                "metric": "setwise_heapsort_flan-t5-large_docs_per_sec",
                "value": round(batched_dps, 2),
                "unit": "docs/s/chip",
                "vs_baseline": round(batched_dps / seq_dps, 2),
                "detail": {
                    "batched_wall_s": round(batched_s, 2),
                    "reference_style_wall_s_est": round(seq_s, 2),
                    "queries": N_QUERIES,
                    "docs_per_query": N_DOCS,
                    "comparisons": total_compares,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
