"""Shared ranker machinery: engine-backed comparator plumbing."""
from __future__ import annotations

import copy
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..algos.scheduler import WaveRunner
from ..engine.engine import ScoringEngine
from ..types import LlmRanker, RerankStats, SearchResult


class EngineRanker(LlmRanker):
    """Base for rankers driven by a :class:`ScoringEngine`.

    ``rerank_many`` is the native entry point: all queries' sort coroutines
    run under one WaveRunner so their comparisons share device batches.
    ``rerank`` (the reference's per-query API, rankers.py:12-14) is the
    single-query special case.
    """

    def __init__(self, engine: ScoringEngine, max_wave_size: Optional[int] = None):
        super().__init__()
        self.engine = engine
        self.max_wave_size = max_wave_size
        # Named engine adapter used for this ranker's scoring/generation
        # calls (see ScoringEngine.add_adapter — vLLM LoRARequest parity).
        # None = base weights. Settable per call batch (the HTTP server
        # groups jobs by adapter and flips this between groups).
        self.adapter: Optional[str] = None
        # Comparison-memoization key function (arXiv:2505.24643): set by
        # subclasses when caching is requested AND scoring is
        # deterministic; None disables caching.
        self._cache_key_fn: Optional[Callable[[Any], Any]] = None
        self._query_stats: List[RerankStats] = []
        # Per-query adapter assignment for the current rerank_many call
        # (multi-adapter wave mixing); set via the query_adapters arg.
        self._query_adapters: Optional[List[Optional[str]]] = None

    # Rankers whose _compare_batch threads per-row adapters into the
    # engine (batched multi-adapter mixing) override this to True.
    supports_query_adapters: bool = False

    def _row_adapters_for(self, qidxs: Sequence[int]):
        """Per-row adapter list for a wave (row i belongs to query
        qidxs[i]), or None when this call has no per-query adapters.
        getattr-tolerant: tests drive _compare_batch directly, without
        a rerank_many call to set the attribute."""
        qa = getattr(self, "_query_adapters", None)
        if qa is None:
            return None
        return [qa[q] for q in qidxs]

    @staticmethod
    def _docid_cache_key(r: Any) -> Any:
        """Memoization key for window/set requests: query index + docid
        tuple IN ORDER (order changes the prompt, hence the output).
        Single definition so every ranker caches under the same shape."""
        return (r.qidx, tuple(d.docid for d in r.docs))

    # Subclasses implement: one query's ranking coroutine + a batch executor.
    async def _rerank_one(self, runner: WaveRunner, qidx: int, query: str,
                          ranking: List[SearchResult]) -> List[SearchResult]:
        raise NotImplementedError

    def _compare_batch(self, requests: List[Any]) -> List[Any]:
        raise NotImplementedError

    def rerank_many(
        self,
        queries: Sequence[str],
        rankings: Sequence[List[SearchResult]],
        on_result: Optional[Callable[[int, List[SearchResult]], None]] = None,
        query_adapters: Optional[Sequence[Optional[str]]] = None,
    ) -> List[List[SearchResult]]:
        """``on_result(i, reranked)`` fires as soon as query i's coroutine
        finishes — the driver streams results to disk at query granularity
        (crash-safe resume, run_setwise.py:300-301 semantics).

        ``query_adapters`` assigns a LoRA adapter PER QUERY; rankers that
        support batched multi-adapter mixing (Rank-R1, the reference's
        LoRA surface) then serve every query's comparisons in shared
        device waves — one dispatch, N adapters (vLLM multi-LoRA parity,
        setwise.py:491-498). Overrides ``self.adapter``."""
        if query_adapters is not None and len(query_adapters) != len(queries):
            raise ValueError("query_adapters must match queries")
        if query_adapters is not None and not self.supports_query_adapters:
            raise ValueError(
                f"{type(self).__name__} does not support per-query "
                "adapters; group queries by adapter instead"
            )
        self._query_adapters = (
            list(query_adapters) if query_adapters is not None else None
        )
        self._query_stats = [RerankStats() for _ in queries]
        runner = WaveRunner(self._compare_batch, self.max_wave_size,
                            cache_key=self._cache_key_fn)

        async def one(i, q, r):
            res = await self._rerank_one(runner, i, q, r)
            if on_result is not None:
                on_result(i, res)
            return res

        results = runner.run(
            [
                one(i, q, copy.deepcopy(list(r)))
                for i, (q, r) in enumerate(zip(queries, rankings))
            ]
        )
        total = RerankStats()
        for s in self._query_stats:
            total.add(s)
        self.stats = total
        # Scheduler observability: cumulative over this ranker's lifetime.
        # submaximal_waves > 0 means the drain heuristic flushed before
        # every live task was blocked — outcomes unchanged, batching
        # degraded; tests assert it stays 0 (scheduler.py invariant).
        self.wave_stats["waves"] += runner.num_waves
        self.wave_stats["submaximal_waves"] += runner.num_submaximal_waves
        self.wave_stats["cache_hits"] += runner.num_cache_hits
        return results

    def rerank(self, query: str, ranking: List[SearchResult]) -> List[SearchResult]:
        return self.rerank_many([query], [ranking])[0]

    @property
    def per_query_stats(self) -> List[RerankStats]:
        return self._query_stats

    def truncate(self, text: str, length: int) -> str:
        return self.engine.tokenizer.truncate(text, length)

    # -- tokenizer helpers -------------------------------------------------
    def _encode_prompt(self, text: str) -> List[int]:
        return self.engine.tokenizer.encode(text, add_special_tokens=True)

    def _label_token_ids(self, labels: Sequence[str], prefix: str) -> List[int]:
        """Last-token id of f'{prefix} {label}' for each label, mirroring
        the reference's target_token_ids construction (setwise.py:55-59)."""
        tk = self.engine.tokenizer
        out = []
        for c in labels:
            ids = tk.encode(f"{prefix} {c}", add_special_tokens=False)
            out.append(ids[-1])
        return out


def rerank_many_pipelined(
    ranker_factory: Callable[[], EngineRanker],
    queries: Sequence[str],
    rankings: Sequence[List[SearchResult]],
    cohorts: int = 2,
    on_result: Optional[Callable[[int, List[SearchResult]], None]] = None,
):
    """Run ``cohorts`` independent wave-batched rerank passes on threads
    sharing one engine, so one cohort's host work (tokenize/pack/parse)
    overlaps another's device compute. ~8% end-to-end on v5e at 64
    queries.

    Semantics: identical to cohorts=1 for DETERMINISTIC scoring. Rankers
    whose comparisons draw from a shared RNG stream (setwise/Rank-R1
    ``num_permutation > 1``) give different — equally valid — shuffles
    per cohort, because each cohort ranker re-seeds its own stream over
    a subset of the queries; the CLI forces cohorts=1 for those configs.

    Returns (results, rankers): per-query results in input order plus the
    cohort rankers (for meter aggregation).
    """
    import threading

    n = len(queries)
    cohorts = max(1, min(cohorts, n or 1))
    bounds = [round(i * n / cohorts) for i in range(cohorts + 1)]
    rankers = [ranker_factory() for _ in range(cohorts)]
    results: List[Optional[List[SearchResult]]] = [None] * n
    errors: List[BaseException] = []

    def run(ci: int) -> None:
        lo, hi = bounds[ci], bounds[ci + 1]

        def cb(i: int, res: List[SearchResult]) -> None:
            results[lo + i] = res
            if on_result is not None:
                on_result(lo + i, res)

        try:
            out = rankers[ci].rerank_many(queries[lo:hi], rankings[lo:hi],
                                          on_result=cb)
            results[lo:hi] = out
        except BaseException as e:  # surface thread failures to the caller
            errors.append(e)

    threads = [threading.Thread(target=run, args=(ci,)) for ci in range(cohorts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results, rankers
