"""Pointwise rerankers: qlm, yes_no, and supervised monoT5.

Behavioral parity with reference pointwise.py:
  * qlm — negative log-likelihood of the query under a "write a question"
    prompt, summed over target positions including the forced leading pad
    (pointwise.py:41-82);
  * yes_no — P(Yes) from the softmax over Yes/No first-token logits
    (pointwise.py:84-127);
  * monoT5 — P(true) over true/false token logits at decoder position 0
    (pointwise.py:136-186).

This was the reference's only genuinely batched path; here it batches
across queries as well — all (query, doc) pairs of a rerank_many call
ride one bucketed engine stream.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..engine.engine import ScoringEngine
from ..types import LlmRanker, RerankStats, SearchResult
from . import prompts
from .base import EngineRanker


class PointwiseLlmRanker(EngineRanker):
    def __init__(self, engine: ScoringEngine, method: str = "qlm",
                 batch_size: int = 0):
        # batch_size is accepted for CLI parity; the engine buckets itself.
        super().__init__(engine)
        if engine.kind != "t5":
            raise NotImplementedError(
                "Model type is not supported yet for pointwise (pointwise.py:27)"
            )
        self.method = method
        tk = engine.tokenizer
        self.yes_id = tk.encode("Yes", add_special_tokens=False)[0]
        self.no_id = tk.encode("No", add_special_tokens=False)[0]

    def rerank_many(self, queries, rankings, on_result=None):
        self._query_stats = [RerankStats() for _ in queries]
        rows: List[List[int]] = []
        row_q: List[int] = []
        targets: List[List[int]] = []
        tk = self.engine.tokenizer
        for qi, (query, ranking) in enumerate(zip(queries, rankings)):
            for doc in ranking:
                if self.method == "qlm":
                    text = prompts.qlm_prompt(doc.text)
                    targets.append(tk.encode(f"<pad> {query}", add_special_tokens=False))
                else:
                    text = prompts.yes_no_prompt(query, doc.text)
                ids = self._encode_prompt(text)
                st = self._query_stats[qi]
                st.comparisons += 1
                st.prompt_tokens += len(ids) + (len(targets[-1]) if self.method == "qlm" else 1)
                rows.append(ids)
                row_q.append(qi)

        if self.method == "qlm":
            scores = self.engine.sequence_nll(rows, targets, adapter=self.adapter)
        elif self.method == "yes_no":
            logits = self.engine.score_labels(
                rows, [self.yes_id, self.no_id],
                decoder_prefix=[self.engine.cfg.pad_token_id],
                adapter=self.adapter,
            )
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            scores = e[:, 0] / e.sum(axis=1)  # P(Yes)
        else:
            raise ValueError(f"unknown pointwise method {self.method}")

        out: List[List[SearchResult]] = []
        pos = 0
        for qi, ranking in enumerate(rankings):
            scored = [
                SearchResult(docid=d.docid, score=float(scores[pos + j]), text=d.text)
                for j, d in enumerate(ranking)
            ]
            pos += len(ranking)
            ranked = sorted(scored, key=lambda x: x.score, reverse=True)
            out.append(ranked)
            if on_result is not None:
                on_result(qi, ranked)
        total = RerankStats()
        for s in self._query_stats:
            total.add(s)
        self.stats = total
        return out


class MonoT5LlmRanker(PointwiseLlmRanker):
    """Supervised monoT5 head (pointwise.py:136-186)."""

    def __init__(self, engine: ScoringEngine, method: str = "yes_no",
                 batch_size: int = 0):
        super().__init__(engine, method="monot5")
        tk = engine.tokenizer
        self.false_id = tk.encode("false", add_special_tokens=False)[0]
        self.true_id = tk.encode("true", add_special_tokens=False)[0]

    def rerank_many(self, queries, rankings, on_result=None):
        self._query_stats = [RerankStats() for _ in queries]
        rows: List[List[int]] = []
        for qi, (query, ranking) in enumerate(zip(queries, rankings)):
            for doc in ranking:
                ids = self._encode_prompt(prompts.monot5_prompt(query, doc.text))
                st = self._query_stats[qi]
                st.comparisons += 1
                st.prompt_tokens += len(ids) + 1
                rows.append(ids)
        logits = self.engine.score_labels(
            rows, [self.false_id, self.true_id],
            decoder_prefix=[self.engine.cfg.decoder_start_token_id],
            adapter=self.adapter,
        )
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        scores = e[:, 1] / e.sum(axis=1)  # P(true)
        out: List[List[SearchResult]] = []
        pos = 0
        for qi, ranking in enumerate(rankings):
            scored = [
                SearchResult(docid=d.docid, score=float(scores[pos + j]), text=d.text)
                for j, d in enumerate(ranking)
            ]
            pos += len(ranking)
            ranked = sorted(scored, key=lambda x: x.score, reverse=True)
            out.append(ranked)
            if on_result is not None:
                on_result(qi, ranked)
        total = RerankStats()
        for s in self._query_stats:
            total.add(s)
        self.stats = total
        return out
