"""Listwise (RankGPT) sliding-window reranker.

Behavioral parity with reference listwise.py:147-291:
  * generation scoring — full permutation decode over the RankGPT prompt
    (completion form for T5, chat form for decoder-only models);
  * likelihood scoring — the setwise single-forward trick: label-token
    logits rank the whole window in one forward and are rendered as a
    synthetic "[i] > [j]" string (listwise.py:273-286);
  * bottom-up sliding window, num_repeat passes, final score = -position.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import sys

import numpy as np

from ..algos import listwise_window
from ..engine.engine import ScoringEngine
from ..types import RerankStats, SearchResult
from . import prompts
from .base import EngineRanker


@dataclass
class _WindowRequest:
    qidx: int
    query: str
    docs: List[SearchResult]


class ListwiseLlmRanker(EngineRanker):
    CHARACTERS = prompts.CHARACTERS

    def __init__(
        self,
        engine: ScoringEngine,
        window_size: int = 3,
        step_size: int = 1,
        num_repeat: int = 1,
        scoring: str = "generation",
        max_new_tokens: int = 20,
        max_wave_size: Optional[int] = None,
        cache_comparisons: bool = False,
        method: str = "sliding",  # 'sliding' (reference) | 'topdown'
        k: int = 10,  # topdown pivot rank (unused by sliding)
    ):
        super().__init__(engine, max_wave_size)
        if cache_comparisons:
            # Sound for both scoring modes (greedy decode / label-logit
            # forward are deterministic in the window contents). Repeated
            # windows occur across num_repeat passes whenever a pass
            # leaves a slice unchanged.
            self._cache_key_fn = self._docid_cache_key
        if method not in ("sliding", "topdown"):
            raise NotImplementedError(f"Method {method} is not implemented.")
        if method == "topdown" and (num_repeat != 1 or step_size != 1):
            print("topdown ignores num_repeat/step_size (single-pass "
                  "pivot partitioning)", file=sys.stderr)
        self.method = method
        self.k = k
        self.window_size = window_size
        self.step_size = step_size
        self.num_repeat = num_repeat
        self.scoring = scoring
        # The reference relies on HF's default generation length (~20
        # total tokens, listwise.py:257); enough for a window permutation.
        self.max_new_tokens = max_new_tokens
        tk = engine.tokenizer
        if engine.kind == "t5":
            self.decoder_prefix = tk.encode("<pad>", add_special_tokens=False) or [
                engine.cfg.decoder_start_token_id
            ]
            self.likelihood_prefix = tk.encode("<pad> Passage", add_special_tokens=False)
            self.label_ids = self._label_token_ids(self.CHARACTERS, "<pad> Passage")
        else:
            self.decoder_prefix = []
            self.likelihood_prefix = []
            self.label_ids = self._label_token_ids(self.CHARACTERS, "Passage")

    async def _rerank_one(self, runner, qidx, query, ranking):
        async def compare(window: List[SearchResult]) -> str:
            return await runner.compare(_WindowRequest(qidx, query, window))

        if self.method == "topdown":
            # Beyond-reference extension (arXiv:2405.14589): parallel
            # pivot partitioning — every level is one device wave.
            ordered = await listwise_window.topdown(
                runner, list(ranking), self.k, self.window_size, compare
            )
        else:
            ordered = await listwise_window.sliding_window(
                list(ranking), self.window_size, self.step_size,
                self.num_repeat, compare,
            )
        return [
            SearchResult(docid=d.docid, score=-i, text=d.text)
            for i, d in enumerate(ordered)
        ]

    def _compare_batch(self, requests: List[_WindowRequest]) -> List[str]:
        if self.scoring == "likelihood":
            return self._likelihood_batch(requests)
        return self._generation_batch(requests)

    def _likelihood_batch(self, requests: List[_WindowRequest]) -> List[str]:
        rows, max_docs = [], 0
        for r in requests:
            self._query_stats[r.qidx].comparisons += 1
            text = prompts.setwise_prompt(r.query, [d.text for d in r.docs])
            ids = self._encode_prompt(text)
            self._query_stats[r.qidx].prompt_tokens += len(ids)
            rows.append(ids)
            max_docs = max(max_docs, len(r.docs))
        logits = self.engine.score_labels(
            rows, self.label_ids[:max_docs], self.likelihood_prefix,
            adapter=self.adapter,
        )
        out = []
        for i, r in enumerate(requests):
            n = len(r.docs)
            # Stable descending sort, ties keep original label order
            # (listwise.py:281-286 uses Python sorted).
            order = sorted(range(n), key=lambda j: -logits[i, j])
            out.append(">".join(f"[{j + 1}]" for j in order))
        return out

    def _generation_batch(self, requests: List[_WindowRequest]) -> List[str]:
        tk = self.engine.tokenizer
        rows = []
        for r in requests:
            self._query_stats[r.qidx].comparisons += 1
            texts = [d.text for d in r.docs]
            if self.engine.kind == "t5":
                text = prompts.rankgpt_completion_prompt(r.query, texts)
            else:
                msgs = prompts.rankgpt_chat_messages(r.query, texts)
                text = tk.apply_chat_template(msgs)
            ids = self._encode_prompt(text)
            self._query_stats[r.qidx].prompt_tokens += len(ids)
            rows.append(ids)
        texts_out, ntoks = self.engine.generate(
            rows, self.max_new_tokens, self.decoder_prefix,
            adapter=self.adapter,
        )
        for r, nt in zip(requests, ntoks):
            self._query_stats[r.qidx].completion_tokens += nt
        return [t.strip() for t in texts_out]
