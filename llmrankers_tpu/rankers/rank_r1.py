"""Rank-R1: reasoning setwise reranker (reference setwise.py:406-553,
Rank-R1/run_setwise.py:95-222).

A decoder-only chat model (optionally with a LoRA adapter) reasons inside
<think></think> and answers <answer>[i]</answer>; the winner is extracted
by the prompt pack's regex over the lowercased completion. Labels are
numeric "[1]".."[20]". Prompt packs are TOML files with keys
prompt_system / prompt_user / pattern / doc_prefix / doc_separator
(setwise.py:426-427, run_setwise.py:157-158) — the packs shipped in
``llmrankers_tpu/prompts/`` are model artifacts the published Rank-R1
LoRAs were trained against (Rank-R1/README.md:95).

TPU-native: long reasoning completions run on the fixed-shape KV-cache
decode scan; permutation self-consistency copies ride the same batch.
"""
from __future__ import annotations

import random
import sys
import re
import tomllib
from dataclasses import dataclass
from typing import Any, List, Optional

from ..algos import setwise_sort
from ..engine.engine import ScoringEngine
from ..types import SearchResult, toppassage_results
from .base import EngineRanker
from .setwise import _SetRequest


class RankR1SetwiseLlmRanker(EngineRanker):
    CHARACTERS = [f"[{i + 1}]" for i in range(20)]
    # Waves mix per-query LoRA adapters via engine row_adapters
    # (batched multi-adapter serving — vLLM multi-LoRA parity).
    supports_query_adapters = True

    def __init__(
        self,
        engine: ScoringEngine,
        prompt_file: str,
        num_child: int = 19,
        k: int = 10,
        scoring: str = "generation",
        method: str = "heapsort",
        num_permutation: int = 1,
        max_completion_tokens: int = 2048,  # SamplingParams(max_tokens=2048)
        seed: int = 929,
        verbose: bool = False,
        max_wave_size: Optional[int] = None,
        adapter: Optional[str] = None,  # engine adapter name (vLLM
        # LoRARequest parity, setwise.py:494-497); None = base weights
        spec_depth: int = 1,  # >1: speculative heap pops (latency knob)
        cache_comparisons: bool = False,
        temperature: float = 0.0,  # vLLM SamplingParams(temperature=...)
        # parity; the reference pins 0 (run_setwise.py:116) but the
        # serving surface exposes the knob. Sample streams are keyed by
        # ``seed``, so a rerank call is reproducible.
        chunk_tokens: Optional[int] = None,  # host stop-string check /
        # slot-refill granularity (engine.generate chunking); None =
        # engine default (256 for budgets >= 512)
    ):
        super().__init__(engine, max_wave_size)
        if temperature and temperature > 0.0:
            if cache_comparisons:
                raise ValueError(
                    "cache_comparisons requires deterministic outcomes; "
                    "incompatible with temperature sampling"
                )
            if spec_depth > 1:
                raise ValueError(
                    "spec_depth > 1 is greedy-only (speculative "
                    "acceptance); incompatible with temperature sampling"
                )
        self.temperature = float(temperature)
        if cache_comparisons:
            if num_permutation > 1:
                raise ValueError(
                    "cache_comparisons requires num_permutation == 1"
                )
            self._cache_key_fn = self._docid_cache_key
        self.adapter = adapter
        if scoring != "generation":
            raise NotImplementedError(
                "RankR1SetwiseLlmRanker only supports 'generation' scoring"
            )
        if spec_depth > 1 and num_permutation > 1:
            # Same constraint as SetwiseLlmRanker's generation scoring:
            # discarded speculative comparisons would advance the shared
            # permutation RNG stream and change later shuffles.
            raise ValueError(
                "spec_depth > 1 is incompatible with num_permutation > 1 "
                "(speculative comparisons would shift the permutation "
                "RNG stream)"
            )
        self.spec_depth = spec_depth
        if engine.kind != "decoder":
            raise ValueError("Rank-R1 rankers run on decoder-only chat models")
        with open(prompt_file, "rb") as f:
            self.prompt = tomllib.load(f)
        self.num_child = num_child
        self.k = k
        self.method = method
        self.num_permutation = num_permutation
        self.max_completion_tokens = max_completion_tokens
        self.chunk_tokens = chunk_tokens
        self.rng = random.Random(seed)
        self.seed = int(seed)
        self.verbose = verbose

    async def _rerank_one(self, runner, qidx, query, ranking):
        original = list(ranking)

        async def compare(docs: List[SearchResult]) -> int:
            return await runner.compare(_SetRequest(qidx, query, docs))

        if self.method == "heapsort":
            ordered = await setwise_sort.heapsort(
                runner, list(ranking), self.k, self.num_child, compare,
                spec_depth=self.spec_depth,
            )
        elif self.method == "bubblesort":
            ordered = await setwise_sort.bubblesort(
                runner, list(ranking), self.k, self.num_child, compare
            )
        elif self.method == "insertion":
            ordered = await setwise_sort.insertion(
                runner, list(ranking), self.k, self.num_child, compare
            )
        else:
            raise NotImplementedError(f"Method {self.method} is not implemented.")
        return toppassage_results(ordered, original, self.k)

    # ------------------------------------------------------------------
    def _render(self, query: str, docs: List[SearchResult], perm: List[int]) -> str:
        doc_prefix = self.prompt.get("doc_prefix", "[{num}] ")
        doc_sep = self.prompt.get("doc_separator", "\n")
        lines = [
            f"{doc_prefix.format(num=i + 1)}{docs[j].text}"
            for i, j in enumerate(perm)
        ]
        docs_text = doc_sep.join(lines)
        messages = [
            {"role": "system", "content": self.prompt["prompt_system"]},
            {"role": "user", "content": self.prompt["prompt_user"].format(
                query=query, docs=docs_text)},
        ]
        return self.engine.tokenizer.apply_chat_template(messages)

    def _compare_batch(self, requests: List[_SetRequest]) -> List[int]:
        rows: List[List[int]] = []
        row_qidx: List[int] = []
        plans: List[List[Any]] = []
        for r in requests:
            self._query_stats[r.qidx].comparisons += (
                self.num_permutation if self.num_permutation > 1 else 1
            )
            n = len(r.docs)
            plan = []
            # Rank-R1 shuffles docs but keeps labels in order
            # (setwise.py:471-474).
            variants = (
                [list(range(n))]
                if self.num_permutation == 1
                else [self.rng.sample(list(range(n)), n) for _ in range(self.num_permutation)]
            )
            for perm in variants:
                text = self._render(r.query, r.docs, perm)
                ids = self._encode_prompt(text)
                self._query_stats[r.qidx].prompt_tokens += len(ids)
                plan.append((len(rows), perm))
                rows.append(ids)
                row_qidx.append(r.qidx)
            plans.append(plan)

        pattern = rf"{self.prompt['pattern']}"
        row_adapters = self._row_adapters_for(row_qidx)
        texts, ntoks = self.engine.generate(
            rows, self.max_completion_tokens, stop_strings=("</answer>",),
            chunk_tokens=self.chunk_tokens,
            **(
                {"temperature": self.temperature, "seed": self.seed}
                if self.temperature > 0.0 else {}
            ),
            **(
                {"row_adapters": row_adapters}
                if row_adapters is not None else {"adapter": self.adapter}
            ),
        )

        out: List[int] = []
        for r, plan in zip(requests, plans):
            candidates = []
            labels = self.CHARACTERS[: len(r.docs)]
            for row_i, perm in plan:
                self._query_stats[r.qidx].completion_tokens += ntoks[row_i]
                completion = texts[row_i]
                if self.verbose:
                    print(f"--- completion for q={r.query!r}:\n{completion}\n---")
                m = re.search(pattern, completion.lower(), re.DOTALL)
                result = m.group(1).strip() if m else ""
                if result not in labels:
                    if self.verbose:
                        print(f"Unexpected output: {result!r}", file=sys.stderr)
                    continue
                candidates.append(perm[labels.index(result)])
            if not candidates:
                out.append(0)  # fallback-to-first, as heapify's ValueError path
                continue
            counts: dict = {}
            for c in candidates:
                counts[c] = counts.get(c, 0) + 1
            top = max(counts.values())
            best = [c for c, v in counts.items() if v == top]
            out.append(best[0] if len(best) == 1 else self.rng.choice(best))
        return out


class RankR1ListwiseLlmRanker(EngineRanker):
    """RankZephyr-style listwise reranker on a chat model + prompt pack
    (Rank-R1/run_listwise.py:89-156): windows rendered as "[i] text" lines
    into the pack's prompt_user ({query}/{num}/{docs}), the completion's
    ranking string extracted by the pack regex, then the standard sliding
    window rewrite."""

    CHARACTERS = [f"[{i + 1}]" for i in range(20)]
    # Waves mix per-query LoRA adapters via engine row_adapters.
    supports_query_adapters = True

    def __init__(
        self,
        engine: ScoringEngine,
        prompt_file: str,
        window_size: int = 20,
        step_size: int = 10,
        num_repeat: int = 1,
        max_completion_tokens: int = 2048,
        verbose: bool = False,
        max_wave_size: Optional[int] = None,
        adapter: Optional[str] = None,  # engine adapter name; None = base
        cache_comparisons: bool = False,
        method: str = "sliding",  # 'sliding' (reference) | 'topdown'
        k: int = 10,  # topdown pivot rank (unused by sliding)
        temperature: float = 0.0,  # SamplingParams parity (see setwise)
        seed: int = 929,
    ):
        super().__init__(engine, max_wave_size)
        if temperature and temperature > 0.0 and cache_comparisons:
            raise ValueError(
                "cache_comparisons requires deterministic outcomes; "
                "incompatible with temperature sampling"
            )
        self.temperature = float(temperature)
        self.seed = int(seed)
        if cache_comparisons:
            self._cache_key_fn = self._docid_cache_key
        if method not in ("sliding", "topdown"):
            raise NotImplementedError(f"Method {method} is not implemented.")
        if method == "topdown" and (num_repeat != 1 or step_size != 10):
            print("topdown ignores num_repeat/step_size (single-pass "
                  "pivot partitioning)", file=sys.stderr)
        self.method = method
        self.k = k
        self.adapter = adapter
        if engine.kind != "decoder":
            raise ValueError("Rank-R1 rankers run on decoder-only chat models")
        with open(prompt_file, "rb") as f:
            self.prompt = tomllib.load(f)
        self.window_size = window_size
        self.step_size = step_size
        self.num_repeat = num_repeat
        self.max_completion_tokens = max_completion_tokens
        self.verbose = verbose

    async def _rerank_one(self, runner, qidx, query, ranking):
        from ..algos import listwise_window

        async def compare(window: List[SearchResult]) -> str:
            return await runner.compare(_SetRequest(qidx, query, window))

        if self.method == "topdown":
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

    def _compare_batch(self, requests: List[_SetRequest]) -> List[str]:
        rows: List[List[int]] = []
        row_qidx: List[int] = []
        for r in requests:
            self._query_stats[r.qidx].comparisons += 1
            passages = "\n".join(
                f"{self.CHARACTERS[i]} {d.text}" for i, d in enumerate(r.docs)
            )
            messages = [
                {"role": "system", "content": self.prompt["prompt_system"]},
                {"role": "user", "content": self.prompt["prompt_user"].format(
                    query=r.query, num=len(r.docs), docs=passages)},
            ]
            ids = self._encode_prompt(self.engine.tokenizer.apply_chat_template(messages))
            self._query_stats[r.qidx].prompt_tokens += len(ids)
            rows.append(ids)
            row_qidx.append(r.qidx)
        pattern = rf"{self.prompt['pattern']}"
        row_adapters = self._row_adapters_for(row_qidx)
        texts, ntoks = self.engine.generate(
            rows, self.max_completion_tokens,
            **(
                {"temperature": self.temperature, "seed": self.seed}
                if self.temperature > 0.0 else {}
            ),
            **(
                {"row_adapters": row_adapters}
                if row_adapters is not None else {"adapter": self.adapter}
            ),
        )
        out = []
        for r, text, nt in zip(requests, texts, ntoks):
            self._query_stats[r.qidx].completion_tokens += nt
            if self.verbose:
                print(f"--- completion for q={r.query!r}:\n{text}\n---")
            m = re.search(pattern, text.lower(), re.DOTALL)
            if m:
                out.append(m.group(1).strip())
            else:
                print("Completion for no match:", text[:200], file=sys.stderr)
                out.append("None")  # parse failure keeps window order
        return out
