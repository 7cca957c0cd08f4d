"""Setwise rerankers (the Setwise paper's method, reference setwise.py).

``SetwiseLlmRanker`` supports the reference's full matrix:
  * scoring 'likelihood' — one forward, label-token logits
    (setwise.py:179-188); T5 and decoder-only backends.
  * scoring 'generation' — ≤2-token greedy decode (setwise.py:87-177),
    with permutation self-consistency voting (num_permutation shuffled
    copies + majority vote + seeded random tie-break, setwise.py:102-157).
  * methods 'heapsort' (multi-child partial heapsort) and 'bubblesort'
    (windowed, with unchanged-bottom skipping).

TPU-native execution: every ``compare`` is a request into the wave
batcher; permutation copies ride the same device batch as a leading
axis of rows.
"""
from __future__ import annotations

import random
import sys
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import numpy as np

from ..algos import setwise_sort
from ..algos.scheduler import WaveRunner
from ..engine.engine import ScoringEngine
from ..types import SearchResult, toppassage_results
from . import prompts
from .base import EngineRanker


@dataclass
class _SetRequest:
    qidx: int
    query: str
    docs: List[SearchResult] = field(default_factory=list)


class SetwiseLlmRanker(EngineRanker):
    CHARACTERS = prompts.CHARACTERS

    def __init__(
        self,
        engine: ScoringEngine,
        num_child: int = 3,
        k: int = 10,
        scoring: str = "generation",
        method: str = "heapsort",
        num_permutation: int = 1,
        seed: int = 929,
        max_wave_size: Optional[int] = None,
        spec_depth: int = 1,  # >1: speculative heap pops (latency knob)
        cache_comparisons: bool = False,
    ):
        super().__init__(engine, max_wave_size)
        if cache_comparisons:
            if num_permutation > 1:
                # Permutation self-consistency draws from a shared RNG
                # stream per comparison; skipping repeats would shift the
                # stream and change later shuffles.
                raise ValueError(
                    "cache_comparisons requires num_permutation == 1"
                )
            self._cache_key_fn = self._docid_cache_key
        if spec_depth > 1 and num_permutation > 1 and scoring == "generation":
            # Discarded speculative comparisons would advance the shared
            # permutation RNG stream and silently change every later
            # comparison's shuffles — the 'identical results' guarantee
            # of speculation only holds when comparisons are stateless.
            raise ValueError(
                "spec_depth > 1 is incompatible with num_permutation > 1 "
                "generation scoring (speculative comparisons would shift "
                "the permutation RNG stream)"
            )
        self.spec_depth = spec_depth
        self.num_child = num_child
        self.k = k
        self.scoring = scoring
        self.method = method
        self.num_permutation = num_permutation
        self.rng = random.Random(seed)
        tk = engine.tokenizer
        if engine.kind == "t5":
            # "<pad> Passage" forced decoder prefix (setwise.py:51-54).
            self.decoder_prefix = tk.encode("<pad> Passage", add_special_tokens=False)
            self.label_ids = self._label_token_ids(self.CHARACTERS, "<pad> Passage")
        else:
            self.decoder_prefix = []
            self.label_ids = self._label_token_ids(self.CHARACTERS, "Passage")

    # ------------------------------------------------------------------
    async def _rerank_one(self, runner, qidx, query, ranking):
        original = list(ranking)
        stats = self._query_stats[qidx]

        async def compare(docs: List[SearchResult]) -> int:
            return await runner.compare(_SetRequest(qidx, query, docs))

        if self.method == "heapsort":
            arr = list(ranking)
            ordered = await setwise_sort.heapsort(
                runner, arr, self.k, self.num_child, compare,
                spec_depth=self.spec_depth,
            )
        elif self.method == "bubblesort":
            ordered = await setwise_sort.bubblesort(
                runner, list(ranking), self.k, self.num_child, compare
            )
        elif self.method == "insertion":
            # Extra method beyond the reference (arXiv:2504.10509): uses
            # the first-stage order as a prior to prune comparisons.
            ordered = await setwise_sort.insertion(
                runner, list(ranking), self.k, self.num_child, compare
            )
        else:
            raise NotImplementedError(f"Method {self.method} is not implemented.")
        return toppassage_results(ordered, original, self.k)

    # ------------------------------------------------------------------
    # Batch executor
    # ------------------------------------------------------------------
    def _compare_batch(self, requests: List[_SetRequest]) -> List[int]:
        if self.scoring == "likelihood":
            return self._likelihood_batch(requests)
        return self._generation_batch(requests)

    def _likelihood_batch(self, requests: List[_SetRequest]) -> List[int]:
        tk = self.engine.tokenizer
        rows, max_docs = [], 0
        for r in requests:
            self._query_stats[r.qidx].comparisons += 1
            text = prompts.setwise_prompt(r.query, [d.text for d in r.docs])
            if self.engine.kind == "decoder":
                text = tk.apply_chat_template(
                    [{"role": "user", "content": text}]
                ) + " Passage:"
            ids = self._encode_prompt(text)
            self._query_stats[r.qidx].prompt_tokens += len(ids) + len(self.decoder_prefix)
            rows.append(ids)
            max_docs = max(max_docs, len(r.docs))
        logits = self.engine.score_labels(
            rows, self.label_ids[:max_docs], self.decoder_prefix,
            adapter=self.adapter,
        )
        out = []
        for i, r in enumerate(requests):
            out.append(int(np.argmax(logits[i, : len(r.docs)])))
        return out

    def _generation_batch(self, requests: List[_SetRequest]) -> List[int]:
        tk = self.engine.tokenizer
        rows: List[List[int]] = []
        # Per request: list of (row_index, doc_permutation, label_assignment).
        plans: List[List[Any]] = []
        for r in requests:
            self._query_stats[r.qidx].comparisons += (
                self.num_permutation if self.num_permutation > 1 else 1
            )
            plan = []
            n = len(r.docs)
            base_labels = self.CHARACTERS[:n]
            if self.num_permutation == 1:
                variants = [(list(range(n)), base_labels)]
            else:
                variants = []
                idx = list(range(n))
                for _ in range(self.num_permutation):
                    perm = self.rng.sample(idx, n)
                    labs = self.rng.sample(base_labels, n)
                    variants.append((perm, labs))
            for perm, labs in variants:
                text = prompts.setwise_prompt(
                    r.query, [r.docs[j].text for j in perm], labs
                )
                if self.engine.kind == "decoder":
                    text = tk.apply_chat_template(
                        [{"role": "user", "content": text}]
                    ) + " Passage:"
                ids = self._encode_prompt(text)
                self._query_stats[r.qidx].prompt_tokens += len(ids)
                plan.append((len(rows), perm, labs))
                rows.append(ids)
            plans.append(plan)

        max_new = 2 if self.engine.kind == "t5" else 1
        texts, ntoks = self.engine.generate(rows, max_new, self.decoder_prefix,
                                            adapter=self.adapter)

        out: List[int] = []
        for r, plan in zip(requests, plans):
            for row_i, _, _ in plan:
                self._query_stats[r.qidx].completion_tokens += ntoks[row_i]
            if len(plan) == 1:
                row_i, perm, labs = plan[0]
                label = _extract_label(texts[row_i], self.engine.kind)
                if label in labs:
                    out.append(perm[labs.index(label)])
                else:
                    print(f"Unexpected output: {texts[row_i]!r}", file=sys.stderr)
                    # Reference: CHARACTERS.index raises -> fallback 0;
                    # but a valid char beyond the doc count keeps its index
                    # so the IndexError->root fallback can fire upstream.
                    out.append(
                        self.CHARACTERS.index(label) if label in self.CHARACTERS else 0
                    )
            else:
                # Self-consistency vote (setwise.py:137-157).
                candidates = []
                for row_i, perm, labs in plan:
                    # Vote parse (setwise.py:137-141): whole stripped
                    # decode uppercased, EXACTLY one character.
                    s = texts[row_i].strip().upper()
                    label = s if len(s) == 1 else ""
                    if label not in labs:
                        print(f"Unexpected output: {texts[row_i]!r}", file=sys.stderr)
                        continue
                    candidates.append(perm[labs.index(label)])
                if not candidates:
                    print("Unexpected voting.", file=sys.stderr)
                    out.append(0)
                else:
                    counts: dict = {}
                    for c in candidates:
                        counts[c] = counts.get(c, 0) + 1
                    top = max(counts.values())
                    best = [c for c, v in counts.items() if v == top]
                    out.append(best[0] if len(best) == 1 else self.rng.choice(best))
        return out


def _extract_label(text: str, kind: str) -> str:
    """The reference's num_permutation=1 parses, which DIFFER by model
    family and must be replicated exactly for decision parity:
      * T5: last character of the stripped 2-token decode, with NO
        uppercasing (setwise.py:99-101 — a lowercase char is rejected
        by the `output in CHARACTERS` check downstream);
      * Llama: the WHOLE stripped decode uppercased (setwise.py:174-177);
        multi-char strings are rejected by the same downstream check.
    """
    s = text.strip()
    if kind == "t5":
        return s[-1] if s else ""
    return s.upper()
