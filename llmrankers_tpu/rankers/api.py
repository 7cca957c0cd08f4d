"""Chat-API-backed rankers (the reference's OpenAI paths).

Parity surface: OpenAiSetwiseLlmRanker (setwise.py:319-402),
OpenAiPairwiseLlmRanker (pairwise.py:355-452) and OpenAiListwiseLlmRanker
(listwise.py:147-199): RankGPT system prompts, regex label extraction
with fallback "A", bounded-retry ladder (the reference retries forever
with 5s sleeps on transient errors and re-raises auth/invalid errors),
and the context-overflow sentinel 'ERROR::reduce_length'.

Implementation notes vs the reference:
  * speaks the OpenAI-compatible chat-completions HTTP protocol directly
    via urllib (no openai-sdk dependency); point ``base_url`` at any
    compatible server;
  * concurrent windows/comparisons still ride the WaveRunner, so many
    HTTP requests are issued per wave via a thread pool — the API analog
    of device batching;
  * retries are bounded (``max_retries``) rather than infinite.
"""
from __future__ import annotations

import concurrent.futures as cf
import json
import re
import sys
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

from ..algos import listwise_window, pairwise_sort, setwise_sort
from ..types import LlmRanker, RerankStats, SearchResult, toppassage_results
from . import prompts
from .base import EngineRanker

FATAL_STATUS = {400, 401, 403, 404}  # invalid request / auth: do not retry


class ChatApiClient:
    """Minimal OpenAI-compatible chat-completions client."""

    def __init__(
        self,
        model: str,
        api_key: str,
        base_url: str = "https://api.openai.com/v1",
        timeout: float = 15.0,
        max_retries: int = 10,
        retry_sleep: float = 5.0,
        max_workers: int = 16,
    ):
        self.model = model
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries
        self.retry_sleep = retry_sleep
        self.pool = cf.ThreadPoolExecutor(max_workers=max_workers)

    def chat(self, messages: List[dict]) -> Tuple[str, int, int]:
        """Returns (content, prompt_tokens, completion_tokens)."""
        body = json.dumps(
            {"model": self.model, "messages": messages, "temperature": 0.0}
        ).encode()
        last_err: Optional[Exception] = None
        for _ in range(self.max_retries):
            req = urllib.request.Request(
                self.base_url + "/chat/completions",
                data=body,
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"Bearer {self.api_key}",
                },
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    data = json.loads(resp.read())
                usage = data.get("usage", {})
                return (
                    data["choices"][0]["message"]["content"],
                    int(usage.get("prompt_tokens", 0)),
                    int(usage.get("completion_tokens", 0)),
                )
            except urllib.error.HTTPError as e:
                if e.code in FATAL_STATUS:
                    detail = e.read().decode(errors="ignore")
                    if "maximum context length" in detail:
                        return "ERROR::reduce_length", 0, 0
                    raise
                last_err = e
            except Exception as e:  # connection/timeout: retry
                last_err = e
            time.sleep(self.retry_sleep)
        raise RuntimeError(f"chat API failed after retries: {last_err}")

    def chat_many(self, message_lists) -> List[Tuple[str, int, int]]:
        return list(self.pool.map(self.chat, message_lists))


class _ApiRankerBase(EngineRanker):
    """EngineRanker over a ChatApiClient instead of a ScoringEngine."""

    def __init__(self, client: ChatApiClient, max_wave_size: Optional[int] = None):
        LlmRanker.__init__(self)
        self.client = client
        self.max_wave_size = max_wave_size
        # API completions are not deterministic functions of the request,
        # so comparison memoization never applies here.
        self._cache_key_fn = None
        self._query_stats: List[RerankStats] = []

    def truncate(self, text: str, length: int) -> str:
        try:
            import tiktoken

            enc = tiktoken.encoding_for_model(self.client.model)
        except Exception:
            return " ".join(text.split()[:length])
        return enc.decode(enc.encode(text)[:length])


class OpenAiSetwiseLlmRanker(_ApiRankerBase):
    SYSTEM = (
        "You are RankGPT, an intelligent assistant specialized in selecting "
        "the most relevant passage from a pool of passages based on their "
        "relevance to the query."
    )
    CHARACTERS = prompts.CHARACTERS

    def __init__(self, client, num_child=3, method="heapsort", k=10,
                 max_wave_size=None):
        super().__init__(client, max_wave_size)
        self.num_child = num_child
        self.method = method
        self.k = k

    async def _rerank_one(self, runner, qidx, query, ranking):
        original = list(ranking)

        async def compare(docs):
            return await runner.compare((qidx, query, docs))

        algos = {
            "heapsort": setwise_sort.heapsort,
            "bubblesort": setwise_sort.bubblesort,
            "insertion": setwise_sort.insertion,
        }
        if self.method not in algos:
            raise NotImplementedError(f"Method {self.method} is not implemented.")
        ordered = await algos[self.method](
            runner, list(ranking), self.k, self.num_child, compare
        )
        return toppassage_results(ordered, original, self.k)

    def _compare_batch(self, requests):
        msgs = []
        for qidx, query, docs in requests:
            self._query_stats[qidx].comparisons += 1
            text = prompts.setwise_prompt(query, [d.text for d in docs])
            # API variant ends with a period (setwise.py:337).
            text = text[: -len(":")] + "."
            msgs.append([
                {"role": "system", "content": self.SYSTEM},
                {"role": "user", "content": text},
            ])
        outs = self.client.chat_many(msgs)
        results = []
        for (qidx, _q, docs), (content, pt, ct) in zip(requests, outs):
            st = self._query_stats[qidx]
            st.prompt_tokens += pt
            st.completion_tokens += ct
            m = re.findall(r"(Passage [A-Z])", content, re.MULTILINE)
            if m:
                label = m[0][8]
            elif content.strip() in self.CHARACTERS:
                label = content.strip()
            else:
                print(f"Unexpected output: {content}", file=sys.stderr)
                label = "A"
            results.append(self.CHARACTERS.index(label))
        return results


class OpenAiPairwiseLlmRanker(_ApiRankerBase):
    SYSTEM = (
        "You are RankGPT, an intelligent assistant specialized in selecting "
        "the most relevant passage from a pair of passages based on their "
        "relevance to the query."
    )

    def __init__(self, client, method="heapsort", k=10, max_wave_size=None):
        super().__init__(client, max_wave_size)
        self.method = method
        self.k = k

    async def _rerank_one(self, runner, qidx, query, ranking):
        original = list(ranking)

        async def gt(a, b):
            o1, o2 = await runner.compare((qidx, query, a.text, b.text))
            return o1 == "A" and o2 == "B"

        if self.method == "heapsort":
            ordered = await pairwise_sort.heapsort(runner, list(ranking), self.k, gt)
        elif self.method == "bubblesort":
            ordered = await pairwise_sort.bubblesort(runner, list(ranking), self.k, gt)
        else:
            raise NotImplementedError(f"Method {self.method} is not implemented.")
        return toppassage_results(ordered, original, self.k)

    def _compare_batch(self, requests):
        msgs = []
        for qidx, query, d1, d2 in requests:
            self._query_stats[qidx].comparisons += 1
            for a, b in ((d1, d2), (d2, d1)):
                msgs.append([
                    {"role": "system", "content": self.SYSTEM},
                    {"role": "user", "content": prompts.pairwise_prompt(query, a, b)},
                ])
        outs = self.client.chat_many(msgs)
        results = []
        for i, (qidx, *_rest) in enumerate(requests):
            pair = []
            for content, pt, ct in outs[2 * i : 2 * i + 2]:
                st = self._query_stats[qidx]
                st.prompt_tokens += pt
                st.completion_tokens += ct
                m = re.findall(r"(Passage [A-B])", content, re.MULTILINE)
                if m:
                    pair.append(m[0][8])
                elif content.strip() in ("A", "B"):
                    pair.append(content.strip())
                else:
                    print(f"Unexpected output: {content}", file=sys.stderr)
                    pair.append("A")
            results.append(tuple(pair))
        return results


class OpenAiListwiseLlmRanker(_ApiRankerBase):
    def __init__(self, client, window_size, step_size, num_repeat,
                 max_wave_size=None):
        super().__init__(client, max_wave_size)
        self.window_size = window_size
        self.step_size = step_size
        self.num_repeat = num_repeat

    async def _rerank_one(self, runner, qidx, query, ranking):
        async def compare(window):
            return await runner.compare((qidx, query, window))

        ordered = await listwise_window.sliding_window(
            list(ranking), self.window_size, self.step_size, self.num_repeat, compare
        )
        return [
            SearchResult(docid=d.docid, score=-i, text=d.text)
            for i, d in enumerate(ordered)
        ]

    def _compare_batch(self, requests):
        try:
            import tiktoken

            enc = tiktoken.encoding_for_model(self.client.model)

            def count(messages):
                n = 3
                for m in messages:
                    n += 4 + len(enc.encode(m["content"]))
                return n

            budget = (8192 if "gpt-4" in self.client.model else 4096) - 200
        except Exception:
            count, budget = None, None
        msgs = []
        for qidx, query, window in requests:
            self._query_stats[qidx].comparisons += 1
            msgs.append(prompts.rankgpt_chat_messages(
                query, [d.text for d in window],
                token_count=count, token_budget=budget,
            ))
        outs = self.client.chat_many(msgs)
        results = []
        for (qidx, *_r), (content, pt, ct) in zip(requests, outs):
            st = self._query_stats[qidx]
            st.prompt_tokens += pt
            st.completion_tokens += ct
            results.append(content)
        return results
