"""HTTP reranking server with cross-request continuous batching.

Beyond the reference's batch CLI: a production serving surface. Concurrent
requests are micro-batched — the dispatcher collects jobs for a short
window and submits them through one ``rerank_many`` call, so their
comparisons share device waves exactly like the offline driver's queries
(the wave batcher is the continuous-batching engine).

API (Cohere-/Jina-style rerank endpoint):

    POST /v1/rerank
    {"query": "...", "documents": ["...", {"text": "..."}...],
     "top_n": 10}
    -> {"results": [{"index": 3, "relevance_score": -1.0}, ...],
        "meters": {"comparisons": N, "prompt_tokens": N, ...}}

    GET /health -> {"status": "ok", ...}
    GET /stats  -> serving counters (requests served, adapters, compiled
                   program count, speculative-decoding accept stats)

Run:

    python -m llmrankers_tpu.serve \
        --model_name_or_path /ckpts/flan-t5-large --port 8080 \
        --scoring likelihood setwise --num_child 2 --k 10
"""
from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

from .types import LlmRanker, SearchResult


class _Job:
    def __init__(self, query: str, ranking: List[SearchResult],
                 adapter: Optional[str] = None):
        self.query = query
        self.ranking = ranking
        self.adapter = adapter  # named LoRA adapter (None = base weights)
        self.done = threading.Event()
        self.result: Optional[List[SearchResult]] = None
        self.stats: Optional[Dict[str, int]] = None
        self.error: Optional[str] = None
        # Set by the HTTP handler when its client stopped waiting (504):
        # the batching loop drops cancelled jobs before dispatching their
        # group, so abandoned requests never reach the device.
        self.cancelled = False


class RerankService:
    """Micro-batching dispatcher over one ranker."""

    def __init__(self, ranker: LlmRanker, max_batch: int = 64,
                 window_ms: float = 5.0, adapters: Optional[List[str]] = None,
                 request_timeout_s: Optional[float] = None,
                 max_queue: Optional[int] = None):
        self.ranker = ranker
        self.adapters = set(adapters or ())
        self.request_timeout_s = request_timeout_s  # None = wait forever
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        # Bounded queue = backpressure: when more than max_queue jobs are
        # waiting the server answers 429 instead of queueing unboundedly
        # and burning device time on clients that will time out anyway.
        if max_queue is None:
            max_queue = 4 * max_batch
        self.max_queue = max_queue
        self.queue: "queue.Queue[_Job]" = queue.Queue(maxsize=max_queue)
        self.served = 0
        self.rejected = 0  # 429s (queue full)
        self.cancelled_skipped = 0  # jobs dropped before device dispatch
        self.mixed_waves = 0  # multi-adapter windows served as one wave set
        self._stats_lock = threading.Lock()
        # Per-adapter ranker clones for concurrent group dispatch
        # (see _ranker_for).
        self._rankers: Dict[Optional[str], LlmRanker] = {}
        self._ranker_lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, query: str, ranking: List[SearchResult],
               adapter: Optional[str] = None) -> Optional[_Job]:
        """Enqueue a job, or return None when the queue is full (the
        caller answers 429)."""
        job = _Job(query, ranking, adapter)
        try:
            self.queue.put_nowait(job)
        except queue.Full:
            self.rejected += 1
            return None
        return job

    def shutdown(self, wait: bool = False) -> None:
        """Stop the batching loop. ``wait`` joins it (current batch
        finishes) and fails any still-queued jobs so no waiter hangs."""
        self._stop = True
        if wait:
            self._thread.join(timeout=600)
            while True:
                try:
                    job = self.queue.get_nowait()
                except queue.Empty:
                    break
                job.error = "server shutting down"
                job.done.set()

    def _loop(self) -> None:
        while not self._stop:
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            jobs = [first]
            deadline = time.monotonic() + self.window_s
            while len(jobs) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    jobs.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # Cancelled jobs (client already 504'd away) are dropped here,
            # before any device work happens on their behalf.
            live = []
            for j in jobs:
                if j.cancelled:
                    self.cancelled_skipped += 1
                    j.done.set()
                else:
                    live.append(j)
            jobs = live
            # Jobs for the same adapter share device waves; different
            # adapters run as separate dispatches (merged weights are
            # cached per adapter by the engine — vLLM LoRARequest parity).
            groups: Dict[Optional[str], List[_Job]] = {}
            for j in jobs:
                groups.setdefault(j.adapter, []).append(j)
            # Batched multi-adapter mixing (S-LoRA style): when the
            # ranker/engine support it, ALL adapter groups run as ONE
            # set of shared device waves — per-row A·B mixing at
            # constant memory, no merged-weight clones, no LRU thrash
            # regardless of how many adapters the window touches
            # (vLLM multi-LoRA serving, reference setwise.py:491-498).
            if len(groups) > 1 and self._can_mix():
                self._run_mixed(jobs)
                continue
            # Fallback — concurrent group dispatch: each adapter group
            # runs on its own thread with a per-adapter ranker clone
            # (same engine — scoring/merge paths are lock-guarded), so
            # one group's host work (tokenize/pack/parse) overlaps
            # another's device compute, like the CLI's cohort pipeline.
            # Only when the engine can keep every group's merged weights
            # resident — otherwise concurrent merges would thrash the
            # adapter LRU and serialize anyway, so run sequentially.
            cache_cap = getattr(
                getattr(self.ranker, "engine", None),
                "_max_cached_adapters", 1,
            )
            if len(groups) > 1 and len(groups) <= cache_cap:
                threads = [
                    threading.Thread(
                        target=self._run_group, args=(adapter, grp)
                    )
                    for adapter, grp in groups.items()
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
            else:
                for adapter, grp in groups.items():
                    self._run_group(adapter, grp)

    def _can_mix(self) -> bool:
        """True when a multi-adapter window can run as one mixed wave
        set: the ranker threads per-query adapters into the engine and
        the engine's weights allow batched A·B mixing (decoder-only,
        unquantized — ScoringEngine._mix_setup's rules)."""
        r = self.ranker
        eng = getattr(r, "engine", None)
        if eng is None or not getattr(r, "supports_query_adapters", False):
            return False
        if getattr(eng, "kind", None) != "decoder":
            return False
        from .models import quant as quant_mod

        return not quant_mod.is_quantized(eng.params)

    def _run_mixed(self, jobs: List["_Job"]) -> None:
        """One rerank_many over every adapter's jobs, mixed per query."""
        fresh = []
        for j in jobs:
            if j.cancelled:
                with self._stats_lock:
                    self.cancelled_skipped += 1
                j.done.set()
            else:
                fresh.append(j)
        jobs = fresh
        if not jobs:
            return
        try:
            results = self.ranker.rerank_many(
                [j.query for j in jobs], [j.ranking for j in jobs],
                query_adapters=[j.adapter for j in jobs],
            )
            per_query = getattr(self.ranker, "per_query_stats", None)
            for i, (job, res) in enumerate(zip(jobs, results)):
                job.result = res
                if per_query is not None:
                    s = per_query[i]
                    job.stats = {
                        "comparisons": s.comparisons,
                        "prompt_tokens": s.prompt_tokens,
                        "completion_tokens": s.completion_tokens,
                    }
            with self._stats_lock:
                self.served += len(jobs)
                self.mixed_waves += 1
        except Exception as e:  # surface per-job
            for job in jobs:
                job.error = f"{type(e).__name__}: {e}"
        finally:
            for job in jobs:
                job.done.set()

    def _ranker_for(self, adapter: Optional[str]):
        """Per-adapter ranker clone (lazy): shares the engine, owns its
        ``adapter`` field and per-call stats, so groups can dispatch
        concurrently without racing on a shared mutable adapter."""
        if adapter is None and not hasattr(self.ranker, "adapter"):
            return self.ranker
        with self._ranker_lock:
            r = self._rankers.get(adapter)
            if r is None:
                import copy as _copy

                r = _copy.copy(self.ranker)
                r.adapter = adapter
                self._rankers[adapter] = r
        return r

    def _run_group(self, adapter: Optional[str], grp: List[_Job]) -> None:
        # Re-check right before dispatch: earlier groups in this
        # window may have run for seconds.
        fresh = []
        for j in grp:
            if j.cancelled:
                with self._stats_lock:
                    self.cancelled_skipped += 1
                j.done.set()
            else:
                fresh.append(j)
        grp = fresh
        if not grp:
            return
        try:
            if not hasattr(self.ranker, "adapter") and adapter:
                raise ValueError("ranker does not support adapters")
            ranker = self._ranker_for(adapter)
            results = ranker.rerank_many(
                [j.query for j in grp], [j.ranking for j in grp]
            )
            per_query = getattr(ranker, "per_query_stats", None)
            for i, (job, res) in enumerate(zip(grp, results)):
                job.result = res
                if per_query is not None:
                    s = per_query[i]
                    job.stats = {
                        "comparisons": s.comparisons,
                        "prompt_tokens": s.prompt_tokens,
                        "completion_tokens": s.completion_tokens,
                    }
            with self._stats_lock:
                self.served += len(grp)
        except Exception as e:  # surface per-job
            for job in grp:
                job.error = f"{type(e).__name__}: {e}"
        finally:
            for job in grp:
                job.done.set()


def make_handler(service: RerankService, default_top_n: Optional[int]):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok", "served": service.served,
                                 "adapters": sorted(service.adapters)})
            elif self.path == "/stats":
                # getattr-tolerant: API-backed or test rankers may carry
                # no engine, and custom engines may lack attributes.
                eng = getattr(service.ranker, "engine", None)
                spec = dict(getattr(eng, "spec_stats", None)
                            or {"tokens": 0, "rounds": 0})
                self._send(200, {
                    "served": service.served,
                    "rejected": service.rejected,
                    "cancelled_skipped": service.cancelled_skipped,
                    "queue_depth": service.queue.qsize(),
                    "max_queue": service.max_queue,
                    "adapters": sorted(service.adapters),
                    "model_kind": getattr(eng, "kind", "unknown"),
                    "spec_lookup": getattr(eng, "spec_lookup", 0),
                    "spec_tokens": spec["tokens"],
                    "spec_rounds": spec["rounds"],
                    "spec_accept_tokens_per_round": (
                        round(spec["tokens"] / spec["rounds"], 3)
                        if spec["rounds"] else None
                    ),
                    "compiled_programs": len(
                        getattr(eng, "_jit_cache", ())
                    ),
                    "truncated_rows": getattr(eng, "truncated_rows", 0),
                    "refill": dict(
                        getattr(eng, "refill_stats", None)
                        or {"sessions": 0, "refills": 0}
                    ),
                    "prefix_cache": dict(
                        getattr(eng, "pkv_stats", None)
                        or {"hits": 0, "misses": 0, "evictions": 0}
                    ),
                    "prefix_cache_bytes": getattr(eng, "_pkv_bytes", 0),
                    "mixed_adapter_waves": service.mixed_waves,
                    # Wave-maximality guard: submaximal_waves counts
                    # flushes issued before every live task was blocked
                    # on a compare (scheduler drain heuristic gave up).
                    # Expected 0; >0 means batching silently degraded.
                    "waves": dict(
                        getattr(service.ranker, "wave_stats", None)
                        or {"waves": 0, "submaximal_waves": 0,
                            "cache_hits": 0}
                    ),
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/v1/rerank", "/rerank"):
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                query = req["query"]
                docs = req["documents"]
                if not isinstance(docs, list) or not docs:
                    raise ValueError("documents must be a non-empty list")
                texts = [
                    d if isinstance(d, str) else (d.get("text") or d.get("contents"))
                    for d in docs
                ]
                if any(t is None for t in texts):
                    raise ValueError("each document needs text")
                adapter = req.get("adapter")
                if adapter is not None and adapter not in service.adapters:
                    raise ValueError(
                        f"unknown adapter {adapter!r}; registered: "
                        f"{sorted(service.adapters)}"
                    )
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return

            ranking = [
                SearchResult(docid=str(i), score=0.0, text=t)
                for i, t in enumerate(texts)
            ]
            job = service.submit(query, ranking, req.get("adapter"))
            if job is None:  # bounded queue full: shed load
                self._send(429, {"error": "server overloaded, retry later"})
                return
            if not job.done.wait(timeout=service.request_timeout_s):
                # Mark cancelled so the batching loop drops it before its
                # group dispatches; if dispatch already started, the work
                # completes but the client has stopped waiting.
                job.cancelled = True
                self._send(504, {"error": "rerank timed out"})
                return
            if job.error:
                self._send(500, {"error": job.error})
                return
            top_n = req.get("top_n", default_top_n) or len(texts)
            results = [
                {"index": int(d.docid), "relevance_score": float(d.score)}
                for d in job.result[:top_n]
            ]
            self._send(200, {"results": results, "meters": job.stats})

    return Handler


def build_ranker_from_args(argv=None):
    """Reuse the rerank CLI's parser/factory for model+method flags."""
    from .cli.run import make_engine, make_ranker, parse_args

    args = parse_args(argv)
    if args.run is None:
        raise SystemExit("need the `run` section (see llmrankers_tpu.cli.run)")
    # Mirror cli.run.main exactly: run-section --lora_path_or_name counts,
    # and the OpenAI-API path builds no local engine.
    lora = (args.setwise.lora_name_or_path if args.setwise else None) \
        or args.run.lora_path_or_name
    engine = None if args.run.openai_key else make_engine(args.run, lora)
    return make_ranker(args, engine), args


def main() -> None:
    import sys

    # Split out serve-specific flags, pass the rest to the run parser.
    serve_p = argparse.ArgumentParser(add_help=False)
    serve_p.add_argument("--port", type=int, default=8080)
    serve_p.add_argument("--host", type=str, default="127.0.0.1")
    serve_p.add_argument("--max_batch", type=int, default=64)
    serve_p.add_argument("--window_ms", type=float, default=5.0)
    serve_p.add_argument("--max_queue", type=int, default=None,
                         help="bound on queued jobs before 429s "
                              "(default 4*max_batch)")
    serve_p.add_argument("--adapter", action="append", default=[],
                         metavar="NAME=PEFT_DIR",
                         help="register a LoRA adapter; requests select it "
                              "via {\"adapter\": \"NAME\"}")
    serve_p.add_argument("--request_timeout", type=float, default=None,
                         metavar="SECONDS",
                         help="504 a request not finished within this "
                              "bound (cold compiles can take 15-60s; "
                              "pair with --warmup)")
    serve_p.add_argument("--warmup", type=int, default=0,
                         metavar="N_DOCS",
                         help="compile the scoring program at startup by "
                              "reranking N_DOCS dummy docs before "
                              "accepting traffic (first compiles take "
                              "15-60s on TPU; without this the first "
                              "live request pays them)")
    serve_args, rest = serve_p.parse_known_args(sys.argv[1:])

    ranker, args = build_ranker_from_args(rest)
    adapter_names = []
    for spec in serve_args.adapter:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--adapter wants NAME=PEFT_DIR, got {spec!r}")
        ranker.engine.add_adapter(name, path)
        adapter_names.append(name)
    top_n = None
    for sec in ("setwise", "pairwise"):
        ns = getattr(args, sec)
        if ns is not None:
            top_n = ns.k
    if serve_args.warmup > 0:
        import time as _time

        t0 = _time.time()
        dummy = [
            SearchResult(f"w{i}", 0.0, f"warmup passage number {i} text")
            for i in range(serve_args.warmup)
        ]
        ranker.rerank_many(["warmup query"], [dummy])
        if serve_args.warmup > 3:
            # Also warm the small-wave shapes a short request hits.
            ranker.rerank_many(["warmup query"], [dummy[:3]])
        print(f"warmup done in {_time.time() - t0:.1f}s", flush=True)
    service = RerankService(ranker, serve_args.max_batch, serve_args.window_ms,
                            adapters=adapter_names,
                            request_timeout_s=serve_args.request_timeout,
                            max_queue=serve_args.max_queue)
    server = ThreadingHTTPServer(
        (serve_args.host, serve_args.port), make_handler(service, top_n)
    )
    # Drain semantics need handler threads joined at close: without this
    # they are daemons and interpreter exit kills responses mid-flight.
    server.daemon_threads = False
    server.block_on_close = True
    print(f"serving on http://{serve_args.host}:{serve_args.port}", flush=True)
    print("ready", flush=True)

    import signal

    def _drain(signum, frame):
        # Graceful: stop accepting; serve_forever returns, then
        # server_close() joins the handler threads (still waiting on
        # their jobs) and service.shutdown(wait=True) finishes the
        # batching loop's current batch and fails queued leftovers.
        print("draining on signal", signum, flush=True)
        import threading

        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    server.serve_forever()
    server.server_close()
    service.shutdown(wait=True)
    print("stopped", flush=True)


if __name__ == "__main__":
    main()
