"""Reranking server: concurrent requests batch through one wave pass."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from llmrankers_tpu.rankers import SetwiseLlmRanker
from llmrankers_tpu.serve import RerankService, make_handler
from test_rankers import OracleEngine, VALUES


@pytest.fixture(scope="module")
def server():
    eng = OracleEngine()
    ranker = SetwiseLlmRanker(eng, num_child=3, k=5, scoring="likelihood")
    service = RerankService(ranker, max_batch=8, window_ms=30.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service, 5))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", eng
    srv.shutdown()
    service.shutdown()


def _post(base, payload):
    req = urllib.request.Request(
        base + "/v1/rerank",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


@pytest.mark.quick
def test_rerank_endpoint(server):
    base, eng = server
    docs = [f"passage with relevance {v}" for v in VALUES[:12]]
    status, out = _post(base, {"query": "q", "documents": docs, "top_n": 5})
    assert status == 200
    idx = [r["index"] for r in out["results"]]
    want = list(np.argsort(VALUES[:12])[::-1][:5])
    assert idx == [int(i) for i in want]
    assert out["meters"]["comparisons"] > 0


def test_concurrent_requests_share_waves(server):
    base, eng = server
    calls_before = eng.calls
    results = {}

    def hit(i):
        docs = [f"passage with relevance {v + i}" for v in VALUES[:10]]
        results[i] = _post(base, {"query": f"q{i}", "documents": docs})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results[i][0] == 200 for i in range(6))
    total_compares = sum(
        results[i][1]["meters"]["comparisons"] for i in range(6)
    )
    # Cross-request batching: far fewer engine dispatches than compares.
    assert (eng.calls - calls_before) < total_compares


def test_bad_requests(server):
    base, _ = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"documents": ["x"]})  # missing query
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"query": "q", "documents": []})
    assert e.value.code == 400
    # dict documents and health endpoint
    status, out = _post(base, {"query": "q", "documents": [
        {"text": "passage with relevance 5"},
        {"text": "passage with relevance 9"},
    ]})
    assert status == 200 and out["results"][0]["index"] == 1
    with urllib.request.urlopen(base + "/health", timeout=10) as resp:
        assert json.loads(resp.read())["status"] == "ok"
    with urllib.request.urlopen(base + "/stats", timeout=10) as resp:
        stats = json.loads(resp.read())
        assert stats["served"] >= 1
        assert "compiled_programs" in stats and "spec_lookup" in stats
        # Wave-maximality guard rides /stats; no sub-maximal flushes.
        assert stats["waves"]["submaximal_waves"] == 0


def test_adapter_routing(server):
    """Requests select a registered adapter; unknown names 400; jobs for
    different adapters run as separate dispatch groups with the ranker's
    adapter attribute set per group."""
    base, eng = server
    docs = [f"passage with relevance {v}" for v in VALUES[:6]]

    # Unknown adapter -> 400 with the registered list.
    import urllib.error
    try:
        _post(base, {"query": "q", "documents": docs, "adapter": "nope"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "unknown adapter" in json.loads(e.read())["error"]


def test_adapter_groups_set_ranker_adapter():
    from llmrankers_tpu.types import SearchResult

    seen = []

    class FakeRanker:
        adapter = None
        per_query_stats = None

        def rerank_many(self, queries, rankings):
            seen.append((self.adapter, len(queries)))
            return [list(r) for r in rankings]

    service = RerankService(FakeRanker(), max_batch=8, window_ms=50.0,
                            adapters=["a", "b"])
    docs = [SearchResult("0", 0.0, "x")]
    jobs = [service.submit("q1", list(docs), "a"),
            service.submit("q2", list(docs), None),
            service.submit("q3", list(docs), "a"),
            service.submit("q4", list(docs), "b")]
    for j in jobs:
        j.done.wait(timeout=10)
        assert j.error is None
    groups = dict((ad, n) for ad, n in seen)
    assert groups == {"a": 2, None: 1, "b": 1}
    service.shutdown()


def test_request_timeout_504():
    """A slow batch returns 504 within the configured bound instead of
    hanging the client thread."""
    import json
    import threading
    import time
    import urllib.error
    import urllib.request

    from llmrankers_tpu.serve import RerankService, make_handler
    from http.server import ThreadingHTTPServer

    class SlowRanker:
        def rerank_many(self, queries, rankings, on_result=None):
            time.sleep(2.0)
            return [list(r) for r in rankings]

    service = RerankService(SlowRanker(), max_batch=4, window_ms=1.0,
                            request_timeout_s=0.3)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service, None))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    body = json.dumps({"query": "q", "documents": ["a", "b"]}).encode()
    req = urllib.request.Request(base + "/v1/rerank", data=body)
    t0 = time.time()
    try:
        urllib.request.urlopen(req, timeout=5)
        assert False, "expected 504"
    except urllib.error.HTTPError as e:
        assert e.code == 504
    assert time.time() - t0 < 1.5  # bounded well below the 2s batch
    srv.shutdown()


def test_overload_429_and_bounded_queue():
    """With the queue bound hit, submits shed load as 429 instead of
    growing without bound."""
    import time

    from llmrankers_tpu.types import SearchResult

    class BlockingRanker:
        release = threading.Event()

        def rerank_many(self, queries, rankings, on_result=None):
            self.release.wait(timeout=10)
            return [list(r) for r in rankings]

    ranker = BlockingRanker()
    service = RerankService(ranker, max_batch=1, window_ms=1.0, max_queue=2)
    docs = [SearchResult("0", 0.0, "x")]
    jobs = [service.submit(f"q{i}", list(docs)) for i in range(8)]
    # First job may already be in the dispatch loop; at most 1 (running)
    # + 2 (queued) are accepted, the rest must be rejected with None.
    accepted = [j for j in jobs if j is not None]
    rejected = [j for j in jobs if j is None]
    assert len(rejected) >= 5, (len(accepted), len(rejected))
    assert service.rejected == len(rejected)
    ranker.release.set()
    for j in accepted:
        assert j.done.wait(timeout=10)
    service.shutdown()


def test_cancelled_job_never_dispatches():
    """A job whose client timed out (cancelled) is dropped before its
    group reaches the ranker."""
    import time

    from llmrankers_tpu.types import SearchResult

    dispatched = []
    gate = threading.Event()

    class GatedRanker:
        def rerank_many(self, queries, rankings, on_result=None):
            dispatched.extend(queries)
            gate.wait(timeout=10)
            return [list(r) for r in rankings]

    service = RerankService(GatedRanker(), max_batch=1, window_ms=1.0)
    docs = [SearchResult("0", 0.0, "x")]
    j1 = service.submit("first", list(docs))   # occupies the loop
    # Wait until j1 is actually dispatched so j2 stays queued.
    for _ in range(100):
        if dispatched:
            break
        time.sleep(0.01)
    j2 = service.submit("second", list(docs))
    j2.cancelled = True  # what the 504 handler does
    gate.set()
    assert j1.done.wait(timeout=10) and j1.error is None
    assert j2.done.wait(timeout=10)
    assert "second" not in dispatched  # provably never reached the engine
    assert service.cancelled_skipped == 1
    service.shutdown()


def test_concurrent_adapter_groups_dispatch_in_parallel():
    """With enough adapter-cache capacity, different adapter groups run
    on separate threads (one group's host work overlaps another's device
    compute). Both groups must be inside rerank_many simultaneously."""
    import threading as _th

    from llmrankers_tpu.types import SearchResult

    barrier = _th.Barrier(2, timeout=10)
    seen = []

    class _Eng:
        _max_cached_adapters = 2

    class FakeRanker:
        adapter = None
        per_query_stats = None
        engine = _Eng()

        def rerank_many(self, queries, rankings):
            barrier.wait()  # deadlocks unless BOTH groups are in flight
            seen.append((self.adapter, len(queries)))
            return [list(r) for r in rankings]

    service = RerankService(FakeRanker(), max_batch=8, window_ms=50.0,
                            adapters=["a", "b"])
    docs = [SearchResult("0", 0.0, "x")]
    jobs = [service.submit("q1", list(docs), "a"),
            service.submit("q2", list(docs), "b")]
    for j in jobs:
        j.done.wait(timeout=10)
        assert j.error is None, j.error
    assert dict(seen) == {"a": 1, "b": 1}
    # Per-adapter clones, not the shared ranker, carried the adapter.
    assert service.ranker.adapter is None
    service.shutdown()
