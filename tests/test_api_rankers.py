"""API-backed rankers against a local OpenAI-compatible oracle server."""
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from llmrankers_tpu.rankers.api import (
    ChatApiClient,
    OpenAiListwiseLlmRanker,
    OpenAiPairwiseLlmRanker,
    OpenAiSetwiseLlmRanker,
)
from llmrankers_tpu.types import SearchResult

VALUES = [17, 3, 94, 55, 21, 8, 76, 42, 63, 30, 11, 88]


class OracleHandler(BaseHTTPRequestHandler):
    fail_next = 0  # transient-failure injection

    def do_POST(self):
        if OracleHandler.fail_next > 0:
            OracleHandler.fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        user = body["messages"][-1]["content"]
        scores = [float(m) for m in re.findall(r"relevance (\d+)", user)]
        if "most relevant one to the query" in user:
            labels = re.findall(r"Passage ([A-W]): \"", user)
            content = f"Passage {labels[int(np.argmax(scores))]}"
        elif "two passages is more relevant" in user:
            content = "Passage A" if scores[0] >= scores[1] else "Passage B"
        else:  # RankGPT listwise: rank identifiers
            # Doc texts arrive as earlier user messages "[i] ...relevance N".
            all_scores = []
            for m in body["messages"]:
                if m["role"] == "user" and re.match(r"^\[\d+\]", m["content"]):
                    all_scores.append(float(re.findall(r"relevance (\d+)", m["content"])[0]))
            order = sorted(range(len(all_scores)), key=lambda j: -all_scores[j])
            content = " > ".join(f"[{j+1}]" for j in order)
        resp = json.dumps({
            "choices": [{"message": {"content": content}}],
            "usage": {"prompt_tokens": 10, "completion_tokens": 3},
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), OracleHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def make_ranking():
    return [
        SearchResult(f"d{i}", 0.0, f"passage with relevance {v}")
        for i, v in enumerate(VALUES)
    ]


def ideal():
    return [f"d{i}" for i in np.argsort(VALUES)[::-1]]


def client(server, retry_sleep=0.01):
    return ChatApiClient("test-model", "key", base_url=server,
                         retry_sleep=retry_sleep, max_retries=5)


@pytest.mark.quick
def test_api_setwise(server):
    r = OpenAiSetwiseLlmRanker(client(server), num_child=3, k=4)
    out = r.rerank("q", make_ranking())
    assert [d.docid for d in out[:4]] == ideal()[:4]
    assert r.total_compare > 0 and r.total_prompt_tokens > 0


def test_api_pairwise(server):
    r = OpenAiPairwiseLlmRanker(client(server), method="heapsort", k=4)
    out = r.rerank("q", make_ranking())
    assert [d.docid for d in out[:4]] == ideal()[:4]


def test_api_listwise(server):
    r = OpenAiListwiseLlmRanker(client(server), window_size=4, step_size=2,
                                num_repeat=2)
    out = r.rerank("q", make_ranking())
    assert out[0].docid == ideal()[0]


def test_api_retry_on_transient_error(server):
    OracleHandler.fail_next = 2
    r = OpenAiSetwiseLlmRanker(client(server), num_child=11, k=1)
    out = r.rerank("q", make_ranking())
    assert out[0].docid == ideal()[0]


def test_api_setwise_insertion(server):
    r = OpenAiSetwiseLlmRanker(client(server), num_child=3, k=4,
                               method="insertion")
    out = r.rerank("q", make_ranking())
    assert [d.docid for d in out[:4]] == ideal()[:4]


def test_api_setwise_unknown_method(server):
    r = OpenAiSetwiseLlmRanker(client(server), num_child=3, k=4,
                               method="quicksort")
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        r.rerank("q", make_ranking())
