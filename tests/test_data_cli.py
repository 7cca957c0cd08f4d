"""Data layer + CLI end-to-end tests (synthetic TREC run, jsonl corpus)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from llmrankers_tpu.data import trec
from llmrankers_tpu.types import SearchResult


def make_fixture(tmp_path, n_queries=3, n_docs=12):
    corpus = tmp_path / "corpus.jsonl"
    run = tmp_path / "run.bm25.txt"
    queries = tmp_path / "queries.tsv"
    with open(corpus, "w") as f:
        for i in range(100):
            f.write(json.dumps({"id": f"doc{i}", "title": f"T{i}",
                                "text": f"body of document {i}"}) + "\n")
    with open(queries, "w") as f:
        for q in range(n_queries):
            f.write(f"q{q}\tquery text number {q}\n")
    with open(run, "w") as f:
        rng = np.random.RandomState(0)
        for q in range(n_queries):
            docs = rng.choice(100, n_docs, replace=False)
            for rank, d in enumerate(docs):
                f.write(f"q{q} Q0 doc{d} {rank+1} {100-rank} bm25\n")
    return corpus, run, queries


@pytest.mark.quick
def test_trec_roundtrip(tmp_path):
    corpus, run, queries = make_fixture(tmp_path)
    groups = trec.read_run(str(run), hits=5)
    assert len(groups) == 3
    assert all(len(g[1]) == 5 for g in groups)
    out = tmp_path / "out.txt"
    trec.write_run(
        str(out),
        [(qid, [SearchResult(d, s, None) for d, s in pairs]) for qid, pairs in groups],
    )
    groups2 = trec.read_run(str(out))
    assert [g[0] for g in groups2] == [g[0] for g in groups]
    assert trec.read_done_qids(str(out)) == {"q0", "q1", "q2"}


@pytest.mark.quick
def test_shard_split():
    items = list(range(10))
    shards = [trec.split_into_shards(items, 3, i) for i in range(3)]
    assert sum(shards, []) == items
    assert trec.split_into_shards(items, 1, 0) == items


@pytest.mark.parametrize("method_args", [
    ["setwise", "--num_child", "2", "--method", "heapsort", "--k", "3"],
    ["pointwise", "--method", "yes_no"],
    ["listwise", "--window_size", "3", "--step_size", "2"],
])
def test_cli_end_to_end(tmp_path, method_args):
    corpus, run, queries = make_fixture(tmp_path)
    save = tmp_path / "out.trec"
    cmd = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['run'] + sys.argv[1:];"
        "from llmrankers_tpu.cli.run import parse_args, main;"
        "main(parse_args())",
        "run",
        "--model_name_or_path", "random:t5-tiny",
        "--run_path", str(run),
        "--save_path", str(save),
        "--query_file", str(queries),
        "--corpus_file", str(corpus),
        "--hits", "8",
        "--query_length", "32",
        "--passage_length", "64",
        "--scoring", "likelihood",
        "--dtype", "float32",
    ] + method_args
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "Avg comparisons:" in res.stdout
    groups = trec.read_run(str(save))
    assert len(groups) == 3
    assert all(len(g[1]) == 8 for g in groups)


def test_cli_resume(tmp_path):
    corpus, run, queries = make_fixture(tmp_path)
    save = tmp_path / "out.trec"
    # Pre-write q0 and q1 as "already done".
    with open(save, "w") as f:
        f.write("q0\tQ0\tdoc1\t1\t-1\tLLMRankers\n")
        f.write("q1\tQ0\tdoc2\t1\t-1\tLLMRankers\n")
    cmd = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['run'] + sys.argv[1:];"
        "from llmrankers_tpu.cli.run import parse_args, main;"
        "main(parse_args())",
        "run",
        "--model_name_or_path", "random:t5-tiny",
        "--run_path", str(run), "--save_path", str(save),
        "--query_file", str(queries), "--corpus_file", str(corpus),
        "--hits", "4", "--scoring", "likelihood", "--dtype", "float32",
        "--resume",
        "setwise", "--num_child", "2", "--k", "2",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    groups = trec.read_run(str(save))
    qids = [g[0] for g in groups]
    assert qids == ["q0", "q1", "q2"]  # old rows kept, only q2 appended
    assert len(groups[0][1]) == 1 and len(groups[2][1]) == 4


def test_hybrid_fusion(tmp_path):
    from llmrankers_tpu.cli import hybrid

    r1 = {"q1": {"a": 10.0, "b": 5.0, "c": 0.0}}
    r2 = {"q1": {"b": 1.0, "c": 0.5, "d": 0.0}}
    fused = hybrid.fuse([r1, r2], [0.5, 0.5])
    # a: 0.5*1.0 (only run1); b: 0.5*0.5 + 0.5*1.0 = 0.75 -> b wins.
    assert fused["q1"]["b"] == pytest.approx(0.75)
    assert fused["q1"]["a"] == pytest.approx(0.5)
    assert fused["q1"]["d"] == pytest.approx(0.0)
    out = tmp_path / "fused.txt"
    hybrid.write_fused(fused, str(out))
    rows = open(out).read().splitlines()
    assert rows[0].split()[2] == "b"


def test_rank_r1_extraction_and_vote(tmp_path):
    """Oracle chat engine emitting <think>/<answer> completions validates
    the Rank-R1 regex extraction + permutation voting path."""
    import re as _re

    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.rankers.rank_r1 import RankR1SetwiseLlmRanker

    class ChatOracle:
        kind = "decoder"

        def __init__(self):
            self.tokenizer = ByteTokenizer()

        def generate(self, rows, max_new_tokens, decoder_prefix=(),
                     stop_strings=(), chunk_tokens=None, stats=None,
                     adapter=None):
            texts, ntoks = [], []
            for row in rows:
                text = self.tokenizer.decode(row)
                scores = [float(m) for m in _re.findall(r"relevance (\d+)", text)]
                best = int(np.argmax(scores)) + 1
                texts.append(
                    f"<think>doc {best} looks best</think>\n<answer>[{best}]</answer>"
                )
                ntoks.append(12)
            return texts, ntoks

    prompt_file = "/root/repo/llmrankers_tpu/prompts/prompt_setwise-R1.toml"
    r = RankR1SetwiseLlmRanker(ChatOracle(), prompt_file, num_child=4, k=3,
                               num_permutation=3)
    vals = [17, 3, 94, 55, 21, 8, 76, 42, 63, 30]
    docs = [SearchResult(f"d{i}", 0.0, f"passage with relevance {v}")
            for i, v in enumerate(vals)]
    out = r.rerank("which doc", docs)
    want = [f"d{i}" for i in np.argsort(vals)[::-1][:3]]
    assert [d.docid for d in out[:3]] == want
    assert r.total_compare % 3 == 0


def test_cli_generation_scoring(tmp_path):
    """The default --scoring generation path end-to-end through the CLI
    (drives the T5 greedy-decode scan)."""
    corpus, run, queries = make_fixture(tmp_path, n_queries=2, n_docs=6)
    save = tmp_path / "gen.trec"
    cmd = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['run'] + sys.argv[1:];"
        "from llmrankers_tpu.cli.run import parse_args, main;"
        "main(parse_args())",
        "run", "--model_name_or_path", "random:t5-tiny",
        "--run_path", str(run), "--save_path", str(save),
        "--query_file", str(queries), "--corpus_file", str(corpus),
        "--hits", "6", "--scoring", "generation", "--dtype", "float32",
        "setwise", "--num_child", "2", "--k", "3",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    groups = trec.read_run(str(save))
    assert len(groups) == 2 and all(len(g[1]) == 6 for g in groups)
    assert "Avg completion tokens:" in res.stdout


def test_cli_cohorts(tmp_path):
    corpus, run, queries = make_fixture(tmp_path, n_queries=4, n_docs=8)
    save = tmp_path / "cohort.trec"
    cmd = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['run'] + sys.argv[1:];"
        "from llmrankers_tpu.cli.run import parse_args, main;"
        "main(parse_args())",
        "run", "--model_name_or_path", "random:t5-tiny",
        "--run_path", str(run), "--save_path", str(save),
        "--query_file", str(queries), "--corpus_file", str(corpus),
        "--hits", "8", "--scoring", "likelihood", "--dtype", "float32",
        "--cohorts", "2",
        "setwise", "--num_child", "2", "--k", "3",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    groups = trec.read_run(str(save))
    assert sorted(g[0] for g in groups) == ["q0", "q1", "q2", "q3"]
    assert all(len(g[1]) == 8 for g in groups)
    assert "Avg comparisons:" in res.stdout


def test_rank_r1_insertion_method():
    import re as _re

    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.rankers.rank_r1 import RankR1SetwiseLlmRanker

    class ChatOracle:
        kind = "decoder"

        def __init__(self):
            self.tokenizer = ByteTokenizer()

        def generate(self, rows, max_new_tokens, decoder_prefix=(),
                     stop_strings=(), chunk_tokens=None, stats=None,
                     adapter=None):
            texts, ntoks = [], []
            for row in rows:
                text = self.tokenizer.decode(row)
                scores = [float(m) for m in _re.findall(r"relevance (\d+)", text)]
                best = int(np.argmax(scores)) + 1
                texts.append(f"<think>ok</think>\n<answer>[{best}]</answer>")
                ntoks.append(8)
            return texts, ntoks

    prompt_file = "/root/repo/llmrankers_tpu/prompts/prompt_setwise-R1.toml"
    r = RankR1SetwiseLlmRanker(ChatOracle(), prompt_file, num_child=4, k=3,
                               method="insertion")
    vals = [17, 3, 94, 55, 21, 8, 76, 42, 63, 30]
    docs = [SearchResult(f"d{i}", 0.0, f"passage with relevance {v}")
            for i, v in enumerate(vals)]
    out = r.rerank("which doc", docs)
    want = [f"d{i}" for i in np.argsort(vals)[::-1][:3]]
    assert [d.docid for d in out[:3]] == want


def test_run_section_parity_flags(tmp_path):
    """The Rank-R1 drivers put --prompt_file / --lora_path_or_name /
    --pyserini_dataset in the RUN section (run_setwise.py:336-346); the
    CLI accepts both placements for drop-in command compatibility."""
    from llmrankers_tpu.cli.run import parse_args

    args = parse_args([
        "run", "--model_name_or_path", "random:dec-tiny",
        "--prompt_file", "p.toml", "--lora_path_or_name", "ad",
        "--pyserini_dataset", "dl19-passage",
        "setwise", "--num_child", "19", "--method", "heapsort",
    ])
    assert args.run.prompt_file == "p.toml"
    assert args.run.lora_path_or_name == "ad"
    assert args.run.pyserini_dataset == "dl19-passage"
    assert args.setwise.prompt_file is None


def test_cli_tuning_knob_validation():
    import pytest

    from llmrankers_tpu.cli.run import parse_args

    args = parse_args(["run", "--len_buckets", "1024,512,512",
                       "--max_batch_tokens", "4096",
                       "setwise", "--num_child", "2"])
    assert args.run.len_buckets == (512, 1024)  # sorted + deduped
    assert args.run.max_batch_tokens == 4096
    with pytest.raises(SystemExit):
        parse_args(["run", "--len_buckets", "512,abc", "setwise"])
    with pytest.raises(SystemExit):
        parse_args(["run", "--max_batch_tokens", "0", "setwise"])
