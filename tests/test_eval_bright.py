"""Evaluation metrics + BRIGHT prep utilities."""
import math

import pytest

from llmrankers_tpu.data import bright, evaluate


@pytest.mark.quick
def test_ndcg_known_values(tmp_path):
    qrels = {"q1": {"a": 3, "b": 2, "c": 0, "d": 1}}
    # Perfect ranking -> nDCG 1.
    run = {"q1": [("a", 3.0), ("b", 2.0), ("d", 1.0), ("c", 0.5)]}
    assert evaluate.ndcg_at_k(qrels, run, 10) == pytest.approx(1.0)
    # trec_eval ndcg_cut: LINEAR gain, Jarvelin discount (1, 1, log2(3), 2...).
    # Swapped top two: dcg = 2/1 + 3/1 + 1/log2(3); ideal = 3 + 2 + 1/log2(3).
    run2 = {"q1": [("b", 3.0), ("a", 2.0), ("d", 1.0)]}
    dcg = 2 / 1 + 3 / 1 + 1 / math.log2(3)
    idcg = 3 / 1 + 2 / 1 + 1 / math.log2(3)
    assert evaluate.ndcg_at_k(qrels, run2, 10) == pytest.approx(dcg / idcg)
    # -c semantics: a judged query missing from the run scores 0 and
    # still counts in the mean.
    two = {"q1": qrels["q1"], "q2": {"z": 1}}
    half = evaluate.ndcg_at_k(two, run, 10)
    assert half == pytest.approx(0.5)
    assert evaluate.ndcg_at_k(two, run, 10, judged_only=True) == pytest.approx(1.0)


def test_mrr_and_recall():
    qrels = {"q": {"rel1": 2, "rel2": 1, "junk": 0}}
    run = {"q": [("x", 9.0), ("rel2", 8.0), ("rel1", 7.0)]}
    assert evaluate.mrr_at_k(qrels, run, 10) == pytest.approx(1 / 2)
    # -l 2 threshold: only rel1 counts.
    assert evaluate.mrr_at_k(qrels, run, 10, min_rel=2) == pytest.approx(1 / 3)
    assert evaluate.recall_at_k(qrels, run, 2) == pytest.approx(1 / 2)


def test_qrels_run_io(tmp_path):
    q = tmp_path / "qrels.txt"
    q.write_text("q1 0 a 2\nq1 0 b 0\nq2 0 c 1\n")
    r = tmp_path / "run.txt"
    r.write_text("q1 Q0 b 1 5.0 t\nq1 Q0 a 2 4.0 t\n")
    qrels = evaluate.read_qrels(str(q))
    run = evaluate.run_from_trec(str(r))
    assert qrels["q1"] == {"a": 2, "b": 0}
    assert run["q1"][0] == ("b", 5.0)
    assert 0 < evaluate.ndcg_at_k(qrels, run, 10) < 1


def test_bright_writers(tmp_path):
    docs = [{"id": 1, "content": "doc one"}, {"id": 2, "content": "doc two"}]
    exs = [{"id": "q1", "query": "multi\nline query", "gold_ids": ["1", "2"]}]
    n = bright.write_corpus_jsonl(docs, str(tmp_path / "c/docs.jsonl"))
    assert n == 2
    import json

    rows = [json.loads(l) for l in open(tmp_path / "c/docs.jsonl")]
    assert rows[0] == {"id": "1", "contents": "doc one"}
    bright.write_queries_tsv(exs, str(tmp_path / "queries.tsv"))
    line = open(tmp_path / "queries.tsv").read()
    assert line == "q1\tmulti line query\n"
    bright.write_qrels(exs, str(tmp_path / "qrels.txt"))
    assert open(tmp_path / "qrels.txt").read() == "q1 0 1 1\nq1 0 2 1\n"


def test_bright_filter_excluded():
    groups = [("q1", [("a", 1.0), ("b", 0.9), ("c", 0.8)])]
    out = bright.filter_excluded(groups, {"q1": ["b"]})
    assert out == [("q1", [("a", 1.0), ("c", 0.8)])]
    assert bright.filter_excluded(groups, {}) == groups


def test_bright_filter_cli(tmp_path):
    """filter subcommand: drops excluded docids, renumbers ranks, keeps
    scores verbatim (filter_run.py:20-31 semantics)."""
    import json
    import subprocess
    import sys

    run = tmp_path / "run.txt"
    run.write_text(
        "q1 Q0 d1 1 9.5 X\nq1 Q0 d2 2 8.0 X\nq1 Q0 d3 3 7.0 X\n"
        "q2 Q0 d4 1 5.0 X\n"
    )
    excl = tmp_path / "excl.json"
    excl.write_text(json.dumps({"q1": ["d2"]}))
    out = tmp_path / "run.filtered.txt"
    r = subprocess.run(
        [sys.executable, "-m", "llmrankers_tpu.cli.bright", "filter",
         "--run_path", str(run), "--excluded_path", str(excl),
         "--save_path", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    lines = out.read_text().splitlines()
    assert lines == [
        "q1 Q0 d1 1 9.5 filtered",
        "q1 Q0 d3 2 7.0 filtered",
        "q2 Q0 d4 1 5.0 filtered",
    ]
    assert "kept 3/4" in r.stderr


def test_bright_filter_cli_arg_validation(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "llmrankers_tpu.cli.bright", "filter",
         "--run_path", "x", "--save_path", "y"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0 and "exactly one" in r.stderr
