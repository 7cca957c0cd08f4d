"""BRIGHT benchmark preparation utilities.

Parity with /root/reference/Rank-R1/bright/: export the xlangai/BRIGHT
corpus, queries, and qrels into Pyserini-compatible files per domain
(write_pyserini_corpus.py / _queries.py / _qrels.py) and filter a run's
per-query ``excluded_ids`` (filter_run.py:20-26). The HF dataset load is
gated; file writers are pure so they test offline.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Mapping, Sequence

DOMAINS = [
    "biology", "earth_science", "economics", "psychology", "robotics",
    "stackoverflow", "sustainable_living", "leetcode", "pony", "aops",
    "theoremqa_questions", "theoremqa_theorems",
]


def write_corpus_jsonl(
    docs: Iterable[Mapping], out_path: str,
    id_key: str = "id", text_key: str = "content",
) -> int:
    """Pyserini JsonCollection: {"id": ..., "contents": ...} rows."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with open(out_path, "w") as f:
        for d in docs:
            f.write(json.dumps({"id": str(d[id_key]), "contents": d[text_key]}) + "\n")
            n += 1
    return n


def write_queries_tsv(
    queries: Iterable[Mapping], out_path: str,
    id_key: str = "id", text_key: str = "query",
) -> int:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with open(out_path, "w") as f:
        for q in queries:
            text = " ".join(str(q[text_key]).split())  # strip newlines/tabs
            f.write(f"{q[id_key]}\t{text}\n")
            n += 1
    return n


def write_qrels(
    examples: Iterable[Mapping], out_path: str,
    id_key: str = "id", gold_key: str = "gold_ids",
) -> int:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with open(out_path, "w") as f:
        for ex in examples:
            for gold in ex[gold_key]:
                f.write(f"{ex[id_key]} 0 {gold} 1\n")
                n += 1
    return n


def filter_excluded(
    run_groups: Sequence, excluded: Mapping[str, Sequence[str]]
):
    """Drop each query's excluded docids from its ranking
    (filter_run.py:20-26: BRIGHT marks near-duplicate sources)."""
    out = []
    for qid, docs in run_groups:
        banned = set(excluded.get(qid, ()))
        out.append((qid, [d for d in docs if d[0] not in banned]))
    return out


def export_bright_domain(domain: str, out_dir: str) -> Dict[str, int]:
    """Gated: pull one BRIGHT domain from HF and write all three files."""
    from datasets import load_dataset  # gated: needs network/local cache

    corpus = load_dataset("xlangai/BRIGHT", "documents", split=domain)
    examples = load_dataset("xlangai/BRIGHT", "examples", split=domain)
    counts = {
        "docs": write_corpus_jsonl(
            corpus, os.path.join(out_dir, domain, "corpus", "docs.jsonl")
        ),
        "queries": write_queries_tsv(
            examples, os.path.join(out_dir, domain, "queries.tsv"),
            text_key="query",
        ),
        "qrels": write_qrels(
            examples, os.path.join(out_dir, domain, "qrels.txt")
        ),
    }
    return counts
