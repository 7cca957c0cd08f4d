"""Self-contained TREC evaluation (nDCG@k, MRR, recall).

The reference delegates metric computation to Lucene's trec_eval via
pyserini (`python -m pyserini.eval.trec_eval -c -l 2 -m ndcg_cut.10`,
README.md:75-80) — unavailable offline, so the metrics are implemented
here. nDCG matches trec_eval's ndcg_cut semantics: graded gains rel_i,
log2 discounts, ideal from the full qrels; ``min_rel`` reproduces the
``-l 2`` relevance threshold for the binary metrics (nDCG always uses
raw graded gains, as trec_eval does).
"""
from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Mapping, Sequence, Tuple

Qrels = Dict[str, Dict[str, int]]
Run = Dict[str, List[Tuple[str, float]]]


def read_qrels(path: str) -> Qrels:
    """TREC qrels: ``qid 0 docid rel``."""
    qrels: Qrels = defaultdict(dict)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            qid, _, docid, rel = parts[:4]
            qrels[qid][docid] = int(rel)
    return dict(qrels)


def run_from_trec(path: str) -> Run:
    """Run file -> qid -> [(docid, score)] sorted by score desc (ties by
    file order, as trec_eval ranks by score)."""
    rows: Dict[str, List[Tuple[str, float]]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            rows[parts[0]].append((parts[2], float(parts[4])))
    return {
        qid: sorted(docs, key=lambda d: -d[1]) for qid, docs in rows.items()
    }


def ndcg_at_k(qrels: Qrels, run: Run, k: int = 10) -> float:
    """Mean nDCG@k over the qrels' queries (trec_eval averages over
    judged queries present in the run)."""
    total, n = 0.0, 0
    for qid, judged in qrels.items():
        if qid not in run:
            continue
        dcg = 0.0
        for i, (docid, _) in enumerate(run[qid][:k]):
            rel = judged.get(docid, 0)
            if rel > 0:
                dcg += (2**rel - 1) / math.log2(i + 2)
        ideal = sorted(judged.values(), reverse=True)[:k]
        idcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(ideal) if r > 0)
        total += dcg / idcg if idcg > 0 else 0.0
        n += 1
    return total / n if n else 0.0


def mrr_at_k(qrels: Qrels, run: Run, k: int = 10, min_rel: int = 1) -> float:
    total, n = 0.0, 0
    for qid, judged in qrels.items():
        if qid not in run:
            continue
        rr = 0.0
        for i, (docid, _) in enumerate(run[qid][:k]):
            if judged.get(docid, 0) >= min_rel:
                rr = 1.0 / (i + 1)
                break
        total += rr
        n += 1
    return total / n if n else 0.0


def recall_at_k(qrels: Qrels, run: Run, k: int = 100, min_rel: int = 1) -> float:
    total, n = 0.0, 0
    for qid, judged in qrels.items():
        if qid not in run:
            continue
        relevant = {d for d, r in judged.items() if r >= min_rel}
        if not relevant:
            continue
        got = sum(1 for docid, _ in run[qid][:k] if docid in relevant)
        total += got / len(relevant)
        n += 1
    return total / n if n else 0.0


def main():
    import argparse
    import json

    p = argparse.ArgumentParser(description="evaluate a TREC run")
    p.add_argument("--qrels", required=True)
    p.add_argument("--run", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--min_rel", type=int, default=1,
                   help="binary relevance threshold (trec_eval -l)")
    args = p.parse_args()
    qrels = read_qrels(args.qrels)
    run = run_from_trec(args.run)
    print(json.dumps({
        f"ndcg_cut_{args.k}": round(ndcg_at_k(qrels, run, args.k), 4),
        f"mrr_{args.k}": round(mrr_at_k(qrels, run, args.k, args.min_rel), 4),
        "recall_100": round(recall_at_k(qrels, run, 100, args.min_rel), 4),
        "queries": len([q for q in qrels if q in run]),
    }))


if __name__ == "__main__":
    main()
