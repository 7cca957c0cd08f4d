"""Self-contained TREC evaluation (nDCG@k, MRR, recall).

The reference delegates metric computation to Lucene's trec_eval via
pyserini (`python -m pyserini.eval.trec_eval -c -l 2 -m ndcg_cut.10`,
README.md:75-80) — unavailable offline, so the metrics are implemented
here with trec_eval's exact semantics:
  * ndcg_cut: LINEAR gain rel_i with the Jarvelin discount
    (rank 1 undiscounted, rank i >= 2 divided by log2(i)); ideal from
    the full qrels;
  * ``-c``: averages run over ALL judged queries — a query missing from
    the run scores 0 (the default here; ``judged_only=True`` restricts
    to queries present in the run);
  * ``min_rel`` reproduces the ``-l 2`` threshold for the binary
    metrics (nDCG always uses raw graded gains, as trec_eval does).
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


def _discount(rank: int) -> float:
    """Jarvelin DCG discount used by trec_eval's ndcg_cut: ranks 1-2
    effectively undiscounted, rank i divided by log2(i)."""
    return 1.0 if rank <= 1 else math.log2(rank)


def ndcg_at_k(
    qrels: Qrels, run: Run, k: int = 10, judged_only: bool = False
) -> float:
    total, n = 0.0, 0
    for qid, judged in qrels.items():
        if qid not in run:
            if not judged_only:
                n += 1  # trec_eval -c: missing query scores 0
            continue
        dcg = 0.0
        for i, (docid, _) in enumerate(run[qid][:k]):
            rel = judged.get(docid, 0)
            if rel > 0:
                dcg += rel / _discount(i + 1)
        ideal = sorted(judged.values(), reverse=True)[:k]
        idcg = sum(r / _discount(i + 1) for i, r in enumerate(ideal) if r > 0)
        total += dcg / idcg if idcg > 0 else 0.0
        n += 1
    return total / n if n else 0.0


def mrr_at_k(
    qrels: Qrels, run: Run, k: int = 10, min_rel: int = 1,
    judged_only: bool = False,
) -> float:
    total, n = 0.0, 0
    for qid, judged in qrels.items():
        if qid not in run:
            if not judged_only:
                n += 1
            continue
        rr = 0.0
        for i, (docid, _) in enumerate(run[qid][:k]):
            if judged.get(docid, 0) >= min_rel:
                rr = 1.0 / (i + 1)
                break
        total += rr
        n += 1
    return total / n if n else 0.0


def recall_at_k(
    qrels: Qrels, run: Run, k: int = 100, min_rel: int = 1,
    judged_only: bool = False,
) -> float:
    total, n = 0.0, 0
    for qid, judged in qrels.items():
        relevant = {d for d, r in judged.items() if r >= min_rel}
        if not relevant:
            continue
        if qid not in run:
            if not judged_only:
                n += 1
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
