"""Run fusion: weighted interpolation of two TREC runs.

Parity with Rank-R1/hybrid.py: per-query min-max normalization of each
run's scores, alpha-weighted sum, docs missing from one run contribute 0
from it, queries missing from one run are copied over from the other
(hybrid.py:30-76). Output rows are space-separated like the reference's
fusion writer.

    python -m llmrankers_tpu.cli.hybrid --run_1 a.txt --run_2 b.txt \
        --alpha 0.5 --save_path fused.txt
"""
from __future__ import annotations

import argparse
from typing import Dict, List


def read_run_scores(path: str) -> Dict[str, Dict[str, float]]:
    run: Dict[str, Dict[str, float]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            qid, _, docid, _, score, _ = parts[:6]
            run.setdefault(qid, {})[docid] = float(score)
    return run


def min_max(scores: Dict[str, float]):
    vals = list(scores.values())
    lo, hi = min(vals), max(vals)
    return lo, max(hi - lo, 1e-9)


def fuse(
    runs: List[Dict[str, Dict[str, float]]], weights: List[float]
) -> Dict[str, Dict[str, float]]:
    qids = set()
    for r in runs:
        qids.update(r)
    fused: Dict[str, Dict[str, float]] = {}
    for qid in qids:
        fused[qid] = {}
        norms = [min_max(r[qid]) if qid in r and r[qid] else (0.0, 1.0) for r in runs]
        docs = set()
        for r in runs:
            docs.update(r.get(qid, {}))
        for doc in docs:
            s = 0.0
            for r, w, (lo, denom) in zip(runs, weights, norms):
                if qid in r and doc in r[qid]:
                    s += w * (r[qid][doc] - lo) / denom
            fused[qid][doc] = s
    return fused


def write_fused(run: Dict[str, Dict[str, float]], path: str, name: str = "fusion"):
    with open(path, "w") as f:
        for qid in run:
            ranked = sorted(run[qid].items(), key=lambda kv: kv[1], reverse=True)
            for i, (doc, score) in enumerate(ranked):
                f.write(f"{qid} Q0 {doc} {i + 1} {score} {name}\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_1", type=str, required=True)
    p.add_argument("--run_2", type=str, required=True)
    p.add_argument("--alpha", type=float, default=0.5, help="weight for --run_1")
    p.add_argument("--save_path", type=str, required=True)
    args = p.parse_args()

    run1 = read_run_scores(args.run_1)
    run2 = read_run_scores(args.run_2)
    # Copy missing queries across (hybrid.py:71-76).
    for qid in set(run1) | set(run2):
        run1.setdefault(qid, run2.get(qid, {}))
        run2.setdefault(qid, run1.get(qid, {}))
    fused = fuse([run1, run2], [args.alpha, 1 - args.alpha])
    write_fused(fused, args.save_path)


if __name__ == "__main__":
    main()
