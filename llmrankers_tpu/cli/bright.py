"""BRIGHT benchmark prep CLI.

Parity with /root/reference/Rank-R1/bright/'s standalone scripts:
  * ``export`` — write one (or all) BRIGHT domain(s) to Pyserini-format
    corpus/queries/qrels files (write_pyserini_corpus.py / _queries.py /
    _qrels.py). Needs network or a local HF dataset cache.
  * ``filter`` — drop each query's ``excluded_ids`` from a TREC run and
    renumber ranks (filter_run.py:20-26; BRIGHT marks near-duplicate
    sources that must not be scored). Offline: the excluded map is a
    JSON file {qid: [docid, ...]} (exportable from the HF examples
    split), so reranked runs can be filtered without network.

Usage:
  python -m llmrankers_tpu.cli.bright export --out_dir bright/ [--domain biology]
  python -m llmrankers_tpu.cli.bright filter --run_path run.txt \
      --excluded_path excluded.json --save_path run.filtered.txt
"""
from __future__ import annotations

import argparse
import json
import sys

from ..data import bright as bright_mod
from ..data.trec import read_run


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llmrankers_tpu.bright")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="export BRIGHT domain(s) from HF")
    ex.add_argument("--out_dir", required=True)
    ex.add_argument("--domain", default=None, choices=bright_mod.DOMAINS,
                    help="one domain; default: all 12")

    fl = sub.add_parser("filter", help="drop per-query excluded docids")
    fl.add_argument("--run_path", required=True)
    fl.add_argument("--excluded_path", default=None,
                    help='JSON {qid: [docid, ...]} (offline path)')
    fl.add_argument("--split", default=None,
                    help="BRIGHT domain: pull excluded_ids from the HF "
                         "examples split instead (filter_run.py parity; "
                         "needs network/cache)")
    fl.add_argument("--save_path", required=True)
    fl.add_argument("--tag", default="filtered")  # filter_run.py's tag
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.cmd == "export":
        domains = [args.domain] if args.domain else bright_mod.DOMAINS
        for d in domains:
            counts = bright_mod.export_bright_domain(d, args.out_dir)
            print(f"{d}: {counts}", file=sys.stderr)
        return
    if (args.excluded_path is None) == (args.split is None):
        raise SystemExit("filter needs exactly one of "
                         "--excluded_path / --split")
    if args.excluded_path:
        with open(args.excluded_path) as f:
            excluded = json.load(f)
    else:
        from datasets import load_dataset  # gated: network/cache

        examples = load_dataset("xlangai/BRIGHT", "examples")[args.split]
        excluded = {q["id"]: q["excluded_ids"] for q in examples}
    groups = read_run(args.run_path)
    kept = bright_mod.filter_excluded(groups, excluded)
    n_in = sum(len(docs) for _, docs in groups)
    n_out = 0
    with open(args.save_path, "w") as f:
        for qid, docs in kept:
            # Ranks renumber densely after the drop; scores keep their
            # numeric value (filter_run.py:28-31 — formatting goes
            # through float repr, so trailing zeros may differ).
            for rank, (docid, score) in enumerate(docs, start=1):
                f.write(f"{qid} Q0 {docid} {rank} {score} {args.tag}\n")
                n_out += 1
    print(f"kept {n_out}/{n_in} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
