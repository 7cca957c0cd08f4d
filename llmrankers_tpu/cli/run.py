"""Main CLI: rerank a first-stage TREC run.

Flag-compatible rebuild of the reference driver (run.py:206-259) plus the
Rank-R1 driver extras (run_setwise.py:335-368): query/corpus files,
dataset sharding, qid-level resume. Usage:

    python -m llmrankers_tpu.cli.run \
        run --model_name_or_path /path/to/flan-t5-large \
            --run_path run.bm25.txt --save_path run.setwise.txt \
            --hits 100 --query_length 32 --passage_length 128 \
            --scoring likelihood \
        setwise --num_child 2 --method heapsort --k 10

Differences from the reference, by design:
  * --device is accepted but ignored (JAX targets whatever platform is
    configured; use --tensor_parallel/--data_parallel for the mesh);
  * all queries are reranked in one wave-batched pass instead of a
    sequential per-query loop (run.py:184-195) — meters are still
    reported per query.
"""
from __future__ import annotations

import argparse
import logging
import random
import sys
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


def _bucket_list(text: str):
    """Sorted positive-int ladder; engine._bucket takes the FIRST entry
    >= n, so an unsorted ladder would silently over-pad. "auto" /
    "auto:K" pass through (DP re-planned ladder, utils/bucketplan.py)."""
    if text == "auto" or text.startswith("auto:"):
        if ":" in text:
            try:
                if int(text.split(":", 1)[1]) < 1:
                    raise ValueError
            except ValueError:
                raise argparse.ArgumentTypeError(
                    "auto:K needs a positive int K")
        return text
    try:
        vals = sorted({int(x) for x in text.split(",") if x.strip()})
    except ValueError:
        raise argparse.ArgumentTypeError(f"not a comma-list of ints: {text!r}")
    if not vals or vals[0] < 1:
        raise argparse.ArgumentTypeError("len_buckets need positive ints")
    return tuple(vals)


def _positive_int(text: str) -> int:
    v = int(text)
    if v < 1:
        raise argparse.ArgumentTypeError("must be >= 1")
    return v


def build_parsers():
    parser = argparse.ArgumentParser(prog="llmrankers_tpu")
    commands = parser.add_subparsers(title="sub-commands")

    run_p = commands.add_parser("run")
    run_p.add_argument("--run_path", type=str, required=False)
    run_p.add_argument("--save_path", type=str, required=False)
    run_p.add_argument("--model_name_or_path", type=str)
    run_p.add_argument("--tokenizer_name_or_path", type=str, default=None)
    run_p.add_argument("--ir_dataset_name", type=str, default=None)
    run_p.add_argument("--pyserini_index", type=str, default=None)
    run_p.add_argument("--pyserini_dataset", type=str, default=None,
                       help="pyserini topics name for queries, e.g. "
                            "dl19-passage (run_setwise.py:262-263; "
                            "--pyserini_index alone appends '-test')")
    run_p.add_argument("--lora_path_or_name", type=str, default=None,
                       help="PEFT adapter dir merged into the model "
                            "(run_setwise.py:341; also accepted as "
                            "setwise --lora_name_or_path)")
    run_p.add_argument("--prompt_file", type=str, default=None,
                       help="TOML prompt pack (run-section placement "
                            "matches run_setwise.py:336; equivalent to "
                            "the method-section --prompt_file)")
    run_p.add_argument("--query_file", type=str, default=None,
                       help=".tsv or .jsonl query file (run_setwise.py:247-261)")
    run_p.add_argument("--corpus_file", type=str, default=None,
                       help=".jsonl corpus (id/title/text) used as docstore")
    run_p.add_argument("--hits", type=int, default=100)
    run_p.add_argument("--query_length", type=int, default=128)
    run_p.add_argument("--passage_length", type=int, default=128)
    run_p.add_argument("--device", type=str, default=None)  # parity no-op
    run_p.add_argument("--cache_dir", type=str, default=None)
    run_p.add_argument("--openai_key", type=str, default=None)
    run_p.add_argument("--api_base_url", type=str, default=None)
    run_p.add_argument("--scoring", type=str, default="generation",
                       choices=["generation", "likelihood"])
    run_p.add_argument("--shuffle_ranking", type=str, default=None,
                       choices=["inverse", "random"])
    run_p.add_argument("--dataset_number_of_shards", type=int, default=1)
    run_p.add_argument("--dataset_shard_index", type=int, default=0)
    run_p.add_argument("--resume", action="store_true",
                       help="skip qids already in save_path; append")
    run_p.add_argument("--tensor_parallel", type=int, default=1)
    run_p.add_argument("--data_parallel", type=int, default=1)
    run_p.add_argument("--dtype", type=str, default="bfloat16",
                       choices=["bfloat16", "float32"])
    run_p.add_argument("--quantize", type=str, default=None,
                       choices=["int8", "int4"],
                       help="weight quantization. int8 decoder: weight-only "
                            "W8A16 (halves weight HBM; ~2x decode throughput "
                            "at serving batch sizes). int8 T5: W8A8 via "
                            "the Pallas int8-MXU kernel on single-chip TPU "
                            "(the compute-bound scoring path runs on the "
                            "2x-peak int8 systolic path). int4: decoder-only "
                            "group-wise W4A8 Pallas kernel (quarter weight "
                            "HBM; ~2x the int8 decode ceiling; expect some "
                            "accuracy loss — validate on your task)")
    run_p.add_argument("--awq_calib_file", type=str, default=None,
                       help="AWQ-style activation-aware calibration for "
                            "--quantize on decoder models: a text file of "
                            "calibration prompts (one per line, in-domain "
                            "ranking prompts work best); per-(layer, site) "
                            "scales fitted on them are folded into the "
                            "weights before quantization (models/awq.py; "
                            "the vLLM '*-AWQ' checkpoint equivalent, "
                            "calibrated in-framework)")
    run_p.add_argument("--max_cached_adapters", type=int, default=1,
                       help="merged LoRA weight copies kept on device; "
                            "raise to the serving working set when "
                            "alternating adapters (each copy costs a full "
                            "model's HBM)")
    run_p.add_argument("--kv_quantize", type=str, default=None,
                       choices=["int8", "int4"],
                       help="quantized KV cache for decoder models: int8 "
                            "halves the cache HBM stream during decode and "
                            "doubles rows-per-chip under the memory cap; "
                            "int4 (planar nibble packing, per-half scales) "
                            "halves the cache FOOTPRINT again vs int8 "
                            "(more rows-per-chip) — its decode stream "
                            "matches int8's (docs/ARCHITECTURE.md)")
    run_p.add_argument("--prefix_cache_mb", type=int, default=256,
                       help="cross-wave prefix-KV cache budget (decoder "
                            "models): unique prompt prefixes' K/V kept on "
                            "device across dispatches, so a sort's "
                            "successive waves skip the query-head prefill "
                            "(vLLM cross-request prefix caching). 0 "
                            "disables")
    run_p.add_argument("--spec_lookup", type=int, default=0,
                       help="K>0: prompt-lookup speculative decoding with "
                            "K-token drafts (decoder generation; outputs "
                            "identical to plain greedy — vLLM ngram-spec "
                            "parity). Pays off when completions quote the "
                            "prompt, e.g. Rank-R1 reasoning")
    run_p.add_argument("--event_log", type=str, default=None)
    run_p.add_argument("--profile_dir", type=str, default=None,
                       help="capture a jax.profiler device trace here")
    run_p.add_argument("--seed", type=int, default=929)
    run_p.add_argument("--len_buckets", type=_bucket_list, default=None,
                       help="comma-separated padded-length ladder, e.g. "
                            "'512,640,1024' (default: the engine's "
                            "general-purpose ladder). Fewer buckets = "
                            "fewer compiles; tighter buckets = less "
                            "padding waste. 'auto' (or 'auto:K') starts "
                            "on the default ladder and swaps in a "
                            "DP-optimal K-rung ladder planned from the "
                            "first ~4k observed row lengths")
    run_p.add_argument("--max_batch_tokens", type=_positive_int,
                       default=None,
                       help="per-dispatch token budget B*L (default 2^17); "
                            "lower to bound activation memory, raise for "
                            "throughput on small models")
    run_p.add_argument("--cohorts", type=int, default=1,
                       help="parallel rerank cohorts sharing the engine "
                            "(2 overlaps host work with device compute)")
    run_p.add_argument("--verbose", action="store_true",
                       help="log completions (Rank-R1 paths; the reference's "
                            "commented-out write_log_file, run_setwise.py:26-29)")

    pw = commands.add_parser("pointwise")
    pw.add_argument("--method", type=str, default="yes_no", choices=["qlm", "yes_no"])
    pw.add_argument("--batch_size", type=int, default=2)

    _cache_help = ("memoize repeated comparisons (arXiv:2505.24643): "
                   "identical ranking, fewer LLM calls; requires "
                   "deterministic scoring (num_permutation == 1)")
    pr = commands.add_parser("pairwise")
    pr.add_argument("--method", type=str, default="allpair",
                    choices=["allpair", "heapsort", "bubblesort"])
    pr.add_argument("--batch_size", type=int, default=2)
    pr.add_argument("--k", type=int, default=10)
    pr.add_argument("--cache_comparisons", action="store_true", help=_cache_help)

    sw = commands.add_parser("setwise")
    sw.add_argument("--num_child", type=int, default=3)
    sw.add_argument("--method", type=str, default="heapsort",
                    choices=["heapsort", "bubblesort", "insertion"])
    sw.add_argument("--k", type=int, default=10)
    sw.add_argument("--num_permutation", type=int, default=1)
    sw.add_argument("--speculative_depth", type=int, default=1,
                    help="heap-pop speculation depth (>1 batches the "
                         "descent subtree into one wave; identical "
                         "results for stateless comparisons, lower "
                         "latency, more comparisons; incompatible with "
                         "num_permutation>1 generation scoring)")
    sw.add_argument("--prompt_file", type=str, default=None,
                    help="TOML prompt pack -> Rank-R1 reasoning ranker")
    sw.add_argument("--lora_name_or_path", type=str, default=None)
    sw.add_argument("--max_completion_tokens", type=int, default=2048)
    sw.add_argument("--cache_comparisons", action="store_true", help=_cache_help)

    lw = commands.add_parser("listwise")
    lw.add_argument("--window_size", type=int, default=3)
    lw.add_argument("--step_size", type=int, default=1)
    lw.add_argument("--num_repeat", type=int, default=1)
    lw.add_argument("--prompt_file", type=str, default=None)
    lw.add_argument("--method", type=str, default="sliding",
                    choices=["sliding", "topdown"],
                    help="'sliding' = reference bottom-up window walk; "
                         "'topdown' = parallel pivot partitioning "
                         "(arXiv:2405.14589) — every level is one wave")
    lw.add_argument("--k", type=int, default=10,
                    help="topdown pivot rank (unused by sliding)")
    lw.add_argument("--cache_comparisons", action="store_true", help=_cache_help)

    return parser, commands


def parse_args(argv: Optional[List[str]] = None):
    """Two-level parse: split argv at sub-command names (the reference's
    custom splitter behavior, run.py:20-38)."""
    parser, commands = build_parsers()
    argv = list(sys.argv[1:] if argv is None else argv)
    sections: List[List[str]] = [[]]
    for tok in argv:
        if tok in commands.choices:
            sections.append([tok])
        else:
            sections[-1].append(tok)
    args = argparse.Namespace()
    for name in commands.choices:
        setattr(args, name, None)
    parser.parse_args(sections[0], namespace=args)
    for sec in sections[1:]:
        ns = argparse.Namespace()
        parser.parse_args(sec, namespace=ns)
        setattr(args, sec[0], ns)
    return args


# ---------------------------------------------------------------------------
def make_engine(run_args, lora_path=None):
    """Build a ScoringEngine from a local HF checkpoint directory.
    ``lora_path`` merges a PEFT-format adapter into the weights
    (the vLLM LoRARequest path, setwise.py:494-497).

    ``--model_name_or_path random:{t5-tiny|t5-large|t5-xl|dec-tiny|mistral-tiny}``
    builds a random-init model with the byte tokenizer — the offline
    smoke-test path (no weights ship with this environment).
    """
    import jax
    import jax.numpy as jnp

    from ..engine.engine import ScoringEngine
    from ..engine.tokenizer import ByteTokenizer, HFTokenizer
    from ..models.loader import load_pretrained
    from ..parallel import mesh as mesh_mod
    from ..utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    dtype = jnp.bfloat16 if run_args.dtype == "bfloat16" else jnp.float32
    name = run_args.model_name_or_path or ""
    if name.startswith("random:"):
        from ..models import decoder as dec_mod
        from ..models import t5 as t5_mod
        from ..models.config import DecoderConfig, T5Config

        preset = name.split(":", 1)[1]
        key = jax.random.PRNGKey(run_args.seed)
        if preset == "t5-tiny":
            kind, cfg = "t5", T5Config.tiny()
            params = t5_mod.init_params(cfg, key, dtype)
        elif preset == "t5-large":
            kind, cfg = "t5", T5Config.flan_t5_large()
            params = t5_mod.init_params(cfg, key, dtype)
        elif preset == "t5-xl":
            kind, cfg = "t5", T5Config.flan_t5_xl()
            params = t5_mod.init_params(cfg, key, dtype)
        elif preset == "dec-tiny":
            kind, cfg = "decoder", DecoderConfig.tiny()
            params = dec_mod.init_params(cfg, key, dtype)
        elif preset == "mistral-tiny":
            # Sliding-window smoke config (Mistral v0.1-style attention).
            import dataclasses as _dc

            kind = "decoder"
            cfg = _dc.replace(DecoderConfig.tiny(), sliding_window=64)
            params = dec_mod.init_params(cfg, key, dtype)
        else:
            raise ValueError(f"unknown random preset {preset!r}")
        tok = ByteTokenizer(cfg.vocab_size)
    else:
        kind, cfg, params = load_pretrained(name, dtype=dtype)
        tok = HFTokenizer(run_args.tokenizer_name_or_path or name)
    if lora_path:
        from ..train import lora as lora_mod

        adapter, lcfg = lora_mod.load_peft_adapter(lora_path, params, dtype=dtype)
        params = lora_mod.merge(params, adapter, lcfg)
    mesh = mesh_mod.make_mesh(run_args.data_parallel, run_args.tensor_parallel)
    # Adapter merge above happens in bf16 BEFORE quantization (merging
    # onto int8 weights is unsupported, models/quant.py).
    extra = {}
    if run_args.len_buckets is not None:
        extra["len_buckets"] = run_args.len_buckets
    if run_args.max_batch_tokens is not None:
        extra["max_batch_tokens"] = run_args.max_batch_tokens
    if run_args.awq_calib_file:
        with open(run_args.awq_calib_file) as f:
            extra["awq_calib"] = [ln.rstrip("\n") for ln in f if ln.strip()]
    return ScoringEngine(kind, cfg, params, tok, mesh=mesh,
                         quantize=run_args.quantize,
                         kv_quantize=run_args.kv_quantize,
                         spec_lookup=run_args.spec_lookup,
                         max_cached_adapters=run_args.max_cached_adapters,
                         prefix_cache_mb=run_args.prefix_cache_mb,
                         **extra)


def make_ranker(args, engine):
    from ..rankers import (
        DuoT5LlmRanker,
        ListwiseLlmRanker,
        MonoT5LlmRanker,
        PairwiseLlmRanker,
        PointwiseLlmRanker,
        SetwiseLlmRanker,
    )

    model_name = args.run.model_name_or_path or ""
    if args.run.openai_key:
        from ..rankers.api import (
            ChatApiClient,
            OpenAiListwiseLlmRanker,
            OpenAiPairwiseLlmRanker,
            OpenAiSetwiseLlmRanker,
        )

        client = ChatApiClient(
            model=model_name,
            api_key=args.run.openai_key,
            base_url=args.run.api_base_url or "https://api.openai.com/v1",
        )
        if args.setwise:
            return OpenAiSetwiseLlmRanker(
                client, num_child=args.setwise.num_child,
                method=args.setwise.method, k=args.setwise.k,
            )
        if args.pairwise:
            return OpenAiPairwiseLlmRanker(
                client, method=args.pairwise.method, k=args.pairwise.k
            )
        if args.listwise:
            return OpenAiListwiseLlmRanker(
                client, window_size=args.listwise.window_size,
                step_size=args.listwise.step_size,
                num_repeat=args.listwise.num_repeat,
            )
        raise ValueError("API backend supports setwise/pairwise/listwise only")
    if args.pointwise:
        cls = MonoT5LlmRanker if "monot5" in model_name else PointwiseLlmRanker
        return cls(engine, method=args.pointwise.method)
    if args.setwise:
        sw_prompt = args.setwise.prompt_file or args.run.prompt_file
        if sw_prompt:
            from ..rankers.rank_r1 import RankR1SetwiseLlmRanker

            return RankR1SetwiseLlmRanker(
                engine,
                prompt_file=sw_prompt,
                num_child=args.setwise.num_child,
                k=args.setwise.k,
                method=args.setwise.method,
                num_permutation=args.setwise.num_permutation,
                max_completion_tokens=args.setwise.max_completion_tokens,
                verbose=args.run.verbose,
                spec_depth=args.setwise.speculative_depth,
                cache_comparisons=args.setwise.cache_comparisons,
            )
        return SetwiseLlmRanker(
            engine,
            num_child=args.setwise.num_child,
            k=args.setwise.k,
            scoring=args.run.scoring,
            method=args.setwise.method,
            num_permutation=args.setwise.num_permutation,
            seed=args.run.seed,
            spec_depth=args.setwise.speculative_depth,
            cache_comparisons=args.setwise.cache_comparisons,
        )
    if args.pairwise:
        if "duot5" in model_name:
            return DuoT5LlmRanker(engine, method=args.pairwise.method, k=args.pairwise.k,
                                  cache_comparisons=args.pairwise.cache_comparisons)
        return PairwiseLlmRanker(engine, method=args.pairwise.method, k=args.pairwise.k,
                                 cache_comparisons=args.pairwise.cache_comparisons)
    if args.listwise:
        lw_prompt = args.listwise.prompt_file or args.run.prompt_file
        if lw_prompt:
            from ..rankers.rank_r1 import RankR1ListwiseLlmRanker

            return RankR1ListwiseLlmRanker(
                engine,
                prompt_file=lw_prompt,
                window_size=args.listwise.window_size,
                step_size=args.listwise.step_size,
                num_repeat=args.listwise.num_repeat,
                verbose=args.run.verbose,
                cache_comparisons=args.listwise.cache_comparisons,
                method=args.listwise.method,
                k=args.listwise.k,
            )
        return ListwiseLlmRanker(
            engine,
            window_size=args.listwise.window_size,
            step_size=args.listwise.step_size,
            num_repeat=args.listwise.num_repeat,
            scoring=args.run.scoring,
            cache_comparisons=args.listwise.cache_comparisons,
            method=args.listwise.method,
            k=args.listwise.k,
        )
    raise ValueError(
        "Must specify one of --pointwise, --setwise, --pairwise, --listwise."
    )


def load_inputs(args, ranker):
    """Queries + first-stage rankings with reference truncation rules."""
    from ..data import docstore as ds_mod
    from ..data import trec
    from ..types import SearchResult

    r = args.run
    # -- queries ----------------------------------------------------------
    if r.query_file:
        query_map = ds_mod.load_queries(r.query_file)
    elif r.ir_dataset_name:
        query_map = ds_mod.load_queries_ir_datasets(r.ir_dataset_name)
    elif r.pyserini_dataset:
        query_map = ds_mod.load_queries_pyserini_topics(
            r.pyserini_dataset, exact=True
        )
    elif r.pyserini_index:
        query_map = ds_mod.load_queries_pyserini_topics(r.pyserini_index)
    else:
        raise ValueError("need --query_file, --ir_dataset_name, "
                         "--pyserini_dataset or --pyserini_index")
    query_map = {
        qid: ranker.truncate(text, r.query_length) for qid, text in query_map.items()
    }

    # -- docstore ---------------------------------------------------------
    if r.corpus_file:
        # Large corpora (full MS MARCO / BRIGHT) switch to the native
        # offset-indexed store automatically; small files load in memory.
        store = ds_mod.open_jsonl_docstore(r.corpus_file)
    elif r.ir_dataset_name:
        store = ds_mod.IrDatasetsDocstore(r.ir_dataset_name)
    elif r.pyserini_index:
        store = ds_mod.PyseriniDocstore(r.pyserini_index)
    else:
        raise ValueError("need a docstore source")

    groups = trec.read_run(r.run_path, hits=r.hits)
    groups = trec.split_into_shards(
        groups, r.dataset_number_of_shards, r.dataset_shard_index
    )
    done = trec.read_done_qids(r.save_path) if r.resume else set()

    first_stage = []
    for qid, pairs in groups:
        if qid in done:
            continue
        if qid not in query_map:
            raise KeyError(
                f"run file qid {qid!r} not found in the query source "
                f"({len(query_map)} queries loaded)"
            )
        ranking = [
            SearchResult(
                docid=d, score=s,
                text=ranker.truncate(store.get_text(d), r.passage_length),
            )
            for d, s in pairs
        ]
        first_stage.append((qid, query_map[qid], ranking))
    return first_stage


def main(args) -> None:
    from ..data.trec import RunWriter
    from ..utils.metering import EventLog, MeterReport

    rng = random.Random(args.run.seed)
    lora_path = (args.setwise.lora_name_or_path if args.setwise else None) \
        or args.run.lora_path_or_name
    engine = None if args.run.openai_key else make_engine(args.run, lora_path)
    ranker = make_ranker(args, engine)
    first_stage = load_inputs(args, ranker)
    logger.info("reranking %d queries", len(first_stage))

    for qid, _, ranking in first_stage:
        if args.run.shuffle_ranking == "random":
            rng.shuffle(ranking)
        elif args.run.shuffle_ranking == "inverse":
            ranking.reverse()
        elif args.run.shuffle_ranking is not None:
            raise ValueError(f"Invalid shuffle: {args.run.shuffle_ranking}")

    import threading

    from ..rankers.base import rerank_many_pipelined
    from ..utils.profiling import trace

    report = MeterReport()
    log = EventLog(args.run.event_log)
    write_lock = threading.Lock()
    tic = time.time()
    with RunWriter(args.run.save_path, "LLMRankers", append=args.run.resume) as w:
        # Stream each query's result to disk the moment it completes so a
        # killed run resumes at query granularity (run_setwise.py:300-301).
        def on_result(i, ranking):
            qid = first_stage[i][0]
            with write_lock:
                w.write_query(qid, ranking)
                log.emit("query_done", qid=qid)

        qs = [q for _, q, _ in first_stage]
        rs = [r for _, _, r in first_stage]
        cohorts = args.run.cohorts
        if cohorts > 1 and getattr(ranker, "num_permutation", 1) > 1:
            # Each cohort ranker re-seeds its permutation RNG over a
            # query subset — results would differ from cohorts=1
            # (rerank_many_pipelined docstring). Keep determinism.
            print("cohorts forced to 1: num_permutation > 1 draws from "
                  "a shared RNG stream", file=sys.stderr)
            cohorts = 1
        with trace(args.run.profile_dir):
            if cohorts > 1:
                _, cohort_rankers = rerank_many_pipelined(
                    lambda: make_ranker(args, engine), qs, rs,
                    cohorts=cohorts, on_result=on_result,
                )
                stats_lists = [r.per_query_stats for r in cohort_rankers]
            else:
                ranker.rerank_many(qs, rs, on_result=on_result)
                stats_lists = [ranker.per_query_stats]
        report.wall_s = time.time() - tic
        for stats_list in stats_lists:
            for stats in stats_list:
                report.add_query(stats)
        if engine is not None:
            report.truncated_rows = engine.truncated_rows
    report.print_summary()
    log.emit("run_done", **report.summary())
    log.close()


def cli_main() -> None:
    args = parse_args()
    if args.run is None:
        raise SystemExit("need the `run` section (see --help)")
    if args.run.ir_dataset_name and args.run.pyserini_index:
        raise SystemExit("--ir_dataset_name and --pyserini_index are exclusive")
    main(args)


if __name__ == "__main__":
    cli_main()
