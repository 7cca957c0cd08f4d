"""Training CLI: GRPO / SFT for setwise rerankers.

Entry-point parity with the reference's launch scripts
(deepspeed train_grpo.py / train_sft.py, Rank-R1/README.md:313-326),
rebuilt on the JAX trainers. Data arrives as a JSONL file of
{"prompt": [...chat messages...], "ground_truth": "[i]"} rows (build one
with llmrankers_tpu.train.datasets), so no HF-datasets network access is
required.

    python -m llmrankers_tpu.cli.train grpo \
        --model_name_or_path /path/to/qwen2.5-3b \
        --dataset data.jsonl --output_dir ckpts --steps 100 \
        --num_generations 8 --batch_size 4

    python -m llmrankers_tpu.cli.train sft \
        --model_name_or_path ... --dataset data.jsonl --output_dir ckpts
"""
from __future__ import annotations

import argparse
import json
import logging
import time
from typing import List

logger = logging.getLogger(__name__)


def add_common(p):
    p.add_argument("--model_name_or_path", type=str, required=True,
                   help="local HF checkpoint dir, or random:dec-tiny for smoke")
    p.add_argument("--tokenizer_name_or_path", type=str, default=None)
    p.add_argument("--dataset", type=str, required=True, help="JSONL rows")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup, then linear decay to 0 at "
                        "--steps (ds_zero0_config.json WarmupDecayLR); "
                        "0 = constant LR")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=int, default=32)
    p.add_argument("--save_steps", type=int, default=20)
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--tensor_parallel", type=int, default=1)
    p.add_argument("--seed", type=int, default=929)
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in output_dir "
                        "(TRL resume_from_checkpoint parity, train_grpo.py:67)")
    p.add_argument("--eval_dataset", type=str, default=None,
                   help="held-out JSONL rows; evaluated at every save point "
                        "(v0.2's 1000-example test split, "
                        "create_dataset_v0.2.py:55-59)")
    p.add_argument("--export_peft", type=str, default=None,
                   help="after the final step, also export the adapter as "
                        "a PEFT-format checkpoint dir (adapter_config.json "
                        "+ adapter_model.safetensors) loadable by HF PEFT "
                        "and vLLM LoRARequest — the format the reference's "
                        "TRL trainer saves (train_grpo.py:36-44) and its "
                        "eval driver consumes (run_setwise.py:121-127)")


def build_parser():
    p = argparse.ArgumentParser(prog="llmrankers_tpu.train")
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("grpo")
    add_common(g)
    g.add_argument("--num_generations", type=int, default=8)
    g.add_argument("--temperature", type=float, default=1.0)
    g.add_argument("--beta", type=float, default=0.04)
    g.add_argument("--max_completion_length", type=int, default=2048)
    g.add_argument("--max_prompt_length", type=int, default=4096)
    s = sub.add_parser("sft")
    add_common(s)
    s.add_argument("--max_length", type=int, default=4096)
    s.add_argument("--response_template", type=str, default="<|assistant|>")
    return p


def load_model(args):
    import jax
    import jax.numpy as jnp

    from ..engine.tokenizer import ByteTokenizer, HFTokenizer
    from ..models.loader import load_pretrained
    from ..parallel import mesh as mesh_mod

    if args.model_name_or_path.startswith("random:"):
        from ..models import decoder as dec_mod
        from ..models.config import DecoderConfig

        preset = args.model_name_or_path.split(":", 1)[1]
        if preset != "dec-tiny":
            # Mirror cli/run.py's strictness: a typo must not silently
            # train a tiny byte-tokenizer model for hours.
            raise ValueError(
                f"unknown random preset {preset!r} (training smoke "
                "supports random:dec-tiny)"
            )
        cfg = DecoderConfig.tiny()
        params = dec_mod.init_params(cfg, jax.random.PRNGKey(args.seed))
        tok = ByteTokenizer(cfg.vocab_size)
    else:
        kind, cfg, params = load_pretrained(
            args.model_name_or_path, dtype=jnp.bfloat16
        )
        if kind != "decoder":
            raise ValueError("training targets decoder-only chat models")
        tok = HFTokenizer(args.tokenizer_name_or_path or args.model_name_or_path)
    mesh = mesh_mod.make_mesh(args.data_parallel, args.tensor_parallel)
    params = mesh_mod.shard_params(
        params, mesh_mod.decoder_param_pspecs(params), mesh
    )
    return cfg, params, tok, mesh


def load_rows(path: str) -> List[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return rows


def main_grpo(args):
    from ..train import checkpoint as ckpt
    from ..train.grpo import GRPOConfig, GRPOTrainer
    from ..train.lora import LoraConfig

    cfg, params, tok, mesh = load_model(args)
    rows = load_rows(args.dataset)
    gcfg = GRPOConfig(
        learning_rate=args.learning_rate,
        num_generations=args.num_generations,
        temperature=args.temperature,
        beta=args.beta,
        max_completion_length=args.max_completion_length,
        max_prompt_length=args.max_prompt_length,
        warmup_steps=args.warmup_steps,
        total_steps=args.steps,
        lora=LoraConfig(r=args.lora_r, alpha=args.lora_alpha),
    )
    trainer = GRPOTrainer(cfg, params, tok, gcfg, mesh)
    start = 0
    if args.resume and ckpt.latest_step(args.output_dir) is not None:
        start, trainer.lora, trainer.opt_state = ckpt.restore(
            args.output_dir,
            {"step": 0, "lora": trainer.lora, "opt_state": trainer.opt_state},
        )
        trainer.step_idx = start  # keeps the rollout RNG stream aligned
        logger.info("resumed from step %d", start)
    eval_rows = load_rows(args.eval_dataset) if args.eval_dataset else None

    def run_eval(step):
        if not eval_rows:
            return {}
        m = trainer.evaluate(
            [r["prompt"] for r in eval_rows],
            [r["ground_truth"] for r in eval_rows],
            batch_size=max(args.batch_size, 1),
        )
        print(json.dumps({"step": step,
                          **{k: round(v, 5) for k, v in m.items()}}),
              flush=True)
        return m

    t0 = time.time()
    for step in range(start, args.steps):
        batch = [rows[(step * args.batch_size + i) % len(rows)]
                 for i in range(args.batch_size)]
        metrics = trainer.train_step(
            [r["prompt"] for r in batch], [r["ground_truth"] for r in batch]
        )
        print(json.dumps({"step": step, "elapsed_s": round(time.time() - t0, 1),
                          **{k: round(v, 5) for k, v in metrics.items()}}),
              flush=True)
        if (step + 1) % args.save_steps == 0 or step + 1 == args.steps:
            ckpt.save(args.output_dir, step + 1, trainer.lora, trainer.opt_state)
            run_eval(step + 1)
    if args.export_peft:
        from ..train.lora import save_peft_adapter

        save_peft_adapter(trainer.lora, gcfg.lora, args.export_peft,
                          base_model_name_or_path=args.model_name_or_path)
        logger.info("exported PEFT adapter to %s", args.export_peft)


def main_sft(args):
    import jax.numpy as jnp
    import numpy as np

    from ..train import checkpoint as ckpt
    from ..train.lora import LoraConfig
    from ..train.sft import SFTConfig, completion_only_mask, make_sft_step

    cfg, params, tok, mesh = load_model(args)
    rows = load_rows(args.dataset)
    tcfg = SFTConfig(
        learning_rate=args.learning_rate,
        max_length=args.max_length,
        warmup_steps=args.warmup_steps,
        total_steps=args.steps,
        lora=LoraConfig(r=args.lora_r, alpha=args.lora_alpha),
    )
    step_fn, lora, opt = make_sft_step(cfg, tcfg, mesh, params)
    resp_ids = tok.encode(args.response_template, add_special_tokens=False)

    def make_batch(batch_rows):
        texts = []
        for r in batch_rows:
            msgs = list(r["prompt"]) + list(r.get("completion", []))
            texts.append(tok.apply_chat_template(msgs, add_generation_prompt=False))
        enc = [tok.encode(t, add_special_tokens=False)[: args.max_length]
               for t in texts]
        L = max(8, 1 << (max(len(e) for e in enc) - 1).bit_length())
        B = len(enc)
        ids = np.full((B, L), tok.pad_id, np.int32)
        attn = np.zeros((B, L), np.int32)
        for i, e in enumerate(enc):
            ids[i, : len(e)] = e
            attn[i, : len(e)] = 1
        lmask = completion_only_mask(ids, resp_ids, tok.pad_id)
        return {
            "input_ids": jnp.asarray(ids),
            "attn_mask": jnp.asarray(attn),
            "loss_mask": jnp.asarray(lmask),
        }

    start = 0
    if args.resume and ckpt.latest_step(args.output_dir) is not None:
        start, lora, opt = ckpt.restore(
            args.output_dir, {"step": 0, "lora": lora, "opt_state": opt}
        )
        logger.info("resumed from step %d", start)

    eval_rows = load_rows(args.eval_dataset) if args.eval_dataset else None
    eval_fn = None
    if eval_rows:
        import jax

        from ..train import lora as lora_mod
        from ..train.sft import sft_loss

        @jax.jit
        def eval_fn(lora_, batch):  # held-out completion-masked loss
            merged = lora_mod.merge(params, lora_, tcfg.lora)
            loss, aux = sft_loss(merged, cfg, batch)
            return loss, aux["tokens"]

    def run_eval(step, lora_):
        if not eval_rows:
            return
        # Micro-batched: the eval split can be 1000 rows (v0.2's test
        # split); one padded batch of that size would not fit on device.
        # Chunk means are weighted by COMPLETION TOKENS, not rows, so the
        # reported number is the true per-token loss over the whole split
        # and is invariant to how the rows are chunked.
        tot, wsum = 0.0, 0.0
        for off in range(0, len(eval_rows), args.batch_size):
            chunk = eval_rows[off : off + args.batch_size]
            loss, ntok = eval_fn(lora_, make_batch(chunk))
            tot += float(loss) * float(ntok)
            wsum += float(ntok)
        print(json.dumps({"step": step,
                          "eval_loss": round(tot / max(wsum, 1.0), 5),
                          "eval_n": len(eval_rows)}), flush=True)

    t0 = time.time()
    with mesh:
        for step in range(start, args.steps):
            batch_rows = [rows[(step * args.batch_size + i) % len(rows)]
                          for i in range(args.batch_size)]
            lora, opt, metrics = step_fn(lora, opt, make_batch(batch_rows))
            print(json.dumps({
                "step": step, "elapsed_s": round(time.time() - t0, 1),
                "loss": round(float(metrics["loss"]), 5),
                "tokens": int(metrics["tokens"]),
            }), flush=True)
            if (step + 1) % args.save_steps == 0 or step + 1 == args.steps:
                ckpt.save(args.output_dir, step + 1, lora, opt)
                run_eval(step + 1, lora)
    if args.export_peft:
        from ..train.lora import save_peft_adapter

        save_peft_adapter(lora, tcfg.lora, args.export_peft,
                          base_model_name_or_path=args.model_name_or_path)
        logger.info("exported PEFT adapter to %s", args.export_peft)


def cli_main() -> None:
    args = build_parser().parse_args()
    if args.cmd == "grpo":
        main_grpo(args)
    else:
        main_sft(args)


if __name__ == "__main__":
    cli_main()
