"""Training-layer tests: LoRA, SFT, GRPO, rewards, datasets, checkpoints."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig
from llmrankers_tpu.parallel import mesh as mesh_mod
from llmrankers_tpu.train import checkpoint as ckpt_mod
from llmrankers_tpu.train import lora as lora_mod
from llmrankers_tpu.train.datasets import (
    build_setwise_row_v01,
    build_setwise_row_v02,
    build_sft_row,
    load_prompt_pack,
)
from llmrankers_tpu.train.grpo import GRPOConfig, GRPOTrainer
from llmrankers_tpu.train.rewards import reward_setwise
from llmrankers_tpu.train.sft import SFTConfig, completion_only_mask, make_sft_step


@pytest.fixture(scope="module")
def tiny_model():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_lora_merge_noop_at_init(tiny_model):
    cfg, params = tiny_model
    lcfg = lora_mod.LoraConfig(r=4, alpha=8)
    lora = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(1))
    merged = lora_mod.merge(params, lora, lcfg)
    # B starts at zero -> merge is identity.
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["wq"]), np.asarray(params["layers"]["wq"])
    )
    # Nonzero B changes weights.
    lora["wq"]["b"] = jnp.ones_like(lora["wq"]["b"])
    merged2 = lora_mod.merge(params, lora, lcfg)
    assert np.abs(np.asarray(merged2["layers"]["wq"]) -
                  np.asarray(params["layers"]["wq"])).max() > 0


@pytest.mark.quick
def test_completion_only_mask():
    resp = [9, 8]
    ids = np.asarray([
        [1, 2, 9, 8, 5, 6, 0, 0],
        [1, 2, 3, 4, 5, 6, 7, 8],  # no template -> no loss
    ])
    m = completion_only_mask(ids, resp, pad_id=0)
    assert m[0].tolist() == [0, 0, 0, 0, 1, 1, 0, 0]
    assert m[1].sum() == 0


def test_sft_overfits_tiny_batch(tiny_model):
    cfg, params = tiny_model
    mesh = mesh_mod.make_mesh(2, 1, devices=jax.devices()[:2])
    params_s = mesh_mod.shard_params(
        params, mesh_mod.decoder_param_pspecs(params), mesh
    )
    tcfg = SFTConfig(learning_rate=5e-2, lora=lora_mod.LoraConfig(r=4, alpha=8))
    step, lora, opt = make_sft_step(cfg, tcfg, mesh, params_s)
    rng = np.random.RandomState(0)
    B, T = 4, 16
    batch = {
        "input_ids": jnp.asarray(rng.randint(2, 500, (B, T)), jnp.int32),
        "attn_mask": jnp.ones((B, T), jnp.int32),
        "loss_mask": jnp.asarray((rng.rand(B, T) > 0.3), jnp.float32),
    }
    losses = []
    with mesh:
        for _ in range(8):
            lora, opt, metrics = step(lora, opt, batch)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


@pytest.mark.quick
def test_reward_setwise_parity():
    comps = [
        "<think>reasoning</think>\n<answer>[3]</answer>",
        "<think>x</think><answer> [3] </answer>",
        "<answer>[3]</answer>",              # missing think -> 0
        "<think>y</think><answer>[2]</answer>",
        "garbage",
    ]
    gts = ["[3]", "[3]", "[3]", "[3]", "[3]"]
    assert reward_setwise(comps, gts) == [1.0, 1.0, 0.0, 0.0, 0.0]


def test_grpo_step(tiny_model):
    cfg, params = tiny_model
    mesh = mesh_mod.make_mesh(1, 1)
    tok = ByteTokenizer(cfg.vocab_size)
    gcfg = GRPOConfig(num_generations=4, max_completion_length=8,
                      max_prompt_length=64, beta=0.04,
                      lora=lora_mod.LoraConfig(r=2, alpha=4))

    # Deterministic pseudo-random reward so groups have variance.
    def reward(completions, gts):
        return [float(hash(c) % 2) for c in completions]

    tr = GRPOTrainer(cfg, params, tok, gcfg, mesh, reward_fn=reward)
    prompts = [
        [{"role": "system", "content": "sys"},
         {"role": "user", "content": f"pick the best doc {i}"}]
        for i in range(2)
    ]
    before = np.asarray(tr.lora["wq"]["b"]).copy()
    m1 = tr.train_step(prompts, ["[1]", "[2]"])
    m2 = tr.train_step(prompts, ["[1]", "[2]"])
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    assert "kl" in m1 and m1["kl"] >= -1e-6
    assert 0.0 <= m1["reward_mean"] <= 1.0
    after = np.asarray(tr.lora["wq"]["b"])
    if m1["reward_std"] > 0 or m2["reward_std"] > 0:
        assert np.abs(after - before).max() > 0


def test_dataset_builders():
    prompt = load_prompt_pack(
        "/root/repo/llmrankers_tpu/prompts/prompt_setwise-R1.toml"
    )
    ex = {
        "query": "what is jax",
        "positive_passages": [{"title": "T", "text": "jax is an array library"}],
        "negative_passages": [
            {"title": f"N{i}", "text": f"negative doc {i}"} for i in range(25)
        ],
    }
    rng = random.Random(929)
    row = build_setwise_row_v01(ex, prompt, rng)
    assert row["prompt"][0]["role"] == "system"
    user = row["prompt"][1]["content"]
    assert "what is jax" in user
    # ground truth points at the line holding the positive passage.
    idx = int(row["ground_truth"].strip("[]"))
    line = [l for l in user.splitlines() if l.startswith(f"[{idx}]")][0]
    assert "jax is an array library" in line
    # at most 20 docs rendered
    assert sum(1 for l in user.splitlines() if l[:1] == "[") <= 20

    v2prompt = load_prompt_pack(
        "/root/repo/llmrankers_tpu/prompts/prompt_setwise-R1-v0.2.toml"
    )
    row2 = build_setwise_row_v02(ex, v2prompt, random.Random(1),
                                 tokenizer=ByteTokenizer())
    idx2 = int(row2["ground_truth"].strip("[]"))
    assert f"[{idx2}]: " in row2["prompt"][1]["content"]

    sft = build_sft_row(ex, prompt, random.Random(2))
    assert sft["completion"][0]["content"].startswith("<answer>[")


def test_checkpoint_roundtrip(tmp_path, tiny_model):
    cfg, params = tiny_model
    lcfg = lora_mod.LoraConfig(r=2, alpha=4)
    lora = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(3))
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(lora)
    ckpt_mod.save(str(tmp_path / "ck"), 7, lora, opt)
    assert ckpt_mod.latest_step(str(tmp_path / "ck")) == 7
    step, lora2, opt2 = ckpt_mod.restore(
        str(tmp_path / "ck"), {"step": 0, "lora": lora, "opt_state": opt}
    )
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(lora2["wq"]["a"]), np.asarray(lora["wq"]["a"])
    )


def test_load_peft_adapter_roundtrip(tmp_path, tiny_model):
    import json

    import numpy as np
    from safetensors.numpy import save_file

    cfg, params = tiny_model
    L = cfg.num_hidden_layers
    D = cfg.hidden_size
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    r = 4
    rng = np.random.RandomState(0)
    sd = {}
    for i in range(L):
        for hf, (din, dout) in [("q_proj", (D, H * Dh)), ("v_proj", (D, KV * Dh))]:
            sd[f"base_model.model.model.layers.{i}.self_attn.{hf}.lora_A.weight"] = (
                rng.randn(r, din).astype(np.float32)
            )
            sd[f"base_model.model.model.layers.{i}.self_attn.{hf}.lora_B.weight"] = (
                rng.randn(dout, r).astype(np.float32)
            )
    save_file(sd, str(tmp_path / "adapter_model.safetensors"))
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": r, "lora_alpha": 8}, f)

    from llmrankers_tpu.train import lora as lora_mod

    adapter, lcfg = lora_mod.load_peft_adapter(str(tmp_path), params)
    assert lcfg.r == 4 and lcfg.alpha == 8
    assert set(adapter.keys()) == {"wq", "wv"}
    assert adapter["wq"]["a"].shape == (L, D, r)
    assert adapter["wq"]["b"].shape == (L, r, H * Dh)
    # merge equals manual delta on layer 0
    merged = lora_mod.merge(params, adapter, lcfg)
    a0 = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"]
    b0 = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"]
    want = np.asarray(params["layers"]["wq"][0]) + (8 / 4) * (a0.T @ b0.T)
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["wq"][0]), want, rtol=1e-5, atol=1e-5
    )


def test_grpo_grad_accum(tiny_model):
    cfg, params = tiny_model
    mesh = mesh_mod.make_mesh(1, 1)
    tok = ByteTokenizer(cfg.vocab_size)
    gcfg = GRPOConfig(num_generations=4, max_completion_length=8,
                      max_prompt_length=64, beta=0.0, grad_accum=4,
                      lora=lora_mod.LoraConfig(r=2, alpha=4))

    def reward(completions, gts):
        return [float(i % 2) for i, _ in enumerate(completions)]

    tr = GRPOTrainer(cfg, params, tok, gcfg, mesh, reward_fn=reward)
    prompts = [[{"role": "user", "content": f"p{i}"}] for i in range(2)]
    m = tr.train_step(prompts, ["[1]", "[2]"])
    assert np.isfinite(m["loss"])
    assert m["reward_std"] > 0  # alternating rewards -> nonzero advantage


def test_grpo_dp_matches_single_device(tiny_model):
    """GRPO step on a 4x2 (dp x tp) mesh reproduces the 1x1 result.

    The reference trains GRPO as 4-GPU DDP (DeepSpeed ZeRO-0,
    Rank-R1/train_grpo.py:58); here DP is batch sharding over 'data'
    with XLA inserting the gradient all-reduce. Same seeds + a
    deterministic reward => identical rollouts, so the updated adapter
    must match the single-device run up to reduction-order noise.
    """
    cfg, params = tiny_model
    tok = ByteTokenizer(cfg.vocab_size)
    gcfg = GRPOConfig(num_generations=4, max_completion_length=8,
                      max_prompt_length=64, beta=0.04, grad_accum=2,
                      lora=lora_mod.LoraConfig(r=2, alpha=4))

    def reward(completions, gts):
        return [float(i % 2) for i, _ in enumerate(completions)]

    prompts = [[{"role": "user", "content": f"pick doc {i}"}] for i in range(2)]
    results = {}
    for name, (nd, nm) in {"single": (1, 1), "dp_tp": (4, 2)}.items():
        p = mesh_mod.shard_params(
            params, mesh_mod.decoder_param_pspecs(params),
            mesh_mod.make_mesh(nd, nm),
        ) if (nd, nm) != (1, 1) else params
        tr = GRPOTrainer(cfg, p, tok, gcfg, mesh_mod.make_mesh(nd, nm),
                         reward_fn=reward)
        m = tr.train_step(prompts, ["[1]", "[2]"])
        results[name] = (m, jax.tree.map(np.asarray, tr.lora))
    m1, lora1 = results["single"]
    m2, lora2 = results["dp_tp"]
    assert m2["reward_mean"] == m1["reward_mean"]
    np.testing.assert_allclose(m2["loss"], m1["loss"], rtol=2e-4, atol=2e-5)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(lora1)}
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(lora2)}
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(flat2[k], flat1[k], rtol=2e-3, atol=2e-5,
                                   err_msg=k)


def test_grpo_hybrid_mesh_matches_flat(tiny_model):
    """Multi-slice seam (SURVEY §5): the 3-axis (replica=2, data=2,
    model=2) hybrid mesh — pure DP across slices on the 'replica' axis,
    dp+tp within a slice — must reproduce the flat (4, 2) mesh's GRPO
    step exactly: batches shard over ('replica', 'data'), the adapter is
    replicated everywhere, and XLA's cross-slice all-reduce changes only
    reduction order."""
    cfg, params = tiny_model
    tok = ByteTokenizer(cfg.vocab_size)
    gcfg = GRPOConfig(num_generations=4, max_completion_length=8,
                      max_prompt_length=64, beta=0.04, grad_accum=2,
                      lora=lora_mod.LoraConfig(r=2, alpha=4))

    def reward(completions, gts):
        return [float(i % 2) for i, _ in enumerate(completions)]

    prompts = [[{"role": "user", "content": f"pick doc {i}"}] for i in range(2)]
    results = {}
    for name, mesh in {
        "flat": mesh_mod.make_mesh(4, 2),
        "hybrid": mesh_mod.make_hybrid_mesh(2, 2, 2),
    }.items():
        p = mesh_mod.shard_params(
            params, mesh_mod.decoder_param_pspecs(params), mesh
        )
        tr = GRPOTrainer(cfg, p, tok, gcfg, mesh, reward_fn=reward)
        m = tr.train_step(prompts, ["[1]", "[2]"])
        results[name] = (m, jax.tree.map(np.asarray, tr.lora))
    m1, lora1 = results["flat"]
    m2, lora2 = results["hybrid"]
    assert m2["reward_mean"] == m1["reward_mean"]
    np.testing.assert_allclose(m2["loss"], m1["loss"], rtol=2e-4, atol=2e-5)
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(lora1),
        jax.tree_util.tree_leaves_with_path(lora2),
    ):
        np.testing.assert_allclose(
            v2, v1, rtol=2e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(k1),
        )


def test_sft_hybrid_mesh_matches_flat(tiny_model):
    """Full-parameter SFT step equivalence on the same meshes (the
    program the driver's dryrun_multichip also exercises)."""
    from llmrankers_tpu.train.sft import SFTConfig, make_full_train_step

    cfg, params = tiny_model
    rng = np.random.RandomState(0)
    B, T = 8, 16
    batch = {
        "input_ids": jnp.asarray(rng.randint(2, 500, (B, T)), jnp.int32),
        "attn_mask": jnp.ones((B, T), jnp.int32),
        "loss_mask": jnp.asarray(rng.rand(B, T) > 0.5, jnp.float32),
    }
    losses = {}
    host_params = jax.tree.map(np.asarray, params)  # step donates its input
    for name, mesh in {
        "flat": mesh_mod.make_mesh(4, 2),
        "hybrid": mesh_mod.make_hybrid_mesh(2, 2, 2),
    }.items():
        p = mesh_mod.shard_params(
            host_params, mesh_mod.decoder_param_pspecs(params), mesh
        )
        step, tx = make_full_train_step(cfg, SFTConfig(), mesh)
        with mesh:
            _, _, metrics = step(p, tx.init(p), batch)
            losses[name] = float(metrics["loss"])
    np.testing.assert_allclose(losses["hybrid"], losses["flat"],
                               rtol=1e-5, atol=1e-6)


def _write_train_jsonl(path, n=4, with_completion=False):
    import json as _json
    rows = []
    for i in range(n):
        r = {"prompt": [{"role": "user", "content": f"rank docs case {i}"}],
             "ground_truth": f"[{(i % 3) + 1}]"}
        if with_completion:
            r["completion"] = [
                {"role": "assistant", "content": f"<answer>[{(i % 3) + 1}]</answer>"}
            ]
        rows.append(r)
    with open(path, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")


def _run_train_cli(tmp_path, cmd, extra):
    import os
    import subprocess
    import sys

    data = tmp_path / "data.jsonl"
    if not data.exists():
        _write_train_jsonl(str(data), with_completion=(cmd == "sft"))
    args = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['train'] + sys.argv[1:];"
        "from llmrankers_tpu.cli.train import build_parser, main_grpo, main_sft;"
        "a = build_parser().parse_args();"
        "(main_grpo if a.cmd == 'grpo' else main_sft)(a)",
        cmd,
        "--model_name_or_path", "random:dec-tiny",
        "--dataset", str(data),
        "--output_dir", str(tmp_path / "ckpt"),
        "--batch_size", "2", "--lora_r", "2", "--lora_alpha", "4",
    ] + extra
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    res = subprocess.run(args, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    import json as _json
    return [_json.loads(l) for l in res.stdout.splitlines()
            if l.startswith("{")]


@pytest.mark.parametrize("cmd,extra", [
    ("sft", ["--max_length", "128"]),
    ("grpo", ["--num_generations", "2", "--max_completion_length", "8",
              "--max_prompt_length", "64"]),
])
def test_train_cli_resume_and_eval(tmp_path, cmd, extra):
    """--resume continues from the newest checkpoint (TRL
    resume_from_checkpoint parity, train_grpo.py:67) and --eval_dataset
    reports a held-out metric at save points."""
    eval_data = tmp_path / "eval.jsonl"
    _write_train_jsonl(str(eval_data), n=2, with_completion=(cmd == "sft"))
    extra = extra + ["--eval_dataset", str(eval_data)]

    first = _run_train_cli(tmp_path, cmd,
                           extra + ["--steps", "2", "--save_steps", "1"])
    train_steps = [r["step"] for r in first if "elapsed_s" in r]
    assert train_steps == [0, 1]
    eval_key = "eval_loss" if cmd == "sft" else "eval_reward_mean"
    assert any(eval_key in r for r in first)

    second = _run_train_cli(tmp_path, cmd,
                            extra + ["--steps", "4", "--save_steps", "2",
                                     "--resume",
                                     "--export_peft", str(tmp_path / "peft")])
    train_steps = [r["step"] for r in second if "elapsed_s" in r]
    assert train_steps == [2, 3], second  # resumed, not restarted
    # --export_peft wrote a loadable PEFT checkpoint of the final adapter.
    assert (tmp_path / "peft" / "adapter_model.safetensors").exists()
    assert (tmp_path / "peft" / "adapter_config.json").exists()


def test_load_peft_adapter_t5_roundtrip(tmp_path):
    """PEFT T5 checkpoints (SelfAttention/EncDecAttention q,k,v,o) load
    into the nested encoder/decoder adapter layout and merge changes the
    targeted weights only."""
    import json

    from safetensors.numpy import save_file

    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    D = cfg.d_model
    A = cfg.num_heads * cfg.d_kv
    r = 4
    rng = np.random.RandomState(0)
    sd = {}
    for sub, n_layers in (("encoder", cfg.num_layers),
                          ("decoder", cfg.num_decoder_layers)):
        for i in range(n_layers):
            for mod in (["SelfAttention"] if sub == "encoder"
                        else ["SelfAttention", "EncDecAttention"]):
                for hf in ("q", "v"):
                    base = f"base_model.model.{sub}.block.{i}.layer.0.{mod}.{hf}"
                    sd[base + ".lora_A.weight"] = rng.randn(r, D).astype(np.float32)
                    sd[base + ".lora_B.weight"] = rng.randn(A, r).astype(np.float32)
    save_file(sd, str(tmp_path / "adapter_model.safetensors"))
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": r, "lora_alpha": 8}, f)

    adapter, lcfg = lora_mod.load_peft_adapter(str(tmp_path), params)
    assert set(adapter["encoder"]) == {"q", "v"}
    assert set(adapter["decoder"]) == {"q", "v", "cq", "cv"}
    merged = lora_mod.merge(params, adapter, lcfg)
    for sub in ("encoder", "decoder"):
        assert (np.abs(np.asarray(merged[sub]["layers"]["q"])
                       - np.asarray(params[sub]["layers"]["q"])).max() > 0)
        np.testing.assert_array_equal(
            np.asarray(merged[sub]["layers"]["o"]),
            np.asarray(params[sub]["layers"]["o"]),
        )
    # Stacked values match the per-layer safetensors (layer 1, encoder q).
    want = sd["base_model.model.encoder.block.1.layer.0.SelfAttention.q.lora_A.weight"].T
    np.testing.assert_allclose(np.asarray(adapter["encoder"]["q"]["a"][1]), want)


def test_engine_serves_multiple_adapters(tiny_model):
    """One engine, two registered LoRA adapters: per-request adapter
    selection changes outputs; base weights stay untouched (vLLM
    LoRARequest parity, setwise.py:494-497)."""
    from llmrankers_tpu.engine.engine import ScoringEngine

    cfg, params = tiny_model
    tok = ByteTokenizer(cfg.vocab_size)
    eng = ScoringEngine("decoder", cfg, params, tok)
    lcfg = lora_mod.LoraConfig(r=2, alpha=64, targets=("wq", "wv"))
    ad1 = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(1))
    ad2 = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(2))
    ad1 = jax.tree.map(lambda x: jnp.ones_like(x) * 0.05, ad1)
    # ad2 = ad1 with B negated, so the A@B delta has the opposite sign.
    ad2 = {t: {"a": jnp.ones_like(ad2[t]["a"]) * 0.05,
               "b": -jnp.ones_like(ad2[t]["b"]) * 0.05} for t in ad2}
    eng.add_adapter("one", ad1, lcfg)
    eng.add_adapter("two", ad2, lcfg)

    rows = [list(range(2, 40)) for _ in range(3)]
    base = eng.score_labels(rows, [5, 6])
    s1 = eng.score_labels(rows, [5, 6], adapter="one")
    s2 = eng.score_labels(rows, [5, 6], adapter="two")
    base2 = eng.score_labels(rows, [5, 6])
    np.testing.assert_array_equal(base, base2)  # base unaffected
    assert np.abs(s1 - base).max() > 1e-3
    assert np.abs(s2 - s1).max() > 1e-3

    g_base, _ = eng.generate(rows, max_new_tokens=4)
    g1, _ = eng.generate(rows, max_new_tokens=4, adapter="one")
    assert isinstance(g_base, list) and isinstance(g1, list)
    with pytest.raises(KeyError):
        eng.score_labels(rows, [5], adapter="nope")

    # Merged weights are a FULL param copy each, so only
    # max_cached_adapters (default 1) stay resident; evicted adapters
    # re-merge on next use and reproduce the same scores.
    assert len(eng._adapter_params) == 1
    s1_again = eng.score_labels(rows, [5, 6], adapter="one")
    np.testing.assert_allclose(s1_again, s1, rtol=1e-5, atol=1e-6)
    assert len(eng._adapter_params) == 1

    eng2 = ScoringEngine("decoder", cfg, params, tok, max_cached_adapters=2)
    eng2.add_adapter("one", ad1, lcfg)
    eng2.add_adapter("two", ad2, lcfg)
    eng2.score_labels(rows, [5, 6], adapter="one")
    eng2.score_labels(rows, [5, 6], adapter="two")
    assert len(eng2._adapter_params) == 2


def test_load_peft_adapter_no_match_raises(tmp_path, tiny_model):
    """An adapter whose tensors match none of the model's layer names
    must raise, not silently register a no-op adapter."""
    import json

    from safetensors.numpy import save_file

    cfg, params = tiny_model
    sd = {
        "base_model.model.transformer.h.0.attn.c_attn.lora_A.weight":
            np.zeros((2, 4), np.float32),
        "base_model.model.transformer.h.0.attn.c_attn.lora_B.weight":
            np.zeros((4, 2), np.float32),
    }
    save_file(sd, str(tmp_path / "adapter_model.safetensors"))
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": 2, "lora_alpha": 4}, f)
    with pytest.raises(ValueError, match="no LoRA tensors"):
        lora_mod.load_peft_adapter(str(tmp_path), params)


@pytest.mark.quick
def test_save_peft_adapter_roundtrip(tmp_path, tiny_model):
    """save_peft_adapter is the exact inverse of load_peft_adapter:
    adapters trained here (train/grpo.py, train/sft.py) export to the
    PEFT checkpoint format the reference's TRL trainer writes
    (Rank-R1/train_grpo.py:36-44) and its vLLM eval driver consumes
    (Rank-R1/run_setwise.py:121-127)."""
    import json

    cfg, params = tiny_model
    lcfg = lora_mod.LoraConfig(r=4, alpha=8, targets=("wq", "wv", "w_up"))
    lora = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(3))
    # B is zero at init; randomize so the round-trip compares real values.
    lora = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape, x.dtype), lora
    )
    out = tmp_path / "peft"
    lora_mod.save_peft_adapter(lora, lcfg, str(out),
                               base_model_name_or_path="Qwen/Qwen2.5-3B")

    with open(out / "adapter_config.json") as f:
        acfg = json.load(f)
    assert acfg["peft_type"] == "LORA" and acfg["task_type"] == "CAUSAL_LM"
    assert acfg["r"] == 4 and acfg["lora_alpha"] == 8
    assert acfg["target_modules"] == ["q_proj", "up_proj", "v_proj"]
    assert acfg["base_model_name_or_path"] == "Qwen/Qwen2.5-3B"

    back, bcfg = lora_mod.load_peft_adapter(str(out), params)
    assert bcfg.r == 4 and bcfg.alpha == 8
    assert set(back) == {"wq", "wv", "w_up"}
    for t in back:
        np.testing.assert_allclose(np.asarray(back[t]["a"]),
                                   np.asarray(lora[t]["a"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back[t]["b"]),
                                   np.asarray(lora[t]["b"]), rtol=1e-6)


@pytest.mark.quick
def test_save_peft_adapter_t5_roundtrip(tmp_path):
    """T5 adapters (incl. decoder cross-attention) export with the real
    HF block layout — self-attn at layer.0, EncDecAttention at layer.1 —
    and round-trip through load_peft_adapter."""
    import json

    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    lcfg = lora_mod.LoraConfig(r=4, alpha=8, targets=("q", "v", "cq"))
    lora = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(3))
    lora = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape, x.dtype), lora
    )
    out = tmp_path / "peft"
    lora_mod.save_peft_adapter(lora, lcfg, str(out))

    from safetensors import safe_open

    f = safe_open(str(out / "adapter_model.safetensors"), framework="numpy")
    keys = set(f.keys())
    assert ("base_model.model.encoder.block.0.layer.0.SelfAttention.q"
            ".lora_A.weight") in keys
    assert ("base_model.model.decoder.block.0.layer.1.EncDecAttention.q"
            ".lora_A.weight") in keys
    assert not any("encoder" in k and "EncDecAttention" in k for k in keys)
    with open(out / "adapter_config.json") as f2:
        assert json.load(f2)["task_type"] == "SEQ_2_SEQ_LM"

    back, bcfg = lora_mod.load_peft_adapter(str(out), params)
    assert set(back["encoder"]) == {"q", "v"}
    assert set(back["decoder"]) == {"q", "v", "cq"}
    for sub in ("encoder", "decoder"):
        for t, ab in back[sub].items():
            np.testing.assert_allclose(np.asarray(ab["a"]),
                                       np.asarray(lora[sub][t]["a"]), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(ab["b"]),
                                       np.asarray(lora[sub][t]["b"]), rtol=1e-6)


def test_save_peft_adapter_loads_in_hf_peft(tmp_path, tiny_model):
    """Gold interop check: the exported directory loads through the REAL
    `peft` library onto a shape-matched HF Llama, and the loaded lora_A/B
    tensors equal ours (transposed to torch layout). This is the exact
    consumption path of the reference's vLLM runner (LoRARequest resolves
    a PEFT dir, run_setwise.py:121-127)."""
    import torch
    from peft import PeftModel
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg, params = tiny_model
    lcfg = lora_mod.LoraConfig(r=4, alpha=8, targets=("wq", "wv"))
    lora = lora_mod.init_lora(params, lcfg, jax.random.PRNGKey(3))
    lora = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(11), x.shape, x.dtype), lora
    )
    out = tmp_path / "peft"
    lora_mod.save_peft_adapter(lora, lcfg, str(out))

    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim_,
    ))
    peft_model = PeftModel.from_pretrained(hf, str(out))
    q0 = peft_model.base_model.model.model.layers[0].self_attn.q_proj
    np.testing.assert_allclose(
        q0.lora_A["default"].weight.detach().to(torch.float32).numpy(),
        np.asarray(lora["wq"]["a"][0]).T, rtol=1e-6,
    )
    np.testing.assert_allclose(
        q0.lora_B["default"].weight.detach().to(torch.float32).numpy(),
        np.asarray(lora["wq"]["b"][0]).T, rtol=1e-6,
    )
    assert peft_model.peft_config["default"].lora_alpha == 8


def test_grpo_grouped_prefill_matches_replicated(tiny_model):
    """The grouped sample program (prefill unique prompts once, expand
    the cache G-fold) must emit the same rollouts as prefilling G
    replicated copies (the pre-optimization path, emulated by G=1 over
    pre-expanded rows)."""
    import jax
    import jax.numpy as jnp

    cfg, params = tiny_model
    mesh = mesh_mod.make_mesh(1, 1)
    tok = ByteTokenizer(cfg.vocab_size)
    gcfg = GRPOConfig(num_generations=4, max_completion_length=8,
                      max_prompt_length=64,
                      lora=lora_mod.LoraConfig(r=2, alpha=4))
    tr = GRPOTrainer(cfg, params, tok, gcfg, mesh,
                     reward_fn=lambda c, g: [0.0] * len(c))
    rows = [list(range(2, 40)), list(range(5, 50))]
    L, T, G = 64, 8, 4
    uids, umask = tr._pad_left(rows, L)
    rep_ids = jnp.repeat(uids, G, axis=0)
    rep_mask = jnp.repeat(umask, G, axis=0)
    rng = jax.random.PRNGKey(929)
    with mesh:
        grouped = np.asarray(tr._sample_fn(L, T, G)(tr.lora, uids, umask, rng))
        flat = np.asarray(tr._sample_fn(L, T, 1)(tr.lora, rep_ids, rep_mask, rng))
    np.testing.assert_array_equal(grouped, flat)


def test_lr_schedule_warmup_decay():
    """WarmupDecayLR semantics: 0 -> lr over warmup_steps, then linear
    to 0 at total_steps; warmup_steps=0 keeps a constant LR."""
    from llmrankers_tpu.train.grpo import GRPOConfig, lr_schedule

    const = lr_schedule(GRPOConfig(learning_rate=2e-5))
    assert const == 2e-5
    sched = lr_schedule(GRPOConfig(learning_rate=1e-5, warmup_steps=10,
                                   total_steps=110))
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5e-5) < 1e-12
    assert abs(float(sched(10)) - 1e-5) < 1e-12
    assert abs(float(sched(60)) - 0.5e-5) < 1e-12
    assert float(sched(110)) <= 1e-12


def test_grpo_trains_with_warmup(tiny_model):
    cfg, params = tiny_model
    mesh = mesh_mod.make_mesh(1, 1)
    tok = ByteTokenizer(cfg.vocab_size)
    gcfg = GRPOConfig(num_generations=2, max_completion_length=4,
                      max_prompt_length=32, warmup_steps=2, total_steps=4,
                      lora=lora_mod.LoraConfig(r=2, alpha=4))
    tr = GRPOTrainer(cfg, params, tok, gcfg, mesh,
                     reward_fn=lambda c, g: [float(i % 2) for i in range(len(c))])
    prompts = [[{"role": "user", "content": "pick"}]]
    m = tr.train_step(prompts, ["[1]"])
    assert np.isfinite(m["loss"])


def test_lr_schedule_rejects_degenerate_total():
    import pytest

    from llmrankers_tpu.train.grpo import GRPOConfig
    from llmrankers_tpu.train.schedule import lr_schedule
    from llmrankers_tpu.train.sft import lr_schedule as sft_sched

    assert sft_sched is lr_schedule  # single shared definition
    with pytest.raises(ValueError, match="total_steps"):
        lr_schedule(GRPOConfig(warmup_steps=10, total_steps=0))
    with pytest.raises(ValueError, match="total_steps"):
        lr_schedule(GRPOConfig(warmup_steps=10, total_steps=10))
