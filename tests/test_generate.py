"""Greedy-generation parity: our KV-cache scan decode vs HF generate."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llmrankers_tpu.engine import generate as gen_mod
from llmrankers_tpu.models import config as cfgmod

from test_models import _hf_llama, _hf_t5


def test_t5_greedy_matches_hf():
    model, cfg, params = _hf_t5()
    rng = np.random.RandomState(3)
    B, L = 4, 12
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[2, 9:] = 0
    ids[2, 9:] = 0
    prefix = np.asarray([[cfg.decoder_start_token_id, 7]] * B)  # 2-token prefix

    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(prefix),
            max_new_tokens=6,
            do_sample=False,
            num_beams=1,
        ).numpy()[:, prefix.shape[1]:]

    got = np.asarray(
        gen_mod.t5_greedy_generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(prefix), 6
        )
    )
    # HF stops the whole batch when all rows hit EOS; compare up to the
    # shorter length, and treat post-EOS tokens as padding on both sides.
    T = min(got.shape[1], want.shape[1])
    for b in range(B):
        for t in range(T):
            assert got[b, t] == want[b, t], (b, t, got[b], want[b])
            if want[b, t] == cfg.eos_token_id:
                break


@pytest.mark.parametrize("kind", ["llama", "qwen2"])
def test_decoder_greedy_matches_hf(kind):
    model, cfg, params = _hf_llama(kind)
    rng = np.random.RandomState(4)
    B, L = 3, 10
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    # Left padding, as the engine pads decoder-only prompts.
    mask[1, :4] = 0
    ids[1, :4] = 0

    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            max_new_tokens=6,
            do_sample=False,
            num_beams=1,
            pad_token_id=0,
        ).numpy()[:, L:]

    logits, cache = gen_mod.decoder_prefill(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), 6
    )
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    got = np.asarray(
        gen_mod.decoder_greedy_decode(params, cfg, first, cache, L, 6, cfg.eos_token_id)
    )
    T = min(got.shape[1], want.shape[1])
    for b in range(B):
        for t in range(T):
            assert got[b, t] == want[b, t], (b, t, got[b], want[b])
            if want[b, t] == cfg.eos_token_id:
                break
