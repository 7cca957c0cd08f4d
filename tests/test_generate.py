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


def test_chunked_decode_matches_single_scan():
    """Chunked decode (prefill + N chunk scans with carried cache) must
    produce exactly the tokens of the single full-length scan."""
    model, cfg, params = _hf_llama("llama")
    rng = np.random.RandomState(7)
    B, L, T = 2, 8, 12
    ids = rng.randint(2, 500, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    logits, cache = gen_mod.decoder_prefill(params, cfg, ids_j, mask_j, T)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    want = np.asarray(
        gen_mod.decoder_greedy_decode(params, cfg, first, cache, L, T, cfg.eos_token_id)
    )

    logits, cache = gen_mod.decoder_prefill(params, cfg, ids_j, mask_j, T)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    pieces = []
    tok, done = first, None
    for off in (0, 4, 8):
        out, (tok, cache, done) = gen_mod.decoder_decode_chunk(
            params, cfg, tok, cache, L, off, 4, cfg.eos_token_id, done=done
        )
        pieces.append(np.asarray(out))
    got = np.concatenate(pieces, axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.quick
def test_engine_chunked_stop_string():
    """Engine-level chunked generation stops early on a stop string."""
    import jax

    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import decoder as dec_mod
    from llmrankers_tpu.models.config import DecoderConfig

    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    eng = ScoringEngine("decoder", cfg, params, ByteTokenizer(cfg.vocab_size),
                        len_buckets=(64,), batch_buckets=(4,))
    rows = [eng.tokenizer.encode(f"prompt {i}", add_special_tokens=False)
            for i in range(3)]
    # (Exact token parity of chunked vs single-scan decode is proven at
    # the gen_mod level above; with random weights the engine's separate
    # jit boundaries can flip near-tie argmaxes, so here we verify the
    # chunking/early-stop machinery itself.)
    chunked, ntoks = eng.generate(rows, 32, chunk_tokens=8)
    assert len(chunked) == 3 and all(t <= 32 for t in ntoks)

    # Early stop: a stop string the model emits in its first chunk must
    # terminate the loop before the full budget.
    calls = {"n": 0}
    orig = eng._get_jit

    def counting(name, *key):
        if name == "dec_chunk":
            calls["n"] += 1
        return orig(name, *key)

    eng._get_jit = counting
    probe, _ = eng.generate(rows[:1], 8, chunk_tokens=8)
    stop = probe[0][:2]
    texts, _ = eng.generate(rows[:1], 64, chunk_tokens=8, stop_strings=(stop,))
    assert texts[0].endswith(stop)
    eng._get_jit = orig
