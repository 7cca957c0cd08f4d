"""Fused quantized-KV decode attention kernel (ops/kvq_attention.py).

Parity against the XLA reference path (engine/generate.py::_cached_qk /
_cached_pv + joint-softmax self term) in interpret mode, plus end-to-end
generate() equivalence with the kernel forced on (it runs interpreted on
CPU — same math, Mosaic-free).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmrankers_tpu.engine import generate as gen
from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig
from llmrankers_tpu.ops.kvq_attention import kvq_decode_attention


def _xla_reference(qg, kcl, vcl, k_new, v_new, amask, scale, mode):
    dtype = qg.dtype
    s = gen._cached_qk(qg, kcl, dtype, mode, "bkgd,bktd->bkgt") * scale
    s = jnp.where(amask[:, None, None, :], s, gen.NEG_INF)
    s_self = jnp.einsum(
        "bkgd,bkd->bkg", qg, k_new, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.maximum(jnp.max(s, axis=-1), s_self)
    p = jnp.exp(s - m[..., None])
    p_self = jnp.exp(s_self - m)
    z = p.sum(axis=-1) + p_self
    return (
        gen._cached_pv(p, vcl, dtype, mode, "bkgt,bktd->bkgd")
        + p_self[..., None] * v_new.astype(jnp.float32)[:, :, None, :]
    ) / z[..., None]


@pytest.mark.quick
@pytest.mark.parametrize("mode", ["int8", "int4"])
@pytest.mark.parametrize("T", [96, 512, 640])
def test_kernel_matches_xla_path(mode, T):
    B, KV, G, Dh = 3, 2, 4, 64
    rng = np.random.RandomState(0)
    qg = jnp.asarray(rng.randn(B, KV, G, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, KV, T, Dh) * 2.0, jnp.float32)
    v = jnp.asarray(rng.randn(B, KV, T, Dh) * 2.0, jnp.float32)
    k_new = jnp.asarray(rng.randn(B, KV, Dh), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, KV, Dh), jnp.float32)
    kcl = gen._kv_pack(k, mode)
    vcl = gen._kv_pack(v, mode)
    # Ragged validity incl. fully-padded tails.
    amask = np.zeros((B, T), bool)
    for b in range(B):
        amask[b, : T - 10 * b - 1] = True
    amask = jnp.asarray(amask)
    scale = Dh**-0.5

    want = _xla_reference(qg, kcl, vcl, k_new, v_new, amask, scale, mode)
    got = kvq_decode_attention(
        qg, kcl, vcl, k_new, v_new, amask, scale, mode, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_generate_with_kernel_forced(mode):
    """End-to-end generate() with kvq_kernel forced on (interpret mode on
    CPU): tokens match the XLA cached-attention path exactly."""
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(cfg.vocab_size)
    rng = np.random.RandomState(1)
    rows = [[int(t) for t in rng.randint(2, 258, 40 + 7 * i)]
            for i in range(3)]

    base = ScoringEngine("decoder", cfg, params, tok, kv_quantize=mode)
    kern = ScoringEngine("decoder", cfg, params, tok, kv_quantize=mode)
    kern.cfg = dataclasses.replace(kern.cfg, kvq_kernel=True)
    out_b = base.generate(rows, max_new_tokens=10, chunk_tokens=4)
    out_k = kern.generate(rows, max_new_tokens=10, chunk_tokens=4)
    assert out_k == out_b
