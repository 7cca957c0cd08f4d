"""Flash-attention kernel correctness vs the XLA reference path.

Runs the Pallas kernel in interpreter mode on CPU (same numerics as the
compiled TPU kernel, minus layout) across the mask/bias/causal matrix the
models use: encoder self-attn (bias + right padding), decoder self-attn
(bias + causal), cross-attn (padding only), decoder-only (causal + left
padding), plus shape-padding edge cases.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.ops import attention, flash


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # Force interpreter mode so the kernel runs on CPU.
    orig = flash.pl.pallas_call
    monkeypatch.setattr(
        flash.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    # flash_mha is jitted with a cache — bypass it to pick up the patch.
    monkeypatch.setattr(flash, "flash_mha", flash.flash_mha.__wrapped__)


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _compare(q, k, v, **kw):
    want = attention.mha(q, k, v, **kw)
    got = flash.flash_mha(
        q, k, v,
        kv_mask=kw.get("kv_mask"),
        causal=kw.get("causal", False),
        bias=kw.get("bias"),
        scale=kw.get("scale", 1.0),
        block_q=64,
        block_k=128,
    )
    valid_q = np.ones(q.shape[2], bool)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.quick
def test_flash_plain():
    B, H, L, D = 2, 3, 128, 64
    _compare(_rand((B, H, L, D), 0), _rand((B, H, L, D), 1), _rand((B, H, L, D), 2),
             scale=0.125)


def test_flash_bias_and_padding():
    B, H, L, D = 2, 4, 192, 32  # L not a tile multiple -> padding path
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) * 2.0
    kv_mask = jnp.asarray(np.r_[np.ones((1, L)), np.r_[np.ones(100), np.zeros(L - 100)][None]],
                          jnp.int32)
    _compare(q, k, v, bias=bias, kv_mask=kv_mask, scale=1.0)


def test_flash_causal_bias():
    B, H, L, D = 1, 2, 256, 64
    q, k, v = (_rand((B, H, L, D), i + 10) for i in range(3))
    bias = _rand((1, H, L, L), 11)
    _compare(q, k, v, bias=bias, causal=True, scale=1.0)


def test_flash_left_padding_causal():
    B, H, L, D = 3, 2, 128, 64
    q, k, v = (_rand((B, H, L, D), i + 20) for i in range(3))
    kv_mask = np.ones((B, L), np.int32)
    kv_mask[1, :50] = 0  # left padding
    # Compare only rows attending to >=1 valid key (fully-masked rows are
    # garbage in both paths but flash emits zeros, XLA emits uniform avg).
    want = attention.mha(q, k, v, kv_mask=jnp.asarray(kv_mask), causal=True,
                         scale=0.125)
    got = flash.flash_mha(q, k, v, kv_mask=jnp.asarray(kv_mask), causal=True,
                          scale=0.125, block_q=64, block_k=128)
    w, g = np.asarray(want), np.asarray(got)
    np.testing.assert_allclose(g[0], w[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g[2], w[2], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g[1][:, 50:], w[1][:, 50:], rtol=2e-5, atol=2e-5)
    # Fully-masked causal+pad rows: flash yields exact zeros (no NaN).
    assert np.all(np.isfinite(g))


def test_flash_cross_attention_rect():
    B, H, Lq, Lk, D = 2, 2, 64, 320, 64
    q = _rand((B, H, Lq, D), 30)
    k = _rand((B, H, Lk, D), 31)
    v = _rand((B, H, Lk, D), 32)
    kv_mask = np.ones((B, Lk), np.int32)
    kv_mask[0, 200:] = 0
    _compare(q, k, v, kv_mask=jnp.asarray(kv_mask), scale=1.0)


def test_t5_forward_flash_matches_xla():
    """Whole-model check: encode() with use_flash on == off."""
    import dataclasses

    from llmrankers_tpu.models import t5
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 500, (2, 100)))
    mask = np.ones((2, 100), np.int32)
    mask[0, 80:] = 0
    mask = jnp.asarray(mask)
    base = t5.encode(params, cfg, ids, mask)
    cfg_f = dataclasses.replace(cfg, use_flash=True)
    flashed = t5.encode(params, cfg_f, ids, mask)
    np.testing.assert_allclose(
        np.asarray(flashed)[0, :80], np.asarray(base)[0, :80], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(flashed)[1], np.asarray(base)[1], rtol=2e-4, atol=2e-4
    )


def test_flash_shard_map_tp_matches_single():
    """Kernel under shard_map on a 2x2 (dp x tp) mesh == unsharded kernel.

    This is the config the engine now runs on multi-chip meshes (heads
    sharded on 'model', batch on 'data'); replaces the reference's
    delegation to vLLM's TP attention (Rank-R1/run_setwise.py:121-126).
    """
    from llmrankers_tpu.parallel import mesh as mesh_mod

    B, H, L, D = 4, 4, 192, 32
    q, k, v = (_rand((B, H, L, D), i + 40) for i in range(3))
    bias = _rand((1, H, L, L), 44)
    kv_mask = np.ones((B, L), np.int32)
    kv_mask[1, 100:] = 0
    kv_mask = jnp.asarray(kv_mask)

    single = flash.flash_mha(q, k, v, kv_mask=kv_mask, bias=bias, scale=1.0,
                             block_q=64, block_k=128)
    mesh = mesh_mod.make_mesh(2, 2)
    sharded = flash.flash_mha(q, k, v, kv_mask=kv_mask, bias=bias, scale=1.0,
                              block_q=64, block_k=128, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=2e-5, atol=2e-5
    )
    # And against the XLA reference path.
    want = attention.mha(q, k, v, kv_mask=kv_mask, bias=bias, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_engine_tp_uses_flash_mesh():
    """ScoringEngine on a >1-device mesh forwards the mesh to the config
    when flash is forced on (use_flash='on')."""
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    mesh = mesh_mod.make_mesh(1, 2)
    eng = ScoringEngine("t5", cfg, params, ByteTokenizer(cfg.vocab_size),
                        mesh=mesh, use_flash="on")
    assert eng.cfg.use_flash
    assert eng.cfg.flash_mesh is mesh

    # Scoring through the engine must run and produce finite label logits.
    rows = [list(range(2, 150)) for _ in range(4)]
    out = eng.score_labels(rows, label_ids=[5, 6], decoder_prefix=[0])
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_causal_rect_unequal_padding():
    """Causal with Lk > Lq where sequence padding differs per side.

    This is the shared-prefix prefill shape (engine/generate.py::
    decoder_shared_prefill): queries are the suffix block, keys are
    prefix + suffix. The causal diagonal offset must come from the TRUE
    lengths — with Lq=64 (no q padding) and Lk=88 (padded to 128), a
    padded-length offset of 64 instead of 24 would let suffix tokens
    attend up to 40 positions into the future.
    """
    B, H, Lq, Lk, D = 2, 2, 64, 88, 32
    q = _rand((B, H, Lq, D), 50)
    k = _rand((B, H, Lk, D), 51)
    v = _rand((B, H, Lk, D), 52)
    _compare(q, k, v, causal=True, scale=0.125)

    # A second shape where BOTH sides pad but by different amounts
    # (Lq 256 -> 256, Lk 272 -> 384 with 128-wide k tiles).
    Lq, Lk = 256, 272
    q = _rand((B, H, Lq, D), 53)
    k = _rand((B, H, Lk, D), 54)
    v = _rand((B, H, Lk, D), 55)
    kv_mask = np.ones((B, Lk), np.int32)
    kv_mask[0, 260:] = 0
    _compare(q, k, v, kv_mask=jnp.asarray(kv_mask), causal=True, scale=1.0)


# ---------------------------------------------------------------------------
# blhd layout (flash_mha_blhd): transpose-free [B, L, H*Dh] attention
# ---------------------------------------------------------------------------
@pytest.fixture
def _interpret_blhd(monkeypatch):
    orig = flash.pl.pallas_call
    monkeypatch.setattr(
        flash.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(
        flash, "flash_mha_blhd", flash.flash_mha_blhd.__wrapped__
    )


@pytest.mark.parametrize("case", ["plain", "bias", "kvmask", "causal",
                                  "bias_kvmask"])
def test_flash_blhd_matches_xla(case, _interpret_blhd):
    """The head-group blhd kernel must reproduce the XLA path across the
    same mask/bias matrix as the bhld kernel, on the flat [B, L, H*Dh]
    layout (H=4, Dh=64 -> head group hg=2)."""
    B, L, H, Dh = 2, 256, 4, 64
    q = _rand((B, L, H * Dh), 0)
    k = _rand((B, L, H * Dh), 1)
    v = _rand((B, L, H * Dh), 2)
    kw = {}
    if case in ("kvmask", "bias_kvmask"):
        m = np.ones((B, L), np.int32)
        m[0, -40:] = 0
        m[1, -7:] = 0
        kw["kv_mask"] = jnp.asarray(m)
    if case in ("bias", "bias_kvmask"):
        kw["bias"] = _rand((1, H, L, L), 3)
    if case == "causal":
        kw["causal"] = True

    got = flash.flash_mha_blhd(q, k, v, H, scale=1.0, **kw)

    def split(x):
        return x.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)

    want = attention.mha(split(q), split(k), split(v), scale=1.0, **kw)
    want = want.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_flat_dispatch(monkeypatch):
    """mha_flat: flash only when the head-group constraint holds; the
    XLA fallback is numerically identical either way."""
    from llmrankers_tpu.ops.attention import mha_flat

    B, L, H, Dh = 2, 64, 4, 16  # H*Dh=64 < 128: flash ineligible
    q = _rand((B, L, H * Dh), 5)
    k = _rand((B, L, H * Dh), 6)
    v = _rand((B, L, H * Dh), 7)
    out = mha_flat(q, k, v, H, use_flash=True)  # must not try the kernel
    assert out.shape == (B, L, H * Dh)
    out2 = mha_flat(q, k, v, H, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_flash_blhd_shard_map_tp_matches_single(_interpret_blhd):
    """blhd kernel under shard_map on a 2x2 (dp x tp) mesh == unsharded:
    the flat H*Dh axis shards over 'model' exactly like the qkv
    projection outputs (t5 TP layout), so the kernel stays local."""
    from llmrankers_tpu.parallel import mesh as mesh_mod

    B, L, H, Dh = 4, 192, 4, 64
    q, k, v = (_rand((B, L, H * Dh), i + 50) for i in range(3))
    bias = _rand((1, H, L, L), 54)
    kv_mask = np.ones((B, L), np.int32)
    kv_mask[1, 100:] = 0
    kv_mask = jnp.asarray(kv_mask)

    single = flash.flash_mha_blhd(q, k, v, H, kv_mask=kv_mask, bias=bias,
                                  scale=1.0, block_q=64, block_k=128)
    mesh = mesh_mod.make_mesh(2, 2)
    sharded = flash.flash_mha_blhd(q, k, v, H, kv_mask=kv_mask, bias=bias,
                                   scale=1.0, block_q=64, block_k=128,
                                   mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=2e-5, atol=2e-5
    )


# ---------------------------------------------------------------------------
# packed layout (flash_mha_packed): q/k/v as index-mapped views of one array
# ---------------------------------------------------------------------------
@pytest.fixture
def _interpret_packed(monkeypatch):
    orig = flash.pl.pallas_call
    monkeypatch.setattr(
        flash.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(
        flash, "flash_mha_packed", flash.flash_mha_packed.__wrapped__
    )
    monkeypatch.setattr(
        flash, "flash_mha_blhd", flash.flash_mha_blhd.__wrapped__
    )


@pytest.mark.parametrize("case", ["plain", "bias", "kvmask", "causal",
                                  "bias_kvmask"])
def test_flash_packed_matches_blhd(case, _interpret_packed):
    """flash_mha_packed must equal flash_mha_blhd on the sliced views —
    the packed form only changes how tiles are addressed."""
    B, L, H, Dh = 2, 256, 4, 64
    HD = H * Dh
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(B, L, 3 * HD).astype(np.float32) * 0.3)
    kv_mask = None
    bias = None
    causal = case == "causal"
    if "kvmask" in case:
        m = np.ones((B, L), np.int32)
        m[0, 200:] = 0
        kv_mask = jnp.asarray(m)
    if "bias" in case:
        bias = jnp.asarray(rng.randn(1, H, L, L).astype(np.float32) * 0.1)
    ref = flash.flash_mha_blhd(
        qkv[..., :HD], qkv[..., HD:2 * HD], qkv[..., 2 * HD:], H,
        kv_mask=kv_mask, causal=causal, bias=bias, scale=0.5,
    )
    got = flash.flash_mha_packed(
        qkv, H, kv_mask=kv_mask, causal=causal, bias=bias, scale=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_packed_unaligned_length(_interpret_packed):
    """L=200 forces sequence padding inside the packed kernel; padded
    keys must be masked and padded queries sliced off."""
    B, L, H, Dh = 2, 200, 4, 64
    HD = H * Dh
    rng = np.random.RandomState(8)
    qkv = jnp.asarray(rng.randn(B, L, 3 * HD).astype(np.float32) * 0.3)
    ref = flash.flash_mha_blhd(
        qkv[..., :HD], qkv[..., HD:2 * HD], qkv[..., 2 * HD:], H, scale=0.5,
    )
    got = flash.flash_mha_packed(qkv, H, scale=0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_gqa_native_kv_heads():
    """K/V with fewer (KV) heads than q: the kernel's h//G index map must
    reproduce the repeated-KV reference exactly (causal + left padding +
    GQA is the decoder-prefill configuration)."""
    B, H, KV, L, D = 2, 8, 2, 128, 64
    q = _rand((B, H, L, D), 60)
    k = _rand((B, KV, L, D), 61)
    v = _rand((B, KV, L, D), 62)
    kv_mask = np.ones((B, L), np.int32)
    kv_mask[1, :30] = 0  # left padding
    kv_mask = jnp.asarray(kv_mask)
    rep = H // KV
    want = attention.mha(
        q, jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1),
        kv_mask=kv_mask, causal=True, scale=0.125,
    )
    got = flash.flash_mha(q, k, v, kv_mask=kv_mask, causal=True,
                          scale=0.125, block_q=64, block_k=128)
    w, g = np.asarray(want), np.asarray(got)
    np.testing.assert_allclose(g[0], w[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g[1][:, 30:], w[1][:, 30:],
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.isfinite(g))
