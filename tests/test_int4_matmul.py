"""Pallas W4A8 int4 matmul kernel (ops/int4_matmul.py).

CPU runs the kernel in interpreter mode (same dataflow, no Mosaic);
on-TPU numerics + throughput are exercised by bench.py's int4 section.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.ops.int4_matmul import (
    choose_group,
    pack_int4,
    quantized_matmul_int4,
    unpack_int4,
)


def test_choose_group():
    assert choose_group(1024) == 512
    assert choose_group(768) == 256
    assert choose_group(128) == 128
    assert choose_group(100) == 0
    assert choose_group(192) == 0  # 192 = 64*3: no 128-multiple divisor


@pytest.mark.quick
def test_pack_unpack_roundtrip_error_bound():
    """unpack(pack(w)) is within one int4 quantization step of w, per
    (k-group, output-channel): |err| <= group_amax / 7 / 2 + eps."""
    rng = np.random.RandomState(0)
    K, N = 256, 128
    w = (rng.randn(K, N) * rng.rand(1, N) * 3).astype(np.float32)
    packed, scales = pack_int4(jnp.asarray(w))
    assert packed.shape == (K // 2, N) and packed.dtype == jnp.int8
    G = choose_group(K)
    assert scales.shape == (K // G, N)
    back = np.asarray(unpack_int4(packed, scales))
    amax = np.abs(w.reshape(K // G, G, N)).max(axis=1, keepdims=True)
    bound = np.broadcast_to(amax / 7.0 * 0.5 + 1e-6, (K // G, G, N))
    err = np.abs(back - w).reshape(K // G, G, N)
    assert (err <= bound).all()


def test_pack_unpack_exact_on_grid():
    """Weights already on the int4 grid (k * scale, k in [-7,7]) survive
    pack -> unpack bit-exactly, including negative high AND low nibbles."""
    rng = np.random.RandomState(1)
    K, N = 128, 128
    q = rng.randint(-7, 8, (K, N)).astype(np.float32)
    # force the full range into every column so scale = amax/7 = 1
    q[0, :] = 7.0
    packed, scales = pack_int4(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(scales), 1.0)
    back = np.asarray(unpack_int4(packed, scales))
    np.testing.assert_allclose(back, q, atol=1e-6)


def test_stacked_leading_dims():
    """pack/unpack over a stacked [L, K, N] leaf (the layer-scan layout)."""
    rng = np.random.RandomState(2)
    w = rng.randn(3, 256, 128).astype(np.float32)
    packed, scales = pack_int4(jnp.asarray(w))
    assert packed.shape == (3, 128, 128)
    assert scales.shape == (3, 1, 128)
    back = np.asarray(unpack_int4(packed, scales))
    assert back.shape == w.shape
    assert np.abs(back - w).max() <= np.abs(w).max() / 7.0


def test_kernel_matches_xla_unpack_reference():
    """The fused-quantize W4A8 kernel (interpret mode) matches the exact
    emulation: int8-quantized activations (per row, per k-group) times
    the dequantized int4 weights. M=200 exercises the pad-to-bm path."""
    rng = np.random.RandomState(3)
    M, K, N = 200, 512, 384
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32)
    packed, scales = pack_int4(jnp.asarray(w))
    got = np.asarray(
        quantized_matmul_int4(
            jnp.asarray(x), packed, scales, interpret=True
        )
    )
    # exact emulation of the kernel's math
    G = K // scales.shape[0]
    xg = x.reshape(M, K // G, G)
    amax = np.maximum(np.abs(xg).max(axis=2, keepdims=True), 1e-8)
    sx = amax / 127.0
    q = np.clip(np.round(xg / sx), -127, 127)
    wq = np.asarray(unpack_int4(packed, scales)).reshape(K // G, G, N)
    ref = np.einsum("mkg,kgn->mn", q * sx, wq)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


def test_kernel_residual_fusion():
    rng = np.random.RandomState(4)
    M, K, N = 64, 128, 128
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32)
    r = rng.randn(M, N).astype(np.float32)
    packed, scales = pack_int4(jnp.asarray(w))
    base = np.asarray(
        quantized_matmul_int4(jnp.asarray(x), packed, scales, interpret=True)
    )
    fused = np.asarray(
        quantized_matmul_int4(
            jnp.asarray(x), packed, scales, residual=jnp.asarray(r),
            interpret=True,
        )
    )
    np.testing.assert_allclose(fused, base + r, rtol=1e-4, atol=1e-4)


def test_kernel_error_bound_vs_fp32():
    """W4A8 vs fp32 on gaussian data. int4's grid step at G=128 is
    ~amax/7 ~ 0.45 sigma, so per-dot error std is ~13% of the dot's std
    regardless of K (both grow as sqrt(K)); the Frobenius-relative
    error lands there and the max-relative a bit above. This test pins
    the MAGNITUDE of the quantization noise (so a packing regression
    that, say, drops a nibble shows up as ~2x the bound); ranking
    fidelity is pinned by the forward/cosine tests below."""
    rng = np.random.RandomState(5)
    M, K, N = 96, 128, 256
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32)
    packed, scales = pack_int4(jnp.asarray(w))
    got = np.asarray(
        quantized_matmul_int4(jnp.asarray(x), packed, scales, interpret=True)
    )
    ref = x @ w
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.16, rel
    relmax = np.abs(got - ref).max() / np.abs(ref).max()
    assert relmax < 0.25, relmax


def test_pack_rejects_bad_k():
    with pytest.raises(ValueError, match="divisible"):
        pack_int4(jnp.zeros((100, 128)))


def test_decoder_forward_int4_kernel_matches_bf16():
    """Full decoder forward through the W4A8 kernel path (interpret on
    CPU): next-token winners match the unquantized forward and hidden
    logits stay close. 128-multiple dims so every site packs."""
    from llmrankers_tpu.models import decoder as dec_mod
    from llmrankers_tpu.models import quant as quant_mod
    from llmrankers_tpu.models.config import DecoderConfig

    # 128-multiple input dims so every site packs (tiny() is 64-wide)
    cfg = DecoderConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    # min_site_params=0: tiny sites would otherwise take the int8 path
    # (the production threshold routes only FFN-sized sites to int4)
    qp = quant_mod.quantize_decoder_params_int4(params, min_site_params=0)
    layers = qp["layers"]
    for name in quant_mod.QUANT_TARGETS:
        assert (name + quant_mod.SCALE4_SUFFIX) in layers, name
        assert layers[name].dtype == jnp.int8
    assert quant_mod.is_quantized(qp)

    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 512)
    mask = jnp.ones_like(ids)
    ref = np.asarray(dec_mod.forward(params, cfg, ids, mask)[:, -1])
    # XLA unpack fallback (int4_kernel=False)
    got_xla = np.asarray(dec_mod.forward(qp, cfg, ids, mask)[:, -1])
    # mixed-precision dispatch: at qwen-like dims the FFN packs int4
    # while attention projections stay int8
    qm = quant_mod.quantize_decoder_params_int4(
        {"layers": {"wq": jnp.zeros((2, 2048, 2048)),
                    "w_up": jnp.zeros((2, 2048, 11008))}}
    )["layers"]
    assert "wq_scale" in qm and "wq_scale4" not in qm
    assert "w_up_scale4" in qm
    # Pallas kernel path (interpret on CPU)
    cfg_k = dataclasses.replace(cfg, int4_kernel=True)
    got_k = np.asarray(dec_mod.forward(qp, cfg_k, ids, mask)[:, -1])

    # kernel vs XLA fallback agree tightly (same int4 weights; kernel
    # only adds A8 quantization of activations)
    cos_paths = (got_xla * got_k).sum() / (
        np.linalg.norm(got_xla) * np.linalg.norm(got_k) + 1e-9
    )
    assert cos_paths > 0.999, cos_paths
    # int4 tracks bf16 logits. Random gaussian weights are the WORST
    # case for int4 (relative grid step ~0.45 sigma, no outlier
    # structure to absorb; measured cos ~0.92 here vs >0.99 reported
    # for trained 3B checkpoints) — the bound guards against packing
    # regressions (nibble swap => cos ~0), not ranking fidelity.
    cos = (ref * got_k).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(got_k) + 1e-9
    )
    assert cos > 0.9, cos
    # ...and preserves every CLEAR winner. A tiny random model's logits
    # are near-uniform, so unconditional argmax equality is noise, not
    # signal: require it only where bf16's top-2 margin exceeds the
    # measured per-row int4 noise (the ranking-decision criterion — a
    # label choice flips only when the margin is inside the noise).
    noise = np.abs(got_k - ref).max(axis=-1)
    top2 = np.sort(ref, axis=-1)
    margin = top2[:, -1] - top2[:, -2]
    clear = margin > 2 * noise
    assert (
        ref.argmax(-1)[clear] == got_k.argmax(-1)[clear]
    ).all()


def test_generate_int4_engine_wiring():
    """quantize='int4' through the engine end to end: params pack, the
    prefill/decode path runs on them, and the engine's first greedy
    token equals a direct forward-argmax of the SAME quantized params
    (bf16 token parity is not meaningful at int4 on a tiny random
    model — the decision-parity battery in bench.py covers that with
    real margins)."""
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import decoder as dec_mod
    from llmrankers_tpu.models import quant as quant_mod
    from llmrankers_tpu.models.config import DecoderConfig

    cfg = DecoderConfig(
        vocab_size=384, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(7),
                                 dtype=jnp.float32)
    tok = ByteTokenizer(cfg.vocab_size)
    eng4 = ScoringEngine("decoder", cfg, params, tok, quantize="int4")
    assert quant_mod.is_quantized(eng4.params)
    assert eng4.params["layers"]["wq"].dtype == jnp.int8

    rows = [list(range(2, 40)), list(range(3, 52))]
    out4, n4 = eng4.generate(rows, 4)
    assert len(out4) == 2 and all(n >= 1 for n in n4)
    # deterministic
    again, _ = eng4.generate(rows, 4)
    assert out4 == again
    # quantize='int4' == handing the engine pre-packed params: the flag
    # is exactly quantize_decoder_params_int4 and nothing else
    pre = jax.jit(quant_mod.quantize_decoder_params_int4)(params)
    eng_pre = ScoringEngine("decoder", cfg, pre, tok)
    out_pre, _ = eng_pre.generate(rows, 4)
    assert out4 == out_pre


def test_int4_on_mesh_xla_fallback():
    """quantize='int4' on a (2,2) GSPMD mesh: packed leaves shard on
    the output dim only (parallel/mesh.py pspecs — input-dim sharding
    would split nibble-pack k-groups) and scoring runs via the XLA
    unpack fallback."""
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import decoder as dec_mod
    from llmrankers_tpu.models.config import DecoderConfig
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg = DecoderConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    from llmrankers_tpu.models import quant as quant_mod

    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(cfg.vocab_size)
    mesh = mesh_mod.make_mesh(2, 2)
    # pre-pack with min_site_params=0 so the mesh pspecs see real
    # scale4 leaves (the engine's threshold would int8 a tiny model)
    qp = quant_mod.quantize_decoder_params_int4(params, min_site_params=0)
    assert any(k.endswith("_scale4") for k in qp["layers"])
    q4 = ScoringEngine("decoder", cfg, qp, tok, mesh=mesh)
    assert not q4.cfg.int4_kernel  # mesh: XLA fallback path
    rows = [list(range(2, 64)) for _ in range(4)]
    out = q4.score_labels(rows, [5, 6])
    assert np.all(np.isfinite(out))
    # mesh path agrees with the single-device XLA fallback
    q4s = ScoringEngine("decoder", cfg, qp, tok)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(q4s.score_labels(rows, [5, 6])),
        rtol=2e-2, atol=2e-2,
    )


def test_int4_rejects_t5_and_lora():
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="int4"):
        ScoringEngine("t5", cfg, params, ByteTokenizer(), quantize="int4")


@pytest.mark.quick
def test_int4_kernel_mesh_col_matches_single():
    """W4A8 kernel under shard_map (VERDICT r4 #2): column-parallel —
    packed weight + group scales shard on N over 'model'. Group packing
    pins the input dim, so col is the only mesh layout (the pspecs in
    parallel/mesh.py shard every int4 leaf on the output dim)."""
    from llmrankers_tpu.ops.int4_matmul import (
        pack_int4, quantized_matmul_int4,
    )
    from llmrankers_tpu.parallel import mesh as mesh_mod

    rng = np.random.RandomState(7)
    M, K, N = 64, 256, 512
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.05)
    p4, s4 = pack_int4(w)
    res = jnp.asarray(rng.randn(M, N).astype(np.float32) * 0.1)
    single = quantized_matmul_int4(x, p4, s4, residual=res, interpret=True)
    for shape in ((1, 2), (2, 2), (2, 4)):
        mesh = mesh_mod.make_mesh(
            *shape, devices=jax.devices()[: shape[0] * shape[1]]
        )
        got = quantized_matmul_int4(x, p4, s4, residual=res, interpret=True,
                                    mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(single), rtol=1e-5, atol=1e-5,
            err_msg=str(shape),
        )
