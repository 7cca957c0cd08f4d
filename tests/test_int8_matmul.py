"""Pallas W8A8 int8-MXU matmul kernel (ops/int8_matmul.py).

CPU runs the kernel in interpreter mode (same dataflow, no Mosaic);
on-TPU numerics + throughput are exercised by bench.py's int8 section.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.ops.int8_matmul import (
    int8_matmul,
    quantize_rows,
    quantized_matmul,
)


@pytest.mark.quick
def test_int8_matmul_exact_integer_math():
    """int8 x int8 -> int32 is exact; the f32 rescale is deterministic.
    M=200 exercises the pad-to-bm path (pad rows sliced off)."""
    rng = np.random.RandomState(0)
    M, K, N = 200, 256, 384
    x8 = rng.randint(-127, 128, (M, K)).astype(np.int8)
    w8 = rng.randint(-127, 128, (K, N)).astype(np.int8)
    sx = rng.rand(M, 1).astype(np.float32) * 0.1
    sw = rng.rand(1, N).astype(np.float32) * 0.1
    out = int8_matmul(
        jnp.asarray(x8), jnp.asarray(sx), jnp.asarray(w8), jnp.asarray(sw),
        out_dtype=jnp.float32, interpret=True,
    )
    ref = (x8.astype(np.int64) @ w8.astype(np.int64)).astype(np.float32)
    ref = ref * sx * sw
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(64, 128).astype(np.float32) * rng.rand(64, 1) * 10
    q, s = quantize_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    assert np.abs(back - x).max() <= np.abs(x).max(1).max() / 127 + 1e-6
    # zero rows stay finite
    q0, s0 = quantize_rows(jnp.zeros((4, 128)))
    assert np.all(np.asarray(q0) == 0) and np.all(np.isfinite(np.asarray(s0)))


def test_quantized_matmul_error_bound():
    """Dynamic per-row activation + per-channel weight int8: ~1% relative
    error on gaussian data."""
    rng = np.random.RandomState(2)
    M, K, N = 160, 256, 256
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32)
    amax = np.abs(w).max(axis=0, keepdims=True)
    sw = amax / 127.0
    w8 = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    got = quantized_matmul(
        jnp.asarray(x), jnp.asarray(w8), jnp.asarray(sw), interpret=True
    )
    ref = x @ w
    rel = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_int8_matmul_rejects_untileable():
    with pytest.raises(ValueError, match="divisible"):
        int8_matmul(
            jnp.zeros((8, 100), jnp.int8), jnp.zeros((8, 1), jnp.float32),
            jnp.zeros((100, 96), jnp.int8), jnp.zeros((1, 96), jnp.float32),
            interpret=True,
        )


def test_t5_forward_int8_kernel_path_matches_bf16():
    """Full T5 forward through the fused W8A8 kernel path (interpret on
    CPU): label winners match the unquantized forward and logits stay
    close. 128-multiple dims so every site takes the kernel."""
    import dataclasses

    from llmrankers_tpu.models import quant as quant_mod
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config(
        vocab_size=512, d_model=128, d_kv=32, d_ff=256,
        num_layers=2, num_decoder_layers=2, num_heads=4,
    )
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quant_mod.quantize_t5_params(params)
    # B*L >= 1024 so the encoder takes the kernel path (small-M sites
    # dispatch to the w8a16 dequant fallback — t5._kernel_worthwhile).
    ids = jax.random.randint(jax.random.PRNGKey(1), (64, 16), 0, 512)
    mask = jnp.ones_like(ids)
    dec = jnp.zeros((64, 1), jnp.int32)
    ref = np.asarray(t5_mod.forward(params, cfg, ids, mask, dec)[:, -1])
    cfg_k = dataclasses.replace(cfg, int8_kernel=True)
    assert t5_mod._kernel_worthwhile(
        jnp.zeros((64, 16, 128)), qp["encoder"]["layers"]["q"][0], cfg_k
    )
    got = np.asarray(t5_mod.forward(qp, cfg_k, ids, mask, dec)[:, -1])
    assert (ref.argmax(-1) == got.argmax(-1)).all()
    cos = (ref * got).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9
    )
    assert cos > 0.999, cos


def test_gated_matmul_matches_split():
    """The fused gated-FFN kernel (act(x@w0)*(x@w1) in one pass) must
    match the two-GEMM reference within int8 quantization error."""
    from llmrankers_tpu.ops.int8_matmul import gated_matmul

    rng = np.random.RandomState(3)
    M, K, N = 160, 256, 384
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, 2 * N).astype(np.float32)
    amax = np.abs(w).max(axis=0, keepdims=True)
    sp = amax / 127.0
    wp = np.clip(np.round(w / sp), -127, 127).astype(np.int8)

    got = np.asarray(gated_matmul(
        jnp.asarray(x), jnp.asarray(wp), jnp.asarray(sp),
        act="gelu_new", interpret=True,
    ))
    wd = wp.astype(np.float32) * sp
    h0 = x @ wd[:, :N]
    h1 = x @ wd[:, N:]
    c = 0.7978845608028654
    ref = 0.5 * h0 * (1.0 + np.tanh(c * (h0 + 0.044715 * h0**3))) * h1
    # int8 activation quantization error bounds the mismatch
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.05
    # relu variant
    got_r = np.asarray(gated_matmul(
        jnp.asarray(x), jnp.asarray(wp), jnp.asarray(sp),
        act="relu", interpret=True,
    ))
    ref_r = np.maximum(h0, 0.0) * h1
    assert np.abs(got_r - ref_r).max() / (np.abs(ref_r).max() + 1e-6) < 0.05


def test_t5_forward_packed_kernel_matches_bf16():
    """pack=True param layout through the kernel path (interpret):
    packed qkv GEMM + gated FFN kernel. Winners must match bf16."""
    import dataclasses

    from llmrankers_tpu.models import quant as quant_mod
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config(
        vocab_size=512, d_model=128, d_kv=32, d_ff=256,
        num_layers=2, num_decoder_layers=2, num_heads=4,
    )
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quant_mod.quantize_t5_params(params, pack=True)
    lyr = qp["encoder"]["layers"]
    assert "qkv" in lyr and "wi_g" in lyr and "q" not in lyr
    assert "ckv" in qp["decoder"]["layers"]
    ids = jax.random.randint(jax.random.PRNGKey(1), (64, 16), 0, 512)
    mask = jnp.ones_like(ids)
    dec = jnp.zeros((64, 1), jnp.int32)
    ref = np.asarray(t5_mod.forward(params, cfg, ids, mask, dec)[:, -1])
    cfg_k = dataclasses.replace(cfg, int8_kernel=True)
    got = np.asarray(t5_mod.forward(qp, cfg_k, ids, mask, dec)[:, -1])
    assert (ref.argmax(-1) == got.argmax(-1)).all()
    cos = (ref * got).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9
    )
    assert cos > 0.999, cos
    # and the packed XLA fallback (int8_kernel=False) is EXACTLY the
    # unpacked int8 path — packing only reorders leaves.
    q_unp = quant_mod.quantize_t5_params(params)
    a = t5_mod.forward(q_unp, cfg, ids, mask, dec)
    b = t5_mod.forward(qp, cfg, ids, mask, dec)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Mesh (shard_map) kernel paths — VERDICT r4 #2: the quantized kernels
# must ride meshes, not silently swap to the dequant path by device count.
# Virtual 8-CPU-device meshes (conftest), interpret-mode kernel: same
# dataflow as Mosaic, so these pin the shard_map specs and collectives.
# ---------------------------------------------------------------------------
def _mesh(n_data, n_model):
    from llmrankers_tpu.parallel import mesh as mesh_mod

    return mesh_mod.make_mesh(n_data, n_model,
                              devices=jax.devices()[: n_data * n_model])


@pytest.mark.quick
def test_quantized_matmul_mesh_col_matches_single():
    """Column-parallel (q/k/v/FFN-in layout): N shards over 'model',
    no collectives — bit-identical to the single-device kernel (each
    device runs the same math on its column slice)."""
    rng = np.random.RandomState(3)
    M, K, N = 256, 256, 512
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w8 = jnp.asarray(rng.randint(-127, 128, (K, N)).astype(np.int8))
    sw = jnp.asarray(rng.rand(1, N).astype(np.float32) * 0.05)
    res = jnp.asarray(rng.randn(M, N).astype(np.float32) * 0.1)
    single = quantized_matmul(x, w8, sw, residual=res, interpret=True)
    for mesh in (_mesh(1, 2), _mesh(2, 2), _mesh(2, 4)):
        got = quantized_matmul(x, w8, sw, residual=res, interpret=True,
                               mesh=mesh, partition="col")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(single), rtol=1e-5, atol=1e-5,
            err_msg=str(dict(mesh.shape)),
        )


@pytest.mark.quick
def test_quantized_matmul_mesh_row_matches_single():
    """Row-parallel (o/wo layout): K shards over 'model', per-shard
    activation row scales, f32 psum, residual added AFTER the psum.
    Per-shard scales differ from the single-chip whole-row scale, so
    equality is to quantization tolerance, not bitwise."""
    rng = np.random.RandomState(4)
    M, K, N = 256, 512, 256
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w8 = jnp.asarray(rng.randint(-127, 128, (K, N)).astype(np.int8))
    sw = jnp.asarray(rng.rand(1, N).astype(np.float32) * 0.05)
    res = jnp.asarray(rng.randn(M, N).astype(np.float32) * 0.1)
    single = np.asarray(
        quantized_matmul(x, w8, sw, residual=res, interpret=True)
    )
    exact = np.asarray(x, np.float64) @ (
        np.asarray(w8, np.float64) * np.asarray(sw, np.float64)
    ) + np.asarray(res, np.float64)
    for mesh in (_mesh(1, 2), _mesh(2, 2)):
        got = np.asarray(
            quantized_matmul(x, w8, sw, residual=res, interpret=True,
                             mesh=mesh, partition="row")
        )
        scale = np.abs(exact).mean()
        assert np.abs(got - single).mean() < 0.02 * scale, dict(mesh.shape)
        # and both stay close to the exact unquantized product
        assert np.abs(got - exact).mean() < 0.02 * scale, dict(mesh.shape)


@pytest.mark.quick
def test_gated_pair_mesh_matches_single():
    from llmrankers_tpu.ops.int8_matmul import gated_matmul_pair

    rng = np.random.RandomState(5)
    M, K, N = 256, 256, 512
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w0 = jnp.asarray(rng.randint(-127, 128, (K, N)).astype(np.int8))
    w1 = jnp.asarray(rng.randint(-127, 128, (K, N)).astype(np.int8))
    s0 = jnp.asarray(rng.rand(1, N).astype(np.float32) * 0.02)
    s1 = jnp.asarray(rng.rand(1, N).astype(np.float32) * 0.02)
    single = gated_matmul_pair(x, w0, s0, w1, s1, act="silu", interpret=True)
    got = gated_matmul_pair(x, w0, s0, w1, s1, act="silu", interpret=True,
                            mesh=_mesh(2, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_kernel_mesh_ok_guards():
    from llmrankers_tpu.ops.int8_matmul import kernel_mesh_ok

    mesh = _mesh(2, 2)
    assert kernel_mesh_ok(None, 64, 128, 128, "col")  # no mesh: caller rules
    assert kernel_mesh_ok(mesh, 4096, 256, 512, "col")
    assert kernel_mesh_ok(mesh, 4096, 512, 256, "row")
    assert not kernel_mesh_ok(mesh, 4096, 256, 384, "col")  # N % tp*128
    assert not kernel_mesh_ok(mesh, 4096, 384, 256, "row")  # K % tp*128
    assert not kernel_mesh_ok(mesh, 1000, 256, 512, "col")  # M % dp
    assert not kernel_mesh_ok(mesh, 1024, 256, 512, "col")  # local M < 1024
    data_only = _mesh(2, 1)
    assert kernel_mesh_ok(data_only, 2048, 256, 384, "col")  # tp=1: no split
