"""Quantized Pallas kernels on meshes (VERDICT r4 #2).

Round-4 state: the W8A8/W4A8 kernels were gated to single-chip — on a
mesh the headline quantized config silently fell back to the XLA w8a16
dequant path. These tests pin the round-5 fix end-to-end through the
ENGINE: a TP mesh engine with the kernels forced on (interpret mode —
same dataflow as Mosaic) must (a) keep cfg.int8_kernel set (no silent
swap by device count) and (b) score within quantization tolerance of
the single-chip kernel engine. Reference match: vLLM quantization under
tensor_parallel_size (/root/reference/Rank-R1/run_setwise.py:109,125).
"""
import numpy as np
import pytest

import jax

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import t5 as t5_mod
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig, T5Config
from llmrankers_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def _force_kernels(monkeypatch):
    monkeypatch.setenv("LLMRANKERS_FORCE_QKERNELS", "1")


def _kernel_shaped_t5():
    """Dims that satisfy the kernel's mesh shape rules at tp=2: every
    GEMM's sharded dim is a 256-multiple, and the 8x128 bucket makes
    M = 1024 (>= the per-device kernel threshold at dp=1)."""
    cfg = T5Config(
        vocab_size=512, d_model=256, d_kv=64, d_ff=512,
        num_layers=2, num_decoder_layers=2, num_heads=4,
    )
    return cfg, t5_mod.init_params(cfg, jax.random.PRNGKey(0))


def test_t5_int8_kernel_tp2_matches_single_chip():
    cfg, params = _kernel_shaped_t5()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("t5", cfg, params, tok, quantize="int8",
                           len_buckets=(128,), batch_buckets=(8,))
    assert single.cfg.int8_kernel  # forced on CPU via the env seam
    mesh = mesh_mod.make_mesh(1, 2, devices=jax.devices()[:2])
    tp = ScoringEngine("t5", cfg, params, tok, mesh=mesh, quantize="int8",
                       len_buckets=(128,), batch_buckets=(8,))
    # The engine no longer swaps the kernel off by device count.
    assert tp.cfg.int8_kernel
    rows = [tok.encode(f"passage number {i} about topic {i % 3}")
            for i in range(6)]
    labels = [10, 11, 12]
    a = np.asarray(single.score_labels(rows, labels))
    b = np.asarray(tp.score_labels(rows, labels))
    # Row-parallel sites quantize activations per-K-shard (finer scales
    # than single-chip), so equality is to quantization tolerance.
    assert (a.argmax(-1) == b.argmax(-1)).all()
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_t5_int8_kernel_tp2_with_data_axis():
    """dp x tp mesh: batch shards over 'data' too. kernel_mesh_ok
    requires local M >= 1024, so the 8x128 bucket at dp=2 (local M=512)
    falls back per-site — scoring must stay correct either way."""
    cfg, params = _kernel_shaped_t5()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("t5", cfg, params, tok, quantize="int8",
                           len_buckets=(128,), batch_buckets=(8,))
    mesh = mesh_mod.make_mesh(2, 2, devices=jax.devices()[:4])
    dptp = ScoringEngine("t5", cfg, params, tok, mesh=mesh, quantize="int8",
                         len_buckets=(128,), batch_buckets=(8,))
    rows = [tok.encode(f"doc {i}") for i in range(5)]
    a = np.asarray(single.score_labels(rows, [7, 8]))
    b = np.asarray(dptp.score_labels(rows, [7, 8]))
    assert (a.argmax(-1) == b.argmax(-1)).all()
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def _kernel_shaped_decoder():
    cfg = DecoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    return cfg, dec_mod.init_params(cfg, jax.random.PRNGKey(1))


def test_decoder_int8_prefill_kernel_tp2():
    """Decoder int8 on a TP mesh: prefill's large-M GEMMs ride the W8A8
    shard_map path (gate/up pair fused), decode's small-M steps stay on
    the GSPMD dequant — scores match the single-chip kernel engine."""
    cfg, params = _kernel_shaped_decoder()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("decoder", cfg, params, tok, quantize="int8",
                           len_buckets=(128,), batch_buckets=(8,))
    assert single.cfg.int8_kernel
    mesh = mesh_mod.make_mesh(1, 2, devices=jax.devices()[:2])
    tp = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                       quantize="int8", len_buckets=(128,),
                       batch_buckets=(8,))
    assert tp.cfg.int8_kernel
    rows = [list(range(2, 80 + 4 * i)) for i in range(4)]
    a = np.asarray(single.score_labels(rows, [5, 6]))
    b = np.asarray(tp.score_labels(rows, [5, 6]))
    assert (a.argmax(-1) == b.argmax(-1)).all()
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_decoder_int4_kernel_tp2():
    """int4 W4A8 on a TP mesh: column-parallel shard_map on every site
    (group packing pins the input dim). Tolerance vs the single-chip
    kernel engine."""
    cfg, params = _kernel_shaped_decoder()
    tok = ByteTokenizer(cfg.vocab_size)
    single = ScoringEngine("decoder", cfg, params, tok, quantize="int4",
                           len_buckets=(128,), batch_buckets=(8,))
    assert single.cfg.int4_kernel
    mesh = mesh_mod.make_mesh(1, 2, devices=jax.devices()[:2])
    tp = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                       quantize="int4", len_buckets=(128,),
                       batch_buckets=(8,))
    assert tp.cfg.int4_kernel
    rows = [list(range(2, 70 + 4 * i)) for i in range(3)]
    a = np.asarray(single.score_labels(rows, [5, 6]))
    b = np.asarray(tp.score_labels(rows, [5, 6]))
    assert (a.argmax(-1) == b.argmax(-1)).all()
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
