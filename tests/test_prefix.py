"""Shared-prefix KV cache: grouping logic + engine parity.

The reference gets prefix reuse from vLLM's PagedAttention prefix caching
(llmrankers/setwise.py:450-454); here the engine groups rows by common
token prefix, prefills each unique prefix once, and rows gather that K/V.
These tests assert the grouped paths are numerically equivalent to the
plain (ungrouped) paths on a tiny random decoder model.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmrankers_tpu.engine.engine import ScoringEngine
from llmrankers_tpu.engine.prefix import group_shared_prefixes
from llmrankers_tpu.engine.tokenizer import ByteTokenizer
from llmrankers_tpu.models import decoder as dec_mod
from llmrankers_tpu.models.config import DecoderConfig


@pytest.mark.quick
def test_grouping_basic():
    pre_a = list(range(2, 102))            # 100-token prefix A
    pre_b = list(range(200, 300))          # 100-token prefix B
    rows = [
        pre_a + [10, 11, 12],
        pre_a + [20, 21],
        pre_a + [30],
        pre_b + [40, 41, 42, 43],
        pre_b + [50],
    ]
    grp = group_shared_prefixes(rows, min_prefix=32, min_saving=64)
    assert grp is not None
    prefixes, gidx, suffixes = grp
    # Rows stay in original order; same-prefix rows share a group id.
    assert gidx[0] == gidx[1] == gidx[2]
    assert gidx[3] == gidx[4]
    assert gidx[0] != gidx[3]
    for i, row in enumerate(rows):
        assert prefixes[gidx[i]] + suffixes[i] == row
        assert len(suffixes[i]) >= 1  # label position stays in the suffix


def test_grouping_declines_when_unprofitable():
    rows = [[i, i + 1, i + 2] for i in range(2, 42, 3)]  # nothing shared
    assert group_shared_prefixes(rows) is None
    # Shared but short prefixes below min_prefix don't group either.
    rows = [[2, 3, 4] + [50 + i] for i in range(8)]
    assert group_shared_prefixes(rows, min_prefix=32) is None


def test_grouping_row_equal_to_prefix():
    pre = list(range(2, 66))
    rows = [pre + [9, 9], list(pre), pre + [7]]
    grp = group_shared_prefixes(rows, min_prefix=16, min_saving=32)
    assert grp is not None
    prefixes, gidx, suffixes = grp
    for i, row in enumerate(rows):
        assert prefixes[gidx[i]] + suffixes[i] == row
        assert len(suffixes[i]) >= 1


@pytest.fixture(scope="module")
def engines():
    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(cfg.vocab_size)
    shared = ScoringEngine("decoder", cfg, params, tok, prefix_share=True)
    plain = ScoringEngine("decoder", cfg, params, tok, prefix_share=False)
    assert shared.prefix_share and not plain.prefix_share
    return shared, plain


def _shared_prefix_rows(rng, n_groups=2, per_group=4, plen=96, smin=4, smax=24):
    rows = []
    for g in range(n_groups):
        pre = rng.randint(2, 500, plen).tolist()
        for _ in range(per_group):
            s = rng.randint(smin, smax + 1)
            rows.append(pre + rng.randint(2, 500, s).tolist())
    order = rng.permutation(len(rows))
    return [rows[i] for i in order]


def test_score_labels_shared_matches_plain(engines):
    shared, plain = engines
    rows = _shared_prefix_rows(np.random.RandomState(0))
    labels = [5, 6, 7]
    a = shared.score_labels(rows, labels)
    b = plain.score_labels(rows, labels)
    keys = {k[0] for k in shared._jit_cache}
    assert {"dec_labels_shared", "dec_labels_pre"} & keys
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_generate_shared_matches_plain(engines):
    shared, plain = engines
    rows = _shared_prefix_rows(np.random.RandomState(1))
    a, na = shared.generate(rows, max_new_tokens=8)
    b, nb = plain.generate(rows, max_new_tokens=8)
    keys = {k[0] for k in shared._jit_cache}
    assert {"dec_gen_shared", "dec_gen_pre"} & keys
    assert a == b
    assert na == nb


def test_generate_shared_chunked_matches_plain(engines):
    shared, plain = engines
    rows = _shared_prefix_rows(np.random.RandomState(2))
    a, na = shared.generate(rows, max_new_tokens=12, chunk_tokens=4,
                            stop_strings=("zq",))
    b, nb = plain.generate(rows, max_new_tokens=12, chunk_tokens=4,
                           stop_strings=("zq",))
    keys = {k[0] for k in shared._jit_cache}
    assert {"dec_prefill_shared", "dec_prefill_pre"} & keys
    assert a == b
    assert na == nb


def test_score_labels_shared_matches_plain_on_mesh():
    """Grouped (shared-prefix) scoring on a 2x2 dp x tp mesh matches the
    single-device plain path — the per-row K/V gather must partition
    cleanly when the suffix batch is sharded over 'data'."""
    from llmrankers_tpu.parallel import mesh as mesh_mod

    cfg = DecoderConfig.tiny()
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(cfg.vocab_size)
    mesh = mesh_mod.make_mesh(2, 2)
    shared = ScoringEngine("decoder", cfg, params, tok, mesh=mesh,
                           prefix_share=True)
    plain = ScoringEngine("decoder", cfg, params, tok, prefix_share=False)
    rows = _shared_prefix_rows(np.random.RandomState(3))
    labels = [5, 6, 7]
    a = shared.score_labels(rows, labels)
    b = plain.score_labels(rows, labels)
    keys = {k[0] for k in shared._jit_cache}
    assert {"dec_labels_shared", "dec_labels_pre"} & keys
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_group_falls_back_when_combined_length_exceeds_context():
    """Prefix and suffix are padded separately, so the grouped path can't
    see the combined prompt length; rows past max_position_embeddings
    must take the plain path (which truncates with a warning) instead of
    running out-of-range RoPE positions."""
    import dataclasses

    import jax

    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import decoder as dec_mod
    from llmrankers_tpu.models.config import DecoderConfig

    cfg = dataclasses.replace(
        DecoderConfig.tiny(), max_position_embeddings=256
    )
    params = dec_mod.init_params(cfg, jax.random.PRNGKey(0))
    eng = ScoringEngine("decoder", cfg, params, ByteTokenizer(cfg.vocab_size))
    prefix = list(range(2, 202))  # 200-token shared prefix
    rows = [prefix + list(range(210, 330 + i)) for i in range(4)]  # ~320 total
    assert eng._group(rows) is None  # would exceed the 256 context
    short = [prefix[:40] + list(range(210, 260 + i)) for i in range(4)]
    assert eng._group(short) is not None  # under the cap: still groups
    # End-to-end: generation works (truncated to context on the plain path).
    assert eng.truncated_rows == 0
    texts, ntoks = eng.generate(rows, max_new_tokens=4)
    assert len(texts) == 4
    # Observability: every context-cut row is counted, not just warned
    # about once (meters expose the count via MeterReport/serve /stats).
    assert eng.truncated_rows == 4
    eng.generate(rows[:2], max_new_tokens=4)
    assert eng.truncated_rows == 6
