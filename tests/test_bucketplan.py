"""DP-optimal length-bucket planning (utils/bucketplan.py) + the
engine's len_buckets='auto' re-planning mode."""
import itertools

import numpy as np
import pytest

import jax

from llmrankers_tpu.utils.bucketplan import ladder_waste, optimal_buckets


def brute_force(lengths, max_buckets, multiple):
    cands = sorted({-(-x // multiple) * multiple for x in lengths})
    best, best_w = None, None
    for k in range(1, min(max_buckets, len(cands)) + 1):
        for combo in itertools.combinations(cands, k):
            if combo[-1] != cands[-1]:
                continue  # must cover the max
            w = ladder_waste(lengths, combo)
            if best_w is None or w < best_w or (
                w == best_w and len(combo) < len(best)
            ):
                best, best_w = combo, w
    return best, best_w


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(1, 400, size=60).tolist()
    for k in (1, 2, 3, 4):
        got = optimal_buckets(lengths, max_buckets=k, multiple=16)
        _, want_w = brute_force(lengths, k, 16)
        assert ladder_waste(lengths, got) == want_w, (k, got)
        assert len(got) <= k
        assert got[-1] >= max(lengths)
        assert all(b % 16 == 0 for b in got)


def test_bimodal_distribution_splits():
    """Two tight clusters -> two rungs at the cluster tops."""
    lengths = [100] * 500 + [1000] * 500
    got = optimal_buckets(lengths, max_buckets=4, multiple=64)
    assert got == (128, 1024)


@pytest.mark.quick
def test_single_bucket_and_ties_prefer_fewer():
    assert optimal_buckets([64] * 10, max_buckets=5, multiple=64) == (64,)
    # all lengths equal after rounding: extra rungs buy nothing
    assert optimal_buckets([61, 62, 63], max_buckets=3, multiple=64) == (64,)


def test_compile_cost_trades_rungs():
    lengths = [100] * 100 + [110] * 100 + [1000] * 100
    free = optimal_buckets(lengths, max_buckets=8, multiple=4)
    assert len(free) == 3  # zero compile cost: every cluster gets a rung
    taxed = optimal_buckets(lengths, max_buckets=8, multiple=4,
                            compile_cost=10_000)
    assert len(taxed) < len(free)


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        optimal_buckets([], max_buckets=4)
    with pytest.raises(ValueError):
        optimal_buckets([5], max_buckets=0)


def test_engine_auto_replans_and_scores_match():
    """len_buckets='auto': after auto_plan_rows observed rows the ladder
    is re-planned; scores are identical to the default-ladder engine
    (padding invariance)."""
    from llmrankers_tpu.engine.engine import (
        DEFAULT_LEN_BUCKETS,
        ScoringEngine,
    )
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer(cfg.vocab_size)
    base = ScoringEngine("t5", cfg, params, tok)
    auto = ScoringEngine("t5", cfg, params, tok, len_buckets="auto:4",
                         auto_plan_rows=8)
    assert auto.len_buckets == DEFAULT_LEN_BUCKETS

    rng = np.random.RandomState(0)
    rows = [list(rng.randint(2, 200, size=33 + 2 * i)) for i in range(12)]
    a = np.asarray(base.score_labels(rows, [5, 6]))
    b = np.asarray(auto.score_labels(rows, [5, 6]))  # records 12 >= 8 rows
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert auto.len_buckets != DEFAULT_LEN_BUCKETS
    assert len(auto.len_buckets) <= 4
    assert auto.len_buckets[-1] >= max(len(r) for r in rows)
    assert auto._auto_buckets == 0  # plans exactly once

    # post-replan scoring still matches
    c = np.asarray(auto.score_labels(rows, [5, 6]))
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-5)


def test_engine_auto_rejects_unknown_mode():
    from llmrankers_tpu.engine.engine import ScoringEngine
    from llmrankers_tpu.engine.tokenizer import ByteTokenizer
    from llmrankers_tpu.models import t5 as t5_mod
    from llmrankers_tpu.models.config import T5Config

    cfg = T5Config.tiny()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="len_buckets"):
        ScoringEngine("t5", cfg, params, ByteTokenizer(cfg.vocab_size),
                      len_buckets="sometimes")


def test_cli_bucket_list_auto():
    from llmrankers_tpu.cli.run import _bucket_list

    assert _bucket_list("auto") == "auto"
    assert _bucket_list("auto:6") == "auto:6"
    assert _bucket_list("128,64") == (64, 128)
    import argparse
    with pytest.raises(argparse.ArgumentTypeError):
        _bucket_list("auto:0")
    with pytest.raises(argparse.ArgumentTypeError):
        _bucket_list("auto:x")
