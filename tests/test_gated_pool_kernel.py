"""Fused gated-attention pooling kernel vs jnp oracle and vs CLAM_SB."""
import functools
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.models import CLAM_SB
from hipt_abmil_atec23_tpu.ops import gated_attention_pool as gap


def _interpret(fn, *args, **kwargs):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    with mock.patch.object(gap.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        return fn(*args, **kwargs)


def _random_params(rng, d_in=192, l=16, d=8, c=2):
    g = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    return gap.GatedPoolParams(
        w_f=g(d_in, l), b_f=g(l), w_a=g(l, d), b_a=g(d),
        w_b=g(l, d), b_b=g(d), w_c=g(d, 1), b_c=g(1),
        w_cls=g(l, c), b_cls=g(c))


@pytest.mark.parametrize("n,valid,tile", [(128, 128, 64), (300, 280, 128),
                                          (75, 75, 128)])
def test_kernel_matches_oracle(n, valid, tile, rng):
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(n, 192)).astype(np.float32))
    mask = jnp.arange(n) < valid
    ref_logits, ref_scores = gap.gated_attention_pool_reference(bag, mask, p)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p,
                                n_valid=valid, tile=tile)
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores)[:valid],
                               np.asarray(ref_scores)[:valid],
                               rtol=1e-5, atol=1e-5)


def test_kernel_matches_clam_sb(rng):
    """The fused kernel reproduces CLAM_SB's deterministic forward exactly."""
    model = CLAM_SB(size_arg="hipt_smaller", n_classes=2)
    bag = jnp.asarray(rng.normal(size=(200, 192)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), bag, None)
    out = model.apply(params, bag, None)

    p = gap.params_from_clam(params)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p, tile=128)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out.logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(out.a_raw)[0],
                               rtol=1e-4, atol=1e-5)


def test_kernel_streams_large_bag(rng):
    """Full-slide-scale bag (20k x 192) pools in tiles without HBM
    intermediates; numerics stay stable."""
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(20_000, 192)).astype(np.float32))
    ref_logits, _ = gap.gated_attention_pool_reference(
        bag, jnp.ones(20_000, bool), p)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p, tile=2048)
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)
    assert scores.shape == (20_000,)
