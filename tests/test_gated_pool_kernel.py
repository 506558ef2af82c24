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


@pytest.mark.parametrize("n", [1_000, 10_000, 100_000])
def test_kernel_full_bag_scale_parity(n, rng):
    """VERDICT #3 done-criterion: fused kernel == jnp path at
    N in {1k, 10k, 100k} (full unpadded production bags)."""
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(n, 192)).astype(np.float32))
    ref_logits, ref_scores = gap.gated_attention_pool_reference(
        bag, jnp.ones(n, bool), p)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p, tile=2048)
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-4, atol=1e-4)


def test_kernel_dynamic_n_valid(rng):
    """n_valid is a data operand: a traced scalar under jit works, and
    different prefixes give the right masked results."""
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(256, 192)).astype(np.float32))

    def run(nv):
        return _interpret(gap.gated_attention_pool, bag, p,
                          n_valid=jnp.asarray(nv), tile=128)

    for nv in (64, 200, 256):
        logits, scores = run(nv)
        ref_logits, ref_scores = gap.gated_attention_pool_reference(
            bag, jnp.arange(256) < nv, p)
        np.testing.assert_allclose(np.asarray(logits)[0],
                                   np.asarray(ref_logits),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scores)[:nv],
                                   np.asarray(ref_scores)[:nv],
                                   rtol=1e-5, atol=1e-5)


def test_kernel_partial_mode_combines(rng):
    """Partial (shard-local) outputs combine across two halves with the
    flash recurrence to the exact full-bag result."""
    p = _random_params(rng)
    n = 512
    bag = rng.normal(size=(n, 192)).astype(np.float32)
    mask = np.ones((n,), bool)
    mask[480:] = False
    ref_logits, _ = gap.gated_attention_pool_reference(
        jnp.asarray(bag), jnp.asarray(mask), p)

    halves = [(bag[:256], mask[:256]), (bag[256:], mask[256:])]
    parts = [_interpret(gap.gated_attention_pool_partial, jnp.asarray(b), p,
                        mask=jnp.asarray(m), tile=128) for b, m in halves]
    gmax = max(float(pt[1]) for pt in parts)
    acc = sum(np.asarray(pt[0]) * np.exp(float(pt[1]) - gmax) for pt in parts)
    l = sum(float(pt[2]) * np.exp(float(pt[1]) - gmax) for pt in parts)
    mpool = acc / l
    logits = mpool @ np.asarray(p.w_cls) + np.asarray(p.b_cls)
    np.testing.assert_allclose(logits[0], np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)


def test_apply_pooled_dispatch(rng):
    """apply_pooled: CLAM_SB bags route through the pooled path and match
    model.apply; CLAM_MB (no single-branch tree) falls back identically."""
    from hipt_abmil_atec23_tpu.models import CLAM_MB

    bag = jnp.asarray(rng.normal(size=(2000, 192)).astype(np.float32))
    model = CLAM_SB(size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0), bag, None)
    ref = model.apply(params, bag, None)
    out = gap.apply_pooled(model, params, bag)  # n >= min_fused -> pooled
    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref.logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.a_raw), np.asarray(ref.a_raw),
                               rtol=1e-4, atol=1e-5)
    assert int(out.y_hat[0]) == int(ref.y_hat[0])

    # small bag -> fallback to model.apply exactly
    small = bag[:64]
    out_s = gap.apply_pooled(model, params, small)
    ref_s = model.apply(params, small, None)
    np.testing.assert_allclose(np.asarray(out_s.logits),
                               np.asarray(ref_s.logits), rtol=1e-6)

    # multi-branch model -> structural fallback
    mb = CLAM_MB(size_arg="hipt_smaller", n_classes=2)
    mb_params = mb.init(jax.random.PRNGKey(1), bag, None)
    out_mb = gap.apply_pooled(mb, mb_params, bag)
    ref_mb = mb.apply(mb_params, bag, None)
    np.testing.assert_allclose(np.asarray(out_mb.logits),
                               np.asarray(ref_mb.logits), rtol=1e-6)


def test_kernel_all_masked_bag_neutral(rng):
    """An all-masked (empty) bag must not pool garbage: the kernel forces
    masked rows' exp contributions to 0 even while the running max is still
    NEG_INF, so l = 0, acc = 0 and the logits finalize to the classifier
    bias (ADVICE r2 #4)."""
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(128, 192)).astype(np.float32))
    mask = jnp.zeros((128,), bool)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p, mask=mask)
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(p.b_cls),
                               rtol=1e-6, atol=1e-6)
    assert np.all(np.asarray(scores) <= 0.5 * gap.NEG_INF)

    # leading all-masked tiles self-heal: only the valid tail contributes
    mask2 = jnp.arange(300) >= 250
    bag2 = jnp.asarray(rng.normal(size=(300, 192)).astype(np.float32))
    ref_logits, _ = gap.gated_attention_pool_reference(bag2, mask2, p)
    logits2, _ = _interpret(gap.gated_attention_pool, bag2, p, mask=mask2,
                            tile=128)
    np.testing.assert_allclose(np.asarray(logits2)[0], np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# impl="dma": manually pipelined ring variant (_kernel_dma)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,tile,nbuf", [
    (1000, 256, 4),    # 4 chunks + ragged tail, no slot reuse
    (5000, 512, 4),    # 10 chunks: ring slots reused (prefetch-clobber reg.)
    (4096, 512, 2),    # minimal double-buffer depth, 8 chunks
    (300, 512, 4),     # single chunk == ragged tail only
    (256, 128, 4),     # exact multiple, fewer chunks than buffers
])
def test_dma_kernel_matches_oracle(n, tile, nbuf, rng):
    """The DMA-ring variant streams the UNPADDED bag and must match the
    oracle for every chunk-count/tail/ring-depth combination. The 10-chunk
    case pins the prefetch ordering: a chunk may only be DMA'd into a slot
    AFTER the iteration that consumed it (a clobbering prefetch poisons
    scores by whole tiles, caught in interpret mode)."""
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(n, 192)).astype(np.float32))
    ref_logits, ref_scores = gap.gated_attention_pool_reference(
        bag, jnp.ones(n, bool), p)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p,
                                tile=tile, impl="dma", nbuf=nbuf)
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-4, atol=1e-5)


def test_dma_kernel_mask_and_traced_n_valid(rng):
    """Mask rows and traced n_valid prefixes behave identically to the grid
    kernel; tail rows past n never contribute (stale-buffer guard)."""
    p = _random_params(rng)
    n = 777
    bag = jnp.asarray(rng.normal(size=(n, 192)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) > 0.3)
    ref_logits, ref_scores = gap.gated_attention_pool_reference(bag, mask, p)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p, mask=mask,
                                tile=256, impl="dma")
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    valid = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(scores)[valid],
                               np.asarray(ref_scores)[valid],
                               rtol=1e-4, atol=1e-5)

    for nv in (64, 700):
        logits, scores = _interpret(gap.gated_attention_pool, bag, p,
                                    n_valid=jnp.asarray(nv), tile=256,
                                    impl="dma")
        ref_logits, ref_scores = gap.gated_attention_pool_reference(
            bag, jnp.arange(n) < nv, p)
        np.testing.assert_allclose(np.asarray(logits)[0],
                                   np.asarray(ref_logits),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scores)[:nv],
                                   np.asarray(ref_scores)[:nv],
                                   rtol=1e-4, atol=1e-5)


def test_dma_kernel_all_masked_neutral(rng):
    """Empty-bag guard holds on the DMA path too (classifier bias out)."""
    p = _random_params(rng)
    bag = jnp.asarray(rng.normal(size=(200, 192)).astype(np.float32))
    mask = jnp.zeros((200,), bool)
    logits, scores = _interpret(gap.gated_attention_pool, bag, p, mask=mask,
                                tile=128, impl="dma")
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(p.b_cls),
                               rtol=1e-6, atol=1e-6)
    assert np.all(np.asarray(scores) <= 0.5 * gap.NEG_INF)


def test_dma_partial_mode_combines(rng):
    """DMA-variant shard-local partials combine across halves exactly like
    the grid kernel's (sequence-parallel local-op drop-in)."""
    p = _random_params(rng)
    n = 700
    bag = rng.normal(size=(n, 192)).astype(np.float32)
    mask = np.ones((n,), bool)
    mask[650:] = False
    ref_logits, _ = gap.gated_attention_pool_reference(
        jnp.asarray(bag), jnp.asarray(mask), p)

    halves = [(bag[:350], mask[:350]), (bag[350:], mask[350:])]
    parts = [_interpret(gap.gated_attention_pool_partial, jnp.asarray(b), p,
                        mask=jnp.asarray(m), tile=128, impl="dma")
             for b, m in halves]
    gmax = max(float(pt[1]) for pt in parts)
    acc = sum(np.asarray(pt[0]) * np.exp(float(pt[1]) - gmax) for pt in parts)
    l = sum(float(pt[2]) * np.exp(float(pt[1]) - gmax) for pt in parts)
    logits = (acc / l) @ np.asarray(p.w_cls) + np.asarray(p.b_cls)
    np.testing.assert_allclose(logits[0], np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
