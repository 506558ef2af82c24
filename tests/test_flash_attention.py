"""Pallas attention kernels vs the naive jnp oracle (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from hipt_abmil_atec23_tpu.ops import flash_attention as fa


def _run_interpret(fn, *args, **kwargs):
    from jax.experimental import pallas as pl
    import unittest.mock as mock
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        # the module imported pallas as pl too; patch its reference
        with mock.patch.object(fa.pl, "pallas_call",
                               functools.partial(orig, interpret=True)):
            return fn(*args, **kwargs)


@pytest.mark.parametrize("n,valid", [(257, 257), (384, 257), (128, 100)])
def test_fused_attention_matches_reference(n, valid, rng):
    bh, d = 4, 64
    q = jnp.asarray(rng.normal(size=(bh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bh, n, d)).astype(np.float32))
    ref = fa.attention_reference(q, k, v, valid_len=valid)
    out = _run_interpret(fa.fused_attention, q, k, v, valid_len=valid)
    np.testing.assert_allclose(np.asarray(out)[:, :valid],
                               np.asarray(ref)[:, :valid],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,valid", [(512, 512), (768, 700)])
def test_flash_attention_matches_reference(n, valid, rng):
    bh, d = 2, 64
    q = jnp.asarray(rng.normal(size=(bh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bh, n, d)).astype(np.float32))
    ref = fa.attention_reference(q, k, v, valid_len=valid)
    out = _run_interpret(fa.flash_attention, q, k, v, valid_len=valid,
                         block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out)[:, :valid],
                               np.asarray(ref)[:, :valid],
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16(rng):
    bh, n, d = 2, 256, 64
    q = jnp.asarray(rng.normal(size=(bh, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, n, d)), jnp.bfloat16)
    ref = fa.attention_reference(q, k, v)
    out = _run_interpret(fa.fused_attention, q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_mlp_matches_dense_path(rng):
    """ops/fused_mlp kernel (interpret) == nn.Dense+exact-GELU+nn.Dense,
    with an identical parameter tree (same checkpoint loads both paths)."""
    import dataclasses
    import functools
    import unittest.mock as mock

    import jax
    from hipt_abmil_atec23_tpu.models.vit import Mlp
    from hipt_abmil_atec23_tpu.ops import fused_mlp as fm

    x = jnp.asarray(rng.normal(size=(5, 37, 384)).astype(np.float32))
    plain = Mlp(hidden=1536, out=384)
    fused = Mlp(hidden=1536, out=384, use_fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    want = plain.apply(params, x)

    orig = pl.pallas_call
    with mock.patch.object(fm.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        # SAME params tree drives the fused path
        got = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # and init from the fused path produces the same tree structure
    p2 = None
    with mock.patch.object(fm.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        p2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p2) == \
        jax.tree_util.tree_structure(params)


def test_vit_production_fused_config_parity(rng):
    """The production TPU encoder config (use_flash + use_fused_mlp) matches
    the plain XLA ViT in interpret mode — guards the TPU-only path from CPU."""
    import dataclasses
    import functools
    import unittest.mock as mock

    import jax
    from hipt_abmil_atec23_tpu.models.vit import (
        VIT_CONFIGS, VisionTransformer, vit_small)
    from hipt_abmil_atec23_tpu.ops import flash_attention as fa_mod
    from hipt_abmil_atec23_tpu.ops import fused_mlp as fm_mod

    m0 = vit_small()
    mf = VisionTransformer(dataclasses.replace(
        VIT_CONFIGS["vit_small"], use_flash=True, use_fused_mlp=True))
    x = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m0.apply(params, x))

    orig = pl.pallas_call
    with mock.patch.object(fa_mod.pl, "pallas_call",
                           functools.partial(orig, interpret=True)), \
         mock.patch.object(fm_mod.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        got = np.asarray(mf.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_fused_attention_query_tiled(rng):
    """Medium-N path: query-tiled single-pass (K/V resident) == oracle."""
    q, k, v = (jnp.asarray(rng.normal(size=(4, 1000, 64)).astype(np.float32))
               for _ in range(3))
    ref = fa.attention_reference(q, k, v, valid_len=990)
    out = _run_interpret(fa.fused_attention, q, k, v, valid_len=990,
                         group=1, block_q=256)
    np.testing.assert_allclose(np.asarray(out)[:, :990],
                               np.asarray(ref)[:, :990],
                               rtol=2e-5, atol=2e-5)


def test_hipt_production_fused_config_parity(rng):
    """The full hierarchical HIPT encoder under the production fused config
    (flash attention incl. ViT-4K's head_dim=32 + fused LN/MLP) matches the
    plain XLA graph in interpret mode."""
    import functools
    import unittest.mock as mock

    import jax
    from hipt_abmil_atec23_tpu.models.hipt import make_hipt_encoder
    from hipt_abmil_atec23_tpu.ops import flash_attention as fa_mod
    from hipt_abmil_atec23_tpu.ops import fused_mlp as fm_mod

    m0 = make_hipt_encoder(dtype=jnp.float32)
    mf = make_hipt_encoder(dtype=jnp.float32, use_flash=True,
                           use_fused_mlp=True)
    x = jnp.asarray(rng.normal(size=(1, 512, 512, 3)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 256, 256, 3), jnp.float32))
    want = np.asarray(m0.apply(params, x))

    orig = pl.pallas_call
    with mock.patch.object(fa_mod.pl, "pallas_call",
                           functools.partial(orig, interpret=True)), \
         mock.patch.object(fm_mod.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        got = np.asarray(mf.apply(params, x))
    assert want.shape == got.shape == (1, 192)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
