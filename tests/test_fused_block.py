"""Parity tests for the whole-block fused kernel (ops/fused_block.py).

The fused path must reproduce the flax Dense/Attention Block bit-for-bit at
f32 (CPU interpret mode runs the same kernel code Mosaic compiles on TPU),
on the SAME parameter tree — the param shells give both paths identical
names/shapes/init.
"""
import dataclasses
import functools
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.models.vit import (
    Block, VisionTransformer, VisionTransformer4K, VIT_CONFIGS, ViT4KConfig)
from hipt_abmil_atec23_tpu.ops import fused_block as fb


def _interpret(fn, *args, **kwargs):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    with mock.patch.object(fb.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        return fn(*args, **kwargs)


@pytest.mark.parametrize("b,n,d,heads", [(2, 16, 64, 2), (3, 9, 96, 3)])
def test_block_parity(b, n, d, heads, rng):
    # the kernel's MXU operands are bf16 (f32 accumulation) — compare
    # against the bf16-dtype flax Block, the path it replaces in production
    ref_blk = Block(num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
                    ln_eps=1e-6, dtype=jnp.bfloat16)
    fus_blk = Block(num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
                    ln_eps=1e-6, use_fused_block=True)
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    want, _ = ref_blk.apply(params, x)

    n_pad = (n + 7) // 8 * 8
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    got, _ = _interpret(fus_blk.apply, params, xp, n_valid=n)
    np.testing.assert_allclose(np.asarray(got)[:, :n],
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=3e-2)

    # and stays close to the exact f32 Block (absolute bf16-scale band)
    f32_blk = Block(num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
                    ln_eps=1e-6)
    exact, _ = f32_blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got)[:, :n], np.asarray(exact),
                               rtol=5e-2, atol=5e-2)


def test_fused_block_param_tree_matches(rng):
    """Both paths must share one checkpoint format (same tree, same init)."""
    ref_blk = Block(num_heads=2, mlp_ratio=4.0, qkv_bias=True, ln_eps=1e-6)
    fus_blk = Block(num_heads=2, mlp_ratio=4.0, qkv_bias=True, ln_eps=1e-6,
                    use_fused_block=True)
    x = jnp.zeros((2, 16, 64))
    p_ref = ref_blk.init(jax.random.PRNGKey(7), x)
    p_fus = _interpret(fus_blk.init, jax.random.PRNGKey(7), x)
    ref_paths = jax.tree_util.tree_structure(p_ref)
    fus_paths = jax.tree_util.tree_structure(p_fus)
    assert ref_paths == fus_paths
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fus)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vit256_fused_block_forward_parity(rng):
    """Full ViT (tiny depth) CLS parity: fused-block net vs plain net on
    the same variables, pixels in."""
    base = dataclasses.replace(VIT_CONFIGS["vit_small"], depth=2,
                               embed_dim=64, num_heads=2,
                               dtype=jnp.bfloat16)
    fused = dataclasses.replace(base, use_fused_block=True)
    m0 = VisionTransformer(base)
    m1 = VisionTransformer(fused)
    x = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    v = m0.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m0.apply(v, x))
    got = np.asarray(_interpret(m1.apply, v, x))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=3e-2)


def test_vit256_fused_block_attention_paths(rng):
    """get_last_selfattention / get_intermediate_layers must pad + thread
    n_valid under use_fused_block (the production TPU encoder config) —
    regression for the unpadded block walk that crashed the heatmap path
    (explain/hierarchical.py region_attention_cls_maps)."""
    base = dataclasses.replace(VIT_CONFIGS["vit_small"], depth=2,
                               embed_dim=64, num_heads=2,
                               dtype=jnp.bfloat16)
    fused = dataclasses.replace(base, use_fused_block=True)
    m0 = VisionTransformer(base)
    m1 = VisionTransformer(fused)
    x = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    v = m0.init(jax.random.PRNGKey(0), x)

    want = np.asarray(m0.apply(v, x, method=m0.get_last_selfattention))
    got = np.asarray(_interpret(m1.apply, v, x,
                                method=m1.get_last_selfattention))
    assert got.shape == want.shape  # [B, heads, N, N], N unpadded (257)
    assert got.shape[-1] == 257
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=3e-2)

    w_int = m0.apply(v, x, method=m0.get_intermediate_layers)
    g_int = _interpret(m1.apply, v, x, method=m1.get_intermediate_layers)
    assert len(g_int) == len(w_int)
    for g, w in zip(g_int, w_int):
        assert g.shape == w.shape  # padded tokens must be sliced away
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-2, atol=5e-2)


def test_fused_block_vmem_fallback(rng):
    """Shapes whose score blocks exceed the kernel's VMEM budget must run
    the exact XLA path — unpadded, bitwise-equal to a plain Block — instead
    of compiling an overflowing kernel (cf. ADVICE r2 on flash attention)."""
    from hipt_abmil_atec23_tpu.models.vit import (
        _pad_tokens, fused_block_group)

    assert fused_block_group(512, 264) == 4       # production shape
    assert fused_block_group(3, 264) == 1         # batch not divisible
    assert fused_block_group(2, 4096) is None     # beyond VMEM budget

    x = jnp.asarray(rng.normal(size=(1, 4096, 16)).astype(np.float32))
    tok, n = _pad_tokens(x)
    assert n is None and tok is x  # no padding at infeasible shapes

    ref_blk = Block(num_heads=2, mlp_ratio=1.0, qkv_bias=True, ln_eps=1e-6)
    fus_blk = Block(num_heads=2, mlp_ratio=1.0, qkv_bias=True, ln_eps=1e-6,
                    use_fused_block=True)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    want, _ = ref_blk.apply(params, x)
    # no interpret shim: this must never reach pallas_call
    got, _ = fus_blk.apply(params, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vit4k_fused_block_attention_path(rng):
    base = ViT4KConfig(input_embed_dim=32, output_embed_dim=32, depth=2,
                       num_heads=2, dtype=jnp.bfloat16)
    fused = dataclasses.replace(base, use_fused_block=True)
    m0 = VisionTransformer4K(base)
    m1 = VisionTransformer4K(fused)
    g = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    v = m0.init(jax.random.PRNGKey(0), g)
    want = np.asarray(m0.apply(v, g, method=m0.get_last_selfattention))
    got = np.asarray(_interpret(m1.apply, v, g,
                                method=m1.get_last_selfattention))
    assert got.shape == want.shape and got.shape[-1] == 17
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=3e-2)


def test_vit4k_fused_block_forward_parity(rng):
    base = ViT4KConfig(input_embed_dim=32, output_embed_dim=32, depth=2,
                       num_heads=2, dtype=jnp.bfloat16)
    fused = dataclasses.replace(base, use_fused_block=True)
    m0 = VisionTransformer4K(base)
    m1 = VisionTransformer4K(fused)
    g = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    v = m0.init(jax.random.PRNGKey(0), g)
    want = np.asarray(m0.apply(v, g))
    got = np.asarray(_interpret(m1.apply, v, g))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=3e-2)
