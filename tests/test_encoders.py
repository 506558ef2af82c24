"""Encoder parity tests: bicubic interp, ViT-256, ViT-4K, fused HIPT_4K.

Oracles are the reference's torch modules instantiated with random weights
(imported read-only from /root/reference, never copied) — this validates both
the flax architectures and the torch->flax converters (SURVEY.md §4 plan #3).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps

from hipt_abmil_atec23_tpu.models.vit import vit_small, vit4k_xs
from hipt_abmil_atec23_tpu.models.hipt import HIPT4K, hipt_eval_normalize, center_crop_multiple
from hipt_abmil_atec23_tpu.models.convert import (
    vit256_params_from_torch, vit4k_params_from_torch, hipt_params_from_torch)
from hipt_abmil_atec23_tpu.ops.interpolate import bicubic_resize_2d, interpolate_pos_embed


def _import_reference_vits():
    stub_reference_deps()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from HIPT_4K import vision_transformer as vits
        from HIPT_4K import vision_transformer4k as vits4k
    finally:
        sys.path.remove(REFERENCE_DIR)
    return vits, vits4k


# ---------------------------------------------------------------------------
# bicubic interpolation
# ---------------------------------------------------------------------------

def test_bicubic_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    x = rng.normal(size=(1, 14, 14, 32)).astype(np.float32)
    # torch semantics: scale_factor with recompute_scale_factor=False
    scale = ((16 + 0.1) / 14, (16 + 0.1) / 14)
    ours = np.asarray(bicubic_resize_2d(jnp.asarray(x), (16, 16), scale))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, scale_factor=scale, mode="bicubic",
                        recompute_scale_factor=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bicubic_identity_when_same_grid(rng):
    pe = jnp.asarray(rng.normal(size=(1, 197, 64)).astype(np.float32))
    out = interpolate_pos_embed(pe, (14, 14))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))


# ---------------------------------------------------------------------------
# ViT parity
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_vit256_parity(rng):
    import torch
    vits, _ = _import_reference_vits()
    tmodel = vits.vit_small(patch_size=16, num_classes=0)
    tmodel.eval()

    params = vit256_params_from_torch(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    model = vit_small()

    x = rng.normal(size=(2, 256, 256, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmodel(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_vit256_last_selfattention_parity(rng):
    import torch
    vits, _ = _import_reference_vits()
    tmodel = vits.vit_small(patch_size=16, num_classes=0)
    tmodel.eval()
    params = vit256_params_from_torch(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    model = vit_small()
    x = rng.normal(size=(1, 256, 256, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmodel.get_last_selfattention(
            torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x),
                                  method=model.get_last_selfattention))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_vit4k_parity(rng):
    import torch
    _, vits4k = _import_reference_vits()
    tmodel = vits4k.vit4k_xs(num_classes=0)
    tmodel.eval()
    params = vit4k_params_from_torch(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    model = vit4k_xs()

    # grid of 16x16 ViT-256 CLS features, 384-d
    grid = rng.normal(size=(1, 16, 16, 384)).astype(np.float32)
    # reference consumes [1, 384, w, h] with token order iw*h+ih == our
    # row-major (igh*gw+igw) when w axis == our gh axis
    tgrid = torch.tensor(grid).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref = tmodel(tgrid).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(grid)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_hipt4k_fused_parity(rng):
    """Our single fused graph == the reference's two-stage chunked pipeline
    (crop -> unfold -> ViT-256 in minibatches -> regrid -> ViT-4K,
    reference: hipt_4k.py:48-76), on a 1024x1024 region (4x4 tiles)."""
    import torch
    from einops import rearrange
    vits, vits4k = _import_reference_vits()
    t256 = vits.vit_small(patch_size=16, num_classes=0); t256.eval()
    t4k = vits4k.vit4k_xs(num_classes=0); t4k.eval()

    params = hipt_params_from_torch(
        {k: v.numpy() for k, v in t256.state_dict().items()},
        {k: v.numpy() for k, v in t4k.state_dict().items()})
    model = HIPT4K()

    img = rng.integers(0, 255, size=(1, 1024, 1024, 3)).astype(np.uint8)
    x = np.asarray(hipt_eval_normalize(jnp.asarray(img)))

    # reference-style torch pipeline as oracle
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)          # [1,3,H,W]
        batch = xt.unfold(2, 256, 256).unfold(3, 256, 256)
        batch = rearrange(batch, "b c p1 p2 w h -> (b p1 p2) c w h")
        cls256 = t256(batch)                               # [16, 384]
        grid = cls256.reshape(4, 4, 384).transpose(0, 1).transpose(0, 2)
        ref = t4k(grid.unsqueeze(0)).numpy()               # [1, 192]

    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)


def test_hipt_center_crop_and_normalize():
    img = np.zeros((1, 600, 700, 3), np.uint8)
    out = center_crop_multiple(img, 256)
    assert out.shape == (1, 512, 512, 3)
    x = hipt_eval_normalize(jnp.asarray(np.full((2, 2, 3), 255, np.uint8)))
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-6)
    x0 = hipt_eval_normalize(jnp.asarray(np.zeros((2, 2, 3), np.uint8)))
    np.testing.assert_allclose(np.asarray(x0), -1.0, atol=1e-6)


def test_hipt_asset_dict_shapes(rng):
    model = HIPT4K()
    x = jnp.asarray(rng.normal(size=(1, 512, 512, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    assets = model.apply(params, x, method=model.asset_dict)
    assert assets["features_cls256"].shape == (1, 4, 384)
    assert assets["features_mean256"].shape == (1, 384)
    assert assets["features_cls4k"].shape == (1, 192)
    assert assets["features_mean256_cls4k"].shape == (1, 576)


def test_dino_head_shapes_and_norm():
    """DINOHead (reference: vision_transformer.py:296-330): bottleneck is
    L2-normalized and the weight-normalized prototype layer has unit-norm
    columns, so logits are bounded by 1."""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.models.vit import DINOHead

    head = DINOHead(out_dim=128, nlayers=3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 384)),
                    jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (4, 128)
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-5)
