"""LeViT numerical parity against a torch oracle of the original
architecture (Graham et al. ICCV 2021 — the model behind the reference's
`timm.create_model('levit_256')`, extract_features_fp.py:211-212).

The oracle below re-implements the original facebookresearch/LeViT modules
(Conv2d_BN / Linear_BN / Residual / Attention / AttentionSubsample) so its
state dict has the original key layout, which is what
levit_params_from_torch consumes. BN running stats are randomized to verify
the eval-time BN folding is exact."""
import itertools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from hipt_abmil_atec23_tpu.models.levit import (  # noqa: E402
    LeViT, SPECS, levit_params_from_torch)


class Conv2d_BN(tnn.Sequential):
    def __init__(self, a, b, ks=3, stride=2, pad=1):
        super().__init__()
        self.add_module("c", tnn.Conv2d(a, b, ks, stride, pad, bias=False))
        self.add_module("bn", tnn.BatchNorm2d(b))


class Linear_BN(tnn.Sequential):
    def __init__(self, a, b):
        super().__init__()
        self.add_module("c", tnn.Linear(a, b, bias=False))
        self.add_module("bn", tnn.BatchNorm1d(b))

    def forward(self, x):
        x = self.c(x)
        return self.bn(x.flatten(0, 1)).reshape_as(x)


class Residual(tnn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, x):
        return x + self.m(x)


class Attention(tnn.Module):
    def __init__(self, dim, key_dim, num_heads, attn_ratio, resolution):
        super().__init__()
        self.num_heads, self.scale = num_heads, key_dim ** -0.5
        self.key_dim = key_dim
        self.d = int(attn_ratio * key_dim)
        self.dh = self.d * num_heads
        h = self.dh + key_dim * num_heads * 2
        self.qkv = Linear_BN(dim, h)
        self.proj = tnn.Sequential(tnn.Hardswish(), Linear_BN(self.dh, dim))
        points = list(itertools.product(range(resolution), repeat=2))
        offsets, idxs = {}, []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                idxs.append(offsets.setdefault(off, len(offsets)))
        self.attention_biases = tnn.Parameter(
            torch.zeros(num_heads, len(offsets)))
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(points), len(points)))

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x)
        q, k, v = qkv.view(B, N, self.num_heads, -1).split(
            [self.key_dim, self.key_dim, self.d], dim=3)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * self.scale \
            + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, self.dh)
        return self.proj(x)


class AttentionSubsample(tnn.Module):
    def __init__(self, in_dim, out_dim, key_dim, num_heads, attn_ratio,
                 stride, resolution):
        super().__init__()
        self.num_heads, self.scale = num_heads, key_dim ** -0.5
        self.key_dim, self.stride = key_dim, stride
        self.resolution = resolution
        self.resolution_ = (resolution - 1) // stride + 1
        self.d = int(attn_ratio * key_dim)
        self.dh = self.d * num_heads
        self.kv = Linear_BN(in_dim, key_dim * num_heads + self.dh)
        self.q = tnn.Sequential(
            tnn.Identity(), Linear_BN(in_dim, key_dim * num_heads))
        self.proj = tnn.Sequential(tnn.Hardswish(),
                                   Linear_BN(self.dh, out_dim))
        points = list(itertools.product(range(resolution), repeat=2))
        points_ = list(itertools.product(range(self.resolution_), repeat=2))
        offsets, idxs = {}, []
        for p1 in points_:
            for p2 in points:
                off = (abs(p1[0] * stride - p2[0]),
                       abs(p1[1] * stride - p2[1]))
                idxs.append(offsets.setdefault(off, len(offsets)))
        self.attention_biases = tnn.Parameter(
            torch.zeros(num_heads, len(offsets)))
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(points_), len(points)))

    def forward(self, x):
        B, N, C = x.shape
        k, v = self.kv(x).view(B, N, self.num_heads, -1).split(
            [self.key_dim, self.d], dim=3)
        k, v = k.permute(0, 2, 1, 3), v.permute(0, 2, 1, 3)
        xq = x.view(B, self.resolution, self.resolution, C)[
            :, ::self.stride, ::self.stride].reshape(B, -1, C)
        q = self.q(xq).view(B, -1, self.num_heads, self.key_dim
                            ).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.scale \
            + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, -1, self.dh)
        return self.proj(x)


class TorchLeViT(tnn.Module):
    def __init__(self, spec):
        super().__init__()
        ed, kd = spec["embed_dim"], spec["key_dim"]
        self.patch_embed = tnn.Sequential(
            Conv2d_BN(3, ed[0] // 8), tnn.Hardswish(),
            Conv2d_BN(ed[0] // 8, ed[0] // 4), tnn.Hardswish(),
            Conv2d_BN(ed[0] // 4, ed[0] // 2), tnn.Hardswish(),
            Conv2d_BN(ed[0] // 2, ed[0]))
        blocks, res = [], 14
        for si, (dim, depth, nh) in enumerate(zip(ed, spec["depth"],
                                                  spec["num_heads"])):
            for _ in range(depth):
                blocks.append(Residual(Attention(dim, kd, nh, 2, res)))
                blocks.append(Residual(tnn.Sequential(
                    Linear_BN(dim, 2 * dim), tnn.Hardswish(),
                    Linear_BN(2 * dim, dim))))
            if si + 1 < len(ed):
                blocks.append(AttentionSubsample(
                    dim, ed[si + 1], kd, dim // kd, 4, 2, res))
                res = (res - 1) // 2 + 1
                blocks.append(Residual(tnn.Sequential(
                    Linear_BN(ed[si + 1], 2 * ed[si + 1]), tnn.Hardswish(),
                    Linear_BN(2 * ed[si + 1], ed[si + 1]))))
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        x = self.patch_embed(x)
        x = x.flatten(2).transpose(1, 2)
        x = self.blocks(x)
        return x.mean(1)


def _randomize_bn_stats(model, gen):
    """Non-trivial running stats so the folding math is actually exercised."""
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    gen.normal(0, 0.1, m.running_mean.shape
                               ).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    gen.uniform(0.9, 1.1, m.running_var.shape
                                ).astype(np.float32)))
                m.weight.copy_(torch.from_numpy(
                    gen.uniform(0.9, 1.1, m.weight.shape
                                ).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    gen.normal(0, 0.05, m.bias.shape).astype(np.float32)))


@pytest.mark.parametrize("spec_name", ["levit_128s", "levit_256"])
def test_levit_torch_parity(spec_name):
    gen = np.random.default_rng(0)
    torch.manual_seed(0)
    oracle = TorchLeViT(SPECS[spec_name]).eval()
    _randomize_bn_stats(oracle, gen)
    with torch.no_grad():
        for p in oracle.parameters():
            p.normal_(0, 0.02)
    _randomize_bn_stats(oracle, gen)  # re-apply after the blanket normal_

    x = gen.normal(0, 1, (2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = LeViT(spec=spec_name)
    params = levit_params_from_torch(sd, spec=spec_name)
    got = np.asarray(model.apply(params, x))
    assert got.shape == want.shape == (2, SPECS[spec_name]["embed_dim"][-1])
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_levit_ckpt_through_encoder_zoo(tmp_path):
    """--levit_ckpt wiring: a torch checkpoint saved in the original layout
    loads through build_encoder and produces the converted model's output."""
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.encode import build_encoder
    from hipt_abmil_atec23_tpu.models.resnet import imagenet_normalize
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    torch.manual_seed(1)
    oracle = TorchLeViT(SPECS["levit_128s"]).eval()
    ckpt = str(tmp_path / "levit.pth")
    torch.save(oracle.state_dict(), ckpt)

    enc = build_encoder(EncoderConfig(model_type="levit_128s", batch_size=2,
                                      dtype="float32", levit_ckpt=ckpt))
    batch = np.random.default_rng(0).integers(
        0, 255, size=(2, 224, 224, 3)).astype(np.uint8)
    got = np.asarray(enc.apply(jnp.asarray(batch)))

    model = LeViT(spec="levit_128s")
    params = levit_params_from_torch(
        {k: v.numpy() for k, v in oracle.state_dict().items()})
    want = np.asarray(model.apply(params, imagenet_normalize(
        jnp.asarray(batch))))
    np.testing.assert_allclose(got, want, atol=1e-5)
