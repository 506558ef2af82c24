"""`cli parity` — the one-command real-weights AUC parity recipe
(VERDICT r3 item 7): given the released DINO checkpoints and a dataset
CSV, runs tile -> encode (HIPT_4K) -> splits -> k-fold train ->
bootstrap and prints the AUC vs the reference headline
(0.6462 +/- 0.0328, reference docs/README.md:92).

The real ckpts/dataset don't exist in this environment, so this drives
the FULL recipe on fabricated DINO-layout .pth files (the exact layout
hipt_model_utils.py:39-110 consumes) + synthetic YCbCr slides — proving
the recipe is executable end to end the day the real inputs appear.
"""
import json
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps


@pytest.mark.slow
@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_parity_recipe_end_to_end(tmp_path):
    import torch

    stub_reference_deps()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from HIPT_4K import vision_transformer as vits
        from HIPT_4K import vision_transformer4k as vits4k
    finally:
        sys.path.remove(REFERENCE_DIR)

    # fabricated production-layout DINO ckpts (teacher dict, DDP
    # 'module.' + multicrop 'backbone.' prefixes, distractor keys)
    torch.manual_seed(0)
    ckpt256 = str(tmp_path / "vit256_small_dino.pth")
    torch.save({"teacher": {f"module.backbone.{k}": v for k, v in
                            vits.vit_small(patch_size=16, num_classes=0)
                            .state_dict().items()},
                "student": {"junk": torch.zeros(1)}}, ckpt256)
    ckpt4k = str(tmp_path / "vit4k_xs_dino.pth")
    torch.save({"teacher": {f"module.{k}": v for k, v in
                            vits4k.vit4k_xs(num_classes=0)
                            .state_dict().items()},
                "optimizer": {}}, ckpt4k)

    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide

    slide_dir = tmp_path / "slides"
    slide_dir.mkdir()
    rows = ["slide_id,label"]
    for i in range(12):
        sid = f"s{i}"
        # full-tissue stain-colored noise: every 512px region passes the
        # contour test, so the recipe's stages all have work on every
        # slide (the recipe itself is what's under test, not seg recall)
        rng_i = np.random.default_rng(i)
        img = np.clip(np.array([199, 124, 180], np.int16)
                      + rng_i.integers(-25, 25, (1024, 1024, 3),
                                       dtype=np.int16),
                      0, 255).astype(np.uint8)
        write_synthetic_slide(str(slide_dir / f"{sid}.tif"), 1024, 1024,
                              n_levels=2, ycbcr420=True, image=img)
        rows.append(f"{sid},{'effective' if i % 2 else 'invalid'}")
    csv_path = str(tmp_path / "dataset.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")

    from hipt_abmil_atec23_tpu.cli import main
    work = str(tmp_path / "work")
    rc = main(["parity", "--slide_dir", str(slide_dir), "--csv_path",
               csv_path, "--vit256_ckpt", ckpt256, "--vit4k_ckpt", ckpt4k,
               "--work_dir", work, "--slide_ext", ".tif",
               # k=3 is the smallest k the reference's val=next-fold split
               # design leaves a non-empty train partition for
               "--region_size", "512", "--k", "3", "--max_epochs", "2",
               "--min_epochs", "1", "--encode_batch_size", "2",
               "--bootstraps", "500", "--use_otsu", "--a_t", "1",
               "--extra_train_args=--no_early_stopping"])
    assert rc in (0, None)

    # every stage left its artifact, and the verdict is a real bootstrap
    assert os.path.exists(os.path.join(work, "tiles", "patches", "s0.h5"))
    assert os.path.exists(os.path.join(work, "feats", "pt_files", "s0.pt"))
    assert os.path.exists(os.path.join(work, "splits", "splits_0.csv"))
    assert os.path.exists(os.path.join(work, "results", "fold_2.csv"))
    summary = json.load(open(os.path.join(work, "parity_summary.json")))
    assert {"auc", "auc_std", "target_auc", "within_band"} <= set(summary)
    assert 0.0 <= summary["auc"] <= 1.0
    assert summary["target_auc"] == 0.6462
