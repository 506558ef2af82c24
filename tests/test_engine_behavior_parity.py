"""ENGINE-level behavioral parity: the reference's own torch training loop
vs our jitted engine on IDENTICAL synthetic bags and hyperparameters.

This goes beyond model-forward parity (test_abmil): it drives the reference's
train_loop + CLAM_SB + torch Adam (imported read-only) against our
train_fold on the same data and asserts both reach comparable validation
AUC — evidence the optimization semantics (loss, optimizer, schedule) match,
not just the forward math.
"""
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_training_behavior_parity(tmp_path, rng):
    import torch

    stub_reference_deps()
    # the PyPI 'datasets' package shadows the reference's datasets/ dir;
    # point a namespace module at the reference for the import, then restore
    import types
    saved = {k: sys.modules.get(k)
             for k in ("datasets", "datasets.dataset_generic",
                       "datasets.dataset_h5")}
    for k, v in list(sys.modules.items()):
        if k == "datasets" or k.startswith("datasets."):
            del sys.modules[k]
    ref_datasets = types.ModuleType("datasets")
    ref_datasets.__path__ = [f"{REFERENCE_DIR}/datasets"]
    sys.modules["datasets"] = ref_datasets
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from models.model_clam import CLAM_SB as TorchSB
        from utils.core_utils import train_loop, validate
    finally:
        sys.path.remove(REFERENCE_DIR)
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            elif k in sys.modules and sys.modules[k] is ref_datasets:
                del sys.modules[k]

    # ---- shared synthetic data (learnable MIL signal)
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=60, feat_dim=192, signal=1.5,
        signal_fraction=0.4, bag_range=(60, 120), seed=11)
    ids = list(manifest.slide_ids)
    labels = manifest.labels
    train_idx, val_idx = list(range(0, 40)), list(range(40, 60))
    bags = {s: store.load_features(s) for s in ids}

    epochs, lr, reg = 15, 1e-3, 1e-5

    # ---- reference loop (torch, one slide per optimizer step)
    tmodel = TorchSB(size_arg="hipt_smaller", n_classes=2)
    tmodel.eval()  # no dropout configured anyway; keep deterministic
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr, weight_decay=reg)
    ce = torch.nn.CrossEntropyLoss()
    g = np.random.default_rng(0)
    train_items = [(torch.tensor(bags[ids[i]]), torch.tensor([int(labels[i])]))
                   for i in train_idx]
    val_items = [(torch.tensor(bags[ids[i]]), torch.tensor([int(labels[i])]))
                 for i in val_idx]
    for epoch in range(epochs):
        order = g.permutation(len(train_items))
        # reference train_loop semantics (core_utils.py:373-426)
        train_loop(epoch, tmodel, [train_items[i] for i in order], opt, 2,
                   writer=None, loss_fn=ce)
    _, _, _, ref_auc = validate(0, epochs - 1, tmodel, val_items, 2,
                                results_dir=str(tmp_path),
                                loss_fn=ce)

    # ---- our engine, same data/hyperparams (B=1 = same step schedule)
    from hipt_abmil_atec23_tpu.data.bags import BagDataset
    from hipt_abmil_atec23_tpu.engine.train import train_fold
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)
    cfg = ExperimentConfig(
        exp_code="parity", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=0, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(lr=lr, reg=reg, max_epochs=epochs, min_epochs=1,
                          early_stopping=False, k=3, seed=2,
                          weighted_sample=False, bag_loss="ce"))
    mk = lambda sel: BagDataset([ids[i] for i in sel], labels[list(sel)],
                                store, cfg.bags)
    res = train_fold(cfg, 0, mk(train_idx), mk(val_idx), mk(val_idx),
                     np.array([30, 30]), verbose=False)

    # Both engines learn the signal into the same quality regime. (With 20
    # val slides the AUC is seed-noisy — measured spread across init seeds is
    # 0.81-1.0 for ours and similar for torch — so assert the regime, not a
    # tight delta.)
    assert ref_auc > 0.85, f"reference failed to learn: {ref_auc}"
    assert res.val_auc > 0.85, f"our engine failed to learn: {res.val_auc}"
    assert abs(res.val_auc - ref_auc) < 0.15, (res.val_auc, ref_auc)
