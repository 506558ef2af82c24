"""Benchmark driver. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current scope (round 1): the CLAM-SB gated-attention ABMIL training stage on
precomputed HIPT feature bags — BASELINE.json config #1 and the reference's
primary workflow (main.py on pt files, winning config: hipt_smaller, 75
patches/slide). Measures optimizer steps over slides/sec on the TPU chip via
the jitted scan-epoch engine, against the PyTorch reference loop semantics
executed with torch on this host's CPU (the reference's own published env is
a GTX 1660 desktop; no GPU is available here, so vs_baseline understates
nothing — it is our chip vs their loop on available hardware).

As encode/tile stages land, this bench graduates to the BASELINE.json
north-star metric: end-to-end WSI slides/hour (tile -> HIPT -> ABMIL).
"""
from __future__ import annotations

import json
import time

import numpy as np


N_SLIDES = 512          # synthetic slides per epoch
BAG = 75                # instances/bag (winning config)
PAD = 80
DIM = 192               # HIPT feature dim
BATCH = 8               # bags per optimizer step on TPU
EPOCHS_TIMED = 3


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from hipt_abmil_atec23_tpu.engine.train import build_step_fns
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TrainConfig, TaskConfig)

    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=BAG, batch_size=BATCH),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          drop_out=0.85),
        train=TrainConfig(lr=1e-3, reg=0.5, bag_loss="ce"))
    fns = build_step_fns(cfg, np.array([N_SLIDES // 2] * 2), PAD, DIM)

    rng = np.random.default_rng(0)
    steps = N_SLIDES // BATCH
    feats = jnp.asarray(rng.normal(size=(steps, BATCH, PAD, DIM))
                        .astype(np.float32))
    mask = jnp.asarray(np.ones((steps, BATCH, PAD), bool))
    labels = jnp.asarray(rng.integers(0, 2, size=(steps, BATCH))
                         .astype(np.int32))
    params = fns.init_params(jax.random.PRNGKey(0))
    opt_state = fns.tx.init(params)
    key = jax.random.PRNGKey(1)

    # warmup/compile
    out = fns.train_epoch(params, opt_state, feats, mask, labels, key)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for e in range(EPOCHS_TIMED):
        params, opt_state, bl, _, _ = fns.train_epoch(
            params, opt_state, feats, mask, labels,
            jax.random.fold_in(key, e))
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    return (N_SLIDES * EPOCHS_TIMED) / dt


def bench_torch_reference_loop() -> float:
    """The reference's training semantics (one slide per optimizer step,
    CLAM_SB forward/backward/adam — utils/core_utils.py:300-371) on host CPU
    torch, on identical data shapes."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, torch.get_num_threads()))

    class GatedAttn(nn.Module):
        def __init__(self, L, D):
            super().__init__()
            self.a = nn.Sequential(nn.Linear(L, D), nn.Tanh())
            self.b = nn.Sequential(nn.Linear(L, D), nn.Sigmoid())
            self.c = nn.Linear(D, 1)

        def forward(self, h):
            return self.c(self.a(h) * self.b(h))

    class SB(nn.Module):
        def __init__(self, in_dim=DIM, L=16, D=8, C=2):
            super().__init__()
            self.fc = nn.Sequential(nn.Linear(in_dim, L), nn.ReLU())
            self.attn = GatedAttn(L, D)
            self.cls = nn.Linear(L, C)

        def forward(self, x):
            h = self.fc(x)
            a = torch.softmax(self.attn(h).T, dim=1)
            return self.cls(a @ h)

    model = SB()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=0.5)
    ce = nn.CrossEntropyLoss()
    rng = np.random.default_rng(0)
    bags = torch.tensor(rng.normal(size=(64, BAG, DIM)).astype(np.float32))
    labels = torch.tensor(rng.integers(0, 2, size=64))

    # warmup
    for i in range(8):
        loss = ce(model(bags[i]), labels[i:i + 1])
        loss.backward(); opt.step(); opt.zero_grad()
    n = 128
    t0 = time.perf_counter()
    for i in range(n):
        j = i % 64
        loss = ce(model(bags[j]), labels[j:j + 1])
        loss.backward(); opt.step(); opt.zero_grad()
    return n / (time.perf_counter() - t0)


def main():
    tpu_rate = bench_tpu()
    ref_rate = bench_torch_reference_loop()
    print(json.dumps({
        "metric": "abmil_train_slides_per_sec",
        "value": round(tpu_rate, 2),
        "unit": "slides/sec",
        "vs_baseline": round(tpu_rate / ref_rate, 2),
    }))


if __name__ == "__main__":
    main()
