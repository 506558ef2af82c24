"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4 plan #4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
from hipt_abmil_atec23_tpu.models import CLAM_SB
from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh
from hipt_abmil_atec23_tpu.parallel.fold_parallel import train_folds_parallel
from hipt_abmil_atec23_tpu.parallel.sharded_bag import sharded_clam_forward
from hipt_abmil_atec23_tpu.utils.config import (
    ExperimentConfig, BagConfig, ModelConfig, TrainConfig, TaskConfig)


def test_mesh_construction():
    mesh = make_mesh([("fold", 4), ("data", 2)])
    assert mesh.shape == {"fold": 4, "data": 2}
    with pytest.raises(ValueError):
        make_mesh([("fold", 3)])


def test_fold_parallel_training_on_mesh(tmp_path):
    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=48, feat_dim=192, signal=1.5,
        signal_fraction=0.4, seed=1)
    cfg = ExperimentConfig(
        exp_code="fp", results_dir=str(tmp_path / "results"),
        task=TaskConfig(name="s", n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=64, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig(lr=1e-3, reg=1e-5, max_epochs=12, min_epochs=1,
                          early_stopping=False, k=4, seed=3,
                          weighted_sample=True))
    folds = [make_fold_datasets(manifest, store, cfg, f) for f in range(4)]
    mesh = make_mesh([("fold", 4)], devices=jax.devices()[:4])
    res = train_folds_parallel(cfg, folds, manifest.class_counts(),
                               mesh, verbose=False)
    assert res.summary["test_auc"].shape == (4,)
    # fold-parallel training must actually learn the signal
    assert res.summary["test_auc"].mean() > 0.7, res.summary


def test_sharded_bag_matches_single_device(rng):
    """Instance-sharded CLAM forward == unsharded forward."""
    n, d = 256, 192
    bag = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones((n,), bool)
    mask[200:] = False
    model = CLAM_SB(size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(bag), None)
    ref = model.apply(params, jnp.asarray(bag), jnp.asarray(mask))

    mesh = make_mesh([("inst", 8)])
    logits, a_raw = sharded_clam_forward(params, jnp.asarray(bag),
                                         jnp.asarray(mask), mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref.logits),
                               rtol=2e-4, atol=1e-5)
    # raw attention matches on valid instances
    np.testing.assert_allclose(np.asarray(a_raw)[0, :200],
                               np.asarray(ref.a_raw)[0, :200],
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("fused_impl", ["grid", "dma"])
def test_sharded_bag_fused_local_op(rng, fused_impl):
    """use_fused=True: the Pallas partial kernel (both the grid-pipelined
    and DMA-ring variants) as the sequence-parallel local op (interpret
    mode on CPU) == unsharded CLAM forward."""
    import functools
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    from hipt_abmil_atec23_tpu.ops import gated_attention_pool as gap

    n, d = 1024, 192
    bag = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones((n,), bool)
    mask[1000:] = False
    model = CLAM_SB(size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(bag), None)
    ref = model.apply(params, jnp.asarray(bag), jnp.asarray(mask))

    mesh = make_mesh([("inst", 8)])
    orig = pl.pallas_call
    with mock.patch.object(gap.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        logits, a_raw = sharded_clam_forward(
            params, jnp.asarray(bag), jnp.asarray(mask), mesh,
            use_fused=True, fused_impl=fused_impl)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref.logits),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_raw)[0, :1000],
                               np.asarray(ref.a_raw)[0, :1000],
                               rtol=2e-4, atol=1e-5)


def test_sharded_bag_training_matches_unsharded(rng):
    """Sequence-parallel TRAINING: gradients through the sharded forward's
    collectives == unsharded gradients, and an optimizer step stays in
    lockstep — exact full-bag training, no subsampling."""
    import optax
    from hipt_abmil_atec23_tpu.parallel.sharded_bag import (
        sharded_bag_train_step, sharded_clam_loss)

    n, d = 512, 192
    bag = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < 480)
    label = 1
    model = CLAM_SB(size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0), bag, None)
    mesh = make_mesh([("inst", 8)])

    # gradient parity
    def ref_loss(p):
        out = model.apply(p, bag, mask)
        return -jax.nn.log_softmax(out.logits[0])[label]
    ref_g = jax.grad(ref_loss)(params)
    sh_g = jax.grad(sharded_clam_loss)(params, bag, mask, label, mesh)
    # atol absorbs f32 cancellation noise on analytically-ZERO entries
    # (attn_c bias is softmax-shift-invariant; verified ~1e-16 in f64)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1.5e-3),
        ref_g, sh_g)

    # one optimizer step stays in lockstep
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    p1, _, loss = sharded_bag_train_step(params, opt_state, tx, bag, mask,
                                         label, mesh)
    g = jax.grad(ref_loss)(params)
    upd, _ = tx.update(g, tx.init(params), params)
    p1_ref = optax.apply_updates(params, upd)
    # Adam's first step is ~lr*sign(g): on the analytically-zero
    # shift-invariant bias, f32 gradient noise produces a full lr-sized
    # step in either run — bound the parity by one lr quantum (1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1.5e-3),
        p1, p1_ref)
    assert np.isfinite(float(loss))


def test_full_bag_sharded_training_learns(tmp_path):
    """Exact full-bag trainer (instance axis over the 8-device mesh) learns
    the MIL signal without any subsampling."""
    from hipt_abmil_atec23_tpu.data.bags import BagDataset
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.parallel.full_bag_train import (
        train_full_bags_sharded)
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    manifest, store = make_synthetic_bags(
        str(tmp_path), n_slides=28, feat_dim=192, signal=1.5,
        signal_fraction=0.4, bag_range=(300, 900), seed=9)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=None),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig(lr=2e-3, max_epochs=6, seed=0))
    ids = list(manifest.slide_ids)
    mk = lambda sel: BagDataset([ids[i] for i in sel],
                                manifest.labels[list(sel)], store, cfg.bags)
    mesh = make_mesh([("inst", 8)])
    params, history = train_full_bags_sharded(
        cfg, mk(range(20)), mk(range(20, 28)), mesh, verbose=False)
    assert history[-1]["val_auc"] > 0.85, history
    assert history[-1]["train_loss"] < history[0]["train_loss"]
