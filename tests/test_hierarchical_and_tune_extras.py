"""Hierarchical HIPT heatmaps, sampling-param tuning, train-state ckpts."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_hierarchical_region_heatmaps(rng):
    from hipt_abmil_atec23_tpu.explain.heatmaps import hierarchical_region_heatmaps
    from hipt_abmil_atec23_tpu.models.hipt import HIPT4K

    model = HIPT4K()
    x = jnp.asarray(rng.normal(size=(1, 512, 512, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    attn256, attn4k = model.apply(params, x, method=model.region_attention)
    attn256 = np.asarray(attn256)  # [4, 6, 257, 257]
    attn4k = np.asarray(attn4k)    # [1, 6, 5, 5]
    assert attn256.shape == (4, 6, 257, 257)
    assert attn4k.shape[0] == 1 and attn4k.shape[2] == 5

    maps = hierarchical_region_heatmaps(attn256, attn4k, (2, 2))
    assert maps["map256"].shape == (1, 6, 512, 512)
    assert maps["map4k"].shape == (1, 6, 512, 512)
    assert maps["combined"].shape == (1, 6, 6, 512, 512)
    for k in maps:
        assert np.isfinite(maps[k]).all()
        assert maps[k].min() >= 0.0 and maps[k].max() <= 1.0 + 1e-6


def test_tune_sampling_params(tmp_path, rng):
    from hipt_abmil_atec23_tpu.data.bags import BagDataset
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.tune import (
        tune_sampling_params, Choice)
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    manifest, store = make_synthetic_bags(str(tmp_path), n_slides=8,
                                          feat_dim=192, bag_range=(120, 200),
                                          seed=3)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=0),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig())
    ds = BagDataset(list(manifest.slide_ids), manifest.labels, store, cfg.bags)
    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, 192), jnp.float32), None)
    coords = {s: rng.integers(0, 10000,
                              size=(len(store.load_features(s)), 2))
              for s in manifest.slide_ids}
    space = {"resampling_iterations": Choice([2, 3]),
             "sampling_neighbors": Choice([4, 8])}
    out_csv = str(tmp_path / "s.csv")
    best, df = tune_sampling_params(cfg, ds, params, model,
                                    coords_lookup=coords, space=space,
                                    num_samples=2, output_csv=out_csv,
                                    verbose=False)
    assert set(best) == {"resampling_iterations", "sampling_neighbors"}
    assert len(df) == 2 and os.path.exists(out_csv)


def test_train_state_checkpoint_roundtrip(tmp_path):
    import optax
    from hipt_abmil_atec23_tpu.engine.checkpoint import (
        save_train_state, load_train_state)
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # take one step so optimizer state is nontrivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params2 = optax.apply_updates(params, updates)
    path = str(tmp_path / "state.msgpack")
    save_train_state(path, params2, opt_state, epoch=7)
    restored = load_train_state(path, params, tx.init(params))
    assert restored["epoch"] == 7
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(params2["w"]))
    # optimizer moments restored
    mu = restored["opt_state"][0].mu["w"]
    assert np.abs(np.asarray(mu)).sum() > 0


def test_multihost_helpers():
    from hipt_abmil_atec23_tpu.parallel.multihost import (
        init_multihost, global_mesh)
    n = init_multihost()  # single-process no-op
    assert n == 8
    mesh = global_mesh("fold")
    assert mesh.shape["fold"] == 8
