"""DRAS sampling: parity with the reference's sampling math + loop behavior."""
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps

from hipt_abmil_atec23_tpu.engine.sampling import (
    SamplingConfig, generate_sample_idxs, update_sampling_weights,
    knn_indices, dras_sample_slide)


def _ref_sampling_utils():
    stub_reference_deps()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from utils import sampling_utils
    finally:
        sys.path.remove(REFERENCE_DIR)
    return sampling_utils


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("rule", ["max", "average", "newest", "none"])
def test_update_weights_parity(rule, rng):
    su = _ref_sampling_utils()
    n, s, k = 200, 30, 8
    weights0 = rng.uniform(0.001, 1.0, n)
    weights0 /= weights0.sum()
    attn = rng.uniform(0, 1, s)
    nbrs = np.stack([rng.choice(n, k, replace=False) for _ in range(s)])
    sampled = list(rng.choice(n, 20, replace=False))

    ours = update_sampling_weights(weights0, attn, sampled, nbrs, k,
                                   power=0.15, sampling_update=rule,
                                   normalise=(rule != "average"))
    ref = su.update_sampling_weights(weights0.copy(), attn, list(sampled),
                                     nbrs.tolist(), k, power=0.15,
                                     sampling_update=rule,
                                     normalise=(rule != "average"))
    ref = np.asarray(ref)
    if rule == "average":
        # the reference's 'average' is an order-dependent running pairwise
        # average it itself calls "not a perfect method"; ours is the true
        # mean — only indices touched once are bit-identical
        flat = nbrs.ravel()
        once = np.bincount(flat, minlength=n) == 1
        np.testing.assert_allclose(ours[once], ref[once], rtol=1e-10)
    elif rule == "newest":
        # reference bug: its 'newest' branch computes new_attentions but
        # never folds them into sampling_weights (sampling_utils.py:173-176)
        # — a no-op. We implement the documented intent (overwrite touched
        # weights with pow(newest attention, power)); assert OUR semantics.
        flat = np.unique(nbrs.ravel())
        untouched = np.setdiff1d(np.arange(n), flat)
        w_expected = weights0.copy()
        for i in range(len(nbrs)):
            w_expected[nbrs[i]] = attn[i] ** 0.15
        w_expected[np.asarray(sampled)] = 0
        w_expected /= w_expected.sum()
        np.testing.assert_allclose(ours, w_expected, rtol=1e-10)
        assert not np.allclose(ours[flat], ref[flat])  # divergence is real
    else:
        np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_generate_sample_idxs_properties(rng):
    n = 500
    w = rng.uniform(0, 1, n)
    w /= w.sum()
    idxs = generate_sample_idxs(n, [], w, 50, num_random=10, rng=rng)
    assert len(idxs) == 50 and len(set(idxs)) == 50
    # grid-stratified initial sample covers distinct cells
    coords = rng.integers(0, 10000, size=(n, 2))
    gidx = generate_sample_idxs(n, [], None, 49, 49, rng, grid=True,
                                coords=coords)
    assert len(gidx) == 49


def test_knn_indices_exact(rng):
    X = rng.normal(size=(300, 2)).astype(np.float32)
    q = X[:5]
    idx = knn_indices(X, q, 4)
    # first neighbor of each query point is itself
    assert (idx[:, 0] == np.arange(5)).all()
    # validate against brute force numpy
    d = ((q[:, None] - X[None]) ** 2).sum(-1)
    ref = np.argsort(d, axis=1)[:, :4]
    assert (np.sort(idx) == np.sort(ref)).all()


def test_dras_converges_to_signal(rng):
    """Attention-guided sampling should concentrate the final sample on the
    high-attention region of the slide."""
    n = 4000
    coords = rng.integers(0, 40000, size=(n, 2)).astype(np.int64)
    # hot region must be larger than the total sampled budget: no-repeats
    # zeroing (reference semantics) exhausts tiny regions
    hot = (coords[:, 0] < 20000) & (coords[:, 1] < 20000)  # ~25%
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    lookup = {f.tobytes(): i for i, f in enumerate(feats)}

    def attention_fn(subset_feats):
        # oracle attention: high iff patch is in the hot region
        idx = np.array([lookup[f.tobytes()] for f in subset_feats])
        return np.where(hot[idx], 0.95, 0.05)

    cfg = SamplingConfig(samples_per_iteration=100, resampling_iterations=6,
                         sampling_neighbors=16, final_sample_size=100,
                         sampling_random=0.4, sampling_random_delta=0.05,
                         weight_smoothing=1.0)  # default 0.15 flattens hard
    res = dras_sample_slide(feats, coords, attention_fn, cfg,
                            np.random.default_rng(0))
    # final weighted draw concentrates in the hot region (reference
    # normalise=False loop semantics; measured 0.83 vs 0.24 base rate)
    frac_hot = hot[res.final_idxs].mean()
    assert frac_hot > 0.7, (frac_hot, hot.mean())
    # the bag actually classified = final draw + all sampled along the way
    # (reference --use_all_samples, core_utils_sampling.py:449-454); it is
    # larger than the final draw and also strongly enriched
    bag = res.bag_idxs
    assert len(bag) == len(res.final_idxs) + len(res.all_sampled)
    assert len(set(bag.tolist())) == len(bag)  # draws never repeat
    assert hot[bag].mean() > 2.0 * hot.mean()


def test_dras_fully_random_and_small_bags(rng):
    feats = rng.normal(size=(50, 4)).astype(np.float32)
    coords = rng.integers(0, 100, size=(50, 2))
    cfg = SamplingConfig(final_sample_size=100)
    res = dras_sample_slide(feats, coords, lambda x: np.ones(len(x)), cfg,
                            np.random.default_rng(0))
    assert len(res.final_idxs) == 50  # whole bag when smaller than target


def test_train_fold_sampling_integration(tmp_path, rng):
    """DRAS training end-to-end on synthetic bags with coords."""
    from hipt_abmil_atec23_tpu.data.bags import BagDataset, FeatureBagStore
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.sampling import train_fold_sampling
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TrainConfig, TaskConfig)

    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=18,
                                          feat_dim=192, bag_range=(150, 250),
                                          signal=1.5, signal_fraction=0.4,
                                          seed=4)
    cfg = ExperimentConfig(
        exp_code="dras", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=0, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(lr=1e-3, reg=1e-5, max_epochs=4, min_epochs=1,
                          early_stopping=False, k=3, seed=0,
                          weighted_sample=True))
    scfg = SamplingConfig(samples_per_iteration=32, resampling_iterations=3,
                          sampling_neighbors=8, final_sample_size=48,
                          no_sampling_epochs=2)
    ids = list(manifest.slide_ids)
    labels = manifest.labels
    mk = lambda sl: BagDataset([ids[i] for i in sl], labels[list(sl)], store,
                               cfg.bags)
    train_ds, val_ds, test_ds = mk(range(0, 10)), mk(range(10, 14)), mk(range(14, 18))
    coords_lookup = {s: rng.integers(0, 30000, size=(len(store.load_features(s)), 2))
                     for s in ids}
    res = train_fold_sampling(cfg, scfg, 0, train_ds, val_ds, test_ds,
                              manifest.class_counts(),
                              coords_lookup=coords_lookup, verbose=False)
    assert np.isfinite(res.test_auc)
    assert len(res.history) == 4
    # the sampled epochs actually ran (loss recorded after no_sampling_epochs)
    assert np.isfinite(res.history[-1]["train_loss"])


def test_eval_sampling_integration(tmp_path, rng):
    from hipt_abmil_atec23_tpu.data.bags import BagDataset
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.sampling import eval_sampling
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)
    import jax
    import jax.numpy as jnp

    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=6,
                                          feat_dim=192, bag_range=(150, 250),
                                          seed=5)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=0),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig())
    ds = BagDataset(list(manifest.slide_ids), manifest.labels, store, cfg.bags)
    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, 192), jnp.float32), None)
    scfg = SamplingConfig(samples_per_iteration=32, resampling_iterations=2,
                          sampling_neighbors=8, final_sample_size=48)
    coords_lookup = {s: rng.integers(0, 30000,
                                     size=(len(store.load_features(s)), 2))
                     for s in manifest.slide_ids}
    probs, counts = eval_sampling(cfg, scfg, ds, params, model,
                                  coords_lookup=coords_lookup)
    assert probs.shape == (6, 2)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    assert (counts > 0).all()


def test_dras_device_scan_variant(rng):
    """Fully on-device DRAS (one lax.scan dispatch for the whole loop):
    concentrates its final sample on the high-attention region like the
    host-loop reference implementation."""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.sampling import (
        SamplingConfig, dras_sample_slide_device)
    from hipt_abmil_atec23_tpu.models import CLAM_SB, build_mil_model

    n, d = 600, 192
    feats = rng.normal(size=(n, d)).astype(np.float32)
    # plant a salient direction in patches 100..200 and align the model's
    # attention with it by training-free construction: use a random model
    # but boost the planted patches' norm so gated attention scores move
    feats[100:200] *= 4.0
    coords = np.stack([np.arange(n) % 25, np.arange(n) // 25], 1) * 256
    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((8, d), jnp.float32), None)
    cfg = SamplingConfig(resampling_iterations=6, samples_per_iteration=64,
                         final_sample_size=96, sampling_neighbors=8,
                         sampling_type="spatial")
    res = dras_sample_slide_device(
        jnp.asarray(feats), coords, params, model, cfg,
        jax.random.PRNGKey(0))
    final = np.asarray(res.final_idxs)
    weights = np.asarray(res.weights)
    assert len(res.all_sampled) >= 64   # sampled set exposed for bag_idxs
    assert final.shape == (96,)
    assert len(np.unique(final)) == 96          # without replacement
    assert np.isfinite(weights).all() and (weights >= 0).all()
    # mechanism invariants (mirror the host loop's semantics):
    # visited patches are zeroed out; attention propagated to neighbors
    # lifts them off the 1e-4 floor; untouched patches stay at the floor
    assert (weights == 0).sum() >= 64            # >= one iteration's draws
    lifted = weights[(weights > 2e-4)]
    assert lifted.size > 0                       # kNN propagation happened
    # the final draw only picks non-zeroed patches
    assert (weights[final] > 0).all()
    # deterministic in the key; different keys give different draws
    import jax as _jax
    r2 = dras_sample_slide_device(
        jnp.asarray(feats), coords, params, model, cfg,
        _jax.random.PRNGKey(0))
    np.testing.assert_array_equal(final, np.asarray(r2.final_idxs))
    r3 = dras_sample_slide_device(
        jnp.asarray(feats), coords, params, model, cfg,
        _jax.random.PRNGKey(5))
    assert not np.array_equal(final, np.asarray(r3.final_idxs))


def test_eval_sampling_device_loop(tmp_path, rng):
    """eval_sampling(device_loop=True) classifies every slide via the
    one-dispatch DRAS and returns sane probabilities."""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.data.bags import BagDataset
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.sampling import (
        SamplingConfig, eval_sampling)
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    manifest, store = make_synthetic_bags(str(tmp_path), n_slides=6,
                                          feat_dim=192, bag_range=(200, 400),
                                          seed=2)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=0),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig())
    ds = BagDataset(list(manifest.slide_ids), manifest.labels, store,
                    cfg.bags)
    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, 192), jnp.float32), None)
    coords = {s: np.asarray(rng.integers(0, 10000,
                                         size=(len(store.load_features(s)), 2)))
              for s in manifest.slide_ids}
    scfg = SamplingConfig(resampling_iterations=3, samples_per_iteration=32,
                          final_sample_size=48, sampling_neighbors=8)
    probs, counts = eval_sampling(cfg, scfg, ds, params, model,
                                  coords_lookup=coords, device_loop=True)
    assert probs.shape == (6, 2)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
    assert (counts > 0).all()


def test_dras_device_vs_host_behavioral_equivalence(rng):
    """The device-scan DRAS's mixture draw is claimed statistically
    equivalent to the host loop's split draw (COMPONENT_MAP divergence #7):
    with a model whose attention provably prefers a planted region, the two
    variants produce matching weight-concentration ratios and final-draw
    planted fractions across seeds. (Concentration itself is mild by
    reference design: power=0.15 flattens attention into near-uniform
    weights — the point here is host/device AGREEMENT.)"""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.sampling import (
        SamplingConfig, dras_sample_slide, dras_sample_slide_device,
        make_attention_fn)
    from hipt_abmil_atec23_tpu.models import build_mil_model

    n, d = 1000, 192
    feats = rng.normal(size=(n, d)).astype(np.float32) * 0.1
    planted = np.arange(200, 320)
    feats[planted, 0] = 5.0          # the attention feature (see params)
    coords = np.stack([np.arange(n) % 40, np.arange(n) // 40], 1) * 256

    # hand-built CLAM_SB params: score monotone in feature 0, so planted
    # patches get the top attention within every sampled subset
    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, d), jnp.float32), None)
    p = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                     params)["params"]
    p["fc"]["kernel"][0, 0] = 1.0
    p["attention"]["attn_a"]["kernel"][0, 0] = 1.0
    p["attention"]["attn_c"]["kernel"][0, 0] = 4.0
    params = {"params": jax.tree.map(jnp.asarray, p)}

    cfg = SamplingConfig(resampling_iterations=6, samples_per_iteration=64,
                         final_sample_size=96, sampling_neighbors=8,
                         sampling_type="spatial", sampling_random=0.4)
    attn_fn = make_attention_fn(model, cfg.samples_per_iteration)

    def stats(res):
        w = np.asarray(res.weights)
        ratio = w[planted].mean() / max(np.delete(w, planted).mean(), 1e-9)
        frac = np.isin(np.asarray(res.final_idxs), planted).mean()
        return ratio, frac

    ratios_h, ratios_d, fracs_h, fracs_d = [], [], [], []
    for seed in range(3):
        rh = dras_sample_slide(feats, coords,
                               lambda s: attn_fn(params, s), cfg,
                               np.random.default_rng(seed))
        rd = dras_sample_slide_device(jnp.asarray(feats), coords, params,
                                      model, cfg, jax.random.PRNGKey(seed))
        r1, f1 = stats(rh)
        r2, f2 = stats(rd)
        ratios_h.append(r1); ratios_d.append(r2)
        fracs_h.append(f1); fracs_d.append(f2)

    # weight concentration ratios agree variant-to-variant
    assert abs(np.mean(ratios_h) - np.mean(ratios_d)) < 0.35, \
        (ratios_h, ratios_d)
    # final planted fractions agree in the mean
    assert abs(np.mean(fracs_h) - np.mean(fracs_d)) < 0.08, \
        (fracs_h, fracs_d)
    # and neither variant collapses below half of chance coverage
    chance = len(planted) / n
    assert np.mean(fracs_h) > 0.5 * chance and np.mean(fracs_d) > 0.5 * chance
