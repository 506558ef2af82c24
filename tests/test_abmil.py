"""Unit + parity tests for the MIL heads (CLAM_SB/MB, MIL_fc)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.models import (
    CLAM_SB, CLAM_MB, MIL_fc, MIL_fc_mc, build_mil_model, MIL_SIZE_DICT,
)
from hipt_abmil_atec23_tpu.ops.masking import masked_softmax, masked_top_k

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps


def _init_and_run(model, bag, mask=None, **kwargs):
    params = model.init(jax.random.PRNGKey(0), bag, mask, **kwargs)
    return params, model.apply(params, bag, mask, **kwargs)


def test_masked_softmax_zero_on_pad():
    scores = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.array([[True, True, False, False]])
    p = masked_softmax(scores, mask)
    assert p[0, 2] == 0.0 and p[0, 3] == 0.0
    np.testing.assert_allclose(float(p.sum()), 1.0, rtol=1e-6)
    # fully masked row -> zeros, no NaN
    p0 = masked_softmax(scores, jnp.zeros_like(mask))
    assert not np.any(np.isnan(np.asarray(p0)))
    assert float(p0.sum()) == 0.0


def test_masked_top_k_ignores_pad():
    scores = jnp.array([1.0, 9.0, 5.0, 7.0])
    mask = jnp.array([True, False, True, True])
    vals, idx, valid = masked_top_k(scores, mask, 2)
    assert list(np.asarray(idx)) == [3, 2]
    assert bool(valid.all())


@pytest.mark.parametrize("model_type", ["clam_sb", "clam_mb", "mil"])
def test_forward_shapes(model_type, rng):
    n, d, c = 37, 1024, 2
    bag = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    model = build_mil_model(model_type, n_classes=c)
    params, out = _init_and_run(model, bag)
    assert out.logits.shape == (1, c)
    assert out.y_prob.shape == (1, c)
    assert out.y_hat.shape == (1,)
    np.testing.assert_allclose(np.asarray(out.y_prob).sum(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("model_type", ["clam_sb", "clam_mb", "mil"])
def test_padding_invariance(model_type, rng):
    """A padded+masked bag must produce the same output as the ragged bag."""
    n, n_pad, d = 29, 64, 1024
    bag = rng.normal(size=(n, d)).astype(np.float32)
    padded = np.zeros((n_pad, d), np.float32)
    padded[:n] = bag
    mask = np.zeros((n_pad,), bool)
    mask[:n] = True

    model = build_mil_model(model_type, n_classes=2)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(bag), None)
    out_ragged = model.apply(params, jnp.asarray(bag), None)
    out_padded = model.apply(params, jnp.asarray(padded), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_ragged.logits), np.asarray(out_padded.logits),
        rtol=2e-4, atol=1e-5)


def test_clam_instance_eval_outputs(rng):
    n, d = 50, 192
    bag = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    model = CLAM_SB(size_arg="hipt_smaller", k_sample=8, n_classes=2)
    params = model.init(jax.random.PRNGKey(0), bag, None,
                        label=jnp.array(1), instance_eval=True)
    out = model.apply(params, bag, None, label=jnp.array(1), instance_eval=True)
    assert "instance_loss" in out.extras
    assert np.isfinite(float(out.extras["instance_loss"]))
    # with subtyping off, only the in-class branch is valid: 2k instances
    assert int(out.extras["inst_valid"].sum()) == 16


def test_attention_only_path(rng):
    n, d = 21, 192
    bag = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    model = CLAM_SB(size_arg="hipt_smaller")
    params = model.init(jax.random.PRNGKey(0), bag, None)
    a = model.apply(params, bag, None, attention_only=True)
    assert a.shape == (1, n)


def test_dropout_is_stochastic_in_train_mode(rng):
    n, d = 40, 192
    bag = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    model = CLAM_SB(size_arg="hipt_smaller", dropout=0.5)
    params = model.init(jax.random.PRNGKey(0), bag, None)
    o1 = model.apply(params, bag, None, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, bag, None, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1.logits), np.asarray(o2.logits))


# ---------------------------------------------------------------------------
# Numerical parity vs the PyTorch reference (never copied — imported read-only
# from /root/reference purely to compare behavior; skipped when absent).
# ---------------------------------------------------------------------------

def _torch_clam(model_type, size_arg, n_classes, k_sample):
    stub_reference_deps()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from models.model_clam import CLAM_SB as TorchSB, CLAM_MB as TorchMB
    finally:
        sys.path.remove(REFERENCE_DIR)
    cls = TorchSB if model_type == "clam_sb" else TorchMB
    return cls(size_arg=size_arg, n_classes=n_classes, k_sample=k_sample)


def _copy_linear(params_leaf, torch_linear):
    import torch
    with torch.no_grad():
        torch_linear.weight.copy_(torch.tensor(np.asarray(params_leaf["kernel"]).T))
        torch_linear.bias.copy_(torch.tensor(np.asarray(params_leaf["bias"])))


def _sync_clam_weights(params, tmodel, multi_branch, n_classes):
    import torch
    p = params["params"]
    _copy_linear(p["fc"], tmodel.attention_net[0])
    attn = p["attention"]
    _copy_linear(attn["attn_a"], tmodel.attention_net[2].attention_a[0])
    _copy_linear(attn["attn_b"], tmodel.attention_net[2].attention_b[0])
    _copy_linear(attn["attn_c"], tmodel.attention_net[2].attention_c)
    with torch.no_grad():
        if multi_branch:
            for c in range(n_classes):
                tmodel.classifiers[c].weight.copy_(
                    torch.tensor(np.asarray(p["bag_w"][c]))[None, :])
                tmodel.classifiers[c].bias.copy_(
                    torch.tensor(np.asarray(p["bag_b"][c]))[None])
        else:
            _copy_linear(p["classifier"], tmodel.classifiers)
        for c in range(n_classes):
            tmodel.instance_classifiers[c].weight.copy_(
                torch.tensor(np.asarray(p["instance_w"][c]).T))
            tmodel.instance_classifiers[c].bias.copy_(
                torch.tensor(np.asarray(p["instance_b"][c])))


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("model_type", ["clam_sb", "clam_mb"])
def test_clam_parity_with_torch_reference(model_type, rng):
    import torch

    n, size_arg, n_classes, k = 64, "hipt_smaller", 2, 8
    d = MIL_SIZE_DICT[size_arg][0]
    bag = rng.normal(size=(n, d)).astype(np.float32)
    label = 1

    model = build_mil_model(model_type, size_arg=size_arg, n_classes=n_classes,
                            k_sample=k)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(bag), None,
                        label=jnp.array(label), instance_eval=True)
    out = model.apply(params, jnp.asarray(bag), None, label=jnp.array(label),
                      instance_eval=True)

    tmodel = _torch_clam(model_type, size_arg, n_classes, k)
    tmodel.eval()
    _sync_clam_weights(params, tmodel, model_type == "clam_mb", n_classes)
    with torch.no_grad():
        tlogits, tprob, that, ta_raw, tdict = tmodel(
            torch.tensor(bag), label=torch.tensor([label]), instance_eval=True)

    np.testing.assert_allclose(np.asarray(out.logits), tlogits.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.a_raw), ta_raw.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.extras["instance_loss"]),
                               float(tdict["instance_loss"]), rtol=1e-4, atol=1e-5)
    assert int(out.y_hat[0]) == int(that.item())
