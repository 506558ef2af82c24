"""Attention-based MIL heads (ABMIL / CLAM / instance-level MIL).

Capability parity with the reference's trainable models
(reference: models/model_clam.py, models/model_mil.py) re-designed for TPU:

- A bag is a fixed-shape ``[N, D]`` array plus a boolean ``[N]`` validity mask
  (the reference uses ragged ``[n, D]`` tensors, one slide per step).
- Every head is a pure Flax module; batching over bags, folds, or
  hyper-parameter trials is done with ``jax.vmap`` / ``shard_map`` outside.
- CLAM's instance-level clustering loss (reference: models/model_clam.py:116-178,
  a Python loop over per-class ``nn.Linear`` classifiers with host-side
  ``.item()`` branches) is computed for *all* classes at once with a single
  einsum against stacked classifier weights and combined with one-hot label
  weights — fully traceable, no data-dependent control flow.

Forward contract (mirrors the reference 5-tuple
``(logits, Y_prob, Y_hat, A_raw, results_dict)``, models/model_clam.py:191):
``MILOutput(logits[1,C], y_prob[1,C], y_hat[1], a_raw[K,N], extras)``.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hipt_abmil_atec23_tpu.ops.masking import masked_softmax, masked_top_k, masked_bottom_k

# Exact copy of the reference's named size configurations
# [input_dim, hidden_dim, attention_dim] (reference: models/model_clam.py:81).
MIL_SIZE_DICT = {
    "tinier3": [1024, 32, 8],
    "256": [256, 64, 16],
    "tinier_resnet18": [512, 64, 16],
    "tinier2_resnet18": [512, 32, 8],
    "tiny_resnet18": [512, 128, 32],
    "small_resnet18": [512, 256, 64],
    "tinier": [1024, 64, 16],
    "tiny128": [1024, 128, 32],
    "tiny": [1024, 256, 64],
    "small": [1024, 512, 256],
    "big": [1024, 512, 384],
    "hipt_big": [192, 128, 64],
    "hipt_medium": [192, 64, 32],
    "hipt_small": [192, 32, 16],
    "hipt_smaller": [192, 16, 8],
    "hipt_smallest": [192, 8, 4],
}

# Reference initializes every Linear with xavier-normal weights and zero bias
# (reference: utils/utils.py:217-226).
def _dense(features: int, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=nn.initializers.glorot_normal(),
        bias_init=nn.initializers.zeros_init(),
        name=name,
    )


class MILOutput(NamedTuple):
    logits: jax.Array      # [1, C]
    y_prob: jax.Array      # [1, C]
    y_hat: jax.Array       # [1] int32
    a_raw: jax.Array       # [K, N] pre-softmax attention (K=1 for SB, C for MB)
    extras: Dict[str, Any]


class AttnNet(nn.Module):
    """Two-layer attention scorer: Linear->Tanh->(Dropout)->Linear
    (reference: models/model_clam.py:15-31)."""

    dim_attn: int
    n_branches: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h: jax.Array, deterministic: bool = True) -> jax.Array:
        a = jnp.tanh(_dense(self.dim_attn, name="attn_a")(h))
        if self.dropout > 0:
            a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        return _dense(self.n_branches, name="attn_c")(a)  # [N, K]


class AttnNetGated(nn.Module):
    """Gated attention: A = W_c(tanh(W_a h) * sigmoid(W_b h))
    (reference: models/model_clam.py:41-64)."""

    dim_attn: int
    n_branches: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h: jax.Array, deterministic: bool = True) -> jax.Array:
        a = jnp.tanh(_dense(self.dim_attn, name="attn_a")(h))
        b = jax.nn.sigmoid(_dense(self.dim_attn, name="attn_b")(h))
        if self.dropout > 0:
            a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
            b = nn.Dropout(self.dropout)(b, deterministic=deterministic)
        return _dense(self.n_branches, name="attn_c")(a * b)  # [N, K]


def _instance_cluster_loss(
    a_soft: jax.Array,        # [C_branches, N] softmaxed attention
    h: jax.Array,             # [N, L] projected instances
    mask: jax.Array,          # [N] bool
    inst_w: jax.Array,        # [C, L, 2] stacked per-class binary classifiers
    inst_b: jax.Array,        # [C, 2]
    label: jax.Array,         # [] int
    n_classes: int,
    k_sample: int,
    subtyping: bool,
    multi_branch: bool,
):
    """CLAM instance-level clustering loss, all classes evaluated at once.

    For the label's class ("in-the-class", reference: models/model_clam.py:116-132)
    the top-k attended instances are pseudo-labelled positive and the bottom-k
    negative; for other classes ("out-of-the-class", :135-145, only when
    subtyping) the top-k are pseudo-labelled negative. Rather than branching on
    the host label (reference: :161-175 uses ``.item()``), we compute both
    variants for every class and blend with one-hot weights.
    """
    onehot = jax.nn.one_hot(label, n_classes)  # [C]

    def per_class(ci):
        a_c = a_soft[ci] if multi_branch else a_soft[0]  # [N]
        _, top_idx, top_valid = masked_top_k(a_c, mask, k_sample)
        _, bot_idx, bot_valid = masked_bottom_k(a_c, mask, k_sample)
        top_h = h[top_idx]  # [k, L]
        bot_h = h[bot_idx]
        w, b = inst_w[ci], inst_b[ci]
        top_logits = top_h @ w + b   # [k, 2]
        bot_logits = bot_h @ w + b
        # in-the-class: top->1, bottom->0 over 2k instances
        logits_in = jnp.concatenate([top_logits, bot_logits], axis=0)    # [2k, 2]
        targets_in = jnp.concatenate(
            [jnp.ones((k_sample,), jnp.int32), jnp.zeros((k_sample,), jnp.int32)]
        )
        valid_in = jnp.concatenate([top_valid, bot_valid]).astype(logits_in.dtype)
        ce_in = _masked_ce(logits_in, targets_in, valid_in)
        preds_in = jnp.argmax(logits_in, axis=-1)
        # out-of-the-class: top->0 over k instances
        ce_out = _masked_ce(top_logits, jnp.zeros((k_sample,), jnp.int32),
                            top_valid.astype(top_logits.dtype))
        preds_out = jnp.argmax(top_logits, axis=-1)
        return ce_in, preds_in, targets_in, valid_in, ce_out, preds_out, top_valid

    ce_in, preds_in, targets_in, valid_in, ce_out, preds_out, top_valid = jax.vmap(
        per_class
    )(jnp.arange(n_classes))

    in_w = onehot
    out_w = (1.0 - onehot) if subtyping else jnp.zeros_like(onehot)
    total = jnp.sum(in_w * ce_in) + jnp.sum(out_w * ce_out)
    if subtyping:
        total = total / n_classes  # reference: models/model_clam.py:177-178

    # Per-instance predictions/targets for the engine's clustering-accuracy
    # logger (reference: utils/core_utils.py:332-334). Validity folds in the
    # class-selection weights so only evaluated branches count.
    k2 = 2 * k_sample
    sel_in = jnp.repeat(in_w[:, None] > 0, k2, axis=1)
    sel_out = jnp.repeat(out_w[:, None] > 0, k_sample, axis=1)
    inst_preds = jnp.concatenate([preds_in.reshape(-1), preds_out.reshape(-1)])
    inst_targets = jnp.concatenate(
        [targets_in.reshape(-1), jnp.zeros((n_classes * k_sample,), jnp.int32)]
    )
    inst_valid = jnp.concatenate(
        [(sel_in & (valid_in > 0)).reshape(-1), (sel_out & top_valid).reshape(-1)]
    )
    return total, inst_preds, inst_targets, inst_valid


def _masked_ce(logits: jax.Array, targets: jax.Array, weights: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(nll * weights) / denom


class _CLAMBase(nn.Module):
    """Shared trunk: fc projection + attention + instance classifiers."""

    gate: bool = True
    size_arg: str = "small"
    dropout: float = 0.0
    k_sample: int = 8
    n_classes: int = 2
    subtyping: bool = False
    multi_branch: bool = False  # False: CLAM_SB, True: CLAM_MB

    @nn.compact
    def __call__(
        self,
        bag: jax.Array,                 # [N, D]
        mask: Optional[jax.Array] = None,  # [N] bool
        label: Optional[jax.Array] = None,
        instance_eval: bool = False,
        attention_only: bool = False,
        return_features: bool = False,
        deterministic: bool = True,
    ):
        size = MIL_SIZE_DICT[self.size_arg]
        n = bag.shape[0]
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)

        h = nn.relu(_dense(size[1], name="fc")(bag))  # [N, L]
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        n_branches = self.n_classes if self.multi_branch else 1
        attn_cls = AttnNetGated if self.gate else AttnNet
        a = attn_cls(dim_attn=size[2], n_branches=n_branches,
                     dropout=self.dropout, name="attention")(
                         h, deterministic=deterministic)  # [N, K]
        a_raw = a.T  # [K, N] — reference transposes before softmax (model_clam.py:150)
        if attention_only:
            return a_raw
        a_soft = masked_softmax(a_raw, mask[None, :], axis=-1)  # [K, N]

        extras: Dict[str, Any] = {}
        if instance_eval:
            if label is None:
                raise ValueError("instance_eval requires a label")
            # batch_axis=0: each class's [L, 2] slice gets the reference's
            # per-class xavier-normal std sqrt(2/(L+2)) (utils/utils.py:
            # 217-226); without it the class axis would count as fan and
            # shrink the init by sqrt(n_classes).
            inst_w = self.param(
                "instance_w", nn.initializers.glorot_normal(batch_axis=(0,)),
                (self.n_classes, size[1], 2))
            inst_b = self.param(
                "instance_b", nn.initializers.zeros_init(), (self.n_classes, 2))
            inst_loss, inst_preds, inst_targets, inst_valid = _instance_cluster_loss(
                a_soft, h, mask, inst_w, inst_b, jnp.asarray(label),
                self.n_classes, self.k_sample, self.subtyping, self.multi_branch)
            extras.update(
                instance_loss=inst_loss,
                inst_preds=inst_preds,
                inst_labels=inst_targets,
                inst_valid=inst_valid,
            )

        m = a_soft @ h  # [K, L] bag embedding(s) (reference: model_clam.py:180)
        if self.multi_branch:
            # Per-class 1-d bag classifiers (reference: model_clam.py:208,251-254).
            bag_w = self.param("bag_w", nn.initializers.glorot_normal(),
                               (self.n_classes, size[1]))
            bag_b = self.param("bag_b", nn.initializers.zeros_init(),
                               (self.n_classes,))
            logits = (jnp.sum(m * bag_w, axis=-1) + bag_b)[None, :]  # [1, C]
        else:
            logits = _dense(self.n_classes, name="classifier")(m)  # [1, C]

        y_prob = jax.nn.softmax(logits, axis=-1)
        y_hat = jnp.argmax(logits, axis=-1)
        if return_features:
            extras["features"] = m
        return MILOutput(logits, y_prob, y_hat, a_raw, extras)


class CLAM_SB(_CLAMBase):
    """Single-branch CLAM (gated-attention ABMIL + optional instance clustering).

    ABMIL mode == CLAM_SB trained with the instance loss disabled
    (reference: models/model_clam.py:77-191; docs/README.md winning config)."""

    multi_branch: bool = False


class CLAM_MB(_CLAMBase):
    """Multi-branch CLAM: per-class attention branches and per-class bag
    classifiers (reference: models/model_clam.py:193-264)."""

    multi_branch: bool = True


class MIL_fc(nn.Module):
    """Non-attention MIL baseline (binary): per-instance classifier; the slide
    prediction is the top class-1-probability instance
    (reference: models/model_mil.py:7-43)."""

    size_arg: str = "small"
    dropout: float = 0.0
    n_classes: int = 2
    top_k: int = 1

    @nn.compact
    def __call__(self, bag, mask=None, deterministic: bool = True, **_):
        assert self.n_classes == 2
        size = {"small": [1024, 512]}[self.size_arg]
        n = bag.shape[0]
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)
        h = nn.relu(_dense(size[1], name="fc")(bag))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        inst_logits = _dense(self.n_classes, name="classifier")(h)  # [N, 2]
        y_probs = jax.nn.softmax(inst_logits, axis=-1)
        _, top_idx, _ = masked_top_k(y_probs[:, 1], mask, self.top_k)
        top_instance = inst_logits[top_idx[0]][None, :]  # [1, 2]
        y_prob = jax.nn.softmax(top_instance, axis=-1)
        y_hat = jnp.argmax(top_instance, axis=-1)
        return MILOutput(top_instance, y_prob, y_hat, y_probs.T, {})


class MIL_fc_mc(nn.Module):
    """Multi-class MIL baseline: the prediction is the (instance, class) cell
    with the global max probability (reference: models/model_mil.py:46-93)."""

    size_arg: str = "small"
    dropout: float = 0.0
    n_classes: int = 3
    top_k: int = 1

    @nn.compact
    def __call__(self, bag, mask=None, deterministic: bool = True, **_):
        assert self.n_classes > 2
        size = {"small": [1024, 512]}[self.size_arg]
        n = bag.shape[0]
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)
        h = nn.relu(_dense(size[1], name="fc")(bag))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        inst_logits = _dense(self.n_classes, name="classifier")(h)  # [N, C]
        y_probs = jax.nn.softmax(inst_logits, axis=-1)
        masked_probs = jnp.where(mask[:, None], y_probs, 0.0)
        flat_arg = jnp.argmax(masked_probs.reshape(-1))
        top_inst = flat_arg // self.n_classes
        y_hat = (flat_arg % self.n_classes)[None]
        top_instance = inst_logits[top_inst][None, :]
        y_prob = y_probs[top_inst][None, :]
        return MILOutput(top_instance, y_prob, y_hat, y_probs.T, {})


def build_mil_model(
    model_type: str,
    *,
    size_arg: str = "small",
    dropout: float = 0.0,
    n_classes: int = 2,
    k_sample: int = 8,
    gate: bool = True,
    subtyping: bool = False,
) -> nn.Module:
    """Model-type dispatch mirroring the reference registry
    (reference: main.py:329, utils/core_utils.py:156-189)."""
    if model_type == "clam_sb":
        return CLAM_SB(gate=gate, size_arg=size_arg, dropout=dropout,
                       k_sample=k_sample, n_classes=n_classes, subtyping=subtyping)
    if model_type == "clam_mb":
        return CLAM_MB(gate=gate, size_arg=size_arg, dropout=dropout,
                       k_sample=k_sample, n_classes=n_classes, subtyping=subtyping)
    if model_type == "mil":
        if n_classes > 2:
            return MIL_fc_mc(size_arg="small", dropout=dropout, n_classes=n_classes)
        return MIL_fc(size_arg="small", dropout=dropout, n_classes=n_classes)
    raise ValueError(f"unknown model_type {model_type!r}")
