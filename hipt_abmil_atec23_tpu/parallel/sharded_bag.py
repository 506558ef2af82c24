"""Instance-axis (sequence-parallel) sharded MIL inference.

The reference caps bags at ``max_patches_per_slide`` because a full ResNet
slide bag (10^4-10^5 x 1024) doesn't fit one GPU step (SURVEY.md §5
long-context). Here the *instance axis itself is a mesh axis*: the bag is
sharded [N/n_dev, D] per device inside ``shard_map``; the gated-attention
softmax runs as local partials + two psums (global max, global sum), and the
bag embedding M = A·h is a psum of local matmuls. Full-slide exact inference —
no subsampling — scales linearly over ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hipt_abmil_atec23_tpu.ops.masking import NEG_INF


def sharded_clam_forward(params: Any, bag: jax.Array, mask: jax.Array,
                         mesh: Mesh, *, axis: str = "inst",
                         use_fused: bool = False,
                         fused_impl: str = "grid") -> Tuple[jax.Array, jax.Array]:
    """CLAM_SB deterministic forward with the instance axis sharded.

    params: unbatched CLAM_SB parameter tree ({'params': {...}}).
    bag:    [N, D] with N divisible by mesh.shape[axis].
    Returns (logits [1, C], a_raw [1, N] fully replicated).

    use_fused=True runs each shard's projection + online-softmax partials as
    ONE Pallas kernel (ops/gated_attention_pool.py partial mode) and combines
    shards with the flash-attention pmax/psum recurrence — the fused kernel IS
    the sequence-parallel local op, no [N_local, L] HBM intermediates.
    """
    p = params["params"]

    if use_fused:
        from hipt_abmil_atec23_tpu.ops.gated_attention_pool import (
            gated_attention_pool_partial, params_from_clam)
        gp = params_from_clam(params)

        def local_fused(bag_l, mask_l):
            acc, m, l, scores = gated_attention_pool_partial(
                bag_l, gp, mask=mask_l, impl=fused_impl)
            gmax = jax.lax.pmax(m, axis)
            scale = jnp.exp(m - gmax)
            l_g = jax.lax.psum(l * scale, axis)
            acc_g = jax.lax.psum(acc * scale, axis)        # [1, L]
            mpool = acc_g / jnp.maximum(l_g, 1e-30)
            logits = mpool @ gp.w_cls + gp.b_cls           # [1, C]
            a_full = jax.lax.all_gather(scores, axis, tiled=True)
            return logits, a_full[None, :]

        fwd = shard_map(
            local_fused, mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fwd(bag, mask)

    def local_fwd(bag_l, mask_l):
        # fc -> relu (local, elementwise over instances)
        h = jax.nn.relu(bag_l @ p["fc"]["kernel"] + p["fc"]["bias"])
        att = p["attention"]
        a = jnp.tanh(h @ att["attn_a"]["kernel"] + att["attn_a"]["bias"])
        b = jax.nn.sigmoid(h @ att["attn_b"]["kernel"] + att["attn_b"]["bias"])
        scores = ((a * b) @ att["attn_c"]["kernel"] + att["attn_c"]["bias"])[:, 0]
        scores = jnp.where(mask_l, scores, NEG_INF)

        # distributed masked softmax over the sharded instance axis.
        # softmax(s - c) is invariant in c, so the global max is purely a
        # numerical-stability shift — stop_gradient both keeps that exact
        # and sidesteps pmax's missing differentiation rule.
        gmax = jax.lax.pmax(jax.lax.stop_gradient(jnp.max(scores)), axis)
        e = jnp.exp(scores - gmax) * mask_l.astype(scores.dtype)
        gsum = jax.lax.psum(jnp.sum(e), axis)
        w = e / jnp.maximum(gsum, 1e-30)

        # bag embedding: psum of local weighted sums
        m_local = w @ h                                    # [L]
        m = jax.lax.psum(m_local, axis)                    # [L]
        logits = m @ p["classifier"]["kernel"] + p["classifier"]["bias"]
        a_full = jax.lax.all_gather(scores, axis, tiled=True)  # [N]
        return logits[None, :], a_full[None, :]

    fwd = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fwd(bag, mask)


def sharded_clam_loss(params: Any, bag: jax.Array, mask: jax.Array,
                      label, mesh: Mesh, *, axis: str = "inst") -> jax.Array:
    """Cross-entropy bag loss on an instance-SHARDED full-slide bag.
    Differentiable: shard_map has autodiff rules, so gradients flow through
    the psum/pmax collectives back to every parameter — exact full-bag
    training the reference can only approximate by subsampling
    (datasets/dataset_generic.py:517-519)."""
    logits, _ = sharded_clam_forward(params, bag, mask, mesh, axis=axis)
    logp = jax.nn.log_softmax(logits[0])
    return -logp[jnp.asarray(label)]


def sharded_bag_train_step(params: Any, opt_state, tx, bag: jax.Array,
                           mask: jax.Array, label, mesh: Mesh,
                           *, axis: str = "inst"):
    """One optimizer step on one exact full-slide bag with the instance axis
    sharded over the mesh (sequence-parallel MIL training). `tx` is any
    optax GradientTransformation; returns (params, opt_state, loss)."""
    import optax

    loss, grads = jax.value_and_grad(sharded_clam_loss)(
        params, bag, mask, label, mesh, axis=axis)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
