"""Training step construction: loss, optimizer, jitted update.

Replaces the reference's PyTorch DDP training loop
(``example/samgraph/sgnn/train_gcn.py:133-243``): Adam via optax, gradient
sync via ``pmean`` over the data-parallel mesh axis when present (the NCCL
all-reduce analog, rides ICI collectives inserted by XLA).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .types import Block


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(config) -> optax.GradientTransformation:
    if config.weight_decay:
        return optax.adamw(config.lr, weight_decay=config.weight_decay)
    return optax.adam(config.lr)


def init_state(model, config, sample_batch_blocks: Sequence[Block], sample_x, rng) -> TrainState:
    params = model.init(
        {"params": rng, "dropout": rng}, sample_batch_blocks, sample_x, False
    )["params"]
    tx = make_optimizer(config)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def loss_fn(logits: jax.Array, labels: jax.Array, num_valid: jax.Array):
    """Masked softmax cross-entropy over the first ``num_valid`` seeds."""
    n = logits.shape[0]
    mask = (jnp.arange(n) < num_valid).astype(jnp.float32)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    ll = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
    total = jnp.maximum(num_valid.astype(jnp.float32), 1.0)
    loss = jnp.sum(ll * mask) / total
    acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / total
    return loss, acc


def make_train_step(model, config, donate: bool = True, axis_name: Optional[str] = None):
    """Build the jitted train step.

    ``axis_name`` set ⇒ gradients are ``pmean``-ed across that mesh axis
    (data parallelism; the DDP/NCCL analog).  The returned function signature:
    ``(state, blocks, x, labels, num_valid, dropout_rng) -> (state, metrics)``.
    """
    tx = make_optimizer(config)

    def step(state: TrainState, blocks, x, labels, num_valid, rng, skip=None):
        """``skip`` (bool scalar, e.g. capacity overflow): the whole update
        becomes a no-op on device — avoids a per-step host sync to decide."""

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, blocks, x, True, rngs={"dropout": rng}
            )
            return loss_fn(logits, labels, num_valid)

        (loss, acc), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if skip is not None:
            keep = lambda old, new: jax.tree.map(
                lambda a, b: jnp.where(skip, a, b), old, new
            )
            params = keep(state.params, params)
            opt_state = keep(state.opt_state, opt_state)
            loss = jnp.where(skip, jnp.nan, loss)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    if axis_name is not None:
        return step  # caller wraps in shard_map/jit with mesh context
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    @jax.jit
    def eval_step(params, blocks, x, labels, num_valid):
        logits = model.apply({"params": params}, blocks, x, False)
        _, acc = loss_fn(logits, labels, num_valid)
        return acc

    return eval_step
