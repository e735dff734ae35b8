"""Collocated multi-chip training step (the XGNN arch6 analog).

Every chip samples, extracts, and trains its own mini-batch shard (reference
``RunArch6LoopsOnce``, ``dist/dist_loops_arch6.cc:55-199``) — expressed as ONE
jitted SPMD program over a named mesh:

  per chip: sample (replicated topology) → feature fetch from the
  partitioned HBM store via sorted all-to-all (``exchange.partitioned_gather``,
  replacing NVLink P2P reads) → forward/backward → gradient psum (the
  NCCL-DDP analog) → replicated optimizer update.

The feature store sharding is the ``--part-cache`` / GGMS path; topology
partition (``--use-dist-graph``) has its own exchange in
``dist_topology.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as PS
from jax import shard_map

from .. import constants as C
from ..config import RunConfig
from ..sampler import _sample_minibatch
from ..train import TrainState, loss_fn, make_optimizer
from ..types import Graph
from .exchange import partitioned_gather
from .mesh import DATA_AXIS


def make_collocated_train_step(
    model,
    config: RunConfig,
    mesh,
    capacities,
    seg_cap: int,
    axis_name: str = DATA_AXIS,
    use_dist_graph: bool = False,
):
    """Build the full SPMD train step.

    Signature of the returned jitted fn::

        (state, topo, feat_parts, label_parts, seeds, num_seeds, keys, dkeys)
            -> (state, metrics)

    - ``state``: replicated TrainState.
    - ``topo``: replicated Graph (topology), or — with ``use_dist_graph`` —
      the pair ``(local_indptrs, local_indices)`` from
      ``dist_topology.partition_csr_host`` sharded over ``axis_name``
      (the ``--use-dist-graph`` GGMS topology partition).
    - ``feat_parts``: (P, rows, F) interleave-partitioned features
      (from ``exchange.shard_interleaved``), sharded over ``axis_name``
      (the ``--part-cache`` analog).
    - ``label_parts``: (P, rows) interleave-partitioned labels.
    - ``seeds``: (P, batch_cap) per-chip seed shards; ``num_seeds``: (P,);
      ``keys``/``dkeys``: (P, 2) per-chip RNG key DATA (uint32, from
      ``jax.random.key_data``).
    """
    tx = make_optimizer(config)
    fanouts = tuple(config.fanout)
    caps = tuple(int(c) for c in capacities)
    rw = (
        config.num_random_walk,
        config.random_walk_length,
        config.random_walk_restart_prob,
    )

    def per_chip(state, topo, feat_part, label_part, seeds, num_seed, key, drop_key):
        seeds = seeds.reshape(-1)
        num_seed = num_seed.reshape(())
        # keys arrive as raw uint32 data (typed key arrays don't survive
        # multi-process host staging)
        key = jax.random.wrap_key_data(key.reshape(-1))
        drop_key = jax.random.wrap_key_data(drop_key.reshape(-1))
        if use_dist_graph:
            from .dist_topology import sample_minibatch_partitioned

            local_iptr, local_idx = topo
            batch = sample_minibatch_partitioned(
                local_iptr.reshape(local_iptr.shape[-1]),
                local_idx.reshape(local_idx.shape[-1]),
                seeds,
                num_seed,
                key,
                axis_name=axis_name,
                seg_cap=seg_cap,
                sample_type=config.sample_type,
                fanouts=fanouts,
                capacities=caps,
            )
        else:
            batch = _sample_minibatch(
                topo,
                seeds,
                num_seed,
                key,
                sample_type=config.sample_type,
                fanouts=fanouts,
                capacities=caps,
                rw_params=rw,
            )
        feat_local = feat_part.reshape(feat_part.shape[-2], feat_part.shape[-1])
        x, overflow = partitioned_gather(
            feat_local, batch.input_nodes, axis_name, seg_cap
        )
        lab_local = label_part.reshape(-1, 1)
        labels, lab_overflow = partitioned_gather(
            lab_local, batch.output_nodes, axis_name, seg_cap
        )
        labels = labels[:, 0]
        # any overflow anywhere poisons the step: overflowed exchange slots
        # received another request's rows, so the whole update is skipped on
        # device (the single-chip Engine's skip path, train.make_train_step)
        skip = jax.lax.pmax(
            overflow | lab_overflow | batch.overflow, axis_name
        )

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, batch.blocks, x, True,
                rngs={"dropout": drop_key},
            )
            return loss_fn(logits, labels, batch.num_output)

        (loss, acc), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        acc = jax.lax.pmean(acc, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        keep = lambda old, new: jax.tree.map(
            lambda a, b: jnp.where(skip, a, b), old, new
        )
        new_state = TrainState(
            params=keep(state.params, params),
            opt_state=keep(state.opt_state, opt_state),
            step=state.step + 1,
        )
        metrics = {
            "loss": jnp.where(skip, jnp.nan, loss),
            "acc": acc,
            "exchange_overflow": skip,
        }
        return new_state, metrics

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            PS(),  # state (replicated)
            PS(axis_name) if use_dist_graph else PS(),  # topology
            PS(axis_name),  # feat parts
            PS(axis_name),  # label parts
            PS(axis_name),  # seeds
            PS(axis_name),  # num_seeds
            PS(axis_name),  # sample keys
            PS(axis_name),  # dropout keys
        ),
        out_specs=(PS(), PS()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def put_replicated(tree, mesh):
    """Replicate a pytree over the mesh (multi-process aware: under
    multi-controller JAX every process supplies the full value)."""
    sharding = NamedSharding(mesh, PS())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    import numpy as np

    def put_one(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(put_one, tree)


def put_sharded(arr, mesh, axis_name: str = DATA_AXIS):
    """Shard ``arr`` along dim 0 over the mesh (multi-process aware)."""
    sharding = NamedSharding(mesh, PS(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    import numpy as np

    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
