"""Disaggregated sampler/trainer execution (the reference arch5 / FGNN mode).

The reference dedicates sampler GPUs and trainer GPUs in separate processes,
shipping serialized tasks through a shared-memory ``MessageTaskQueue``
(``dist/dist_loops_arch5.cc``, ``common/task_queue.cc:162-366``), with the
trainers running DDP and a per-trainer ``DistCacheManager`` feature cache
(``dist/dist_cache_manager*``, ``dist_loops.cc:811-936``).

Under single-controller JAX the role split is a device-placement split:

- the shm queue becomes a ``jax.device_put`` from sampler chip to trainer
  chip — an ICI D2D copy dispatched asynchronously, overlapped with both
  sides' compute by the host prefetch pipeline;
- per-trainer batches are assembled into ONE globally-sharded array over the
  trainer mesh with ``jax.make_array_from_single_device_arrays`` — zero host
  copies, each trainer's shard is the batch that was shipped to it;
- DDP is a psum over the trainer mesh axis.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as PS

from .. import constants as C
from ..config import RunConfig
from ..sampler import Sampler
from ..train import TrainState, loss_fn, make_optimizer
from ..types import Graph
from .collocated import pack_batch, unpack_blocks
from .mesh import DATA_AXIS


class DisaggregatedSampler:
    """Sampling service pinned to dedicated sampler chips.

    One ``Sampler`` (and one topology replica) per sampler device; requests
    round-robin across them; outputs land on the requested trainer device
    (the MessageTaskQueue Send/Recv analog, minus the serialization)."""

    def __init__(
        self,
        dataset,
        config: RunConfig,
        sample_devices: Sequence,
        capacities=None,
    ):
        self.devices = list(sample_devices)
        self.samplers = []
        tiered = config.use_dist_graph and config.dist_graph_percentage < 1.0
        for dev in self.devices:
            if tiered:
                # arch5 sampler tier: each sampler chip holds the hot edge
                # prefix; host CSR serves the rest — lifts the one-chip-HBM
                # topology cap of disaggregated mode (reference arch5 with
                # --use-dist-graph)
                import numpy as np

                from ..sampler import (
                    _layer_fanouts,
                    default_capacities,
                    make_tiered_topology,
                )

                indptr = np.asarray(dataset.indptr)
                indices = np.asarray(
                    dataset.graph.indices
                    if getattr(dataset, "graph", None) is not None
                    else dataset.indices
                )
                graph, tier, full_n = make_tiered_topology(
                    indptr, indices, config.dist_graph_percentage,
                    config.sample_type, device=dev,
                )
                caps0 = capacities or config.frontier_capacities or (
                    default_capacities(
                        config.batch_size, _layer_fanouts(config), full_n
                    )
                )
                tier = (tier[0], tier[1], max(int(caps0[-1]) // 4, 128))
                self.samplers.append(
                    Sampler(graph, config, capacities, tier=tier,
                            num_node=full_n)
                )
                continue
            graph = (
                dataset.graph
                if getattr(dataset, "graph", None) is not None
                else Graph.from_dataset(dataset, dev)
            )
            self.samplers.append(Sampler(graph, config, capacities))
        self._rr = 0

    @property
    def capacities(self):
        return self.samplers[0].capacities

    def sample_to(self, seeds, num_seed, key, train_device):
        """Sample on the next sampler chip, ship the batch to the trainer
        chip (async D2D)."""
        idx = self._rr
        self._rr = (self._rr + 1) % len(self.samplers)
        dev = self.devices[idx]
        batch = self.samplers[idx].sample(
            jax.device_put(jnp.asarray(seeds), dev),
            num_seed,
            jax.device_put(key, dev),
        )
        return jax.device_put(batch, train_device)


def assemble_sharded(per_device_trees, mesh, axis_name: str = DATA_AXIS):
    """Stitch per-trainer pytrees (each resident on its trainer device) into
    globally-sharded arrays over the trainer mesh — the TPU-native
    MessageTaskQueue delivery: no host staging, no copies beyond the D2D
    ship that already happened.

    Every leaf of each tree must already live on the matching mesh device
    and have identical shapes across trainers.
    """
    devices = list(mesh.devices.ravel())
    assert len(per_device_trees) == len(devices)
    sharding = NamedSharding(mesh, PS(axis_name))

    def stitch(*leaves):
        shards = [
            jax.device_put(leaf, dev) for leaf, dev in zip(leaves, devices)
        ]
        shape = (len(devices) * leaves[0].shape[0],) + leaves[0].shape[1:]
        return jax.make_array_from_single_device_arrays(
            shape, sharding, shards
        )

    return jax.tree.map(stitch, *per_device_trees)


def make_disagg_train_step(
    model, config: RunConfig, mesh, axis_name: str = DATA_AXIS
):
    """DDP train step over the trainer mesh: per-trainer (batch, x, labels)
    shards → forward/backward → gradient psum → replicated update with the
    skip-on-overflow no-op (the NCCL-DDP loop of multi_gpu/train_gcn.py
    run_train re-expressed as one SPMD program)."""
    tx = make_optimizer(config)

    def per_chip(state, packed, x, labels, dkey):
        dkey = jax.random.wrap_key_data(dkey.reshape(-1))
        blocks = unpack_blocks(packed)
        num_output = packed["num_output"].reshape(())
        skip = jax.lax.pmax(packed["overflow"].reshape(()), axis_name)

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, blocks, x, True, rngs={"dropout": dkey}
            )
            return loss_fn(logits, labels, num_output)

        (loss, acc), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        # seed-count-weighted cross-trainer reduction (NOT pmean): a trainer
        # handed an empty/short batch on the ragged last step must not
        # average loss=0/acc=0 into the metrics or dilute the gradient
        w = num_output.astype(jnp.float32)
        wsum = jnp.maximum(jax.lax.psum(w, axis_name), 1.0)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * w, axis_name) / wsum, grads
        )
        loss = jax.lax.psum(loss * w, axis_name) / wsum
        acc = jax.lax.psum(acc * w, axis_name) / wsum
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
        return new_state, {
            "loss": jnp.where(skip, jnp.nan, loss),
            # NaN the acc too: a skipped step's accuracy was computed from
            # corrupt/zeroed rows and must not pollute the epoch average
            "acc": jnp.where(skip, jnp.nan, acc),
            "exchange_overflow": skip,
        }

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            PS(), PS(axis_name), PS(axis_name), PS(axis_name), PS(axis_name)
        ),
        out_specs=(PS(), PS()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def batch_to_shard(batch) -> dict:
    """Per-trainer shard of a packed batch + labels placeholder (scalars as
    (1,) lanes so ``assemble_sharded`` can concatenate them)."""
    return pack_batch(batch)
