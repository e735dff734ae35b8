"""Disaggregated sampler/trainer execution (the reference arch5 / FGNN mode).

The reference dedicates sampler GPUs and trainer GPUs in separate processes,
shipping serialized tasks through a shared-memory ``MessageTaskQueue``
(``dist/dist_loops_arch5.cc``, ``common/task_queue.cc:162-366``).  Under
single-controller JAX the role split is a device-placement split, and the
shm queue becomes a ``jax.device_put`` from sampler chip to trainer chip —
an ICI D2D copy dispatched asynchronously, overlapped with both sides'
compute by the host prefetch pipeline.

Layout: ``sample_devices`` run the sampling jit; ``train_devices`` run a
data-parallel train step; batches round-robin from samplers to trainers.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import RunConfig
from ..sampler import Sampler
from ..types import Graph


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
        for dev in self.devices:
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
