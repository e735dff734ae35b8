"""Frequency-based cache ranking via pre-sampling.

Reference ``PreSampler::DoPreSample`` (``dist/pre_sampler.cc:39-163``): run
``presample_epoch`` epochs of the *real* sampler, count per-node access
frequency, rank descending.  Here counting is a jitted scatter-add over each
batch's ``input_nodes`` — the counting rides the same compiled sampler the
training loop uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

def static_presample_config(cfg):
    """PRE_SAMPLE_STATIC presamples with an all-neighbor expansion instead
    of the configured sampler (reference ``DoGPUSampleAllNeighbour``,
    ``dist/pre_sampler.cc:188-210``): KHOP0 at a wide static fanout emits
    every neighbor exactly once for nodes with degree <= fanout.  Shared by
    all three engines so the policy ranks identically across them."""
    import dataclasses

    from ..config import SampleType

    return dataclasses.replace(
        cfg,
        sample_type=SampleType.KHOP0,
        fanout=(cfg.presample_static_fanout,) * cfg.num_fanout,
        frontier_capacities=None,
    )


@jax.jit
def _accumulate(freq, input_nodes, num_input):
    n = input_nodes.shape[0]
    valid = jnp.arange(n) < num_input
    idx = jnp.where(valid, input_nodes, 0)
    return freq.at[idx].add(valid.astype(freq.dtype), mode="drop")


def presample_ranking(sampler, train_set, config, num_node: int) -> np.ndarray:
    """Run presample epochs, return per-node access counts (host array)."""
    from ..engine.shuffler import Shuffler  # deferred: avoids circular import

    freq = jnp.zeros((num_node,), jnp.int32)
    shuffler = Shuffler(
        train_set, config.batch_size, seed=config.seed, num_worker=1
    )
    key = jax.random.key(config.seed ^ 0x5EED)
    for epoch in range(config.presample_epoch):
        for seeds, num_valid in shuffler.epoch_batches(epoch):
            key, k = jax.random.split(key)
            batch = sampler.sample(jnp.asarray(seeds), num_valid, k)
            freq = _accumulate(freq, batch.input_nodes, batch.num_input)
    return np.asarray(freq)
