"""HBM-capacity simulation: pin ballast buffers to emulate a smaller chip.

TPU-native analog of the reference's ``utility/simulate_v100_16g/simulate.cu``
(burns GPU memory so a 32 GB card behaves like a 16 GB V100).  Here a held
device buffer shrinks the usable HBM so capacity-limit behavior — the regime
the tiered store / GGMS exists for — can be exercised and benchmarked on a
larger chip: allocate ballast, then verify the feature matrix genuinely does
not fit beside it.

Usage::

    ballast = hbm_ballast(gb=9.0)       # hold ~9 GB of HBM
    ...                                  # run the capacity-limited workload
    del ballast                          # release
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hbm_ballast(gb: float, device=None) -> list[jax.Array]:
    """Allocate and return device buffers totalling ``gb`` GiB of HBM.

    The buffers are live as long as the returned list is referenced; dropping
    it frees the memory.  Allocated in ≤1 GiB chunks so partial amounts work
    and allocation failures surface with a clear size.  Buffers are written
    (iota, not zeros) so XLA cannot elide or compress the allocation.
    """
    chunks = []
    remaining = int(gb * (1 << 30))
    dev = device or jax.devices()[0]
    # generated ON device (a host device_put would move GB over the link)
    make = jax.jit(lambda n: jnp.arange(n, dtype=jnp.int32), static_argnums=0)
    with jax.default_device(dev):
        while remaining > 0:
            n = min(remaining, 1 << 30) // 4
            chunks.append(make(n))
            remaining -= n * 4
    for c in chunks:
        c.block_until_ready()
    return chunks
